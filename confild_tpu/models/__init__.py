from confild_tpu.models import cnf, cnf_zoo, nn, unet  # noqa: F401
