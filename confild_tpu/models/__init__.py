from confild_tpu.models import cnf  # noqa: F401
