from confild_tpu.train import cnf_trainer  # noqa: F401
