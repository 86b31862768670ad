from confild_tpu.train import cnf_trainer, diffusion_trainer  # noqa: F401
