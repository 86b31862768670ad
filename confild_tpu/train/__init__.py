from confild_tpu.train import (cnf_trainer, classifier_trainer,  # noqa: F401
                               diffusion_trainer)
