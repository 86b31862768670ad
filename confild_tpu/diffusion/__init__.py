from confild_tpu.diffusion import gaussian, losses, resample  # noqa: F401
from confild_tpu.diffusion.gaussian import (  # noqa: F401
    GaussianDiffusion,
    LossType,
    ModelMeanType,
    ModelVarType,
    create_gaussian_diffusion,
)
