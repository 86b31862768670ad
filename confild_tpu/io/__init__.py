from confild_tpu.io import torch_port  # noqa: F401
