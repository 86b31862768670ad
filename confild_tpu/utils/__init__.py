from confild_tpu.utils import logger, readdata  # noqa: F401
