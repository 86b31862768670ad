from confild_tpu.analysis import metrics  # noqa: F401
