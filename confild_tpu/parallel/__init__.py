from confild_tpu.parallel import mesh  # noqa: F401
