from confild_tpu.ops import siren_decode  # noqa: F401
