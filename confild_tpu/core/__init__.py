from confild_tpu.core import normalize, packing, schedules, slicing  # noqa: F401
