from streamoptima_tpu.utils.clips import synthetic_clip  # noqa: F401
