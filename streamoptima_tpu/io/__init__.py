from streamoptima_tpu.io.video import VideoManager

__all__ = ["VideoManager"]
