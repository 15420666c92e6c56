from pathtrace_tpu.io import image

__all__ = ["image"]
