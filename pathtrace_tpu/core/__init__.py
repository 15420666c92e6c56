from pathtrace_tpu.core.camera import Camera

__all__ = ["Camera"]
