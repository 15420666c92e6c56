from pathtrace_tpu.ops import intersect, bsdf

__all__ = ["intersect", "bsdf"]
