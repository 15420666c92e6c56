from pathtrace_tpu.utils import math3, rng

__all__ = ["math3", "rng"]
