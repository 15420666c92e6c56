from pathtrace_tpu.accel.bvh import BVHArrays, build_bvh, validate_bvh
from pathtrace_tpu.accel.traverse import raycast_bvh

__all__ = ["BVHArrays", "build_bvh", "validate_bvh", "raycast_bvh"]
