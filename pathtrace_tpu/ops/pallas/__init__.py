from pathtrace_tpu.ops.pallas.intersect_kernel import (mt_closest_pallas,
                                                      raycast_pallas)

__all__ = ["mt_closest_pallas", "raycast_pallas"]
