from pathtrace_tpu.parallel.mesh import (RAY_AXIS, make_ray_mesh,
                                         render_grad_sharded, render_sharded,
                                         render_wavefront_sharded,
                                         train_step_replay_sharded,
                                         train_step_wavetape_sharded)

__all__ = ["RAY_AXIS", "make_ray_mesh", "render_sharded",
           "render_grad_sharded", "render_wavefront_sharded",
           "train_step_replay_sharded", "train_step_wavetape_sharded"]
