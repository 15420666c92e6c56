"""Render driver: spp-chunked accumulation over a pixel grid.

Replaces PathTracer::Render + StartRender (pathtracer.cu:42-83,124-259).
The reference runs NUM_MULTI_SAMPLE=8 sequential kernel launches of
NUM_SAMPLE=1024 samples each, accumulating into a raw film buffer and
re-exporting temp.png after every pass. Here a pass is one `lax.scan`
step tracing one sample per pixel for the whole grid (or per tile), and
multi-pass accumulation/checkpointing lives in io/checkpoint.py + cli.

Ray id convention matches the reference's stream layout
(pathtracer.cu:71: offset + SampleIDX*W*H): ray_id = sample*W*H + pixel.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from pathtrace_tpu.core.camera import Camera
from pathtrace_tpu.integrator.config import IntegratorConfig
from pathtrace_tpu.integrator.megakernel import trace_paths
from pathtrace_tpu.models.scene import Scene
from pathtrace_tpu.utils import rng

# rng tag namespaces for camera jitter vs path sampling
_JITTER_TAG = 0x7F000000


def render_sample(scene: Scene, camera: Camera, sample_idx, base_key,
                  cfg: IntegratorConfig = IntegratorConfig(),
                  raycast_fn=None, sample_mat_fn=None) -> jnp.ndarray:
    """Trace one sample per pixel; returns (W*H, 3) radiance."""
    px, py = camera.pixel_grid()
    num_pix = px.shape[0]
    pixel_ids = jnp.arange(num_pix, dtype=jnp.int32)
    ray_ids = sample_idx * num_pix + pixel_ids
    # Per-(pixel,sample) subpixel jitter (GetPixelDirection,
    # pathtracer.cu:33-40; the reference jitters once per 1024-sample pass,
    # we jitter per sample - same estimator, better AA).
    ju = rng.pixel_jitter(base_key, ray_ids)
    dirs = camera.ray_directions(px, py, ju[:, 0], ju[:, 1])
    org = jnp.broadcast_to(camera.pos, dirs.shape)
    return trace_paths(scene, org, dirs, ray_ids, base_key, cfg, raycast_fn,
                       sample_mat_fn)


@partial(jax.jit, static_argnames=("spp", "cfg", "raycast_fn",
                                   "sample_mat_fn"))
def render(scene: Scene, camera: Camera, spp: int, base_key,
           cfg: IntegratorConfig = IntegratorConfig(),
           raycast_fn=None, sample_mat_fn=None) -> jnp.ndarray:
    """Mean radiance over spp samples; returns (H, W, 3) linear float32.

    Equivalent to the reference's inner sample loop + image[i] += mean
    (StartRender, pathtracer.cu:77-81) with renormalization at export
    (exportImage, pathtracer.cu:94-122).
    """
    def body(accum, s):
        accum = accum + render_sample(scene, camera, s, base_key, cfg,
                                      raycast_fn, sample_mat_fn)
        return accum, None

    num_pix = camera.width * camera.height
    accum = jnp.zeros((num_pix, 3), jnp.float32)
    accum, _ = jax.lax.scan(body, accum, jnp.arange(spp))
    img = accum / spp
    return img.reshape(camera.height, camera.width, 3)


def render_image(scene: Scene, camera: Camera, spp: int, seed: int = 0,
                 cfg: IntegratorConfig = IntegratorConfig(),
                 raycast_fn=None,
                 passes: int = 1,
                 progressive_path: Optional[str] = None) -> jnp.ndarray:
    """Multi-pass render with optional progressive PNG dumps.

    Mirrors the reference's 8-pass loop with temp.png after each pass
    (pathtracer.cu:236-246). Returns the final (H, W, 3) linear image.
    """
    from pathtrace_tpu.io import image as imageio

    key = rng.make_key(seed)
    accum = jnp.zeros((camera.height, camera.width, 3), jnp.float32)
    spp_per_pass = max(spp // passes, 1)
    for p in range(passes):
        pass_key = rng.iter_key(key, 1000 + p)
        accum = accum + render(scene, camera, spp_per_pass, pass_key, cfg,
                               raycast_fn)
        if progressive_path is not None:
            imageio.write_png(progressive_path, accum / (p + 1))
    return accum / passes
