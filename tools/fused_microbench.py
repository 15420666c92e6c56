"""Microbenchmark the fused bounce step in isolation on the TPU.

Times (a) one fused_bounce_step pallas call repeated via lax.fori_loop
inside a single program, and (b) the full _run_fused while_loop at 64 spp,
to separate in-kernel cost from loop/driver overhead.
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pathtrace_tpu.models import procedural
from pathtrace_tpu.integrator.config import IntegratorConfig
from pathtrace_tpu.ops.pallas.bounce_kernel import (
    build_fused_pack, fused_bounce_step, _cam16)
from pathtrace_tpu.utils import rng

LANES = int(os.environ.get("MB_LANES", 65536))
ITERS = int(os.environ.get("MB_ITERS", 200))
BLOCK_R = int(os.environ.get("MB_BLOCK_R", 2048))
W = H = 256

scene = procedural.cornell_box_scene(include_spheres=True).with_mt()
scene = scene.to_device()
pack = build_fused_pack(scene)
camera = procedural.default_camera(W, H)
cfg = IntegratorConfig()
key = rng.make_key(0)

k_pix = max(1, (W * H) // LANES)
sf_rows = 13 + 3 * k_pix  # incl. rays-accumulator row
misc = jnp.stack([jnp.int32(0), jnp.int32(W * H * 64),
                  jnp.int32(0), jnp.int32(0)])[None, :]
key2 = jnp.stack([key[0], key[1]])[None, :]
cam16 = _cam16(camera)

local0 = jnp.arange(LANES, dtype=jnp.int32)
sf = jnp.zeros((sf_rows, LANES), jnp.float32).at[3:6].set(
    jnp.stack([jnp.zeros(LANES), jnp.zeros(LANES) - 1.0,
               jnp.zeros(LANES)]).astype(jnp.float32))
sf = sf.at[9:12].set(1.0)
si = jnp.zeros((6, LANES), jnp.int32).at[3].set(1).at[4].set(local0)


@jax.jit
def loop_steps(sf, si):
    def body(_, c):
        sf_c, si_c, r = c
        sf_n, si_n = fused_bounce_step(
            pack, misc, key2, cam16, sf_c, si_c, cfg=cfg, lanes=LANES,
            k_pix=k_pix, width=W, height=H, block_r=BLOCK_R)
        return sf_n, si_n, r

    return jax.lax.fori_loop(0, ITERS, body,
                             (sf, si, jnp.zeros((), jnp.float32)))


out = loop_steps(sf, si)
jax.block_until_ready(out)
t0 = time.perf_counter()
out = loop_steps(sf, si)
jax.block_until_ready(out)
dt = time.perf_counter() - t0
print(f"fused step: {dt / ITERS * 1e6:.1f} us/iter "
      f"({LANES} lanes, block_r={BLOCK_R}, {ITERS} iters, total {dt:.3f}s)")
