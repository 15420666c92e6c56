"""Section-cost attribution for the fused bounce kernel on real TPU.

Times fused_bounce_step with each section ablated (replaced by cheap
placeholders); cost of a section ~= full - ablated. Run one TPU process
at a time (see .claude/skills/verify/SKILL.md).

    python tools/fused_ablate.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

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
GINNER = int(os.environ.get("MB_GINNER", 1))
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

LANES_L = LANES // 8
local0 = jnp.arange(LANES, dtype=jnp.int32).reshape(8, LANES_L)
sf = jnp.zeros((sf_rows, 8, LANES_L), jnp.float32).at[4].set(-1.0)
sf = sf.at[9:12].set(1.0)
si = jnp.zeros((2, 8, LANES_L), jnp.int32).at[0].set(1).at[1].set(local0)

import functools


def timed(ablate):
    @jax.jit
    def loop_steps(sf, si):
        def body(_, c):
            sf_c, si_c, r = c
            sf_n, si_n = fused_bounce_step(
                pack, misc, key2, cam16, sf_c, si_c, cfg=cfg, lanes=LANES,
                k_pix=k_pix, width=W, height=H, block_r=BLOCK_R,
                g_inner=GINNER, ablate=frozenset(ablate))
            return sf_n, si_n, r
        return jax.lax.fori_loop(0, ITERS, body,
                                 (sf, si, jnp.zeros((), jnp.float32)))

    out = loop_steps(sf, si)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop_steps(sf, si)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (ITERS * GINNER) * 1e6


base = timed(())
print(f"{'full':>22}: {base:8.1f} us/iter  (t_pad={pack.t_pad}, "
      f"lanes={LANES}, block_r={BLOCK_R})", flush=True)
for ab in (("rng",), ("raycast",), ("fetch",), ("mtexact",), ("nee",),
           ("bsdf",), ("spheres",), ("regen",), ("body",),
           ("raycast", "fetch", "mtexact", "nee", "bsdf", "spheres",
            "regen", "rng")):
    us = timed(ab)
    print(f"{'-'.join(ab):>22}: {us:8.1f} us/iter  (section ~ "
          f"{base - us:+8.1f} us)", flush=True)
