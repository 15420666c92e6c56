"""(lanes, block_r, steps-per-launch) sweep of the fused bounce kernel.

Times the FULL fused_bounce_step in a fori_loop at several shapes to find
the overhead-amortizing configuration (the ablation tool showed a ~190 us
floor with every section ablated at 65536 lanes / block_r 2048 - i.e.
fixed per-iteration cost dominates; see STATUS.md). One TPU process at a
time (see .claude/skills/verify/SKILL.md).

    python tools/fused_sweep.py
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

ITERS = int(os.environ.get("MB_ITERS", 128))
W = H = 256

scene = procedural.cornell_box_scene(include_spheres=True).with_mt()
scene = scene.to_device()
pack = build_fused_pack(scene)
camera = procedural.default_camera(W, H)
cfg = IntegratorConfig()
key = rng.make_key(0)
key2 = jnp.stack([key[0], key[1]])[None, :]
cam16 = _cam16(camera)


G_INNER = int(os.environ.get("MB_GINNER", 1))


def timed(lanes, block_r):
    k_pix = max(1, (W * H) // lanes)
    sf_rows = 13 + 3 * k_pix  # incl. rays-accumulator row
    misc = jnp.stack([jnp.int32(0), jnp.int32(W * H * 64)])[None, :]
    lanes_l = lanes // 8
    local0 = jnp.arange(lanes, dtype=jnp.int32).reshape(8, lanes_l)
    sf = jnp.zeros((sf_rows, 8, lanes_l), jnp.float32).at[4].set(-1.0)
    sf = sf.at[9:12].set(1.0)
    si = jnp.zeros((2, 8, lanes_l), jnp.int32).at[0].set(1).at[1].set(local0)

    @jax.jit
    def loop_steps(sf, si):
        def body(_, c):
            sf_c, si_c, r = c
            sf_n, si_n = fused_bounce_step(
                pack, misc, key2, cam16, sf_c, si_c, cfg=cfg, lanes=lanes,
                k_pix=k_pix, width=W, height=H, block_r=block_r,
                g_inner=G_INNER)
            return sf_n, si_n, r
        return jax.lax.fori_loop(0, ITERS, body,
                                 (sf, si, jnp.zeros((), jnp.float32)))

    out = loop_steps(sf, si)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop_steps(sf, si)
    jax.block_until_ready(out)
    us = (time.perf_counter() - t0) / (ITERS * G_INNER) * 1e6
    # lanes/iter normalized: ns per lane-iteration
    print(f"lanes={lanes:7d} block_r={block_r:6d} g={G_INNER}: "
          f"{us:9.1f} us/iter ({us * 1e3 / lanes:7.3f} ns/lane-iter)",
          flush=True)


import json

CONFIGS = os.environ.get(
    "MB_CONFIGS",
    "65536:2048 65536:4096 65536:8192 65536:16384 "
    "131072:8192 131072:16384 262144:16384 262144:32768")
# block_r 65536 at 65536 lanes OOMs scoped VMEM (42.68M vs the 16M
# limit) - keep blocks <= 32768
for tok in CONFIGS.split():
    lanes, block_r = (int(v) for v in tok.split(":"))
    timed(lanes, block_r)
