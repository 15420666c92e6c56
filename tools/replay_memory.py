"""Measure backward-pass memory: scan-AD vs compact-record replay.

Backs the O(R)-residual claim of diff/replay.py with compiler numbers:
XLA's memory analysis of the compiled gradient programs. The scan-AD
megakernel stores per-bounce activations across max_iters scan steps;
the replay stores only the compact discrete record (~10 B/lane/bounce)
plus O(R) bounce residuals.

    python tools/replay_memory.py [W [H [SPP]]]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

if os.environ.get("REPLAY_MEM_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from pathtrace_tpu.diff import material_grads, material_grads_replay
from pathtrace_tpu.integrator.config import IntegratorConfig
from pathtrace_tpu.models import procedural
from pathtrace_tpu.utils import rng


def temp_bytes(fn, *args, **kwargs):
    lowered = jax.jit(fn, **kwargs).lower(*args)
    mem = lowered.compile().memory_analysis()
    return int(mem.temp_size_in_bytes), int(mem.output_size_in_bytes)


def main():
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    scene = procedural.cornell_box_scene(include_spheres=True).with_mt()
    camera = procedural.default_camera(w, h)
    cfg = IntegratorConfig()
    key = rng.make_key(0)

    t_scan, _ = temp_bytes(
        lambda s, k: material_grads(s, camera, spp, k, cfg=cfg), scene, key)
    t_replay, _ = temp_bytes(
        lambda s, k: material_grads_replay(s, camera, spp, k, cfg),
        scene, key)
    r = w * h
    print(f"{w}x{h} @ {spp}spp ({r} lanes, max_iters={cfg.max_iters}):")
    print(f"  scan-AD grad temp:  {t_scan / 1e6:10.2f} MB")
    print(f"  replay grad temp:   {t_replay / 1e6:10.2f} MB "
          f"({t_scan / max(t_replay, 1):.1f}x smaller)")


if __name__ == "__main__":
    main()
