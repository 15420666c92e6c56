"""Render the reference's default job: 1080x2400 @ 8x1024 spp.

The reference's only published perf evidence is this configuration
(main.cpp:15-16 screen size; CudaUtil.cuh:18-19 NUM_MULTI_SAMPLE=8 x
NUM_SAMPLE=1024; 8-pass progressive temp.png loop pathtracer.cu:236-246;
DiffuseRoom_MS8x2048spp_13min.png implies ~54M camera paths/s on a
GTX-10xx). This tool renders the same-scale job on one TPU chip with the
fused engine, exercising the reference's progressive-pass behavior plus
our checkpoint/resume (the reference cannot resume; SURVEY.md §5):

- 8 passes x 1024 spp, progressive PNG after every pass
- a REAL mid-run resume: the in-memory accumulator is dropped after pass
  3 and reloaded from the checkpoint file before continuing
- final PNG + timing written to docs/

Lane count: Pallas needs the block's lane dim divisible by 128, i.e.
block_r % 1024 == 0, while the fused film needs lanes | num_pix or
num_pix | lanes. 1080*2400 = 2,592,000 = 2^8 * 3^4 * 5^3 carries only
2^8, so no divisor of num_pix is 1024-aligned; instead lanes =
4 * num_pix = 10,368,000 (2^10-aligned, k_pix=1, each lane owns one
pixel across generations) with block_r = 5120 (block_l 640, grid 2025).
State is ~79 MB HBM; a 32-spp chunk is ~8 lane generations per launch.

    python tools/reference_frame.py          # ~10 min on one v5e chip
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pathtrace_tpu.io import checkpoint as ckpt
from pathtrace_tpu.io import image as imageio
from pathtrace_tpu.integrator.config import IntegratorConfig
from pathtrace_tpu.models import procedural
from pathtrace_tpu.ops.pallas.bounce_kernel import (build_fused_pack,
                                                    render_wavefront_fused)
from pathtrace_tpu.utils import rng

W = int(os.environ.get("RF_W", 1080))
H = int(os.environ.get("RF_H", 2400))
PASSES = int(os.environ.get("RF_PASSES", 8))
SPP_PER_PASS = int(os.environ.get("RF_SPP", 1024))
LANES = int(os.environ.get("RF_LANES", 4 * 1080 * 2400))
BLOCK_R = int(os.environ.get("RF_BLOCK", 5120))
CHUNK = int(os.environ.get("RF_CHUNK", 32))
OUT_DIR = os.environ.get("RF_OUT", "docs")
CK = os.path.join(OUT_DIR, "reference_frame.ckpt.npz")

os.makedirs(OUT_DIR, exist_ok=True)
scene = procedural.cornell_box_scene(include_spheres=True).with_mt()
scene = scene.to_device()
pack = build_fused_pack(scene)
camera = procedural.default_camera(W, H)
cfg = IntegratorConfig()
key = rng.make_key(0)

t0 = time.time()
accum = np.zeros((H, W, 3), np.float32)
rays_total = 0.0
start_pass = 0
pass_times = []

p = start_pass
while p < PASSES:
    tp = time.perf_counter()
    pass_key = rng.iter_key(key, 1000 + p)
    img, nrays = render_wavefront_fused(
        scene, camera, SPP_PER_PASS, pass_key, cfg, lanes=LANES,
        chunk_spp=CHUNK, block_r=BLOCK_R, pack=pack)
    accum += np.asarray(img)
    rays_total += float(nrays)
    dt = time.perf_counter() - tp
    pass_times.append(round(dt, 2))
    print(f"[pass {p}] {SPP_PER_PASS}spp in {dt:.1f}s", flush=True)
    imageio.write_png(os.path.join(OUT_DIR, "reference_frame_progress.png"),
                      accum / (p + 1))
    ckpt.save_state(CK, accum, p + 1, 0, SPP_PER_PASS)
    p += 1
    if p == 4 and os.environ.get("RF_NO_RESUME") is None:
        # exercise a REAL resume: drop the in-memory accumulator and
        # reload the pass-3 state from disk (reference equivalent: none -
        # its unified-memory buffer dies with the process)
        accum = None
        state = ckpt.load_state(CK)
        accum = np.asarray(state["accum_image"])
        assert state["passes_done"] == 4
        print("[resume] reloaded accumulator from checkpoint at pass 4",
              flush=True)

wall = time.time() - t0
final = accum / PASSES
imageio.write_png(os.path.join(
    OUT_DIR, f"reference_frame_{W}x{H}_{PASSES}x{SPP_PER_PASS}spp.png"),
    final)
paths = W * H * PASSES * SPP_PER_PASS
summary = {
    "resolution": [W, H], "passes": PASSES, "spp_per_pass": SPP_PER_PASS,
    "total_spp": PASSES * SPP_PER_PASS,
    "wall_seconds": round(wall, 1),
    "pass_seconds": pass_times,
    "camera_paths": paths,
    "paths_per_sec": round(paths / wall, 1),
    "rays_per_sec": round(rays_total / wall, 1),
    "reference": "DiffuseRoom_MS8x2048spp_13min.png on GTX-10xx "
                 "(README.md:60-62) ~= 54M paths/s; this run uses the "
                 "reference's default 8x1024spp job (CudaUtil.cuh:18-19)",
    "device": "TPU v5e single chip",
}
with open(os.path.join(OUT_DIR, "reference_frame.json"), "w") as f:
    json.dump(summary, f, indent=2)
print(json.dumps(summary))
