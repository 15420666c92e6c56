"""The bunny-class mesh render: blob82k at 512^2 @ 256 spp on one chip.

BASELINE.json configs[2] analog (the reference renders 70k-tri bunny
scenes as a matter of course; Img/Render/bunny.png). Writes
docs/mesh512_render.png + docs/mesh512_render.json with wall time.

    python tools/mesh512_render.py
"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pathtrace_tpu.models import procedural
from pathtrace_tpu.integrator.wavefront import render_wavefront_chunked
from pathtrace_tpu.integrator.config import IntegratorConfig
from pathtrace_tpu.io.image import write_png
from pathtrace_tpu.utils import rng

t0 = time.time()
scene = procedural.blob_mesh_scene().with_kd_binned(max_tris=1024).to_device()
cam = procedural.default_camera(512, 512)
cfg = IntegratorConfig()
key = rng.make_key(0)
print(f"[{time.time()-t0:.1f}s] scene ready", flush=True)
img, _ = render_wavefront_chunked(scene, cam, 4, key, cfg, 49152, chunk_spp=4)
jax.block_until_ready(img)
print(f"[{time.time()-t0:.1f}s] compiled", flush=True)
t1 = time.time()
img, nrays = render_wavefront_chunked(scene, cam, 256, key, cfg, 49152,
                                      chunk_spp=32)
jax.block_until_ready(img)
dt = time.time() - t1
paths = 512 * 512 * 256
os.makedirs("docs", exist_ok=True)
write_png("docs/mesh512_render.png", np.asarray(img))
out = {
    "scene": "blob82k (assets/blob82k.obj, 81934 tris) + room",
    "resolution": [512, 512], "spp": 256,
    "engine": "wavefront + KD-cell Pallas pair-block traversal (C=1024)",
    "wall_seconds": round(dt, 1),
    "paths": paths,
    "paths_per_sec": round(paths / dt, 1),
    "rays_traced": float(nrays),
    "device": str(jax.devices()[0]),
    "reference_analog": "bunny-class render, Img/Render/bunny.png",
}
with open("docs/mesh512_render.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out), flush=True)
