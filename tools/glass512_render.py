"""glass512 at its FULL BASELINE config: 512^2 @ 1024 spp, fused engine.

BASELINE.json configs[3]. Writes docs/glass512_render.png + .json with
wall time (the committed-artifact analog of the reference's Img/Render
evidence for its refraction scene).

    python tools/glass512_render.py
"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pathtrace_tpu.models import procedural
from pathtrace_tpu.ops.pallas.bounce_kernel import (build_fused_pack,
                                                    render_wavefront_fused)
from pathtrace_tpu.integrator.config import IntegratorConfig
from pathtrace_tpu.io.image import write_png
from pathtrace_tpu.utils import rng

t0 = time.time()
scene = procedural.glass_scene().with_mt().to_device()
cam = procedural.default_camera(512, 512)
cfg = IntegratorConfig()
key = rng.make_key(0)
pack = build_fused_pack(scene)
img, _ = render_wavefront_fused(scene, cam, 4, key, cfg, 65536,
                                chunk_spp=4, pack=pack)
jax.block_until_ready(img)
print(f"[{time.time()-t0:.1f}s] compiled", flush=True)
t1 = time.time()
img, nrays = render_wavefront_fused(scene, cam, 1024, key, cfg, 65536,
                                    chunk_spp=256, pack=pack)
jax.block_until_ready(img)
dt = time.time() - t1
paths = 512 * 512 * 1024
os.makedirs("docs", exist_ok=True)
write_png("docs/glass512_render.png", np.asarray(img))
out = {
    "scene": "glass (specular + dielectric spheres, IOR-grad scene)",
    "resolution": [512, 512], "spp": 1024,
    "engine": "fused Pallas bounce kernel",
    "wall_seconds": round(dt, 1),
    "paths": paths,
    "paths_per_sec": round(paths / dt, 1),
    "rays_traced": float(nrays),
    "device": str(jax.devices()[0]),
    "baseline_config": "BASELINE.json configs[3] (512^2 @ 1024 spp)",
}
with open("docs/glass512_render.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out), flush=True)
