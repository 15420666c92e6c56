"""Trace-profile the FULL production mesh render (wavefront + v3) on TPU.

    python tools/tpu_profile_mesh_render.py && python tools/parse_trace.py /tmp/jaxtrace_mr
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pathtrace_tpu.models import procedural
from pathtrace_tpu.integrator.wavefront import render_wavefront_stats
from pathtrace_tpu.integrator.config import IntegratorConfig
from pathtrace_tpu.utils import rng

C = int(os.environ.get("MK_C", 1024))
SPP = int(os.environ.get("MK_SPP", 8))
scene = procedural.blob_mesh_scene().with_kd_binned(max_tris=C).to_device()
camera = procedural.default_camera(256, 256)
key = rng.make_key(0)
cfg = IntegratorConfig()

img, nrays = render_wavefront_stats(scene, camera, SPP, key, cfg, 65536)
img.block_until_ready()
t0 = time.perf_counter()
img, nrays = render_wavefront_stats(scene, camera, SPP, key, cfg, 65536)
img.block_until_ready()
dt = time.perf_counter() - t0
paths = 256 * 256 * SPP
print(f"{paths/dt/1e3:.1f}k paths/s ({dt*1e3:.0f} ms for {SPP} spp)", flush=True)
jax.profiler.start_trace("/tmp/jaxtrace_mr")
img, nrays = render_wavefront_stats(scene, camera, SPP, key, cfg, 65536)
img.block_until_ready()
jax.profiler.stop_trace()
print("trace done", flush=True)
