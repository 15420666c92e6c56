"""Profile the wavefront renderer on the TPU and save a jax.profiler trace.

Run from the repo root (ONE TPU process at a time; see
.claude/skills/verify/SKILL.md for platform rules):

    python tools/tpu_profile.py

Then aggregate device op costs:

    python tools/parse_trace.py
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pathtrace_tpu.models import procedural
from pathtrace_tpu.integrator.wavefront import render_wavefront_chunked
from pathtrace_tpu.integrator.config import IntegratorConfig
from pathtrace_tpu.utils import rng

t0 = time.time()
scene = procedural.cornell_box_scene(include_spheres=True).with_mt().to_device()
cam = procedural.default_camera(256, 256)
key = rng.make_key(0)
cfg = IntegratorConfig()
print(f"[{time.time()-t0:6.1f}s] scene on device", flush=True)
img, _ = render_wavefront_chunked(scene, cam, 4, key, cfg, 65536, chunk_spp=4)
jax.block_until_ready(img)
print(f"[{time.time()-t0:6.1f}s] compiled", flush=True)
t1 = time.time()
img, _ = render_wavefront_chunked(scene, cam, 64, key, cfg, 65536, chunk_spp=64)
jax.block_until_ready(img)
dt = time.time() - t1
print(f"[{time.time()-t0:6.1f}s] 256x256@64spp in {dt:.2f}s = "
      f"{256*256*64/dt:,.0f} paths/s", flush=True)
jax.profiler.start_trace("/tmp/jaxtrace")
img, _ = render_wavefront_chunked(scene, cam, 64, key, cfg, 65536, chunk_spp=64)
jax.block_until_ready(img)
jax.profiler.stop_trace()
print(f"[{time.time()-t0:6.1f}s] trace saved to /tmp/jaxtrace", flush=True)
