"""Profile the FUSED Pallas bounce engine on the TPU.

Run from the repo root (ONE TPU process at a time; see
.claude/skills/verify/SKILL.md):

    python tools/tpu_profile_fused.py [block_r ...]

Times each block_r end-to-end, then traces the last one.
Aggregate with: python tools/parse_trace.py /tmp/jaxtrace_fused
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pathtrace_tpu.models import procedural
from pathtrace_tpu.ops.pallas.bounce_kernel import (build_fused_pack,
                                                    render_wavefront_fused)
from pathtrace_tpu.integrator.config import IntegratorConfig
from pathtrace_tpu.utils import rng

block_rs = [int(a) for a in sys.argv[1:]] or [2048]
lanes = int(os.environ.get("PROF_LANES", 65536))

t0 = time.time()
scene = procedural.cornell_box_scene(include_spheres=True).with_mt().to_device()
cam = procedural.default_camera(256, 256)
key = rng.make_key(0)
cfg = IntegratorConfig()
pack = build_fused_pack(scene)
print(f"[{time.time()-t0:6.1f}s] scene on device, t_pad={pack.t_pad}",
      flush=True)

for br in block_rs:
    img, _ = render_wavefront_fused(scene, cam, 4, key, cfg, lanes,
                                    chunk_spp=4, block_r=br, pack=pack)
    jax.block_until_ready(img)
    print(f"[{time.time()-t0:6.1f}s] block_r={br} compiled", flush=True)
    t1 = time.time()
    img, _ = render_wavefront_fused(scene, cam, 64, key, cfg, lanes,
                                    chunk_spp=64, block_r=br, pack=pack)
    jax.block_until_ready(img)
    dt = time.time() - t1
    print(f"[{time.time()-t0:6.1f}s] block_r={br} lanes={lanes}: "
          f"256x256@64spp in {dt:.2f}s = {256*256*64/dt:,.0f} paths/s",
          flush=True)

jax.profiler.start_trace("/tmp/jaxtrace_fused")
img, _ = render_wavefront_fused(scene, cam, 64, key, cfg, lanes,
                                chunk_spp=64, block_r=block_rs[-1], pack=pack)
jax.block_until_ready(img)
jax.profiler.stop_trace()
print(f"[{time.time()-t0:6.1f}s] trace saved to /tmp/jaxtrace_fused",
      flush=True)
