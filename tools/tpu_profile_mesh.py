"""Trace-profile the v2 mesh raycast + HitRecord tail on TPU.

    python tools/tpu_profile_mesh.py && python tools/parse_trace.py /tmp/jaxtrace_mesh
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pathtrace_tpu.models import procedural
from pathtrace_tpu.accel import binned

C = int(os.environ.get("MK_C", 256))
scene = procedural.blob_mesh_scene().with_kd_binned(max_tris=C).to_device()
r = 65536
g = np.random.default_rng(0)
org = jnp.asarray(g.uniform(-20, 40, (r, 3)).astype(np.float32))
d = g.normal(size=(r, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
d = jnp.asarray(d)

fn = jax.jit(lambda o, dd: binned.raycast_binned_v2(scene, o, dd, k_max=16).t)
out = fn(org, d); jax.block_until_ready(out)
jax.profiler.start_trace("/tmp/jaxtrace_mesh")
for _ in range(5):
    out = fn(org, d)
jax.block_until_ready(out)
jax.profiler.stop_trace()
print("trace done", flush=True)
