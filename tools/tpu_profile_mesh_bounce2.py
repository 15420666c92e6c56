"""Trace-profile one full PRODUCTION mesh bounce (KD v2 raycast + NEE +
BSDF) on TPU, at the preset config (with_kd_binned, max_tris=512).

    python tools/tpu_profile_mesh_bounce2.py && python tools/parse_trace.py /tmp/jaxtrace_mb2
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pathtrace_tpu.models import procedural
from pathtrace_tpu.accel.binned import raycast_binned_v3
from pathtrace_tpu.integrator.megakernel import make_bounce_fn
from pathtrace_tpu.integrator.config import IntegratorConfig
from pathtrace_tpu.utils import rng as prng

C = int(os.environ.get("MK_C", 1024))
scene = procedural.blob_mesh_scene().with_kd_binned(max_tris=C).to_device()
r = int(os.environ.get("MK_R", 65536))
g = np.random.default_rng(0)
# surface-ish rays: aim from random points at the blob (bounce regime)
org = jnp.asarray(g.uniform(-20, 40, (r, 3)).astype(np.float32))
d = g.normal(size=(r, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
d = jnp.asarray(d)
cfg = IntegratorConfig()
key = prng.make_key(9)

def bounce_once(o, dd):
    bounce = make_bounce_fn(scene, lambda oo, ddd, tn, tx:
                            raycast_binned_v3(scene, oo, ddd, tn, tx),
                            cfg, key)
    z = jnp.zeros((r,), jnp.int32)
    out = bounce(o, dd, jnp.zeros((r, 3)), jnp.ones((r, 3)), z, z,
                 jnp.zeros((r,), bool), jnp.ones((r,), bool),
                 jnp.arange(r, dtype=jnp.int32), z)
    return out[2]

fn = jax.jit(bounce_once)
out = fn(org, d); jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(5):
    out = fn(org, d)
jax.block_until_ready(out)
print(f"bounce: {(time.perf_counter()-t0)/5*1e3:.2f} ms/call", flush=True)
jax.profiler.start_trace("/tmp/jaxtrace_mb2")
for _ in range(5):
    out = fn(org, d)
jax.block_until_ready(out)
jax.profiler.stop_trace()
print("trace done", flush=True)
