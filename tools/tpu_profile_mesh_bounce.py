"""Trace-profile one full mesh bounce (v2 raycast + NEE + BSDF) on TPU.

    python tools/tpu_profile_mesh_bounce.py && python tools/parse_trace.py /tmp/jaxtrace_mb
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pathtrace_tpu.models import procedural
from pathtrace_tpu.accel.binned import raycast_binned_v2
from pathtrace_tpu.integrator.megakernel import make_bounce_fn
from pathtrace_tpu.integrator.config import IntegratorConfig
from pathtrace_tpu.utils import rng as prng

C = int(os.environ.get("MK_C", 256))
scene = procedural.blob_mesh_scene().with_binned(max_tris=C).to_device()
r = 65536
g = np.random.default_rng(0)
org = jnp.asarray(g.uniform(-20, 40, (r, 3)).astype(np.float32))
d = g.normal(size=(r, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
d = jnp.asarray(d)
cfg = IntegratorConfig()
key = prng.make_key(9)

def bounce_once(o, dd):
    bounce = make_bounce_fn(scene, lambda oo, ddd, tn, tx:
                            raycast_binned_v2(scene, oo, ddd, tn, tx),
                            cfg, key)
    z = jnp.zeros((r,), jnp.int32)
    out = bounce(o, dd, jnp.zeros((r, 3)), jnp.ones((r, 3)), z, z,
                 jnp.zeros((r,), bool), jnp.ones((r,), bool),
                 jnp.arange(r, dtype=jnp.int32), z)
    return out[2]

fn = jax.jit(bounce_once)
out = fn(org, d); jax.block_until_ready(out)
jax.profiler.start_trace("/tmp/jaxtrace_mb")
for _ in range(5):
    out = fn(org, d)
jax.block_until_ready(out)
jax.profiler.stop_trace()
print("trace done", flush=True)
