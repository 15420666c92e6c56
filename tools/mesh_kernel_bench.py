"""v1 (XLA group loop) vs v2 (Pallas pair kernel) mesh raycast on TPU.

MEASUREMENT RULE (discovered the hard way, see tools/mesh_dispatch_bench
history): on the axon remote-TPU tunnel, a single device-to-host
transfer permanently downgrades the process's dispatch stream from
pipelined (~tens of us visible per op) to synchronous (~2-25 ms latency
per dispatch). ALL timings here run before the first np.asarray; host
verification happens only at the end.

    python tools/mesh_kernel_bench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pathtrace_tpu.models import procedural
from pathtrace_tpu.accel import binned
from pathtrace_tpu.utils import rng as prng

C = int(os.environ.get("MK_C", 256))
K1 = int(os.environ.get("MK_K1", 48))
K2 = int(os.environ.get("MK_K2", 20))
ITERS = 20

KIND = os.environ.get("MK_KIND", "kd")
if KIND == "kd":
    scene = procedural.blob_mesh_scene().with_kd_binned(max_tris=C).to_device()
else:
    scene = procedural.blob_mesh_scene().with_binned(max_tris=C).to_device()
print(f"C={C} M={scene.clusters.num_clusters} tris={scene.num_tris}",
      flush=True)

results = []


def timed(name, fn, *args):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = jfn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:>44}: {ms:9.3f} ms", flush=True)
    results.append((name, ms, out))
    return out


def interior_rays(n, seed):
    g = np.random.default_rng(seed)
    org = jnp.asarray(g.uniform(-20, 40, (n, 3)).astype(np.float32))
    d = g.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return org, jnp.asarray(d)


outs = {}
for r in (16384, 65536):
    org, d = interior_rays(r, 0)
    tmin = jnp.zeros((r,), jnp.float32)
    tmax = jnp.full((r,), 999999.0, jnp.float32)

    if KIND == "kd":
        o1 = None
    else:
        o1 = timed(f"v1 closest R={r}",
                   lambda o, dd, tn, tx: binned.raycast_binned_closest(
                       scene.clusters, o, dd, tn, tx, k_max=K1),
                   org, d, tmin, tmax)
    o2 = timed(f"v2 pallas closest R={r}",
               lambda o, dd, tn, tx: binned.raycast_binned_pallas(
                   scene, o, dd, tn, tx, k_max=K2),
               org, d, tmin, tmax)
    o3 = timed(f"v2 pallas shadow R={r}",
               lambda o, dd, tn, tx: binned.raycast_binned_pallas(
                   scene, o, dd, tn, tx, k_max=K2, mode="shadow"),
               org, d, tmin, tmax)
    o4 = timed(f"v2 full HitRecord R={r}",
               lambda o, dd: binned.raycast_binned_v2(scene, o, dd,
                                                      k_max=K2).t,
               org, d)
    outs[r] = (o1, o2)

# full bounce step comparison at 65536 lanes
from pathtrace_tpu.integrator.megakernel import make_bounce_fn
from pathtrace_tpu.integrator.config import IntegratorConfig
from functools import partial

cfg = IntegratorConfig()
key = prng.make_key(9)
r = 65536
org, d = interior_rays(r, 1)


def bounce_once(o, dd):
    from pathtrace_tpu.accel.binned import raycast_binned_v2
    bounce = make_bounce_fn(scene, lambda oo, ddd, tn, tx:
                            raycast_binned_v2(scene, oo, ddd, tn, tx),
                            cfg, key)
    z = jnp.zeros((r,), jnp.int32)
    out = bounce(o, dd, jnp.zeros((r, 3)), jnp.ones((r, 3)), z, z,
                 jnp.zeros((r,), bool), jnp.ones((r,), bool),
                 jnp.arange(r, dtype=jnp.int32), z)
    return out[2]


timed("v2 FULL BOUNCE (raycast+NEE+bsdf) R=65536", bounce_once, org, d)


def bounce_once_v1(o, dd):  # pragma: bvh-only
    from pathtrace_tpu.accel.binned import raycast_binned
    bounce = make_bounce_fn(scene, lambda oo, ddd, tn, tx:
                            raycast_binned(scene, oo, ddd, tn, tx,
                                           k_max=K1),
                            cfg, key,
                            shadow_fn=None)
    z = jnp.zeros((r,), jnp.int32)
    out = bounce(o, dd, jnp.zeros((r, 3)), jnp.ones((r, 3)), z, z,
                 jnp.zeros((r,), bool), jnp.ones((r,), bool),
                 jnp.arange(r, dtype=jnp.int32), z)
    return out[2]


if KIND != "kd":
    # NOTE: v1 bounce still picks up the v2 shadow path via default_shadow_
    # raycast (scene has pair_pack) - measures raycast difference only.
    timed("v1-raycast bounce R=65536", bounce_once_v1, org, d)

# ---- host-side verification (D2H allowed from here) ----
from pathtrace_tpu.ops.mt_matmul import mt_closest_auto
rv = 4096
org, d = interior_rays(rv, 0)
tmin = jnp.zeros((rv,), jnp.float32)
tmax = jnp.full((rv,), 999999.0, jnp.float32)
a = jax.jit(lambda o, dd: mt_closest_auto(scene.mt, o, dd, tmin, tmax))(org, d)
b2 = jax.jit(lambda o, dd: binned.raycast_binned_pallas(
    scene, o, dd, 0.0, 999999.0, k_max=K2))(org, d)
h1, t1 = np.asarray(a[0]), np.asarray(a[1])
h2, t2, i2, u2, v2, ov2 = [np.asarray(x) for x in b2]
agree = (h1 == h2).mean()
both = h1 & h2
tclose = np.isclose(t1[both], t2[both], rtol=1e-3, atol=1e-3).mean()
print(f"R={rv}: hit-vs-exact agree {agree:.4f}  t close {tclose:.4f} "
      f"overflow v2 {ov2.mean():.4f}", flush=True)
