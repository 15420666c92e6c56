"""Stage-level timing of the binned traversal on the blob82k scene.

The mesh bench sits ~200x below the Cornell per-iteration cost; this
times each stage of raycast_binned_closest in isolation on real TPU to
find the dominant one (suspects: the (R*K)-element argsort, lax.top_k
over 899 clusters, the scatter-min reduction).

    python tools/binned_profile.py    # one TPU process at a time
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
from pathtrace_tpu.accel.traverse import safe_inv_dir
from pathtrace_tpu.utils import rng

R = int(os.environ.get("BP_RAYS", 16384))
K = int(os.environ.get("BP_K", 24))
ITERS = 20

scene = procedural.blob_mesh_scene().with_binned()
scene = scene.to_device()
cl = scene.clusters
m = cl.num_clusters
print(f"clusters={m} cap={cl.cluster_cap} rays={R} k={K}", flush=True)

key = rng.make_key(0)
cam = procedural.default_camera(128, 128)
px, py = cam.pixel_grid()
ju = rng.pixel_jitter(key, jnp.arange(px.shape[0], dtype=jnp.int32))
dirs = cam.ray_directions(px, py, ju[:, 0], ju[:, 1])[:R]
org = jnp.broadcast_to(cam.pos, dirs.shape)
tmin = jnp.zeros((R,), jnp.float32)
tmax = jnp.full((R,), 999999.0, jnp.float32)


def timed(name, fn, *args):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = jfn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:>28}: {ms:9.2f} ms", flush=True)
    return out


def stage_slab(org, dirs, tmin, tmax):
    inv_d = safe_inv_dir(dirs)
    return binned._slab_all(org, inv_d, cl.bmin, cl.bmax, tmin, tmax)


hit_m, tnear = timed("slab (R,M)", stage_slab, org, dirs, tmin, tmax)


def stage_topk(hit_m, tnear):
    tm = jnp.where(hit_m, tnear, jnp.inf)
    return jax.lax.top_k(-tm, K)


neg_top, top_idx = timed("top_k", stage_topk, hit_m, tnear)


def stage_sort(neg_top, top_idx):
    pair_valid = jnp.isfinite(-neg_top)
    pair_cluster = jnp.where(pair_valid, top_idx, m).reshape(-1)
    order = jnp.argsort(pair_cluster.astype(jnp.int32), stable=True)
    return order, pair_cluster


order, pc = timed("argsort pairs", stage_sort, neg_top, top_idx)


def stage_scatter(order):
    t = order.astype(jnp.float32)
    ray = jnp.remainder(order, R)
    return jnp.full((R,), jnp.inf, jnp.float32).at[ray].min(t)


timed("scatter-min (cap,)", stage_scatter, order)


def whole(org, dirs, tmin, tmax):
    return binned.raycast_binned_closest(cl, org, dirs, tmin, tmax, k_max=K)


out = timed("raycast_binned_closest", whole, org, dirs, tmin, tmax)
print("overflow rate:", float(np.asarray(out[5]).mean()), flush=True)


def full_raycast(org, dirs, tmin, tmax):
    h = binned.raycast_binned(scene, org, dirs, tmin, tmax, k_max=K)
    return h.t


timed("raycast_binned (full+grad path)", full_raycast, org, dirs, tmin, tmax)


# --- group-loop isolation: where do the remaining ~29 ms live?
def stage_groups(org, dirs, tmin, tmax):
    """Re-run the pair setup, then ONLY the group fori loop."""
    from pathtrace_tpu.ops.mt_matmul import ray_features
    inv_d = safe_inv_dir(dirs)
    hit_m, tnear = binned._slab_all(org, inv_d, cl.bmin, cl.bmax, tmin, tmax)
    tnear_masked = jnp.where(hit_m, tnear, jnp.inf)
    neg_top, top_idx = jax.lax.top_k(-tnear_masked, K)
    pair_valid = jnp.isfinite(-neg_top)
    pair_ray = jnp.repeat(jnp.arange(R, dtype=jnp.int32), K)
    pair_cluster = jnp.where(pair_valid, top_idx, m).reshape(-1).astype(
        jnp.int32)
    order = jnp.argsort(pair_cluster, stable=True)
    pair_ray = pair_ray[order]
    pair_cluster = pair_cluster[order]
    p = pair_ray.shape[0]
    b = cl.cluster_cap
    counts = jnp.zeros((m + 1,), jnp.int32).at[pair_cluster].add(1)
    padded = ((counts + b - 1) // b) * b
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(padded)[:-1]])
    within = (jnp.arange(p, dtype=jnp.int32)
              - jnp.cumsum(counts)[pair_cluster] + counts[pair_cluster])
    slot = offsets[pair_cluster] + within
    cap = p + (m + 1) * (b - 1) + b
    cap = ((cap + b - 1) // b) * b
    slot_ray = jnp.full((cap,), -1, jnp.int32).at[slot].set(pair_ray)
    nb = cap // b
    block_ids = jnp.arange(nb, dtype=jnp.int32)
    cum_pad_blocks = jnp.cumsum(padded // b)
    block_cluster = jnp.searchsorted(cum_pad_blocks, block_ids,
                                     side="right").astype(jnp.int32)
    block_cluster = jnp.minimum(block_cluster, m)
    nb_real = cum_pad_blocks[m - 1]
    return slot_ray, block_cluster, nb_real


slot_ray, block_cluster, nb_real = timed("pair setup (all pre-loop)",
                                         stage_groups, org, dirs, tmin,
                                         tmax)
print("nb_real:", int(nb_real), " nb:", slot_ray.shape[0] // cl.cluster_cap,
      flush=True)
