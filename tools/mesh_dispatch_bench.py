"""Head-to-head timing of mesh-dispatch primitive candidates on TPU.

tools/binned_profile.py showed the binned raycast is ~95% dispatch glue
(top_k 6.4 ms, scatter-min 4.6 ms, sort + scans ~13 ms at R=16k) and
~5% MXU work. This bench times every candidate replacement primitive at
production sizes so the v2 dispatch can be assembled from measured
winners rather than guesses:

  - per-ray hit-cluster extraction: lax.top_k vs K-pass argmin peel vs
    rank-matmul + K-pass select
  - pair ordering: u32 jnp.sort vs lax.sort_key_val (carry the payload)
  - per-ray reduce: scatter-min vs segment-min over ray-sorted pairs
  - per-pair row gathers (features (cap,16), scalars (cap,))

    python tools/mesh_dispatch_bench.py    # one TPU process at a time
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

R = int(os.environ.get("MB_RAYS", 65536))
M = int(os.environ.get("MB_CLUSTERS", 512))     # ~C=256 cluster count
K = int(os.environ.get("MB_K", 16))
ITERS = 30

rng_ = np.random.default_rng(0)
# synthetic hit mask with realistic density (mean ~5 hits/ray)
logits = rng_.normal(size=(R, M)).astype(np.float32)
hit_np = logits > 1.6
print("mean hits/ray:", hit_np.sum(1).mean(), flush=True)
hit_m = jnp.asarray(hit_np)
tnear = jnp.asarray(np.abs(rng_.normal(size=(R, M))).astype(np.float32))
feats = jnp.asarray(rng_.normal(size=(R, 16)).astype(np.float32))
idx_cap = jnp.asarray(rng_.integers(0, R, size=(R * 8,)).astype(np.int32))
vals_cap = jnp.asarray(rng_.normal(size=(R * 8,)).astype(np.float32))


def timed(name, fn, *args):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = jfn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:>40}: {ms:9.3f} ms", flush=True)
    return out


# ---- extraction candidates ------------------------------------------------

def ex_topk(hit_m, tnear):
    tm = jnp.where(hit_m, tnear, jnp.inf)
    neg, idx = jax.lax.top_k(-tm, K)
    return idx, jnp.isfinite(neg)


def ex_kpass(hit_m):
    """K passes: peel the lowest set column index each pass."""
    m = hit_m.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, hit_m.shape, 1)
    live = hit_m
    idxs = []
    for _ in range(K):
        c = jnp.min(jnp.where(live, cols, m), axis=1)
        idxs.append(c)
        live = live & (cols != c[:, None])
    idx = jnp.stack(idxs, axis=1)
    return idx, idx < m


def ex_rank_matmul(hit_m):
    """rank[r,m] = inclusive count along the row via block-triangular
    matmul (exact: block-local counts <= 128 are bf16-exact), then K
    one-hot select passes idx[r,k] = sum_m m*[rank==k+1 & hit]."""
    m = hit_m.shape[1]
    b = 128
    nb = (m + b - 1) // b
    pad = nb * b - m
    h = jnp.pad(hit_m, ((0, 0), (0, pad))).astype(jnp.bfloat16)
    hb = h.reshape(R, nb, b)
    tri = jnp.asarray(np.tril(np.ones((b, b), np.float32)).T,
                      jnp.bfloat16)  # upper-tri ones: inclusive rank
    local = jnp.einsum("rnb,bc->rnc", hb, tri,
                       preferred_element_type=jnp.float32)
    base = jnp.cumsum(local[:, :, -1], axis=1) - local[:, :, -1]
    rank = (local + base[:, :, None]).reshape(R, nb * b)[:, :m]
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, m), 1)
    ranki = rank.astype(jnp.int32)
    idxs = []
    for k in range(K):
        sel = hit_m & (ranki == (k + 1))
        idxs.append(jnp.max(jnp.where(sel, cols, -1), axis=1))
    idx = jnp.stack(idxs, axis=1)
    return idx, idx >= 0


i1 = timed("extract top_k", ex_topk, hit_m, tnear)
i2 = timed("extract K-pass peel", ex_kpass, hit_m)
i3 = timed("extract rank-matmul", ex_rank_matmul, hit_m)
a = np.sort(np.where(np.asarray(i2[1]), np.asarray(i2[0]), 1 << 20), axis=1)
b = np.sort(np.where(np.asarray(i3[1]), np.asarray(i3[0]), 1 << 20), axis=1)
print("kpass == rankmm:", bool((a == b).all()), flush=True)

# ---- sort candidates ------------------------------------------------------

keys = jnp.asarray(
    rng_.integers(0, 1 << 31, size=(R * K,)).astype(np.uint32))
payload = jnp.asarray(np.arange(R * K, dtype=np.int32))

timed("sort u32 (R*K)", lambda k: jnp.sort(k), keys)
timed("sort_key_val u32+i32 (R*K)",
      lambda k, v: jax.lax.sort_key_val(k, v), keys, payload)
half = keys[:R * K // 2]
timed("sort u32 (R*K/2)", lambda k: jnp.sort(k), half)

# ---- reduce candidates ----------------------------------------------------

def red_scatter_min(idx, vals):
    return jnp.full((R,), jnp.inf, jnp.float32).at[idx].min(vals)


def red_sorted_segment(idx, vals):
    """Assume pairs re-sorted by ray: segment-min via sorted-run trick
    (here: sort to simulate, then searchsorted run starts + cummin)."""
    order_keys = (idx.astype(jnp.uint32) << 8) | 0
    sk, sv = jax.lax.sort_key_val(order_keys, vals)
    ray = (sk >> 8).astype(jnp.int32)
    # per-ray min via reverse cummin trick needs segment boundaries; use
    # searchsorted starts + gather of cummin at run ends
    starts = jnp.searchsorted(ray, jnp.arange(R + 1, dtype=jnp.int32))
    cm = jax.lax.associative_scan(jnp.minimum, sv)
    # min of ray r = cm[starts[r+1]-1] if run non-empty, but cm is global
    # cummin (not per-segment) - this is a lower bound, just for timing
    ends = jnp.maximum(starts[1:] - 1, 0)
    return cm[ends]


timed("reduce scatter-min (8R -> R)", red_scatter_min, idx_cap, vals_cap)
timed("reduce sortKV+scan (8R)", red_sorted_segment, idx_cap, vals_cap)


def red_gather_dense(slot_of, vals):
    """(R, K) gather from (8R,) + dense min along K."""
    return jnp.min(vals[slot_of], axis=1)


slot_of = jnp.asarray(rng_.integers(0, R * 8, size=(R, K)).astype(np.int32))
timed("reduce (R,K)-gather + min", red_gather_dense, slot_of, vals_cap)

# ---- gather candidates ----------------------------------------------------

timed("gather rows (8R,16) from (R,16)",
      lambda f, i: f[i], feats, idx_cap)
timed("gather scalars (8R,) from (R,)",
      lambda f, i: f[i], vals_cap[:R], idx_cap)
onehot_cap = None

# one-hot row gather for comparison at block granularity: (128,R)@(R,16)
blk_idx = idx_cap[:128]


def g_onehot(f, i):
    oh = (i[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (128, R), 1)).astype(jnp.bfloat16)
    return jnp.dot(oh, f.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


timed("gather 128 rows via one-hot matmul", g_onehot, feats, blk_idx)

# ---- slab scale reference -------------------------------------------------

bmin = jnp.asarray(rng_.normal(size=(M, 3)).astype(np.float32))
bmax = bmin + 1.0
org = jnp.asarray(rng_.normal(size=(R, 3)).astype(np.float32))
dirn = jnp.asarray(rng_.normal(size=(R, 3)).astype(np.float32))


def slab(org, dirn):
    from pathtrace_tpu.accel.traverse import safe_inv_dir
    inv = safe_inv_dir(dirn)
    t0 = (bmin[None] - org[:, None]) * inv[:, None]
    t1 = (bmax[None] - org[:, None]) * inv[:, None]
    tlo = jnp.minimum(t0, t1)
    thi = jnp.maximum(t0, t1)
    tn = jnp.max(tlo, axis=-1)
    tf = jnp.min(thi, axis=-1) * 1.00000024
    return (tn <= tf) & (tf > 0)


timed(f"slab ({R},{M})", slab, org, dirn)
