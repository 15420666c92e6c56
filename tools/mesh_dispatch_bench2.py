"""Round-2 dispatch primitives: reduce-chain variants + blob82k stats.

Follow-up to mesh_dispatch_bench.py: the reduce (per-ray winner from
cluster-grouped pair results) dominates the v2 raycast budget. Times the
candidate chains end-to-end and prints real cluster-hit statistics for
blob82k at C=128/256/512 (to pick k_max and the cluster cap).

    python tools/mesh_dispatch_bench2.py
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

R = 65536
CAP = 262144   # ~R*4 pair slots
ITERS = 30

rng_ = np.random.default_rng(0)
ray_of = jnp.asarray(rng_.integers(0, R, size=(CAP,)).astype(np.int32))
t_pair = jnp.asarray(np.abs(rng_.normal(size=(CAP,))).astype(np.float32))
gid_pair = jnp.asarray(rng_.integers(0, 82000, size=(CAP,)).astype(np.int32))


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
    return out


# A: current chain - scatter-min t, gather-back, scatter-min winner pos,
# gather payloads at winner pos
def chain_a(ray_of, t_pair, gid_pair):
    best = jnp.full((R,), jnp.inf, jnp.float32).at[ray_of].min(t_pair)
    pos = jnp.arange(CAP, dtype=jnp.int32)
    isw = t_pair == best[ray_of]
    wp = jnp.full((R,), CAP, jnp.int32).at[ray_of].min(
        jnp.where(isw, pos, CAP))
    wp = jnp.minimum(wp, CAP - 1)
    return best, gid_pair[wp]


# B: int-packed single scatter-min: key = t_bits (monotone for t>0)
# truncated to 22 bits << 10 | gid_lo ... split gid across TWO keyed
# scatter-mins sharing the same truncated-t prefix (consistent unless two
# pairs tie within 2^-13 relative t AND disagree - accept-band scale).
def chain_b(ray_of, t_pair, gid_pair):
    tb = jax.lax.bitcast_convert_type(t_pair, jnp.int32)
    t22 = (tb >> 10) << 10
    k_hi = t22 | (gid_pair >> 9)          # gid hi 8 bits (17-bit ids)
    k_lo = t22 | (gid_pair & 0x1FF) | 0   # gid lo 9 bits... needs 10
    hi = jnp.full((R,), 0x7FFFFFFF, jnp.int32).at[ray_of].min(k_hi)
    lo = jnp.full((R,), 0x7FFFFFFF, jnp.int32).at[ray_of].min(k_lo)
    gid = ((hi & 0x3FF) << 9) | (lo & 0x1FF)
    best = jax.lax.bitcast_convert_type(hi & ~0x3FF, jnp.float32)
    return best, gid


# C: sort2 by ray + doubling-shift run-min + unique scatter at run ends
def chain_c(ray_of, t_pair, gid_pair):
    tb = jax.lax.bitcast_convert_type(t_pair, jnp.uint32)
    # carry (t, gid) as the sort VALUE via two KV sorts? one KV sort of
    # packed payload: payload = slot index; gather t/gid after (scalar
    # gathers...). Instead: two sort_key_vals sharing the key.
    sk, st = jax.lax.sort_key_val(ray_of, t_pair)
    K = 16
    tmin = st
    shift = 1
    while shift < K:
        rolled_t = jnp.concatenate([jnp.full((shift,), jnp.inf), tmin[:-shift]])
        rolled_r = jnp.concatenate([jnp.full((shift,), -1, sk.dtype),
                                    sk[:-shift]])
        tmin = jnp.where(rolled_r == sk, jnp.minimum(tmin, rolled_t), tmin)
        shift *= 2
    run_end = jnp.concatenate([sk[1:] != sk[:-1],
                               jnp.ones((1,), bool)])
    best = jnp.full((R,), jnp.inf, jnp.float32).at[
        jnp.where(run_end, sk, R)].set(
        jnp.where(run_end, tmin, jnp.inf), mode="drop")
    return best


# D: pure scatter-min t only (lower bound for any scatter-based chain)
def chain_d(ray_of, t_pair):
    return jnp.full((R,), jnp.inf, jnp.float32).at[ray_of].min(t_pair)


# E: gather-back variants
def gather_scalar(best, ray_of):
    return best[ray_of]


def gather_as_rows(best8, ray_of):
    return best8[ray_of]     # (R, 8) source


# F: unique .set scatter (for slot_ray construction cost)
uniq_slots = jnp.asarray(rng_.permutation(CAP)[:CAP].astype(np.int32))
vals_i = jnp.asarray(rng_.integers(0, R, size=(CAP,)).astype(np.int32))


def scatter_set_unique(slots, vals):
    return jnp.full((CAP,), -1, jnp.int32).at[slots].set(
        vals, unique_indices=True)


a = timed("A: 2x scatter-min + gatherback + wp", chain_a, ray_of, t_pair,
          gid_pair)
b = timed("B: packed 2x int scatter-min", chain_b, ray_of, t_pair, gid_pair)
timed("C: sortKV + doubling run-min", chain_c, ray_of, t_pair, gid_pair)
timed("D: single scatter-min (floor)", chain_d, ray_of, t_pair)
best = a[0]
timed("E1: gather-back scalar (cap)", gather_scalar, best, ray_of)
best8 = jnp.tile(best[:, None], (1, 8))
timed("E2: gather-back (cap,8) rows", gather_as_rows, best8, ray_of)
timed("F: unique .set scatter (cap)", scatter_set_unique, uniq_slots, vals_i)

# correctness spot-check A vs B
ba, ga = [np.asarray(x) for x in a]
bb, gb = [np.asarray(x) for x in b]
ok = np.isclose(ba, bb, rtol=2e-3).mean()
gsame = (ga == gb)[np.isfinite(ba)].mean()
print(f"A-vs-B best_t close: {ok:.4f}  gid same: {gsame:.4f}", flush=True)

# ---- blob82k cluster statistics at C in {128, 256, 512} ----
from pathtrace_tpu.models import procedural
from pathtrace_tpu.accel import binned
from pathtrace_tpu.accel.traverse import safe_inv_dir
from pathtrace_tpu.utils import rng as prng

base = procedural.blob_mesh_scene()
for cap_tris in (128, 256, 512):
    sc = base.with_binned(max_tris=cap_tris)
    cl = sc.clusters
    # interior bounce-ray regime: origins inside the room volume
    g = np.random.default_rng(1)
    n = 8192
    org = jnp.asarray(g.uniform(-20, 40, (n, 3)).astype(np.float32))
    d = g.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    tmin = jnp.zeros((n,), jnp.float32)
    tmax = jnp.full((n,), 999999.0, jnp.float32)
    hm, _ = jax.jit(binned._slab_all)(org, safe_inv_dir(d),
                                      jnp.asarray(cl.bmin),
                                      jnp.asarray(cl.bmax), tmin, tmax)
    h = np.asarray(jnp.sum(hm, axis=1))
    print(f"C={cap_tris}: M={cl.num_clusters} hits/ray mean={h.mean():.2f} "
          f"p99={np.percentile(h, 99):.0f} max={h.max()}", flush=True)
