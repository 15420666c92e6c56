"""Two-level binned traversal: the TPU-native BVH walk for large scenes.

The reference walks its BVH with a per-thread stack (CudaUtil.cuh:93-148).
Per-lane stack walks are hostile to a vector machine (every step is a
divergent gather), so for large scenes we restructure traversal into
dense batched work:

1. Build: cut the SAH BVH into "clusters" - subtrees holding <= C
   triangles (pre-order flattening already makes each subtree's
   primitives contiguous). Per cluster: AABB + a (16, C) block of
   MT-matmul coefficients (ops/mt_matmul.py).
2. Query, stage 1 (cull): test every ray against every cluster AABB -
   one dense (R, M) slab test, no gathers.
3. Query, stage 2 (dispatch): take each ray's K nearest hit clusters,
   form (ray, cluster) pairs, counting-sort them by cluster, pad each
   cluster's run to the pair-block size B, and process pair-blocks with
   batched (B,16)x(16,C) MXU matmuls - each block reads ONE cluster's
   coefficient tile. This is exactly the counting-sort compaction /
   "expert dispatch" structure the north star prescribes.
4. Reduce: scatter-min the per-pair closest hits back to rays.

Work drops from O(R*T) (brute) to O(R*M + P*C) with P ~ R * avg clusters
per ray. All shapes static; the only approximation is the per-ray cap of
K clusters (k_max): rays intersecting more than K cluster AABBs fall back
to brute force against the full scene for correctness (mask-mixed in, no
recompilation; the cap violation rate is ~0 for reasonable K and is
asserted in tests).

Three generations live here:

- v1 (raycast_binned / raycast_binned_closest): XLA-only, BVH-subtree
  clusters, sorted-key dispatch + einsum group loop. Kept as a tested
  reference backend, and the routed backend for with_binned() scenes
  (BVH-subtree clusters overlap too much for the pair dispatch).
- v2 (raycast_binned_v2 / shadow_binned_v2): the round-4 Pallas
  pair-block kernel path - sort-free (R, K) peel dispatch + dense
  gather-back reduce + k_max overflow repair. Kept as the tested
  stepping stone; see build_pair_dispatch's docstring.
- v3 (raycast_binned_v3 / shadow_binned_v3, the PRODUCTION mesh path):
  peel-free, scatter-free dispatch (arithmetic slot inversion over
  per-panel popcount prefixes), no k_max at all, ONE packed scatter-min
  reduce, and a one-gather shading tail. 229.5k -> 1.02M paths/s on
  blob82k across rounds 4 -> 5; see build_pair_dispatch_v3.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pathtrace_tpu.accel.bvh import BVHArrays
from pathtrace_tpu.utils.pytree import pytree_dataclass
from pathtrace_tpu.utils.math3 import EPS


@pytree_dataclass(static=("num_clusters", "cluster_cap"))
class ClusterArrays:
    """Flat cluster table + per-cluster MT coefficient tiles."""

    bmin: jnp.ndarray        # (M, 3)
    bmax: jnp.ndarray        # (M, 3)
    prim_start: jnp.ndarray  # (M,) into the (reordered) triangle arrays
    prim_count: jnp.ndarray  # (M,)
    coeffs: jnp.ndarray      # (M, 16, C, 4): det, t_num, u_num, v_num
    num_clusters: int
    cluster_cap: int         # C
    # KD cells only (accel/kdgrid.py): member slot -> ORIGINAL tri id.
    # None for BVH-subtree clusters (member order = reordered tris).
    dup_map: jnp.ndarray = None


def _subtree_prim_ranges(bvh: BVHArrays):
    """Per-node contiguous prim range [start, end) via reverse pre-order."""
    n = bvh.num_nodes
    next_miss = np.asarray(bvh.next_miss)
    prim_start = np.asarray(bvh.prim_start)
    prim_count = np.asarray(bvh.prim_count)
    start = np.empty(n, np.int64)
    end = np.empty(n, np.int64)
    for i in range(n - 1, -1, -1):
        if prim_start[i] >= 0:
            start[i] = prim_start[i]
            end[i] = prim_start[i] + prim_count[i]
        else:
            left = i + 1
            right = next_miss[left]
            start[i] = start[left]
            end[i] = end[right]
            assert end[left] == start[right], "subtree prims not contiguous"
    return start, end


def build_clusters(bvh: BVHArrays, positions_reordered: np.ndarray,
                   max_tris: int = 128) -> ClusterArrays:
    """Cut the BVH into <=max_tris subtrees and build coefficient tiles.

    positions_reordered: (T, 3, 3) in the BVH's leaf-contiguous order.
    """
    from pathtrace_tpu.ops.mt_matmul import build_mt_coeffs

    start, end = _subtree_prim_ranges(bvh)
    bmin = np.asarray(bvh.bmin)
    bmax = np.asarray(bvh.bmax)
    next_miss = np.asarray(bvh.next_miss)
    prim_start = np.asarray(bvh.prim_start)

    clusters = []
    stack = [0]
    while stack:
        i = stack.pop()
        cnt = end[i] - start[i]
        if cnt <= max_tris or prim_start[i] >= 0:
            clusters.append(i)
        else:
            left = i + 1
            right = next_miss[left]
            stack.append(right)
            stack.append(left)

    m = len(clusters)
    c = max_tris
    cl_bmin = bmin[clusters]
    cl_bmax = bmax[clusters]
    cl_start = start[np.asarray(clusters)]
    cl_count = (end - start)[np.asarray(clusters)]

    # coefficient tiles: fit once over all tris, slice per cluster, pad.
    # padding slots keep zero det coeffs -> det = 0 < EPS -> culled.
    full = build_mt_coeffs(positions_reordered, pad_to=1)
    stacked = np.stack([np.asarray(full.det), np.asarray(full.t_num),
                        np.asarray(full.u_num), np.asarray(full.v_num)],
                       axis=-1)  # (16, T, 4)
    tiles = np.zeros((m, 16, c, 4), np.float32)
    for k in range(m):
        s, cnt = int(cl_start[k]), int(cl_count[k])
        tiles[k, :, :cnt, :] = stacked[:, s:s + cnt, :]

    return ClusterArrays(
        bmin=cl_bmin, bmax=cl_bmax,
        prim_start=cl_start.astype(np.int32),
        prim_count=cl_count.astype(np.int32),
        coeffs=tiles,
        num_clusters=m, cluster_cap=c,
    )


def _slab_all(org, inv_d, bmin, bmax, t_min, t_max):
    """(R, M) slab test + entry t (reference-robust, accel/traverse.py)."""
    t0 = (bmin[None, :, :] - org[:, None, :]) * inv_d[:, None, :]
    t1 = (bmax[None, :, :] - org[:, None, :]) * inv_d[:, None, :]
    tlo = jnp.minimum(t0, t1)
    thi = jnp.maximum(t0, t1)
    tnear = jnp.maximum(jnp.max(tlo, axis=-1), t_min[:, None])
    tfar = jnp.minimum(jnp.min(thi, axis=-1), t_max[:, None]) * 1.00000024
    return tnear <= tfar, tnear


def raycast_binned_closest(clusters: ClusterArrays, org, dirn, t_min, t_max,
                           k_max: int = 48):
    """Closest-hit (tri_hit, t, global_tri_idx, u, v, overflow).

    overflow: (R,) bool - ray hit more than k_max cluster AABBs (its
    result may be wrong; caller patches those rays via fallback).
    """
    from pathtrace_tpu.accel.traverse import safe_inv_dir
    from pathtrace_tpu.ops.mt_matmul import ray_features
    from pathtrace_tpu.utils import math3

    r = org.shape[0]
    m = clusters.num_clusters
    c = clusters.cluster_cap
    k_max = min(k_max, m)

    inv_d = safe_inv_dir(dirn)
    hit_m, tnear = _slab_all(org, inv_d, clusters.bmin, clusters.bmax,
                             t_min, t_max)
    num_hit = jnp.sum(hit_m, axis=1)
    overflow = num_hit > k_max

    # K nearest hit clusters per ray
    tnear_masked = jnp.where(hit_m, tnear, jnp.inf)
    neg_top, top_idx = jax.lax.top_k(-tnear_masked, k_max)   # (R, K)
    pair_valid = jnp.isfinite(-neg_top)

    # Pairs sorted by cluster id, SCATTER-FREE (profiling on blob82k
    # showed the original scatter-built dispatch - counts .at[].add over
    # R*K pairs, per-pair cumsum gathers, argsort + permutation gathers -
    # cost 25.7 ms of a 43 ms raycast at 16k rays; TPU serializes
    # small-element scatters/gathers while dense sorts/scans are fast):
    # 1. pack (cluster, ray) into ONE uint32 key and jnp.sort it - no
    #    argsort, no permutation gathers (invalid pairs get id m, last);
    # 2. run boundaries via searchsorted with m+1 queries (not R*K);
    # 3. pad-to-block offsets propagated along runs with a cummax scan;
    # 4. one sorted-unique-index store scatter builds the padded slots.
    assert m < (1 << 10) and r <= (1 << 22), (m, r)
    pair_ray0 = jax.lax.broadcasted_iota(jnp.uint32, (r, k_max), 0)
    keys = ((jnp.where(pair_valid, top_idx, m).astype(jnp.uint32) << 22)
            | pair_ray0).reshape(-1)
    keys = jnp.sort(keys)
    pair_cluster = (keys >> 22).astype(jnp.int32)
    pair_ray = (keys & jnp.uint32((1 << 22) - 1)).astype(jnp.int32)
    p = pair_ray.shape[0]

    b = c  # pair-block size = cluster capacity (keeps matmuls square-ish)
    starts = jnp.searchsorted(pair_cluster,
                              jnp.arange(m + 2, dtype=jnp.int32))
    counts = jnp.diff(starts)                        # (m+1,)
    padded = ((counts + b - 1) // b) * b
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(padded)[:-1]])
    # cumulative padding inserted BEFORE each cluster's run; broadcast
    # down each run by a running max (it is non-decreasing), seeded at
    # the run starts by an (m+1)-element scatter
    cum_pad_before = offsets - starts[:m + 1]
    pad_seed = jnp.zeros((p + 1,), jnp.int32).at[starts[:m + 1]].max(
        jnp.maximum(cum_pad_before, 0))[:p]
    slot = (jnp.arange(p, dtype=jnp.int32)
            + jax.lax.cummax(pad_seed))

    cap = p + (m + 1) * (b - 1) + b
    cap = ((cap + b - 1) // b) * b
    slot_ray = jnp.full((cap,), -1, jnp.int32).at[slot].set(
        pair_ray, unique_indices=True, indices_are_sorted=True)
    nb = cap // b
    # block -> cluster: blocks of cluster m' span
    # [offsets[m']//b, offsets[m']//b + padded[m']//b)
    block_ids = jnp.arange(nb, dtype=jnp.int32)
    cum_pad_blocks = jnp.cumsum(padded // b)
    block_cluster = jnp.searchsorted(cum_pad_blocks, block_ids,
                                     side="right").astype(jnp.int32)
    block_cluster = jnp.minimum(block_cluster, m)  # trailing padding

    # gather features + coefficient tiles per block, batched matmuls
    # scanned over groups of blocks: the full (NB, B, C, 4) product is
    # ~1.3 GB at 65k rays (the runtime spike that crashed the TPU worker
    # on the 82k-tri scene); groups bound it to ~150 MB.
    f = ray_features(org, dirn)                      # (R, 16)
    group = 512
    ng = (nb + group - 1) // group
    pad_blocks = ng * group - nb
    slot_ray_b = slot_ray.reshape(nb, b)
    if pad_blocks:
        slot_ray_b = jnp.pad(slot_ray_b, ((0, pad_blocks), (0, 0)),
                             constant_values=-1)
        block_cluster = jnp.pad(block_cluster, (0, pad_blocks),
                                constant_values=m)
    coeffs_all = jnp.asarray(clusters.coeffs)
    prim_start_all = jnp.asarray(clusters.prim_start)

    def group_body(_, x):
        sl_ray, bc = x                               # (G, B), (G,)
        safe_ray = jnp.maximum(sl_ray, 0)
        f_pairs = f[safe_ray]                        # (G, B, 16)
        safe_cluster = jnp.minimum(bc, m - 1)
        tiles = coeffs_all[safe_cluster]             # (G, 16, C, 4)
        # HIGHEST: default TPU matmul truncates f32 inputs to bf16, which
        # breaks the accept tests' t-ordering (same class of bug as the
        # bounce kernel's bf16 hi/lo split rationale, bounce_kernel.py)
        prods = jnp.einsum("nbf,nfcq->nbcq", f_pairs, tiles,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        det = prods[..., 0]
        t_num = prods[..., 1]
        u_num = prods[..., 2]
        v_num = prods[..., 3]

        inv_det = jnp.where(jnp.abs(det) > math3.TINY, 1.0 / det, 0.0)
        t = t_num * inv_det
        tmin_p = t_min[safe_ray][..., None]
        tmax_p = t_max[safe_ray][..., None]
        live = (sl_ray >= 0)[..., None] & (bc < m)[:, None, None]
        valid = live & (det >= EPS)
        valid &= (t >= tmin_p) & (t <= tmax_p)
        valid &= (u_num >= 0.0) & (u_num <= det)
        valid &= (v_num >= 0.0) & (u_num + v_num <= det)

        t_masked = jnp.where(valid, t, jnp.inf)
        g_best_t = jnp.min(t_masked, axis=2)                   # (G, B)
        lane = jax.lax.broadcasted_iota(jnp.int32, t_masked.shape, 2)
        lane_masked = jnp.where(t_masked <= g_best_t[..., None], lane, c)
        lane_masked = jnp.where(valid, lane_masked, c)
        g_arg = jnp.min(lane_masked, axis=2)                   # (G, B)
        pick = lane == g_arg[..., None]
        g_u = jnp.sum(jnp.where(pick, u_num * inv_det, 0.0), axis=2)
        g_v = jnp.sum(jnp.where(pick, v_num * inv_det, 0.0), axis=2)
        g_tri = (prim_start_all[safe_cluster][:, None]
                 + jnp.minimum(g_arg, c - 1))
        return None, (g_best_t, g_u, g_v, g_tri)

    # only blocks belonging to REAL clusters (< m) need processing: the
    # invalid-pair run (cluster id m: top_k slots beyond a ray's actual
    # AABB hits) sorts last, so the loop bound is dynamic - the MXU work
    # tracks the number of VALID pairs (~R * avg clusters per ray), not
    # the static R * k_max pair capacity.
    nb_real = cum_pad_blocks[m - 1]
    ng_real = (nb_real + group - 1) // group
    outs0 = (jnp.full((ng * group, b), jnp.inf, jnp.float32),
             jnp.zeros((ng * group, b), jnp.float32),
             jnp.zeros((ng * group, b), jnp.float32),
             jnp.zeros((ng * group, b), jnp.int32))

    def group_loop(g, outs):
        s = g * group
        sl_ray = jax.lax.dynamic_slice_in_dim(slot_ray_b, s, group)
        bc = jax.lax.dynamic_slice_in_dim(block_cluster, s, group)
        _, (g_t, g_u, g_v, g_tri) = group_body(None, (sl_ray, bc))
        return tuple(
            jax.lax.dynamic_update_slice_in_dim(o, val, s, 0)
            for o, val in zip(outs, (g_t, g_u, g_v, g_tri)))

    pair_best_t, pair_u, pair_v, pair_tri = jax.lax.fori_loop(
        0, ng_real, group_loop, outs0)
    pair_best_t = pair_best_t[:nb]
    pair_u = pair_u[:nb]
    pair_v = pair_v[:nb]
    pair_tri = pair_tri[:nb]
    slot_ray = slot_ray_b[:nb].reshape(-1)

    # scatter-min back to rays
    flat_ray = jnp.maximum(slot_ray, 0)
    flat_t = pair_best_t.reshape(-1)
    flat_t = jnp.where(slot_ray >= 0, flat_t, jnp.inf)
    best_t = jnp.full((r,), jnp.inf, jnp.float32).at[flat_ray].min(flat_t)

    # winner = lowest flat index among pairs matching the ray's best t
    flat_pos = jnp.arange(cap, dtype=jnp.int32)
    is_winner = (flat_t == best_t[flat_ray]) & jnp.isfinite(flat_t)
    winner_pos = jnp.full((r,), cap, jnp.int32).at[flat_ray].min(
        jnp.where(is_winner, flat_pos, cap))
    hit = jnp.isfinite(best_t)
    wp = jnp.minimum(winner_pos, cap - 1)
    u = pair_u.reshape(-1)[wp]
    v = pair_v.reshape(-1)[wp]
    tri = pair_tri.reshape(-1)[wp]
    return (hit, jnp.where(hit, best_t, 0.0), tri.astype(jnp.int32), u, v,
            overflow)


# ---------------------------------------------------------------------------
# v2: Pallas pair-block dispatch (round 4)
# ---------------------------------------------------------------------------

def build_pair_dispatch(clusters: ClusterArrays, hit_m, tnear, k_max: int,
                        block_pairs: int, cap_budget: int = None):
    """Hit mask -> cluster-grouped pair dispatch for the Pallas kernel.

    Returns a dict:
      slot_ray    (cap,) i32   ray id per pair slot, -1 = dead slot
      slot_of     (R, K) i32   inverse map: pair (r, k)'s slot, cap = dead
      pair_valid  (R, K) bool  pair exists and was not capacity-dropped
      block_cluster (nb,) i32  cluster per block, clamped to [0, M)
      block_prim_start (nb,) i32  cluster's prim base, -1 = padding block
      overflow    (R,) bool    ray needs the repair pass (k_max exceeded
                               or pair slots beyond cap_budget dropped)

    SORT-FREE, LOOKUP-FREE construction. Per-op tracing
    (tools/tpu_profile_mesh.py) showed every p-sized routed op - the
    packed-key sort, small-table gathers like offsets[pair_cluster], and
    clustered-index scatters - costs 2-9 ms at p = R*K on this TPU, and
    the dispatch glue dwarfed the actual search kernel (0.8 ms). This
    construction touches only DENSE (R, M) math plus ONE well-mixed
    scatter:

      1. colrank[r, m] = # of hit rays r' <= r in column m, by
         block-lower-triangular bf16 matmul (block-local counts <= 128
         are bf16-exact) + an f32 inter-block carry;
      2. every pair's slot is then ARITHMETIC: slot[r, m] = offsets[m] +
         colrank[r, m] - 1, offsets from the padded per-cluster counts
         (dense (M,) cumsum, broadcast - no gather);
      3. a K-pass peel extracts each ray's hit clusters AND their slots
         in ONE masked min-reduce per pass via a packed key
         (col << 20 | slot, slot < 2^20 asserted);
      4. slot_ray is ONE scatter whose flattened (r, k) index order
         jumps between cluster runs - the well-mixed case (ascending
         scatters serialize ~100x on TPU; see the probe history).
    """
    r, m = hit_m.shape
    k_max = min(k_max, m)
    b = block_pairs
    if cap_budget is None:
        cap_budget = 6 * r + m * b
    cap = (cap_budget // b) * b
    assert cap < (1 << 20), cap  # slot must fit the packed peel key

    num_hit = jnp.sum(hit_m, axis=1)
    overflow = num_hit > k_max

    # --- colrank via block-triangular matmul
    rb = 128
    r_pad = -(-r // rb) * rb
    h = hit_m
    if r_pad != r:
        h = jnp.pad(hit_m, ((0, r_pad - r), (0, 0)))
    nbl = r_pad // rb
    hb = h.reshape(nbl, rb, m).astype(jnp.bfloat16)
    ltri = jnp.asarray(np.tril(np.ones((rb, rb), np.float32)),
                       jnp.bfloat16)
    local = jax.lax.dot_general(
        ltri, hb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (rb, nbl, m)
    local = local.transpose(1, 0, 2)                 # (nbl, rb, m)
    btot = local[:, -1, :]                           # (nbl, m)
    base = jnp.cumsum(btot, axis=0) - btot           # exclusive
    colrank = (local + base[:, None, :]).reshape(r_pad, m)[:r]
    colrank = colrank.astype(jnp.int32)              # inclusive rank

    counts = jnp.sum(hit_m, axis=0)                  # (m,)
    padded = ((counts + b - 1) // b) * b
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(padded)[:-1]])  # (m,)

    # --- packed peel: (cluster, slot) per pass in one reduce.
    # The peel key packs the cluster id into bits 20+ of an int32, so
    # the sentinel (m << 20) must stay inside int32 (ADVICE r4 #3).
    assert m < 2048, f"v2 packed peel limited to <2048 clusters, got {m}"
    slot_dense = offsets[None, :] + colrank - 1      # (R, M)
    cols = jax.lax.broadcasted_iota(jnp.int32, hit_m.shape, 1)
    pack = (cols << 20) | jnp.minimum(slot_dense, (1 << 20) - 1)
    sentinel = (m << 20)
    live = hit_m
    top_c, top_s = [], []
    for _ in range(k_max):
        got = jnp.min(jnp.where(live, pack, sentinel), axis=1)
        c = got >> 20
        top_c.append(c)
        top_s.append(got & ((1 << 20) - 1))
        live = live & (cols != c[:, None])
    top_idx = jnp.stack(top_c, axis=1)               # (R, K)
    slot_of = jnp.stack(top_s, axis=1)               # (R, K)
    pair_valid = top_idx < m
    dropped = pair_valid & (slot_of >= cap)
    overflow = overflow | jnp.any(dropped, axis=1)
    pair_valid = pair_valid & ~dropped
    slot_of = jnp.where(pair_valid, slot_of, cap)

    # --- slot_ray: one well-mixed scatter
    ray_ids = jax.lax.broadcasted_iota(jnp.int32, (r, k_max), 0)
    slot_ray = jnp.full((cap,), -1, jnp.int32).at[
        slot_of.reshape(-1)].set(ray_ids.reshape(-1), mode="drop",
                                 unique_indices=True)

    nb = cap // b
    block_ids = jnp.arange(nb, dtype=jnp.int32)
    cum_pad_blocks = jnp.cumsum(padded // b)         # (m,)
    block_cluster = jnp.searchsorted(cum_pad_blocks, block_ids,
                                     side="right").astype(jnp.int32)
    is_pad_block = block_cluster >= m
    block_cluster = jnp.minimum(block_cluster, m - 1)
    ps = jnp.asarray(clusters.prim_start)
    block_prim_start = jnp.where(is_pad_block, -1, ps[block_cluster])
    return dict(slot_ray=slot_ray, slot_of=slot_of, pair_valid=pair_valid,
                block_cluster=block_cluster,
                block_prim_start=block_prim_start, overflow=overflow)


def raycast_binned_pallas(scene, org, dirn, t_min=0.0, t_max=None, *,
                          k_max: int = 16, mode: str = "closest",
                          exclude_gid=None, interpret=None,
                          cap_budget=None):
    """Closest-hit via the Pallas pair-block kernel (scene.pair_pack).

    Returns (hit, t, gid, u, v, overflow) per ray - detached primal.
    t_min/t_max may be python scalars (preferred: the meta rows become
    broadcast constants instead of per-pair gathers) or (R,) arrays.
    mode="shadow" skips the in-kernel exact recompute; `exclude_gid`
    (R,) i32 masks one tri per ray IN MEMBER-SLOT SPACE (prim_start +
    local, i.e. DUPLICATED space for KD scenes - an original id would
    silently match nothing; ADVICE r4 #4). No production caller passes
    it (NEE identity-tests the winner instead); kept for experiments.
    """
    from pathtrace_tpu.accel.traverse import safe_inv_dir
    from pathtrace_tpu.ops.intersect import BIG_T
    from pathtrace_tpu.ops.mt_matmul import ray_features
    from pathtrace_tpu.ops.pallas.pair_kernel import pair_blocks_search

    clusters = scene.clusters
    pack = scene.pair_pack
    assert pack is not None, "scene has no pair_pack; Scene.with_binned()"
    if interpret is None:
        # Mosaic compiles only for TPU; CPU (tests, goldens) runs the
        # kernel in interpret mode - same semantics, slow but exact
        interpret = jax.default_backend() != "tpu"
    if t_max is None:
        t_max = BIG_T
    r = org.shape[0]
    c_cap = pack.cluster_cap
    b = min(c_cap, 128)

    tmin_arr = (jnp.full((r,), float(t_min), jnp.float32)
                if jnp.ndim(t_min) == 0 else t_min)
    tmax_arr = (jnp.full((r,), float(t_max), jnp.float32)
                if jnp.ndim(t_max) == 0 else t_max)
    inv_d = safe_inv_dir(dirn)
    hit_m, tnear = _slab_all(org, inv_d, clusters.bmin, clusters.bmax,
                             tmin_arr, tmax_arr)
    disp = build_pair_dispatch(clusters, hit_m, tnear, k_max, b,
                               cap_budget=cap_budget)
    slot_ray = disp["slot_ray"]
    cap = slot_ray.shape[0]

    safe_ray = jnp.maximum(slot_ray, 0)
    feats = ray_features(org, dirn)                      # (R, 16)
    feats_t = feats[safe_ray].T                          # (16, cap)
    rows = [slot_ray.astype(jnp.float32)]
    for bound in (t_min, t_max):
        rows.append(jnp.full((cap,), float(bound), jnp.float32)
                    if jnp.ndim(bound) == 0 else bound[safe_ray])
    rows.append(jnp.full((cap,), -1.0, jnp.float32) if exclude_gid is None
                else exclude_gid.astype(jnp.float32)[safe_ray])
    meta = jnp.stack(rows + [jnp.zeros((cap,), jnp.float32)] * 4, axis=0)

    out = pair_blocks_search(pack, disp["block_cluster"],
                             disp["block_prim_start"],
                             feats_t, meta, c_cap=c_cap, block_pairs=b,
                             mode=mode, interpret=interpret)

    # dense (R, K) gather-back reduce: no scatter-min chains
    # gather-back only the 4 rows the reduce consumes (t, u+v packed is
    # not worth it, but halving the row width halves the dominant
    # (R, K, rows) gather's traffic: kernel rows 0 t, 1 u, 2 v, 3 hit,
    # 4 gid -> u/v are recomputed differentiably by the caller's
    # mt_gather tail, so fetch [t, hit, gid, pad])
    out_t = out[jnp.array([0, 3, 4, 5])].T               # (cap, 4) rows
    out_t = jnp.concatenate([out_t, jnp.zeros((1, 4), jnp.float32)], axis=0)
    slot_of = jnp.where(disp["pair_valid"], disp["slot_of"], cap)
    res = out_t[slot_of]                                 # (R, K, 4)
    pv = disp["pair_valid"] & (res[..., 1] > 0.5)
    t_rk = jnp.where(pv, res[..., 0], jnp.inf)
    best_k = jnp.argmin(t_rk, axis=1)                    # (R,)
    best_t = jnp.take_along_axis(t_rk, best_k[:, None], axis=1)[:, 0]
    hit = jnp.isfinite(best_t)

    gid = jnp.take_along_axis(res[..., 2], best_k[:, None],
                              axis=1)[:, 0].astype(jnp.int32)
    # (the kernel emits original tri ids - pack attr row 9 - so no dup
    # translation is needed here)
    # u/v placeholders: every consumer (raycast_binned_v2 / shadow) either
    # recomputes them differentiably at gid (mt_gather) or ignores them
    zeros = jnp.zeros_like(best_t)
    return (hit, jnp.where(hit, best_t, 0.0), gid, zeros, zeros,
            disp["overflow"])


# ---------------------------------------------------------------------------
# v3: arithmetic slot inversion + packed scatter-min reduce (round 5)
# ---------------------------------------------------------------------------
#
# v2's remaining wall was pure index traffic (TPU charges ~5 ns per
# randomly-indexed element, measured via trace): the (R, K) packed peel
# (~3.5 ms), the 1M-element slot_ray scatter (~4.8 ms), the (R, K, 4)
# gather-back reduce (~4.6 ms) and the k_max overflow repair (~3 ms) per
# raycast at 65k lanes. v3 removes ALL of them:
#
#   1. slot_ray is computed ARITHMETICALLY, not scattered: slot s in
#      cluster c's run at rank j names the (j+1)-th ray hitting c, i.e.
#      the (j+1)-th set bit of column c of the hit matrix. With the hit
#      matrix bit-packed per column into 512-row panels (16 u32 words)
#      and per-(panel, column) popcount prefix sums, the rank->ray map is
#      a panel search (dense compare-reduce), ONE (cap, 16) word-row
#      gather, and a 5-step in-word popcount binary search - all dense
#      vector math at slot granularity.
#   2. there is NO k_max: every (ray, cell) crossing gets a slot, so the
#      per-ray overflow class (and its repair pass) is gone. The only
#      residual overflow is the static global slot budget (cap_budget);
#      exceeded runs mark exactly the affected rays (those crossing a
#      truncated cluster) for the capacity-bounded repair.
#   3. the per-ray reduce is ONE scatter-min of a packed 32-bit key
#      [quantized t | dup-space tri id] over the slot axis - no slot_of
#      inverse map, no (R, K) gather-back, no argmin glue. t is
#      quantized to a rebased-exponent log code (monotone for
#      t in [2^-10, 2^22]); the winner's exact t/u/v are recomputed
#      differentiably by the caller's mt_gather tail, so quantization
#      only influences WHICH of two triangles within ~2^-mant relative t
#      wins - ambiguous geometry at that separation. The dup-tri budget
#      fixes the split: gid_bits = ceil(log2(D)), t gets 32 - gid_bits
#      (blob82k: 17 gid bits -> 5 exp + 10 mantissa, 1e-3 relative).
#
# Reference parity: same closest-hit contract as RayCast
# (CudaUtil.cuh:93-148); the arithmetic inversion has no reference
# analog (it exists to keep a vector machine free of index traffic).

_PANEL = 512           # rays per popcount panel (16 u32 words)
_T_EXP_BASE = 117      # biased exponent of 2^-10; t below collapses


def _key_bits(num_dup: int):
    """(gid_bits, exp_bits=5, mant_bits) split of the 32-bit reduce key."""
    gid_bits = max(1, int(np.ceil(np.log2(max(num_dup, 2)))))
    assert gid_bits <= 22, f"scene too large for packed reduce: {num_dup}"
    mant_bits = 32 - gid_bits - 5
    return gid_bits, mant_bits


def build_pair_dispatch_v3(clusters: ClusterArrays, hit_m, block_pairs: int,
                           cap_budget: int = None):
    """Hit mask -> cluster-grouped pair dispatch, scatter- and peel-free.

    Returns a dict:
      slot_ray    (cap,) i32   ray id per pair slot (clamped safe; dead
                               slots flagged by `live`, not by -1)
      live        (cap,) bool  slot holds a real (ray, cluster) pair
      block_cluster (nb,) i32  cluster per block, clamped to [0, M)
      block_prim_start (nb,) i32  cluster's prim base, -1 = padding block
      overflow    (R,) bool    ray crossed a cluster whose run was
                               truncated by cap_budget (repair needed)
    """
    r0, m = hit_m.shape
    b = block_pairs
    if cap_budget is None:
        # Measured on the blob82k production mix (camera / bounce / NEE
        # shadow batches at 65k lanes): real padded totals are 151-179k
        # slots (mean membership ~2.0-2.4, max 2.73R), so 3R+M*b gives a ~1.15x margin
        # while halving every cap-sized op vs the 6.7R worst-case budget
        # (the scatter-min reduce alone was 38% of the bounce at 6.7R).
        # Batches that overflow the budget mark exactly the affected rays
        # for the capacity-bounded repair - correct at any budget.
        cap_budget = (11 * r0) // 4 + m * b
    cap = (cap_budget // b) * b
    r = -(-r0 // _PANEL) * _PANEL
    if r != r0:
        hit_m = jnp.pad(hit_m, ((0, r - r0), (0, 0)))
    p_cnt = r // _PANEL
    wpp = _PANEL // 32                                # words per panel

    hf = hit_m.astype(jnp.float32)
    pc_panel = hf.reshape(p_cnt, _PANEL, m).sum(axis=1)          # (P, M)
    counts = pc_panel.sum(axis=0).astype(jnp.int32)              # (M,)
    base_panel = (jnp.cumsum(pc_panel, axis=0)
                  - pc_panel).astype(jnp.int32)                  # excl (P, M)

    padded = ((counts + b - 1) // b) * b
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(padded)[:-1]])

    # column bitmask words: (M * P, wpp) u32, row-gatherable by (c, p)
    bits = hit_m.T.reshape(m, p_cnt, wpp, 32)
    shifts = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
    words = jnp.sum(bits.astype(jnp.uint32) * shifts,
                    axis=-1).reshape(m * p_cnt, wpp)

    nb = cap // b
    block_ids = jnp.arange(nb, dtype=jnp.int32)
    cum_pad_blocks = jnp.cumsum(padded // b)
    block_cluster = jnp.searchsorted(cum_pad_blocks, block_ids,
                                     side="right").astype(jnp.int32)
    is_pad_block = block_cluster >= m
    block_cluster = jnp.minimum(block_cluster, m - 1)
    ps = jnp.asarray(clusters.prim_start)
    block_prim_start = jnp.where(is_pad_block, -1, ps[block_cluster])

    # per-slot rank within its cluster's run (all (nb,)-table gathers:
    # thousands of elements, negligible; per-slot math is dense)
    blk_off = offsets[block_cluster]                             # (nb,)
    blk_cnt = counts[block_cluster]
    lane = jnp.arange(b, dtype=jnp.int32)
    j = (block_ids[:, None] * b + lane[None, :]
         - blk_off[:, None])                                     # (nb, B)
    live = (j < blk_cnt[:, None]) & ~is_pad_block[:, None]
    j = jnp.clip(j, 0, r - 1)

    # panel holding the (j+1)-th set bit: largest p with base[p, c] <= j
    bp_rows = base_panel.T[block_cluster]                        # (nb, P)
    le = bp_rows[:, None, :] <= j[:, :, None]                    # (nb,B,P)
    p_of = jnp.sum(le, axis=-1).astype(jnp.int32) - 1
    base_sel = jnp.max(jnp.where(le, bp_rows[:, None, :], 0), axis=-1)
    jp = j - base_sel                                            # in-panel

    # the one real gather: this slot's 16 panel words
    row_idx = (block_cluster[:, None] * p_cnt + p_of).reshape(-1)
    wrows = words[row_idx]                                       # (cap,wpp)
    pcw = jax.lax.population_count(wrows).astype(jnp.int32)
    cum_incl = jnp.cumsum(pcw, axis=1)
    jp_f = jp.reshape(-1)
    w_sel = jnp.sum((cum_incl <= jp_f[:, None]).astype(jnp.int32),
                    axis=1)
    w_sel = jnp.minimum(w_sel, wpp - 1)
    iota_w = jnp.arange(wpp, dtype=jnp.int32)
    pick = iota_w[None, :] == w_sel[:, None]
    base_w = jnp.sum(jnp.where(pick, cum_incl - pcw, 0), axis=1)
    word_val = jnp.sum(jnp.where(pick, wrows, jnp.uint32(0)), axis=1,
                       dtype=jnp.uint32)
    jj = jp_f - base_w                                           # (cap,)

    # index of the (jj+1)-th set bit: popcount binary search, 5 rounds
    pos = jnp.zeros_like(jj)
    for width in (16, 8, 4, 2, 1):
        lmask = (jnp.uint32(1) << (pos + width).astype(jnp.uint32)) \
            - jnp.uint32(1)
        cnt = jax.lax.population_count(word_val & lmask).astype(jnp.int32)
        pos = pos + jnp.where(cnt <= jj, width, 0)

    ray = (p_of.reshape(-1) * _PANEL + w_sel * 32 + pos)
    slot_ray = jnp.clip(ray, 0, r0 - 1)

    bad_col = (offsets + padded) > cap                           # (M,)
    overflow = jnp.any(hit_m[:r0] & bad_col[None, :], axis=1)
    return dict(slot_ray=slot_ray, live=live.reshape(-1),
                block_cluster=block_cluster,
                block_prim_start=block_prim_start, overflow=overflow)


def raycast_binned_pallas_v3(scene, org, dirn, t_min=0.0, t_max=None, *,
                             mode: str = "closest", interpret=None,
                             cap_budget=None):
    """Closest-hit via the pair kernel + v3 dispatch + packed scatter-min.

    Returns (hit, t_approx, gid, overflow) per ray - detached primal.
    gid is in ORIGINAL triangle space (dup_map applied). t_approx carries
    the reduce key's quantization (~2^-mant relative); callers recompute
    exact t at gid (mt_gather). t_min/t_max: scalars or (R,) arrays,
    honored both in the cell cull and the in-kernel accept tests.
    """
    from pathtrace_tpu.accel.traverse import safe_inv_dir
    from pathtrace_tpu.ops.intersect import BIG_T
    from pathtrace_tpu.ops.mt_matmul import ray_features
    from pathtrace_tpu.ops.pallas.pair_kernel import pair_blocks_search

    clusters = scene.clusters
    pack = scene.pair_pack
    assert pack is not None, "scene has no pair_pack; Scene.with_kd_binned()"
    assert clusters.dup_map is not None, \
        "v3 requires KD cells (non-overlapping, dup_map)"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if t_max is None:
        t_max = BIG_T
    r = org.shape[0]
    c_cap = pack.cluster_cap
    b = min(c_cap, 128)  # 256-pair blocks measured SLOWER (21.5 vs
    # 19.4 ms/bounce): the wider tile+pair pipeline loses more to VMEM
    # double-buffering than it saves in grid steps
    # the kernel emits ORIGINAL tri ids (pack attr row 9), so duplicate
    # copies of one triangle carry identical keys and the dup gather is
    # free; the key budget is set by the original tri count
    gid_bits, mant_bits = _key_bits(scene.num_tris)

    tmin_arr = (jnp.full((r,), float(t_min), jnp.float32)
                if jnp.ndim(t_min) == 0 else t_min)
    tmax_arr = (jnp.full((r,), float(t_max), jnp.float32)
                if jnp.ndim(t_max) == 0 else t_max)
    inv_d = safe_inv_dir(dirn)
    hit_m, _ = _slab_all(org, inv_d, clusters.bmin, clusters.bmax,
                         tmin_arr, tmax_arr)
    disp = build_pair_dispatch_v3(clusters, hit_m, b,
                                  cap_budget=cap_budget)
    slot_ray = disp["slot_ray"]
    live = disp["live"]
    cap = slot_ray.shape[0]

    # ONE per-ray row table [feats(16) | tmin | tmax], ONE (cap, 18)
    # row gather (v2 built meta from separate (cap,)-wide 1-element
    # gathers - traced at ~3 ms each; 64B+ rows amortize the per-row
    # cost). Dead slots get ZERO rows: zero features make every product
    # zero, so the kernel's det >= EPS rejects them with no live mask.
    feats = ray_features(org, dirn)
    table = jnp.concatenate([feats, tmin_arr[:, None], tmax_arr[:, None]],
                            axis=1)
    g = jnp.where(live[:, None], table[slot_ray], 0.0)   # (cap, 18)
    feats_t = g[:, :16].T
    zero = jnp.zeros((cap,), jnp.float32)
    meta = jnp.stack([g[:, 16], g[:, 17], zero, zero,
                      zero, zero, zero, zero], axis=0)

    out = pair_blocks_search(pack, disp["block_cluster"],
                             disp["block_prim_start"],
                             feats_t, meta, c_cap=c_cap, block_pairs=b,
                             mode=mode, interpret=interpret, lean=True)

    # packed scatter-min: key = [5-bit rebased exp | mant | dup gid]
    t_row = out[0]
    hit_row = out[3] > 0.5
    gid_row = out[4].astype(jnp.int32)
    tb = jax.lax.bitcast_convert_type(jnp.maximum(t_row, 0.0), jnp.int32)
    e = jnp.clip((tb >> 23) - _T_EXP_BASE, 0, 31)
    mant = (tb >> (23 - mant_bits)) & ((1 << mant_bits) - 1)
    tq = ((e << mant_bits) | mant).astype(jnp.uint32)
    key = (tq << gid_bits) | gid_row.astype(jnp.uint32)
    dead_key = jnp.uint32(0xFFFFFFFF)
    key = jnp.where(hit_row & live, key, dead_key)
    # interleave the slot axis before scattering: slot order is ascending
    # within every cluster run (ranks follow ray id), and near-ascending
    # scatters serialize on TPU. The min is order-independent, so a dense
    # (nb, B) transpose relayout mixes consecutive updates across blocks.
    # Measured: neutral at the fat 6.7R budget (element-bound there) but
    # +3% end-to-end at the tight 2.75R budget (1.017M vs 0.987M).
    nb = cap // b
    key_x = key.reshape(nb, b).T.reshape(-1)
    ray_x = slot_ray.reshape(nb, b).T.reshape(-1)
    best = jnp.full((r,), dead_key).at[ray_x].min(key_x)
    hit = best != dead_key

    gid = (best & jnp.uint32((1 << gid_bits) - 1)).astype(jnp.int32)
    # approximate t back from the quantized code (exact recompute is the
    # caller's mt_gather; this only feeds the sphere-vs-tri compare)
    tq_back = (best >> gid_bits).astype(jnp.int32)
    e_b = (tq_back >> mant_bits) + _T_EXP_BASE
    m_b = (tq_back & ((1 << mant_bits) - 1)) << (23 - mant_bits)
    t_approx = jax.lax.bitcast_convert_type((e_b << 23) | m_b, jnp.float32)
    t_approx = jnp.where(hit, t_approx, 0.0)
    return hit, t_approx, gid, disp["overflow"]


def raycast_binned_v3(scene, org, dirn, t_min=None, t_max=None):
    """Drop-in raycast (HitRecord) through the v3 dispatch."""
    from pathtrace_tpu.ops.intersect import (BIG_T, finalize_hit,
                                             finalize_hit_packed, mt_gather)

    org_d = jax.lax.stop_gradient(org)
    dirn_d = jax.lax.stop_gradient(dirn)
    r = org.shape[0]
    if t_min is None:
        t_min = jnp.zeros((r,), jnp.float32)
    if t_max is None:
        t_max = jnp.full((r,), BIG_T, jnp.float32)
    tmin_d = jax.lax.stop_gradient(t_min)
    tmax_d = jax.lax.stop_gradient(t_max)
    hit, best_t, idx, overflow = raycast_binned_pallas_v3(
        scene, org_d, dirn_d, tmin_d, tmax_d)

    if scene.mt is not None:
        zeros = jnp.zeros((r,), jnp.float32)
        hit, best_t, idx, _, _ = _overflow_repair(
            scene, (hit, best_t, idx, zeros, zeros), overflow, org_d,
            dirn_d, tmin_d, tmax_d)

    idx = jnp.minimum(jnp.maximum(idx, 0), scene.num_tris - 1)
    if scene.geom_pack is not None and scene.num_spheres == 0:
        # one-gather differentiable recompute + shading tail
        return finalize_hit_packed(scene, org, dirn, t_min, hit, idx)
    t2, u2, v2, _ = mt_gather(scene.tris, idx, org, dirn, t_min,
                              jnp.full_like(t_max, BIG_T))
    best_t = jnp.where(hit, t2, best_t)
    u = jnp.where(hit, u2, 0.0)
    v = jnp.where(hit, v2, 0.0)
    return finalize_hit(scene, org, dirn, t_min, t_max, hit, best_t, idx,
                        u, v)


def shadow_binned_v3(scene, org, dirn, t_min, t_max):
    """Lean shadow backend via the v3 dispatch: (hit, prim_id, is_sphere).
    NEE only identity-tests the winner (megakernel.nee_contribution)."""
    org_d = jax.lax.stop_gradient(org)
    dirn_d = jax.lax.stop_gradient(dirn)
    tmin_d = jax.lax.stop_gradient(t_min)
    tmax_d = jax.lax.stop_gradient(t_max)
    hit, tri_t, gid, overflow = raycast_binned_pallas_v3(
        scene, org_d, dirn_d, tmin_d, tmax_d, mode="shadow")

    if scene.mt is not None:
        res = (hit, tri_t, gid, jnp.zeros_like(tri_t),
               jnp.zeros_like(tri_t))
        hit, tri_t, gid, _, _ = _overflow_repair(
            scene, res, overflow, org_d, dirn_d, tmin_d, tmax_d)
    if scene.num_spheres:
        from pathtrace_tpu.ops.intersect import (closest_masked,
                                                 intersect_spheres_all)
        st, svalid = intersect_spheres_all(scene.spheres, org, dirn,
                                           t_min, t_max)
        sp_t, _, sp_hit = closest_masked(jnp.where(svalid, st, jnp.inf))
        use_sph = sp_hit & (~hit | (sp_t < jnp.where(hit, tri_t, jnp.inf)))
        return hit | sp_hit, gid, use_sph
    return hit, gid, jnp.zeros_like(hit)


# v3's only overflow class is global slot-budget truncation, which marks
# every ray of a truncated cluster - potentially thousands at once - so
# the repair capacity is sized for that burst (the cond fires only on
# overflow batches; the v2 k_max-overflow class that fired it every call
# is gone).
REPAIR_CAP = 4096


def _overflow_repair(scene, res, overflow, org_d, dirn_d, tmin_d, tmax_d):
    """Re-resolve overflow rays exactly, capacity-bounded.

    The v1 path re-ran the FULL-scene chunked MT product for the whole
    batch whenever ANY lane overflowed (traced at ~295 ms/call at 65k
    lanes on blob82k with overflow rate 1e-4). Here: gather up to
    REPAIR_CAP overflow rays, brute them against the full scene
    (REPAIR_CAP x T products - one chunk), scatter back. The full-batch
    fallback remains only for > REPAIR_CAP overflows (pathological).
    """
    from pathtrace_tpu.ops.mt_matmul import (mt_closest_auto,
                                             mt_matmul_closest_chunked)

    n_over = jnp.sum(overflow.astype(jnp.int32))

    def repair(res):
        idx = jnp.nonzero(overflow, size=REPAIR_CAP, fill_value=0)[0]
        sel = overflow[idx]
        # wide blocks: at REPAIR_CAP rays the (512, block) products are
        # tiny, and the default 4096-column scan's ~21 sequential steps
        # dominated the repair (traced 2.8 ms - it fires on nearly every
        # 65k batch at overflow rate ~2e-4); 4 steps suffice
        block = min(32768, scene.mt.det.shape[1])
        ho, to, io, uo, vo = mt_matmul_closest_chunked(
            scene.mt, org_d[idx], dirn_d[idx], tmin_d[idx], tmax_d[idx],
            block=block)
        h, t, i, u, v = res
        def upd(a, b):
            return a.at[idx].set(jnp.where(sel, b, a[idx]))
        return (upd(h, ho), upd(t, to), upd(i, io), upd(u, uo), upd(v, vo))

    def full(res):
        hit_f, t_f, idx_f, u_f, v_f = mt_closest_auto(
            scene.mt, org_d, dirn_d, tmin_d, tmax_d)
        h, t, i, u, v = res
        return (jnp.where(overflow, hit_f, h),
                jnp.where(overflow, t_f, t),
                jnp.where(overflow, idx_f, i),
                jnp.where(overflow, u_f, u),
                jnp.where(overflow, v_f, v))

    res = jax.lax.cond(n_over > 0, repair, lambda a: a, res)
    res = jax.lax.cond(n_over > REPAIR_CAP, full, lambda a: a, res)
    return res


def raycast_binned_v2(scene, org, dirn, t_min=None, t_max=None,
                      k_max: int = 16):
    """Drop-in raycast (HitRecord) through the Pallas pair-block kernel.

    Bounded overflow repair + the differentiable-recompute tail of
    raycast_binned. NOTE (ADVICE r4 #2): traversal always runs the
    [0, BIG_T) band - a caller passing t_min > 0 gets triangle hits
    below t_min that brute would reject. Every caller passes the
    defaults; the v3 path (raycast_binned_v3) threads real bounds
    through both the cell cull and the in-kernel accepts."""
    from pathtrace_tpu.ops.intersect import BIG_T, finalize_hit, mt_gather

    org_d = jax.lax.stop_gradient(org)
    dirn_d = jax.lax.stop_gradient(dirn)
    r = org.shape[0]
    hit, best_t, idx, u, v, overflow = raycast_binned_pallas(
        scene, org_d, dirn_d, 0.0, BIG_T, k_max=k_max)

    if scene.mt is not None:
        zeros = jnp.zeros((r,), jnp.float32)
        big = jnp.full((r,), BIG_T, jnp.float32)
        hit, best_t, idx, u, v = _overflow_repair(
            scene, (hit, best_t, idx, u, v), overflow, org_d, dirn_d,
            zeros, big)

    if t_min is None:
        t_min = jnp.zeros((r,), jnp.float32)
    if t_max is None:
        t_max = jnp.full((r,), BIG_T, jnp.float32)
    idx = jnp.minimum(jnp.maximum(idx, 0), scene.num_tris - 1)
    t2, u2, v2, _ = mt_gather(scene.tris, idx, org, dirn, t_min,
                              jnp.full_like(t_max, BIG_T))
    best_t = jnp.where(hit, t2, best_t)
    u = jnp.where(hit, u2, u)
    v = jnp.where(hit, v2, v)
    return finalize_hit(scene, org, dirn, t_min, t_max, hit, best_t, idx, u, v)


def shadow_binned_v2(scene, org, dirn, t_min, t_max, k_max: int = 16):
    """Lean shadow backend: (hit, prim_id, is_sphere) via the pair kernel
    in shadow mode (no exact recompute / attribute fetch - NEE only
    identity-tests the winner, see megakernel.nee_contribution)."""
    org_d = jax.lax.stop_gradient(org)
    dirn_d = jax.lax.stop_gradient(dirn)
    tmin_d = jax.lax.stop_gradient(t_min)
    tmax_d = jax.lax.stop_gradient(t_max)
    hit, tri_t, gid, _, _, overflow = raycast_binned_pallas(
        scene, org_d, dirn_d, tmin_d, tmax_d, k_max=k_max, mode="shadow")

    if scene.mt is not None:
        res = (hit, tri_t, gid, jnp.zeros_like(tri_t), jnp.zeros_like(tri_t))
        hit, tri_t, gid, _, _ = _overflow_repair(
            scene, res, overflow, org_d, dirn_d, tmin_d, tmax_d)
    if scene.num_spheres:
        from pathtrace_tpu.ops.intersect import (closest_masked,
                                                 intersect_spheres_all)
        st, svalid = intersect_spheres_all(scene.spheres, org, dirn,
                                           t_min, t_max)
        sp_t, _, sp_hit = closest_masked(jnp.where(svalid, st, jnp.inf))
        use_sph = sp_hit & (~hit | (sp_t < jnp.where(hit, tri_t, jnp.inf)))
        return hit | sp_hit, gid, use_sph
    return hit, gid, jnp.zeros_like(hit)


def raycast_binned(scene, org, dirn, t_min=None, t_max=None,
                   k_max: int = 48):
    """Drop-in raycast via binned traversal (scene.clusters required).

    Overflow rays (more than k_max cluster AABB hits) are re-resolved with
    the exact MT-matmul path against the full scene, masked in - always
    correct, at worst slower when overflow is common."""
    from pathtrace_tpu.ops.intersect import BIG_T, finalize_hit, mt_gather
    from pathtrace_tpu.ops.mt_matmul import mt_closest_auto

    clusters = scene.clusters
    assert clusters is not None, "scene has no clusters; Scene.with_binned()"
    assert clusters.dup_map is None, \
        "KD cells require the v2 path (raycast_binned_v2)"
    org_d = jax.lax.stop_gradient(org)
    dirn_d = jax.lax.stop_gradient(dirn)
    r = org.shape[0]
    if t_min is None:
        t_min = jnp.zeros((r,), jnp.float32)
    if t_max is None:
        t_max = jnp.full((r,), BIG_T, jnp.float32)
    tmin_d = jax.lax.stop_gradient(t_min)
    tmax_d = jax.lax.stop_gradient(t_max)

    hit, best_t, idx, u, v, overflow = raycast_binned_closest(
        clusters, org_d, dirn_d, tmin_d, tmax_d, k_max=k_max)

    if scene.mt is not None:
        # exact fallback for overflow rays, gated behind lax.cond: the
        # full-scene chunked MT product is ~R*T work (5.4G products per
        # bounce on blob82k at 65k lanes) and used to run UNCONDITIONALLY
        # every raycast - the reason the mesh bench sat at ~13k paths/s.
        # k_max must make overflow RARE IN EVERY BATCH, not just low-rate:
        # any single overflowing lane fires the whole fallback for the
        # iteration. Measured on blob82k INTERIOR rays (the bounce-ray
        # regime): mean 5 cluster-AABB hits, p99 15, max 33 -> k=48 gives
        # zero overflow with margin (camera rays: 4.25% at k=8).
        def fallback(args):
            h, bt, ix, uu, vv = args
            hit_f, t_f, idx_f, u_f, v_f = mt_closest_auto(
                scene.mt, org_d, dirn_d, tmin_d, tmax_d)
            return (jnp.where(overflow, hit_f, h),
                    jnp.where(overflow, t_f, bt),
                    jnp.where(overflow, idx_f, ix),
                    jnp.where(overflow, u_f, uu),
                    jnp.where(overflow, v_f, vv))

        hit, best_t, idx, u, v = jax.lax.cond(
            jnp.any(overflow), fallback, lambda a: a,
            (hit, best_t, idx, u, v))

    # differentiable recompute at the detached chosen prim. No-hit lanes
    # may carry indices into a cluster's padding slots; clamp into range
    # (their results are masked by `hit`).
    idx = jnp.minimum(idx, scene.num_tris - 1)
    t2, u2, v2, _ = mt_gather(scene.tris, idx, org, dirn, t_min,
                              jnp.full_like(t_max, BIG_T))
    best_t = jnp.where(hit, t2, best_t)
    u = jnp.where(hit, u2, u)
    v = jnp.where(hit, v2, v)
    return finalize_hit(scene, org, dirn, t_min, t_max, hit, best_t, idx, u, v)
