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
