"""Non-overlapping KD cells for the binned/pair-block traversal.

The BVH-subtree clusters (accel/binned.py build_clusters) inherit the
SAH tree's spatial OVERLAP: around a dense crinkly surface, dozens of
subtree AABBs contain the same point, so a bounce/shadow ray starting ON
the surface is "inside" 20-50 cluster boxes at once - per-ray cluster
membership explodes, k_max with it, and the overflow fallback dominated
the mesh bounce (traced at ~295 ms/call: tools/tpu_profile_mesh_bounce).

This module replaces the cut with a KD median-split partition of SPACE:

  - cells are axis-aligned, non-overlapping, and tile the scene bounds,
    so any point lies in exactly ONE cell and a ray's cluster set is the
    set of cells its segment crosses - bounded by the cell grid's
    resolution, independent of surface density. Exception (ADVICE r4
    #5): a no-progress leaf (every member spans the cut) is chunked
    into multiple cells SHARING one box, so such a point can lie in
    several same-box cells; closest-hit stays exact via the min-dedup,
    but per-ray crossing counts then over-count by the chunk factor
    (none of the committed assets trigger chunking);
  - each triangle is listed in EVERY cell its AABB overlaps (membership
    by duplication, conservative AABB test). Closest-hit over the padded
    per-cell lists is exact: a hit found from a neighboring cell's copy
    has the same t, and the per-ray min dedups naturally;
  - the duplicated member list maps back to original triangle ids via
    `dup_map`, applied once per raycast after the winner reduce.

The reference has no analog (its per-thread stack walks the overlapping
SAH tree directly, CudaUtil.cuh:93-148); this is TPU-shaped geometry:
bounded fan-out buys dense static dispatch.
"""

from __future__ import annotations

import numpy as np

from pathtrace_tpu.accel.binned import ClusterArrays


def build_kd_clusters(positions: np.ndarray, max_tris: int = 256,
                      pad_bounds: float = 1e-3, rule: str = "midpoint",
                      shrink: bool = True):
    """(T, 3, 3) world triangles -> ClusterArrays over a duplicated,
    cell-contiguous member array + dup_map (D,) i32 into the original
    triangle order.

    Splitting: recursive cut along the cell's widest axis until
    <= max_tris members. rule="midpoint" cuts the box center (fat,
    cube-ish cells - fewer crossings per ray, measured mean 8.7 -> ~5 on
    blob82k surface rays vs median cuts); "median" cuts the member-
    centroid median (balanced counts). Empty children are dropped (rays
    crossing empty space just match no cell). With `shrink`, each leaf's
    stored AABB is tightened to its members' bounds intersected with the
    cell (pure win: the slab test culls more, partition semantics keep
    a point in at most one cell). Membership: conservative AABB overlap.
    """
    from pathtrace_tpu.ops.mt_matmul import build_mt_coeffs

    t = positions.shape[0]
    tri_min = positions.min(axis=1)
    tri_max = positions.max(axis=1)
    cent = (tri_min + tri_max) * 0.5
    root_min = tri_min.min(axis=0) - pad_bounds
    root_max = tri_max.max(axis=0) + pad_bounds

    cells = []   # (bmin, bmax, member_ids)

    def emit(ids, bmin, bmax):
        # depth-capped / no-progress leaves may exceed max_tris: chunk
        # into same-box cells (closest-hit dedups duplicate-box hits)
        for s in range(0, len(ids), max_tris):
            sub = ids[s:s + max_tris]
            if shrink:
                mb_min = np.maximum(tri_min[sub].min(axis=0) - pad_bounds,
                                    bmin)
                mb_max = np.minimum(tri_max[sub].max(axis=0) + pad_bounds,
                                    bmax)
                cells.append((mb_min, mb_max, sub))
            else:
                cells.append((bmin, bmax, sub))

    def split(ids: np.ndarray, bmin: np.ndarray, bmax: np.ndarray,
              depth: int):
        if len(ids) == 0:
            return
        if len(ids) <= max_tris or depth > 30:
            emit(ids, bmin, bmax)
            return
        c = cent[ids]
        if rule == "hybrid" and len(ids) <= 2 * max_tris:
            # final split: cut at the centroid median along the widest
            # axis so both leaves land near max_tris (midpoint leaves
            # average ~50% fill, and every padded tile row costs MXU and
            # accept-logic work in the pair kernel). Global structure
            # stays midpoint-fat: an all-median tree degenerates into
            # thin slabs along the dense surface and crossing counts
            # explode (measured 586k -> 15k paths/s on blob82k).
            axis = int(np.argmax(bmax - bmin))
            cut = float(np.median(c[:, axis]))
            if not (bmin[axis] < cut < bmax[axis]):
                cut = 0.5 * (bmin[axis] + bmax[axis])
        elif rule in ("midpoint", "hybrid"):
            axis = int(np.argmax(bmax - bmin))
            cut = 0.5 * (bmin[axis] + bmax[axis])
        else:
            spread = c.max(axis=0) - c.min(axis=0)
            axis = int(np.argmax(spread))
            cut = float(np.median(c[:, axis]))
            if not (bmin[axis] < cut < bmax[axis]):
                cut = 0.5 * (bmin[axis] + bmax[axis])
        bmax_l = bmax.copy()
        bmax_l[axis] = cut
        bmin_r = bmin.copy()
        bmin_r[axis] = cut
        eps = pad_bounds
        left = ids[tri_min[ids, axis] <= cut + eps]
        right = ids[tri_max[ids, axis] >= cut - eps]
        if len(left) == len(ids) and len(right) == len(ids):
            # no progress (every tri spans the cut): accept as leaf
            emit(ids, bmin, bmax)
            return
        split(left, bmin, bmax_l, depth + 1)
        split(right, bmin_r, bmax, depth + 1)

    split(np.arange(t, dtype=np.int64), root_min.astype(np.float64),
          root_max.astype(np.float64), 0)

    m = len(cells)
    c_cap = max_tris
    bmin = np.stack([c[0] for c in cells]).astype(np.float32)
    bmax = np.stack([c[1] for c in cells]).astype(np.float32)
    counts = np.array([len(c[2]) for c in cells], np.int64)
    assert (counts <= c_cap).all(), counts.max()
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    dup_map = np.concatenate([c[2] for c in cells]).astype(np.int64)
    dup_positions = positions[dup_map]

    full = build_mt_coeffs(dup_positions, pad_to=1)
    stacked = np.stack([np.asarray(full.det), np.asarray(full.t_num),
                        np.asarray(full.u_num), np.asarray(full.v_num)],
                       axis=-1)  # (16, D, 4)
    tiles = np.zeros((m, 16, c_cap, 4), np.float32)
    for k in range(m):
        s, n = int(starts[k]), int(counts[k])
        tiles[k, :, :n, :] = stacked[:, s:s + n, :]

    import jax.numpy as jnp
    clusters = ClusterArrays(
        bmin=jnp.asarray(bmin), bmax=jnp.asarray(bmax),
        prim_start=jnp.asarray(starts.astype(np.int32)),
        prim_count=jnp.asarray(counts.astype(np.int32)),
        coeffs=jnp.asarray(tiles),
        num_clusters=m, cluster_cap=c_cap,
    )
    return clusters, dup_map.astype(np.int32), dup_positions


def crossing_stats(clusters, org: np.ndarray, dirn: np.ndarray,
                   t_max: float = 999999.0):
    """Host-side cell-crossing statistics for k_max calibration."""
    import jax
    import jax.numpy as jnp
    from pathtrace_tpu.accel.binned import _slab_all
    from pathtrace_tpu.accel.traverse import safe_inv_dir

    r = org.shape[0]
    hm, _ = jax.jit(_slab_all)(
        jnp.asarray(org), safe_inv_dir(jnp.asarray(dirn)),
        jnp.asarray(clusters.bmin), jnp.asarray(clusters.bmax),
        jnp.zeros((r,), jnp.float32), jnp.full((r,), t_max, jnp.float32))
    h = np.asarray(jnp.sum(hm, axis=1))
    return dict(mean=float(h.mean()), p99=float(np.percentile(h, 99)),
                max=int(h.max()))
