"""Pallas TPU kernel: closest-hit Möller-Trumbore over all triangles.

The XLA path (ops/mt_matmul.py) materializes four (R, T) products in HBM.
This kernel fuses matmul + accept tests + running min-reduction in VMEM,
flash-attention style: grid (rays/BR, tris/BT); each step does four
(BR,16)x(16,BT) MXU dots, applies the reference's accept semantics
(CudaPrimitive.cuh:99-146), and folds the block's argmin into the running
per-ray best. HBM traffic drops from O(R*T) to O(R + T) per raycast.

This is the "#1 hot kernel" the survey calls for (SURVEY.md §2: Pallas
batched traversal); the coefficients come from ops/mt_matmul.build_mt_coeffs.
interpret=True makes it CPU-testable (tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtrace_tpu.ops.mt_matmul import MTCoeffs, ray_features
from pathtrace_tpu.utils.math3 import EPS

BIG = 3.0e38


def _kernel(f_ref, tmin_ref, tmax_ref, mdet_ref, mtn_ref, mun_ref, mvn_ref,
            best_t_ref, best_idx_ref, best_u_ref, best_v_ref, *,
            block_t: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_t_ref[:] = jnp.full_like(best_t_ref, BIG)
        best_idx_ref[:] = jnp.zeros_like(best_idx_ref)
        best_u_ref[:] = jnp.zeros_like(best_u_ref)
        best_v_ref[:] = jnp.zeros_like(best_v_ref)

    f = f_ref[:]  # (BR, 16)
    det = jnp.dot(f, mdet_ref[:], preferred_element_type=jnp.float32)
    t_num = jnp.dot(f, mtn_ref[:], preferred_element_type=jnp.float32)
    u_num = jnp.dot(f, mun_ref[:], preferred_element_type=jnp.float32)
    v_num = jnp.dot(f, mvn_ref[:], preferred_element_type=jnp.float32)

    inv_det = jnp.where(jnp.abs(det) > 1e-20, 1.0 / det, 0.0)
    t = t_num * inv_det
    tmin = tmin_ref[:]  # (BR, 1)
    tmax = tmax_ref[:]
    valid = (det >= EPS)
    valid &= (t >= tmin) & (t <= tmax)
    valid &= (u_num >= 0.0) & (u_num <= det)
    valid &= (v_num >= 0.0) & (u_num + v_num <= det)

    t_masked = jnp.where(valid, t, BIG)
    local_t = jnp.min(t_masked, axis=1, keepdims=True)        # (BR, 1)
    is_min = (t_masked <= local_t) & valid
    # first-match select within the block (break ties to lowest lane)
    lane = jax.lax.broadcasted_iota(jnp.int32, t_masked.shape, 1)
    lane_masked = jnp.where(is_min, lane, block_t)
    local_arg = jnp.min(lane_masked, axis=1, keepdims=True)   # (BR, 1)
    pick = lane == local_arg

    def at_min(x):
        return jnp.sum(jnp.where(pick, x, 0.0), axis=1, keepdims=True)

    local_u = at_min(u_num * inv_det)
    local_v = at_min(v_num * inv_det)

    better = local_t < best_t_ref[:]
    best_t_ref[:] = jnp.where(better, local_t, best_t_ref[:])
    best_idx_ref[:] = jnp.where(better, j * block_t + local_arg,
                                best_idx_ref[:])
    best_u_ref[:] = jnp.where(better, local_u, best_u_ref[:])
    best_v_ref[:] = jnp.where(better, local_v, best_v_ref[:])


@functools.partial(jax.jit, static_argnames=("block_r", "block_t",
                                             "interpret"))
def mt_closest_pallas(coeffs: MTCoeffs, org: jnp.ndarray, dirn: jnp.ndarray,
                      t_min: jnp.ndarray, t_max: jnp.ndarray,
                      block_r: int = 256, block_t: int = 512,
                      interpret: bool = False):
    """(hit, best_t, idx, u, v) like mt_matmul_closest, via the fused
    Pallas kernel. Rays are padded to block_r, tris already padded to 128
    by build_mt_coeffs (re-padded here to block_t)."""
    r = org.shape[0]
    t_pad = coeffs.det.shape[1]
    if t_pad % block_t != 0:
        new_t = ((t_pad + block_t - 1) // block_t) * block_t
        pad = new_t - t_pad
        pad_m = lambda m: jnp.pad(m, ((0, 0), (0, pad)))
        coeffs = MTCoeffs(det=pad_m(coeffs.det), t_num=pad_m(coeffs.t_num),
                          u_num=pad_m(coeffs.u_num), v_num=pad_m(coeffs.v_num),
                          num_tris=coeffs.num_tris)
        t_pad = new_t
    r_pad = ((r + block_r - 1) // block_r) * block_r
    f = ray_features(org, dirn)
    if r_pad != r:
        f = jnp.pad(f, ((0, r_pad - r), (0, 0)))
        t_min = jnp.pad(t_min, (0, r_pad - r))
        t_max = jnp.pad(t_max, (0, r_pad - r), constant_values=-1.0)

    grid = (r_pad // block_r, t_pad // block_t)
    kernel = functools.partial(_kernel, block_t=block_t)

    out_shape = [
        jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),   # best_t
        jax.ShapeDtypeStruct((r_pad, 1), jnp.int32),     # best_idx
        jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),   # best_u
        jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),   # best_v
    ]
    row_spec = pl.BlockSpec((block_r, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    best_t, best_idx, best_u, best_v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, 16), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            row_spec,
            row_spec,
            pl.BlockSpec((16, block_t), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, block_t), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, block_t), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, block_t), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[row_spec, row_spec, row_spec, row_spec],
        out_shape=out_shape,
        interpret=interpret,
    )(f, t_min[:, None], t_max[:, None], coeffs.det, coeffs.t_num,
      coeffs.u_num, coeffs.v_num)

    best_t = best_t[:r, 0]
    best_idx = jnp.minimum(best_idx[:r, 0], coeffs.num_tris - 1)
    best_u = best_u[:r, 0]
    best_v = best_v[:r, 0]
    hit = best_t < BIG
    return hit, jnp.where(hit, best_t, 0.0), best_idx, best_u, best_v


def raycast_pallas(scene, org: jnp.ndarray, dirn: jnp.ndarray,
                   t_min=None, t_max=None, interpret: bool = False):
    """Drop-in raycast via the fused Pallas kernel (scene.mt required)."""
    from pathtrace_tpu.ops.intersect import BIG_T, finalize_hit

    assert scene.mt is not None, "scene has no MT coeffs; call Scene.with_mt()"
    org_d = jax.lax.stop_gradient(org)
    dirn_d = jax.lax.stop_gradient(dirn)
    r = org.shape[0]
    if t_min is None:
        t_min = jnp.zeros((r,), jnp.float32)
    if t_max is None:
        t_max = jnp.full((r,), BIG_T, jnp.float32)
    hit, best_t, idx, u, v = mt_closest_pallas(
        scene.mt, org_d, dirn_d, jax.lax.stop_gradient(t_min),
        jax.lax.stop_gradient(t_max), interpret=interpret)
    # differentiable recompute of (t, u, v) at the (detached) chosen prim
    from pathtrace_tpu.ops.intersect import mt_gather
    t2, u2, v2, _ = mt_gather(scene.tris, idx, org, dirn, t_min,
                              jnp.full_like(t_max, BIG_T))
    sel = hit
    best_t = jnp.where(sel, t2, best_t)
    u = jnp.where(sel, u2, u)
    v = jnp.where(sel, v2, v)
    return finalize_hit(scene, org, dirn, t_min, t_max, hit, best_t, idx, u, v)
