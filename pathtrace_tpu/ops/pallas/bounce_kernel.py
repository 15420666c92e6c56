"""Fused Pallas bounce kernel: one TPU program per wavefront iteration.

The XLA wavefront (integrator/wavefront.py) lowers each bounce to ~50
fusions that round-trip (R,)-sized intermediates - and (R, T_pad)-sized
intersection products - through HBM; profiling put the iteration at
~0.86 ms for 65k lanes with the raycast products dominating. This module
fuses the ENTIRE bounce into a single Pallas kernel: primary raycast,
winner attribute fetch, NEE (light sampling + shadow raycast), the four-
lobe BSDF, Russian roulette, film commit, and path regeneration - all on
VMEM-resident data. HBM traffic per iteration drops to the packed state
rows (~2 x 21 rows x R x 4B).

Layout: the SEARCH side is LANE-MAJOR - triangles on sublanes, rays on
lanes: Moller-Trumbore products (4*T_pad, B), per-triangle reductions
along the sublane axis (a standalone microbenchmark measured this raycast
core at ~80 us per 65536-ray x 128-tri closest-hit vs ~450 us for the XLA
matmul path and ~370 us for a rays-on-sublanes kernel). Everything
ELSEWISE is PANELED: per-lane scalars are (1, 8, B/8) and 3-vectors
(3, 8, B/8), filling all 8 sublanes of each (8, 128) f32 VPU tile - a
(1, B) row occupies 1/8 of its tiles, so the flat layout paid ~8x on
every elementwise op (measured: 699 us/iter full kernel, 193 us with all
sections ablated, at 65536 lanes; VPU row-ops dominated both). The two
layouts meet at jnp.reshape boundaries: state rows enter paneled, get
flattened only to build the (48, B) feature matrix for the search
matmuls, and search results (t/arg/hit rows) plus fetched attributes are
re-paneled for shading.

Precision: the winner search runs on bf16 MXU products with an
approximate-reciprocal ordering key (selection-only); t/u/v are then
recomputed EXACTLY elementwise at the winner, and attribute/material
fetches use an exact bf16x3-split one-hot matmul (the values' f32 bits
are reconstructed exactly; validated in tests). Estimator semantics match
integrator/megakernel.make_bounce_fn - same Philox streams keyed by
(ray_id, path-local iteration), same reference quirks - with selection
precision as the only deviation (near-tie winners can differ, as they
already do between the XLA matmul and brute backends).

Scope: small scenes whose triangle table fits a single VMEM tile
(T_pad <= MAX_TRIS, spheres/lights unrolled) - the reference's own demo
scenes. Large meshes keep the binned two-level traversal.
"""

from __future__ import annotations

import functools
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pathtrace_tpu.ops.pallas import bsdf_t
from pathtrace_tpu.ops.pallas.bsdf_t import (EPS, TINY, cross3, dot3, len3,
                                             normalize3, safe_sqrt, sqlen3)
from pathtrace_tpu.utils import rng
from pathtrace_tpu.utils.pytree import pytree_dataclass

BIG = 3.0e38
BIG_T = 999999.0          # reference RayCast default t_max (CudaUtil.cuh:93)
MAX_TRIS = 512            # single-tile triangle budget
MAX_UNROLL = 8            # spheres / lights are unrolled select chains

ATTR_ROWS = 48            # packed per-triangle attribute rows, see layout
_A_V0, _A_E1, _A_E2 = 0, 3, 6
_A_N0, _A_N1, _A_N2 = 9, 12, 15
_A_T0, _A_T1, _A_T2 = 18, 21, 24
_A_B0, _A_B1, _A_B2 = 27, 30, 33
_A_EMIT, _A_ALB, _A_SPEC = 36, 39, 42
_A_OPAC, _A_ROUGH, _A_METAL = 45, 46, 47

# FLAT-SHADING pack (24 rows): scenes whose triangles have constant
# per-tri normals AND tangent frames derived from them (the procedural
# demo scenes - no UVs, tangent_frame_from_normals) need neither the
# 9-row interpolated normal set nor the 18 tangent/bitangent rows: the
# kernel re-derives the frame from ONE normal row in-registers, exactly
# (derive-then-interpolate == interpolate-then-derive when the three
# vertex normals are identical). Halves the attribute-fetch matmuls and
# the fetched-row relayout.
ATTR_ROWS_FLAT = 24
_F_V0, _F_E1, _F_E2 = 0, 3, 6
_F_N = 9
_F_EMIT, _F_ALB, _F_SPEC = 12, 15, 18
_F_OPAC, _F_ROUGH, _F_METAL = 21, 22, 23


@pytree_dataclass(static=("t_pad", "num_tris", "num_spheres", "num_lights",
                          "flat_shading"))
class FusedPack:
    """Device-resident scene pack for the fused bounce kernel."""

    m_packed: jnp.ndarray   # (4*T_pad, 48) bf16: [M_hi | M_hi | M_lo] split
    attrs_hi: jnp.ndarray   # (attr_rows, T_pad) bf16  \
    attrs_mid: jnp.ndarray  # (attr_rows, T_pad) bf16   > exact bf16x3 split
    attrs_lo: jnp.ndarray   # (attr_rows, T_pad) bf16  /
    spheres: jnp.ndarray    # (max(S,1), 16) f32 SMEM rows
    lights: jnp.ndarray     # (max(L,1), 16) f32 SMEM rows
    t_pad: int
    num_tris: int
    num_spheres: int
    num_lights: int
    flat_shading: bool = False  # 24-row pack + in-kernel derived frames

    @property
    def attr_rows(self) -> int:
        return ATTR_ROWS_FLAT if self.flat_shading else ATTR_ROWS


def _bf16x3(x: np.ndarray):
    import ml_dtypes
    hi = x.astype(ml_dtypes.bfloat16)
    mid = (x - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    lo = (x - hi.astype(np.float32) - mid.astype(np.float32)).astype(
        ml_dtypes.bfloat16)
    return hi, mid, lo


def build_fused_pack(scene) -> FusedPack:
    """Host-side pack build (numpy; call once per scene, ride with jit)."""
    assert scene.mt is not None, "call Scene.with_mt() first"
    mt = scene.mt
    t_pad_mt = np.asarray(mt.det).shape[1]
    # re-pad the triangle axis to a multiple of 8 (the f32 sublane tile)
    # instead of with_mt's 128: for the 38-tri Cornell demo this halves
    # the search matmul's M tiles (4*128=512 -> 4*40=160 rows) and cuts
    # the per-triangle mask/reduction work 3x; padded slots keep det=0 so
    # they never pass the accept test. The MXU pads K to 128 either way.
    t_pad = min(t_pad_mt, max(8, -(-scene.num_tris // 8) * 8))
    assert t_pad <= MAX_TRIS, (t_pad, MAX_TRIS)
    assert scene.num_spheres <= MAX_UNROLL
    assert scene.num_lights <= MAX_UNROLL
    # bf16 hi+lo split of the coefficient matrix, packed for the ONE
    # K=48 search matmul [M_hi | M_hi | M_lo] @ [f_hi; f_lo; f_hi]:
    # recovers ~1.6e-5 relative product precision (bf16-only features
    # were ~1% off - unable to order the light 0.3%-of-t below the
    # ceiling, which silently killed NEE and emissive hits).
    m16 = np.concatenate(
        [np.asarray(mt.det).T[:t_pad], np.asarray(mt.t_num).T[:t_pad],
         np.asarray(mt.u_num).T[:t_pad], np.asarray(mt.v_num).T[:t_pad]],
        axis=0).astype(np.float32)
    import ml_dtypes as _mld
    m_hi = m16.astype(_mld.bfloat16)
    m_lo = (m16 - m_hi.astype(np.float32)).astype(_mld.bfloat16)
    m_packed = np.concatenate([m_hi, m_hi, m_lo], axis=1)

    tr, mat = scene.tris, scene.mat
    t = scene.num_tris

    # flat-shading detection: constant per-tri vertex normals AND a
    # tangent frame equal to the normal-derived fallback (the demo
    # scenes have no UVs, scene.py tangent_frame_from_normals) - then
    # the 24-row pack + in-kernel frame derivation is EXACT.
    n0 = np.asarray(tr.n0)
    flat = (np.allclose(n0, np.asarray(tr.n1), atol=1e-6)
            and np.allclose(n0, np.asarray(tr.n2), atol=1e-6))
    if flat:
        from pathtrace_tpu.models.scene import tangent_frame_from_normals
        td, bd = tangent_frame_from_normals(n0[:, None, :])
        flat = (np.allclose(td[:, 0], np.asarray(tr.t0), atol=1e-5)
                and np.allclose(bd[:, 0], np.asarray(tr.b0), atol=1e-5))

    v0 = np.asarray(tr.v0)
    if flat:
        a = np.zeros((ATTR_ROWS_FLAT, t_pad), np.float32)
        a[_F_V0:_F_V0 + 3, :t] = v0.T
        a[_F_E1:_F_E1 + 3, :t] = (np.asarray(tr.v1) - v0).T
        a[_F_E2:_F_E2 + 3, :t] = (np.asarray(tr.v2) - v0).T
        a[_F_N:_F_N + 3, :t] = n0.T
        a[_F_EMIT:_F_EMIT + 3, :t] = np.asarray(mat.emittance).T
        a[_F_ALB:_F_ALB + 3, :t] = np.asarray(mat.albedo).T
        a[_F_SPEC:_F_SPEC + 3, :t] = np.asarray(mat.specular).T
        a[_F_OPAC, :t] = np.asarray(mat.opacity)
        a[_F_ROUGH, :t] = np.asarray(mat.roughness)
        a[_F_METAL, :t] = np.asarray(mat.metallic)
    else:
        a = np.zeros((ATTR_ROWS, t_pad), np.float32)
        a[_A_V0:_A_V0 + 3, :t] = v0.T
        a[_A_E1:_A_E1 + 3, :t] = (np.asarray(tr.v1) - v0).T
        a[_A_E2:_A_E2 + 3, :t] = (np.asarray(tr.v2) - v0).T
        for base, fld in ((_A_N0, "n0"), (_A_N1, "n1"), (_A_N2, "n2"),
                          (_A_T0, "t0"), (_A_T1, "t1"), (_A_T2, "t2"),
                          (_A_B0, "b0"), (_A_B1, "b1"), (_A_B2, "b2")):
            a[base:base + 3, :t] = np.asarray(getattr(tr, fld)).T
        a[_A_EMIT:_A_EMIT + 3, :t] = np.asarray(mat.emittance).T
        a[_A_ALB:_A_ALB + 3, :t] = np.asarray(mat.albedo).T
        a[_A_SPEC:_A_SPEC + 3, :t] = np.asarray(mat.specular).T
        a[_A_OPAC, :t] = np.asarray(mat.opacity)
        a[_A_ROUGH, :t] = np.asarray(mat.roughness)
        a[_A_METAL, :t] = np.asarray(mat.metallic)
    hi, mid, lo = _bf16x3(a)

    s = max(scene.num_spheres, 1)
    sph = np.zeros((s, 16), np.float32)
    if scene.num_spheres:
        sp = scene.spheres
        sph[:, 0:3] = np.asarray(sp.center)
        sph[:, 3] = np.asarray(sp.radius)
        sph[:, 4:7] = np.asarray(sp.mat.emittance)
        sph[:, 7:10] = np.asarray(sp.mat.albedo)
        sph[:, 10:13] = np.asarray(sp.mat.specular)
        sph[:, 13] = np.asarray(sp.mat.opacity)
        sph[:, 14] = np.asarray(sp.mat.roughness)
        sph[:, 15] = np.asarray(sp.mat.metallic)

    # light rows: [v0 v1 v2 area normal | tri_id | emittance] (17 cols);
    # tri ids are exact in f32 (< 2^24)
    li = np.zeros((max(scene.num_lights, 1), 17), np.float32)
    if scene.num_lights:
        li[:, :13] = np.asarray(scene.light_pack)[:scene.num_lights]
        lids = np.asarray(scene.lights)[:scene.num_lights]
        li[:, 13] = lids.astype(np.float32)
        li[:, 14:17] = np.asarray(mat.emittance)[lids]

    return FusedPack(
        m_packed=jnp.asarray(m_packed),
        attrs_hi=jnp.asarray(hi), attrs_mid=jnp.asarray(mid),
        attrs_lo=jnp.asarray(lo),
        spheres=jnp.asarray(sph), lights=jnp.asarray(li),
        t_pad=int(t_pad), num_tris=int(t), num_spheres=int(scene.num_spheres),
        num_lights=int(scene.num_lights), flat_shading=bool(flat),
    )


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------

def _u01(u):
    """uint32 -> f32 in [0,1): top 24 bits (rng._to_unit_float), via an
    int32 bitcast because Mosaic lacks a uint32->float cast."""
    return (pltpu.bitcast(u >> 8, jnp.int32).astype(jnp.float32)
            * jnp.float32(1.0 / (1 << 24)))


def _draws8(ray_ids_i32, lane_iter_i32, k0, k1):
    """The 8 per-(ray, iteration) uniforms of rng.uniforms, (1, B) each."""
    rid = pltpu.bitcast(ray_ids_i32, jnp.uint32)
    it = pltpu.bitcast(lane_iter_i32, jnp.uint32)
    outs = []
    for block in range(2):
        outs.extend(rng.philox4x32(
            rid, it, jnp.full_like(rid, np.uint32(block)),
            jnp.full_like(rid, np.uint32(0x50415448)), k0, k1))
    return [_u01(o) for o in outs]


def _jitter2(ray_ids_i32, k0, k1):
    rid = pltpu.bitcast(ray_ids_i32, jnp.uint32)
    z = jnp.zeros_like(rid)
    c0, c1, _, _ = rng.philox4x32(
        rid, z, z, jnp.full_like(rid, np.uint32(0x4A495454)), k0, k1)
    return _u01(c0), _u01(c1)


def _features16(org, dirn):
    """(16, B) ray features [1, O, D, vec(D outer O)] (ops/mt_matmul.py)."""
    ones = jnp.ones_like(org[0:1])
    douter = jnp.concatenate(
        [dirn[i:i + 1] * org[j:j + 1] for i in range(3) for j in range(3)],
        axis=0)
    return jnp.concatenate([ones, org, dirn, douter], axis=0)


ACCEPT_SLACK = 1e-4  # relative accept-band widening vs split precision


def _closest_tri(m_ref, org, dirn, tmin, tmax, t_pad, exclude=None):
    """Winner search over all triangles: (hit, t_approx, arg) rows.

    The MT products run as ONE K=48 matmul of the bf16 hi/lo split pack
    [M_hi | M_hi | M_lo] @ [f_hi; f_lo; f_hi] = M_hi f_hi + M_hi f_lo +
    M_lo f_hi ~ M f to ~1.6e-5 relative - enough to order the
    reference's light 0.3%-of-t below the ceiling, which plain-bf16
    products could not (the MXU pads K to 128, so K=48 costs the same as
    K=16). Accept tests carry a tiny ACCEPT_SLACK band; t/u/v are still
    recomputed exactly at the winner with the elementwise MT.

    `exclude`: optional (1, B) i32 triangle id masked out per lane (the
    NEE shadow path identity-tests the winner against the sampled light).
    """
    ft = _features16(org, dirn)
    fh = ft.astype(jnp.bfloat16)
    fl = (ft - fh.astype(jnp.float32)).astype(jnp.bfloat16)
    f48 = jnp.concatenate([fh, fl, fh], axis=0)
    prods = jnp.dot(m_ref[:], f48, preferred_element_type=jnp.float32)
    det = prods[0 * t_pad:1 * t_pad]
    t_num = prods[1 * t_pad:2 * t_pad]
    u_num = prods[2 * t_pad:3 * t_pad]
    v_num = prods[3 * t_pad:4 * t_pad]
    sl = ACCEPT_SLACK
    # exact f32 divide for the ordering key: approx reciprocal (~2e-4
    # rel) would eat most of the split products' precision
    t = t_num / jnp.maximum(det, 1e-30)
    band = sl * (1.0 + jnp.abs(t))  # slack relative to t, NOT to the
    # tmax sentinel (sl * 999999 once admitted behind-the-origin tris)
    valid = (det >= EPS)
    valid &= (t >= tmin - band) & (t <= tmax + band)
    valid &= (u_num >= -sl * det) & (u_num <= det * (1.0 + sl))
    valid &= (v_num >= -sl * det) & (u_num + v_num <= det * (1.0 + 2 * sl))
    t_masked = jnp.where(valid, t, BIG)
    tri = jax.lax.broadcasted_iota(jnp.int32, t_masked.shape, 0)
    if exclude is not None:
        t_masked = jnp.where(tri == exclude, BIG, t_masked)
    best = jnp.min(t_masked, axis=0, keepdims=True)
    arg = jnp.min(jnp.where(t_masked <= best, tri, t_pad), axis=0,
                  keepdims=True)
    hit = best < BIG
    return hit, best, jnp.minimum(arg, t_pad - 1)


def _fetch_attrs(arg, ah_ref, am_ref, al_ref, t_pad, rows=None):
    """Exact one-hot gather of the attr column at arg: (rows, B).

    rows=(start, stop) fetches a row slice (the shadow path needs only
    v0/e1/e2); default all ATTR_ROWS."""
    r0, r1 = rows if rows is not None else (0, ATTR_ROWS)
    iota = jax.lax.broadcasted_iota(jnp.int32, (t_pad,) + arg.shape[1:], 0)
    oh = (iota == arg).astype(jnp.bfloat16)
    acc = jnp.dot(ah_ref[r0:r1], oh, preferred_element_type=jnp.float32)
    acc += jnp.dot(am_ref[r0:r1], oh, preferred_element_type=jnp.float32)
    acc += jnp.dot(al_ref[r0:r1], oh, preferred_element_type=jnp.float32)
    return acc


def _mt_exact(v0, e1, e2, org, dirn, tmin, tmax):
    """Elementwise Moller-Trumbore at the fetched triangle (exact f32).

    Same accept semantics as ops/intersect.mt_gather.
    """
    tvec = org - v0
    p = cross3(dirn, e2)
    q = cross3(tvec, e1)
    det = dot3(p, e1)
    inv_det = jnp.where(jnp.abs(det) > TINY, 1.0 / det, 0.0)
    t = dot3(q, e2) * inv_det
    u = dot3(p, tvec)
    v = dot3(q, dirn)
    valid = (det >= EPS)
    valid &= (t >= tmin) & (t <= tmax)
    valid &= (u >= 0.0) & (u <= det)
    valid &= (v >= 0.0) & (u + v <= det)
    return t, u * inv_det, v * inv_det, valid


def _sphere_scal(sph_ref, s, j, like):
    return jnp.zeros_like(like) + sph_ref[s, j]


def _closest_sphere(sph_ref, num_spheres, org, dirn, tmin, curmax):
    """Unrolled nearest-valid-root sphere scan (intersect_spheres_all +
    closest_masked semantics; ties break to the lowest index)."""
    b = org.shape[1:]
    best_t = jnp.full((1,) + b, BIG, jnp.float32)
    best_s = jnp.zeros((1,) + b, jnp.int32)
    hit = jnp.zeros((1,) + b, bool)
    a = sqlen3(dirn)
    for s in range(num_spheres):
        center = jnp.concatenate(
            [_sphere_scal(sph_ref, s, j, org[0:1]) for j in range(3)], axis=0)
        radius = _sphere_scal(sph_ref, s, 3, org[0:1])
        oc = org - center
        half_b = dot3(oc, dirn)
        c = sqlen3(oc) - radius * radius
        disc = half_b * half_b - a * c
        has = disc >= 0.0
        sq = safe_sqrt(disc)
        r0 = (-half_b - sq) / a
        r1 = (-half_b + sq) / a
        in0 = (r0 >= tmin) & (r0 <= curmax)
        in1 = (r1 >= tmin) & (r1 <= curmax)
        t = jnp.where(in0, r0, r1)
        valid = has & (in0 | in1)
        better = valid & (t < best_t)
        best_t = jnp.where(better, t, best_t)
        best_s = jnp.where(better, s, best_s)
        hit = hit | valid
    return hit, best_t, best_s


def _sphere_select(sph_ref, num_spheres, best_s, j, like):
    """Winner sphere's scalar j as a (1, B) row (unrolled select)."""
    out = jnp.zeros_like(like)
    for s in range(num_spheres):
        out = jnp.where(best_s == s, _sphere_scal(sph_ref, s, j, like), out)
    return out


def _light_select(light_ref, num_lights, slot, j, like):
    out = jnp.zeros_like(like)
    for l in range(num_lights):
        out = jnp.where(slot == l, jnp.zeros_like(like) + light_ref[l, j], out)
    return out


def _light_vec(light_ref, num_lights, slot, j0, like):
    return jnp.concatenate(
        [_light_select(light_ref, num_lights, slot, j0 + j, like)
         for j in range(3)], axis=0)


def _finite(x):
    """NaN/Inf test without jnp.isfinite: x*0 == 0 only for finite x."""
    return (x * 0.0) == 0.0


# ---------------------------------------------------------------------------
# the bounce kernel
# ---------------------------------------------------------------------------

def _bounce_kernel(misc_ref, key_ref, cam_ref, sph_ref, light_ref,
                   m_ref, ah_ref, am_ref, al_ref, sf_ref, si_ref,
                   sf_out, si_out, *,
                   cfg, t_pad, num_spheres, num_lights,
                   lanes_total, num_pix, width, height, k_pix, block_l,
                   num_pix_total=None, g_inner=1, ablate=frozenset(),
                   flat_shading=False):
    """ablate: profiling-only section kill switches ("raycast", "fetch",
    "nee", "bsdf", "spheres", "rng", "regen") - each replaces a section
    with cheap placeholder values so its cost can be measured by
    difference on hardware (tools/fused_ablate.py). Never set in
    production paths; results are meaningless images.

    State refs are PANELED (rows, 8, block_l); the searches run flat
    (rows, 8*block_l) - see the module docstring's layout note.

    g_inner: bounce iterations per kernel invocation. Every lane is
    independent, so iterating the whole body in-kernel is semantics-
    preserving; it amortizes the measured ~143 us fixed per-pallas_call
    cost AND keeps state in VMEM across bounces (no carry round-trip).
    The per-lane ray counter lives in sf's last row (accumulated
    in-kernel; the driver reduces it once per launch)."""
    b_flat = 8 * block_l
    attr_rows = ATTR_ROWS_FLAT if flat_shading else ATTR_ROWS

    # Mosaic rejects shape casts of single rows carrying reduction/
    # replicated layouts (tools/mosaic_probe*.py mapped the support
    # surface), but a concatenate materializes a standard layout after
    # which the multi-row (r, 8L) <-> (r, 8, L) reshape compiles. So:
    # cross each search boundary with everything PACKED into one concat
    # (cheaper anyway - one relayout pass), and let single rows ride a
    # self-concat pair.
    def unpan(x):
        """(r, 8, L) paneled -> (r, 8L) flat lanes (search layout)."""
        if x.dtype == jnp.bool_:
            return unpan(x.astype(jnp.int32)) != 0
        if x.shape[0] == 1:
            return jnp.concatenate([x, x], axis=0).reshape(2, b_flat)[0:1]
        return x.reshape(x.shape[0], b_flat)

    def pan(x):
        """(r, 8L) flat -> (r, 8, L) paneled (elementwise layout)."""
        if x.dtype == jnp.bool_:
            return pan(x.astype(jnp.int32)) != 0
        if x.shape[0] == 1:
            return jnp.concatenate([x, x], axis=0).reshape(2, 8,
                                                           block_l)[0:1]
        return x.reshape(x.shape[0], 8, block_l)

    k0 = key_ref[0, 0]
    k1 = key_ref[0, 1]
    base_path = misc_ref[0, 0]
    total_paths = misc_ref[0, 1]
    pix_offset = misc_ref[0, 2]   # sharded: this chip's first pixel

    # Sharded pools enumerate LOCAL path ids (sample * num_pix + local
    # pixel) for lane striding, but RNG streams and camera rays must be
    # keyed by the GLOBAL path id so an N-chip render is path-for-path
    # identical to the 1-chip render (same contract as the wavefront's
    # _make_to_global). num_pix/num_pix_total are static; pix_offset
    # rides misc. Unsharded (num_pix_total == num_pix, offset 0) this
    # reduces to the identity.
    npt = num_pix if num_pix_total is None else num_pix_total

    def to_global(local_ids):
        if npt == num_pix:
            return local_ids
        return ((local_ids // num_pix) * npt + pix_offset
                + jnp.remainder(local_ids, num_pix))

    # si row 0 is a PACKED bitfield (alive 1b | refracted 1b | depth 6b |
    # refract_cnt 6b | lane_iter 12b): the identity-body ablation showed
    # the per-iteration floor scales with state rows touched, so the five
    # small counters share one row (4 rows saved of 22).
    carry0 = (sf_ref[0:3],                      # org
              sf_ref[3:6],                      # dirn
              sf_ref[6:9],                      # radiance
              sf_ref[9:12],                     # weight
              sf_ref[12:12 + 3 * k_pix],        # film
              sf_ref[12 + 3 * k_pix:13 + 3 * k_pix],  # rays accumulator
              si_ref[0:1],                      # flags bitfield
              si_ref[1:2])                      # ray_ids

    def one_bounce(carry):
        (org, dirn, radiance, weight, film, rays_acc, flags,
         ray_ids) = carry
        alive = (flags & 1) != 0
        refracted = (flags & 2) != 0
        depth = (flags >> 2) & 63
        refract_cnt = (flags >> 8) & 63
        lane_iter = (flags >> 14) & 4095

        zeros1 = jnp.zeros_like(depth).astype(jnp.float32)
        if "rng" in ablate:
            u = [zeros1 + 0.5] * 8
        else:
            u = _draws8(to_global(ray_ids), lane_iter, k0, k1)

        tmin = zeros1
        tmax = zeros1 + BIG_T

        # ---- primary raycast (RayCast, CudaUtil.cuh:93-148) - flat layout
        if "raycast" in ablate:
            tri_hit = zeros1 < 1.0
            t_approx = zeros1 + 10.0
            arg_flat = unpan(jnp.remainder(ray_ids, t_pad))
            if "fetch" in ablate:
                attrs = (jnp.remainder(pan(arg_flat), 7).astype(jnp.float32)
                         * 1e-3 * jnp.ones((attr_rows, 1, 1), jnp.float32))
            else:
                attrs = pan(_fetch_attrs(arg_flat, ah_ref, am_ref, al_ref,
                                         t_pad, rows=(0, attr_rows)))
        else:
            pk = unpan(jnp.concatenate([org, dirn, tmin, tmax], axis=0))
            tri_hit_f, t_approx_f, arg_flat = _closest_tri(
                m_ref, pk[0:3], pk[3:6], pk[6:7], pk[7:8], t_pad)
            if "fetch" in ablate:
                fpk = pan(jnp.concatenate([t_approx_f] * 2, axis=0))
                attrs = (jnp.remainder(pan(arg_flat), 7).astype(jnp.float32)
                         * 1e-3 * jnp.ones((attr_rows, 1, 1), jnp.float32))
            else:
                attrs_f = _fetch_attrs(arg_flat, ah_ref, am_ref, al_ref,
                                       t_pad, rows=(0, attr_rows))
                fpk = pan(jnp.concatenate([t_approx_f, attrs_f], axis=0))
                attrs = fpk[1:1 + attr_rows]
            t_approx = fpk[0:1]
            ipk = pan(jnp.concatenate([tri_hit_f.astype(jnp.int32), arg_flat],
                                      axis=0))
            tri_hit = ipk[0:1] != 0
        v0 = attrs[_A_V0:_A_V0 + 3]
        e1 = attrs[_A_E1:_A_E1 + 3]
        e2 = attrs[_A_E2:_A_E2 + 3]
        if "mtexact" in ablate:
            t_x, u_x, v_x = t_approx, zeros1 + 0.3, zeros1 + 0.3
        else:
            t_x, u_x, v_x, ok_x = _mt_exact(v0, e1, e2, org, dirn, tmin, tmax)
            # exact validity gates the slack-band accepts of the search
            tri_hit = tri_hit & ok_x
        tri_t = jnp.where(tri_hit, t_x, BIG)

        # sphere scan against the running closest t (finalize_hit)
        if num_spheres:
            cur_max = jnp.where(tri_hit, tri_t, tmax)
            sph_hit, sph_t, best_s = _closest_sphere(
                sph_ref, num_spheres, org, dirn, tmin, cur_max)
            use_sphere = sph_hit & (~tri_hit | (sph_t < tri_t))
        else:
            sph_t = jnp.zeros_like(tri_t) + BIG
            best_s = jnp.zeros_like(depth)
            use_sphere = jnp.zeros_like(tri_hit) & False
        hit = tri_hit | use_sphere
        t_final = jnp.where(use_sphere, sph_t, tri_t)
        hit_p = org + jnp.where(hit, t_final, 0.0) * dirn

        # ---- shading attributes (swapped interpolation weights,
        # CudaPrimitive.cuh:141-146)
        if flat_shading:
            # constant per-tri normals: interpolation is the identity,
            # and the tangent frame re-derives EXACTLY the stored
            # normal-derived fallback (tangent_frame_from_normals)
            n_out = normalize3(attrs[_F_N:_F_N + 3])
            helper_y = jnp.abs(n_out[1:2]) < 0.99
            hx = jnp.where(helper_y, 0.0, 1.0)
            hy = jnp.where(helper_y, 1.0, 0.0)
            helper = jnp.concatenate([hx, hy, jnp.zeros_like(hx)], axis=0)
            tangent = normalize3(cross3(helper, n_out))
            bitang = cross3(n_out, tangent)
            mat = dict(
                emittance=attrs[_F_EMIT:_F_EMIT + 3],
                albedo=attrs[_F_ALB:_F_ALB + 3],
                specular=attrs[_F_SPEC:_F_SPEC + 3],
                opacity=attrs[_F_OPAC:_F_OPAC + 1],
                roughness=attrs[_F_ROUGH:_F_ROUGH + 1],
                metallic=attrs[_F_METAL:_F_METAL + 1],
            )
        else:
            w0 = 1.0 - u_x - v_x
            n_out = normalize3(w0 * attrs[_A_N0:_A_N0 + 3]
                               + v_x * attrs[_A_N1:_A_N1 + 3]
                               + u_x * attrs[_A_N2:_A_N2 + 3])
            tangent = normalize3(w0 * attrs[_A_T0:_A_T0 + 3]
                                 + v_x * attrs[_A_T1:_A_T1 + 3]
                                 + u_x * attrs[_A_T2:_A_T2 + 3])
            bitang = normalize3(w0 * attrs[_A_B0:_A_B0 + 3]
                                + v_x * attrs[_A_B1:_A_B1 + 3]
                                + u_x * attrs[_A_B2:_A_B2 + 3])
            mat = dict(
                emittance=attrs[_A_EMIT:_A_EMIT + 3],
                albedo=attrs[_A_ALB:_A_ALB + 3],
                specular=attrs[_A_SPEC:_A_SPEC + 3],
                opacity=attrs[_A_OPAC:_A_OPAC + 1],
                roughness=attrs[_A_ROUGH:_A_ROUGH + 1],
                metallic=attrs[_A_METAL:_A_METAL + 1],
            )
        front = dot3(dirn, n_out) < 0.0
        normal = jnp.where(front, n_out, -n_out)
        if num_spheres:
            center = jnp.concatenate(
                [_sphere_select(sph_ref, num_spheres, best_s, j, zeros1)
                 for j in range(3)], axis=0)
            radius = _sphere_select(sph_ref, num_spheres, best_s, 3, zeros1)
            outward = (hit_p - center) / jnp.maximum(radius, TINY)
            s_front = dot3(dirn, outward) < 0.0
            s_normal = jnp.where(s_front, outward, -outward)
            up = jnp.concatenate([zeros1, zeros1 + 1.0, zeros1], axis=0)
            s_tan = normalize3(cross3(up, s_normal))
            s_bit = cross3(s_normal, s_tan)
            normal = jnp.where(use_sphere, s_normal, normal)
            tangent = jnp.where(use_sphere, s_tan, tangent)
            bitang = jnp.where(use_sphere, s_bit, bitang)
            # boolean select spelled logically: Mosaic cannot lower
            # select->i1 (arith.trunci i8->i1 is unsupported)
            front = (use_sphere & s_front) | (~use_sphere & front)
            sm = [jnp.concatenate(
                [_sphere_select(sph_ref, num_spheres, best_s, j0 + j, zeros1)
                 for j in range(3)], axis=0) for j0 in (4, 7, 10)]
            mat = dict(
                emittance=jnp.where(use_sphere, sm[0], mat["emittance"]),
                albedo=jnp.where(use_sphere, sm[1], mat["albedo"]),
                specular=jnp.where(use_sphere, sm[2], mat["specular"]),
                opacity=jnp.where(use_sphere, _sphere_select(
                    sph_ref, num_spheres, best_s, 13, zeros1), mat["opacity"]),
                roughness=jnp.where(use_sphere, _sphere_select(
                    sph_ref, num_spheres, best_s, 14, zeros1), mat["roughness"]),
                metallic=jnp.where(use_sphere, _sphere_select(
                    sph_ref, num_spheres, best_s, 15, zeros1), mat["metallic"]),
            )
        frame = dict(normal=normal, tangent=tangent, bitangent=bitang,
                     front=front)
        wo = -dirn

        live_hit = alive & hit
        live_miss = alive & ~hit

        # ---- miss: += weight * miss gray, path ends (CudaUtil.cuh:375-379)
        miss_rgb = jnp.concatenate(
            [zeros1 + float(c) for c in cfg.miss_radiance], axis=0)
        radiance = radiance + jnp.where(live_miss, weight * miss_rgb, 0.0)

        # ---- emissive hit every bounce, no MIS (CudaUtil.cuh:220-224)
        emissive = sqlen3(mat["emittance"]) > EPS
        radiance = radiance + jnp.where(live_hit & emissive,
                                        weight * mat["emittance"], 0.0)

        # ---- NEE (CudaUtil.cuh:234-272)
        shadow_count = jnp.zeros_like(zeros1)
        if cfg.nee and num_lights > 0 and "nee" not in ablate:
            slot = jnp.minimum((u[0] * num_lights).astype(jnp.int32),
                               num_lights - 1)
            lv0 = _light_vec(light_ref, num_lights, slot, 0, zeros1)
            lv1 = _light_vec(light_ref, num_lights, slot, 3, zeros1)
            lv2 = _light_vec(light_ref, num_lights, slot, 6, zeros1)
            area = _light_select(light_ref, num_lights, slot, 9, zeros1)
            l_normal = _light_vec(light_ref, num_lights, slot, 10, zeros1)
            r1 = safe_sqrt(u[1])
            r2 = u[2]
            point = (1.0 - r1) * lv0 + r1 * (1.0 - r2) * lv1 + r1 * r2 * lv2
            to_light = point - hit_p
            dist2 = sqlen3(to_light)
            dist = jnp.sqrt(jnp.maximum(dist2, TINY))
            sdir = normalize3(to_light)

            # shadow ray (GetLightColor, CudaUtil.cuh:150-166): t in
            # [EPS, dist+1]. t_min = EPS, not the reference's 0: a t_min
            # of 0 lets the ray re-hit its own SPHERE at t ~ +-1e-7
            # depending on rounding, flipping across compiled programs
            # (see nee_contribution, megakernel.py). Identity acceptance
            # (winner == sampled light tri; see nee_contribution for the
            # deviation note) - the split-precision search orders the
            # light correctly against near-coincident geometry, so no
            # exact recompute or attribute fetch is needed.
            s_tmax = dist + 1.0
            s_tmin = zeros1 + EPS
            spk = unpan(jnp.concatenate([hit_p, sdir, s_tmin, s_tmax],
                                        axis=0))
            s_hit_f, s_t_f, s_arg_f = _closest_tri(
                m_ref, spk[0:3], spk[3:6], spk[6:7], spk[7:8], t_pad)
            sik = pan(jnp.concatenate([s_hit_f.astype(jnp.int32), s_arg_f],
                                      axis=0))
            s_hit_tri = sik[0:1] != 0
            s_arg = sik[1:2]
            if num_spheres:
                s_t_approx = pan(s_t_f)
                s_cur = jnp.where(s_hit_tri, s_t_approx, s_tmax)
                so_hit, so_t, _ = _closest_sphere(
                    sph_ref, num_spheres, hit_p, sdir, s_tmin, s_cur)
                s_use_sph = so_hit & (~s_hit_tri | (so_t < s_t_approx))
            else:
                s_use_sph = jnp.zeros_like(s_hit_tri) & False
            light_id = _light_select(light_ref, num_lights, slot, 13, zeros1)
            reached = (s_hit_tri & ~s_use_sph
                       & (s_arg == light_id.astype(jnp.int32)))
            l_emit = _light_vec(light_ref, num_lights, slot, 14, zeros1)
            light_color = jnp.where(reached, l_emit, 0.0)

            cos_a = jnp.maximum(dot3(l_normal, normalize3(hit_p - point)), 0.0)
            pdf_light = bsdf_t.safe_div(jnp.ones_like(area), area) / num_lights
            brdfcos = bsdf_t.eval_bsdfcos(mat, frame, wo, sdir)
            contrib = (brdfcos * light_color * cos_a
                       / jnp.maximum(dist2 * pdf_light, TINY))
            finite = jnp.min(jnp.where(_finite(contrib), 1.0, 0.0), axis=0,
                             keepdims=True) > 0.5
            radiance = radiance + jnp.where(live_hit & finite, weight * contrib,
                                            0.0)
            shadow_count = jnp.where(live_hit, 1.0, 0.0)

        # ---- BSDF sampling (CudaUtil.cuh:276-338); wavefront is primal-only,
        # no detach needed (stop_gradient has no effect on the primal anyway)
        if "bsdf" in ablate:
            wi = frame["normal"]
            current_weight = mat["albedo"]
        else:
            wi = bsdf_t.sample_bsdf(mat, frame, wo, u[3], u[4], u[5])
            w1 = bsdf_t.eval_bsdfcos(mat, frame, wo, wi)
            w2 = jnp.maximum(bsdf_t.pdf_bsdf(mat, frame, wo, wi), cfg.pdf_clamp)
            current_weight = w1 / w2

        dead_sample = sqlen3(wi) <= EPS
        cont = live_hit & ~dead_sample
        weight = jnp.where(cont, weight * current_weight, weight)

        # sticky refraction flag (CudaUtil.cuh:307)
        transparent = mat["opacity"] < (1.0 - EPS)
        new_refr = dot3(frame["normal"], wo) * dot3(frame["normal"], wi) <= 0.0
        reassign = cont & transparent
        refracted = (reassign & new_refr) | (~reassign & refracted)

        # next ray (CudaUtil.cuh:349-350)
        org_next = hit_p + frame["normal"] * jnp.where(refracted, -EPS, EPS)
        dir_next = normalize3(wi)
        org = jnp.where(cont, org_next, org)
        dirn = jnp.where(cont, dir_next, dirn)

        # refraction depth exemption + cap `RefractCnt++ > 8` (CudaUtil.cuh:351-359)
        refract_now = cont & refracted
        over_cap = refract_now & (refract_cnt > cfg.refract_cap)
        refract_cnt = refract_cnt + refract_now.astype(jnp.int32)

        # Russian roulette (CudaUtil.cuh:361-373)
        rr_lane = cont & ~refracted & (depth >= cfg.rr_bounce)
        rr_prob = jnp.clip(bsdf_t.max3_t(weight), cfg.rr_stop_prob, 1.0)
        rr_survive = u[6] < rr_prob
        weight = jnp.where(rr_lane & rr_survive, weight / rr_prob, weight)

        depth_next = depth + jnp.where(cont & ~refracted, 1, 0)
        alive_next = (cont & ~over_cap & ~(rr_lane & ~rr_survive)
                      & (depth_next < cfg.max_bounce))
        depth = depth_next

        rays_acc = rays_acc + jnp.where(alive, 1.0, 0.0) + shadow_count

        # ---- film commit + strided regeneration (wavefront.py, static assign)
        died = alive & ~alive_next
        contrib_f = jnp.where(died, radiance, 0.0)
        if k_pix == 1:
            film = film + contrib_f
        else:
            kmod = jnp.remainder((ray_ids - base_path) // lanes_total, k_pix)
            parts = [film[3 * k:3 * k + 3] + jnp.where(kmod == k, contrib_f, 0.0)
                     for k in range(k_pix)]
            film = jnp.concatenate(parts, axis=0)

        # Regeneration considers EVERY non-continuing lane (not only freshly
        # died ones): _run_fused starts all lanes dead with ray_ids one
        # stride behind, so every camera ray - including the first one a
        # lane traces - is generated by THIS code path. (A separate XLA-side
        # init raygen computed the same formulas with different rounding;
        # sphere transport is chaotic enough that the ~1e-7 direction
        # differences became macroscopic per-path divergence between chunked
        # and single launches of the same render.)
        new_idx = ray_ids + lanes_total
        regen = ~alive_next & (new_idx - base_path < total_paths)
        if "regen" in ablate:
            regen = regen & (zeros1 > 1.0)
        new_safe = jnp.where(regen, new_idx, 0)
        pixel = jnp.remainder(new_safe, num_pix) + pix_offset  # GLOBAL px
        px = jnp.remainder(pixel, width).astype(jnp.float32)
        py = (pixel // width).astype(jnp.float32)
        jx, jy = _jitter2(to_global(new_safe), k0, k1)
        sx = 2.0 * ((px + jx) / (width - 1) - 0.5)
        sy = 2.0 * ((py + jy) / (height - 1) - 0.5)
        cam = [cam_ref[0, j] for j in range(14)]
        d = jnp.concatenate(
            [cam[3 + i] + sx * cam[12] * cam[9 + i] - sy * cam[13] * cam[6 + i]
             for i in range(3)], axis=0)
        r_dir = normalize3(d)
        r_org = jnp.concatenate([zeros1 + cam[0], zeros1 + cam[1],
                                 zeros1 + cam[2]], axis=0)

        org = jnp.where(regen, r_org, org)
        dirn = jnp.where(regen, r_dir, dirn)
        radiance = jnp.where(regen | died, 0.0, radiance)
        weight = jnp.where(regen, 1.0, weight)
        depth = jnp.where(regen, 0, depth)
        refract_cnt = jnp.where(regen, 0, refract_cnt)
        refracted = ~regen & refracted
        alive_next = alive_next | regen
        ray_ids = jnp.where(regen, new_safe, ray_ids)
        lane_iter = jnp.where(regen, 0, lane_iter + 1)

        flags_out = (alive_next.astype(jnp.int32)
                     | (refracted.astype(jnp.int32) << 1)
                     | (depth << 2) | (refract_cnt << 8)
                     | (lane_iter << 14))
        return (org, dirn, radiance, weight, film, rays_acc, flags_out,
                ray_ids)

    if "body" in ablate:
        # identity bounce: isolates the pure state-DMA + loop floor from
        # the in-body connective tissue (pan/unpan relayouts, selects)
        one_bounce_fn = lambda c: tuple(x + 0 for x in c)
    else:
        one_bounce_fn = one_bounce

    def store(out):
        (org, dirn, radiance, weight, film, rays_acc, flags,
         ray_ids) = out
        sf_out[0:3] = org
        sf_out[3:6] = dirn
        sf_out[6:9] = radiance
        sf_out[9:12] = weight
        sf_out[12:12 + 3 * k_pix] = film
        sf_out[12 + 3 * k_pix:13 + 3 * k_pix] = rays_acc
        si_out[0:1] = flags
        si_out[1:2] = ray_ids

    if g_inner == 1:
        store(one_bounce_fn(carry0))
    else:
        # STATEFUL inner loop: a functional fori_loop carry of the 22
        # state rows made Mosaic copy the whole tuple every iteration -
        # an identity body alone measured 148 us/iter at 65536 lanes
        # (tools/fused_ablate.py "body" ablation), 55% of the full
        # iteration. Mutating the OUT refs in place (read rows -> compute
        # -> store rows, carry=None) removes the copies.
        store(one_bounce_fn(carry0))

        def load():
            return (sf_out[0:3], sf_out[3:6], sf_out[6:9], sf_out[9:12],
                    sf_out[12:12 + 3 * k_pix],
                    sf_out[12 + 3 * k_pix:13 + 3 * k_pix],
                    si_out[0:1], si_out[1:2])

        def body(_, token):
            store(one_bounce_fn(load()))
            return token

        jax.lax.fori_loop(1, g_inner, body, 0)


@functools.partial(
    jax.jit, static_argnames=("cfg", "lanes", "k_pix", "width", "height",
                              "block_r", "interpret", "ablate", "g_inner",
                              "num_pix_local", "num_pix_total"))
def fused_bounce_step(pack: FusedPack, misc, key2, cam16, sf, si, *,
                      cfg, lanes, k_pix, width, height,
                      block_r: int = 2048, interpret: bool = False,
                      ablate: frozenset = frozenset(), g_inner: int = 1,
                      num_pix_local=None, num_pix_total=None):
    """g_inner wavefront iterations over all lanes. State rows in, state
    rows out; the per-lane ray count accumulates in sf's LAST row.

    State arrays are PANELED (rows, 8, lanes/8): lane (s, j) is flat lane
    s*(lanes/8)+j. A block covers block_l = block_r/8 columns of every
    sublane, i.e. block_r lanes. The state buffers are donated
    (input_output_aliases) - callers must not reuse sf/si after the
    call."""
    block_r = min(block_r, lanes)
    assert lanes % block_r == 0 and block_r % 8 == 0
    block_l = block_r // 8
    lanes_l = lanes // 8
    grid = (lanes_l // block_l,)
    sf_rows = 13 + 3 * k_pix
    t_pad = pack.t_pad

    def smem(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.SMEM)

    def rep(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    def rowblk(nrows):
        return pl.BlockSpec((nrows, 8, block_l), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _bounce_kernel, cfg=cfg, t_pad=t_pad,
        num_spheres=0 if "spheres" in ablate else pack.num_spheres,
        num_lights=pack.num_lights,
        lanes_total=lanes,
        num_pix=(width * height if num_pix_local is None else num_pix_local),
        width=width, height=height, k_pix=k_pix, block_l=block_l,
        num_pix_total=num_pix_total, g_inner=g_inner, ablate=ablate,
        flat_shading=pack.flat_shading)

    sf2, si2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            smem((1, 4)),                      # misc i32 [base, total, pix_offset, pad]
            smem((1, 2)),                      # key u32
            smem((1, 16)),                     # camera f32
            smem(pack.spheres.shape),          # spheres f32
            smem(pack.lights.shape),           # lights f32
            rep((4 * t_pad, 48)),              # m_packed bf16 hi/lo split
            rep((pack.attr_rows, t_pad)),      # attrs hi
            rep((pack.attr_rows, t_pad)),      # attrs mid
            rep((pack.attr_rows, t_pad)),      # attrs lo
            rowblk(sf_rows),                   # state f32 (+rays row)
            rowblk(2),                         # state i32 [flags, ray_ids]
        ],
        out_specs=[rowblk(sf_rows), rowblk(2)],
        out_shape=[
            jax.ShapeDtypeStruct((sf_rows, 8, lanes_l), jnp.float32),
            jax.ShapeDtypeStruct((2, 8, lanes_l), jnp.int32),
        ],
        # NOTE: input_output_aliases={9: 0, 10: 1} was measured ~1.8x
        # SLOWER here (590 vs 323 us/iter at 65536 lanes) - XLA inserts
        # defensive copies around the donated while-carry - so the state
        # buffers are deliberately NOT donated.
        interpret=interpret,
    )(misc, key2, cam16, pack.spheres, pack.lights, pack.m_packed,
      pack.attrs_hi, pack.attrs_mid, pack.attrs_lo, sf, si)
    return sf2, si2


# ---------------------------------------------------------------------------
# driver: fused wavefront render
# ---------------------------------------------------------------------------

def _cam16(camera) -> jnp.ndarray:
    row = np.zeros((1, 16), np.float32)
    row[0, 0:3] = np.asarray(camera.pos)
    row[0, 3:6] = np.asarray(camera.forward)
    row[0, 6:9] = np.asarray(camera.up)
    row[0, 9:12] = np.asarray(camera.right)
    row[0, 12] = np.tan(float(camera.fovx) * 0.5)
    row[0, 13] = np.tan(float(camera.fovy) * 0.5)
    return jnp.asarray(row)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "lanes", "k_pix", "width", "height", "block_r", "interpret",
    "g_inner", "num_pix_local", "num_pix_total"))
def _run_fused(pack, cam16, base_key, spp, sample_offset, *, cfg, lanes,
               k_pix, width, height, block_r, interpret, g_inner=8,
               num_pix_local=None, num_pix_total=None, pix_offset=0):
    num_pix = width * height if num_pix_local is None else num_pix_local
    lanes_l = lanes // 8
    spp = jnp.asarray(spp, jnp.int32)
    base_path = jnp.asarray(sample_offset, jnp.int32) * num_pix
    total_paths = num_pix * spp
    misc = jnp.stack([base_path, total_paths,
                      jnp.asarray(pix_offset, jnp.int32),
                      jnp.zeros_like(base_path)])[None, :]
    key2 = jnp.stack([base_key[0], base_key[1]])[None, :]

    # All lanes start DEAD with ray_ids one stride behind their first
    # path: the kernel's own regeneration issues every camera ray, so
    # initial and regenerated rays are bit-identical regardless of
    # chunking (see the regen comment in _bounce_kernel). Costs one
    # regen-only iteration per launch.
    local0 = jnp.arange(lanes, dtype=jnp.int32).reshape(8, lanes_l)
    sf_rows = 13 + 3 * k_pix
    sf = jnp.zeros((sf_rows, 8, lanes_l), jnp.float32)
    sf = sf.at[3:5].set(1.0)  # nonzero dir placeholder for dead lanes
    si = jnp.zeros((2, 8, lanes_l), jnp.int32)
    si = si.at[1].set(base_path + local0 - lanes)

    def cond(state):
        _, si_c = state
        pool_left = jnp.any(si_c[1] + lanes - base_path < total_paths)
        return jnp.any((si_c[0] & 1) != 0) | pool_left

    def body(state):
        # g_inner bounce iterations run INSIDE one kernel call (see
        # _bounce_kernel): the per-call fixed cost measured ~143 us
        # regardless of lanes/blocks, and the liveness check between
        # calls adds more; overshooting by <= g_inner-1 all-dead
        # iterations per launch is noise against ~400 productive ones.
        sf_c, si_c = state
        return fused_bounce_step(
            pack, misc, key2, cam16, sf_c, si_c, cfg=cfg, lanes=lanes,
            k_pix=k_pix, width=width, height=height, block_r=block_r,
            interpret=interpret, g_inner=g_inner,
            num_pix_local=num_pix_local, num_pix_total=num_pix_total)

    sf, si = jax.lax.while_loop(cond, body, (sf, si))
    rays = jnp.sum(sf[12 + 3 * k_pix])

    film = sf[12:12 + 3 * k_pix].reshape(3 * k_pix, lanes)  # (3K, lanes)
    if k_pix == 1:
        film_pix = film.T                               # lane i -> pixel i%P
        if lanes > num_pix:
            film_pix = film_pix.reshape(lanes // num_pix, num_pix, 3).sum(0)
    else:
        film_pix = film.reshape(k_pix, 3, lanes).transpose(0, 2, 1)
        film_pix = film_pix.reshape(k_pix * lanes, 3)   # pixel = k*lanes + i
    if num_pix_local is not None:
        # sharded slice: flat (num_pix_local, 3) film, assembled by the
        # shard_map caller (parallel/mesh.render_fused_sharded)
        return film_pix.reshape(num_pix, 3) / spp.astype(jnp.float32), rays
    img = film_pix.reshape(height, width, 3) / spp.astype(jnp.float32)
    return img, rays


def auto_fused_config(num_pix: int, target_lanes: int = 65536):
    """(lanes, block_r) satisfying the fused engine's constraints for an
    arbitrary pixel count:

    - film mapping needs lanes % num_pix == 0 or num_pix % lanes == 0,
    - Pallas needs the block's lane dim divisible by 128, i.e.
      block_r % 1024 == 0 and block_r | lanes.

    Powers-of-two pixel counts get the tuned (65536, 2048). Otherwise
    lanes = k * num_pix for the smallest k making lanes 1024-aligned
    (k = 1024 / gcd(num_pix, 1024)), scaled up toward target_lanes."""
    import math

    if target_lanes % num_pix == 0 or num_pix % target_lanes == 0:
        return target_lanes, 2048
    k = 1024 // math.gcd(num_pix, 1024)
    lanes = k * num_pix
    while lanes * 2 <= max(target_lanes, num_pix) * 4:
        lanes *= 2
        k *= 2
    for d in range(8, 0, -1):
        if (lanes // 1024) % d == 0:
            return lanes, 1024 * d
    return lanes, 1024


def render_wavefront_fused(scene, camera, spp, base_key, cfg=None,
                           lanes: int = 65536, chunk_spp: int = 64,
                           block_r: int = 2048, interpret: bool = False,
                           pack: FusedPack = None, g_inner: int = 8):
    """Fused-kernel wavefront render -> ((H, W, 3) image, rays traced).

    Same estimator as render_wavefront (per-path streams keyed by
    (ray_id, path-local iteration)); requires the static strided
    assignment (lanes % num_pix == 0 or num_pix % lanes == 0) and a
    small scene (T_pad <= MAX_TRIS). spp is chunked like
    render_wavefront_chunked, all chunks sharing one compiled program.
    """
    from pathtrace_tpu.integrator.config import IntegratorConfig

    if cfg is None:
        cfg = IntegratorConfig()
    num_pix = camera.width * camera.height
    assert lanes % num_pix == 0 or num_pix % lanes == 0, (lanes, num_pix)
    k_pix = max(1, num_pix // lanes)
    assert k_pix <= 64
    if pack is None:
        pack = build_fused_pack(scene)
    cam16 = _cam16(camera)

    film = np.zeros((camera.height, camera.width, 3), np.float32)
    rays = 0.0
    done = 0
    while done < spp:
        cur = min(chunk_spp, spp - done)
        img, nrays = _run_fused(
            pack, cam16, base_key, np.int32(cur), np.int32(done), cfg=cfg,
            lanes=lanes, k_pix=k_pix, width=camera.width,
            height=camera.height, block_r=block_r, interpret=interpret,
            g_inner=g_inner)
        film = film + np.asarray(img) * cur
        rays += float(nrays)
        done += cur
    return jnp.asarray(film / spp), rays
