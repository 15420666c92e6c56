"""Pallas pair-block traversal kernel vs the brute-force oracle.

Runs the kernel in interpret mode on CPU (pairs with the on-TPU numbers
in tools/mesh_kernel_bench.py); semantics must match raycast_brute and
the XLA binned path on real mesh geometry, including the overflow
fallback and the lean shadow mode's winner identity.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pathtrace_tpu.accel import binned
from pathtrace_tpu.models import procedural
from pathtrace_tpu.ops.intersect import raycast_brute


def _rays(n, seed, lo=-25.0, hi=45.0):
    rng = np.random.default_rng(seed)
    org = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


@pytest.fixture(scope="module")
def scene():
    return procedural.sphere_mesh_scene(subdivisions=4).with_binned(
        max_tris=128).to_device()


def _pallas_closest(scene, org, d, k_max=16):
    r = org.shape[0]
    t_min = jnp.zeros((r,), jnp.float32)
    t_max = jnp.full((r,), 999999.0, jnp.float32)
    return binned.raycast_binned_pallas(scene, org, d, t_min, t_max,
                                        k_max=k_max, interpret=True)


def test_pair_kernel_matches_brute(scene):
    org, d = _rays(512, 0)
    a = raycast_brute(scene, org, d)
    hit, t, gid, u, v, overflow = _pallas_closest(scene, org, d)
    assert np.asarray(overflow).mean() == 0.0
    agree = np.asarray(a.hit) == np.asarray(hit)
    assert agree.mean() > 0.995, agree.mean()
    both = np.asarray(a.hit) & np.asarray(hit) & agree
    np.testing.assert_allclose(np.asarray(a.t)[both], np.asarray(t)[both],
                               rtol=1e-4, atol=1e-3)
    same = np.asarray(a.prim_id)[both] == np.asarray(gid)[both]
    assert same.mean() > 0.995


def test_pair_kernel_matches_xla_binned(scene):
    """t and winning prim agree with the XLA binned path (u/v are
    placeholder zeros in the lean gather-back; raycast_binned_v2
    recomputes them differentiably at gid via mt_gather)."""
    org, d = _rays(256, 3)
    r = org.shape[0]
    t_min = jnp.zeros((r,), jnp.float32)
    t_max = jnp.full((r,), 999999.0, jnp.float32)
    xh, xt, xi, xu, xv, xo = binned.raycast_binned_closest(
        scene.clusters, org, d, t_min, t_max, k_max=48)
    assert np.asarray(xo).mean() == 0.0
    hit, t, gid, _, _, vo = _pallas_closest(scene, org, d)
    ok = ~np.asarray(vo)   # overflow rays are repaired one level up
    agree = (np.asarray(xh) == np.asarray(hit))[ok]
    assert agree.mean() > 0.995
    both = (np.asarray(xh) & np.asarray(hit) & (np.asarray(xh)
            == np.asarray(hit))) & ok
    np.testing.assert_allclose(np.asarray(xt)[both], np.asarray(t)[both],
                               rtol=1e-4, atol=1e-3)
    same_prim = np.asarray(xi)[both] == np.asarray(gid)[both]
    assert same_prim.mean() > 0.995


def test_raycast_binned_v2_hitrecord(scene):
    """Full HitRecord path (finalize + differentiable recompute)."""
    import functools
    org, d = _rays(256, 4)
    a = raycast_brute(scene, org, d)
    with jax.disable_jit():  # interpret-mode pallas inside jit is slow
        h = _v2_interpret(scene, org, d)
    agree = np.asarray(a.hit) == np.asarray(h.hit)
    assert agree.mean() > 0.995
    both = np.asarray(a.hit) & np.asarray(h.hit) & agree
    np.testing.assert_allclose(np.asarray(a.t)[both], np.asarray(h.t)[both],
                               rtol=1e-4, atol=1e-3)
    # shading attributes come from the same finalize_hit as every backend
    n = np.asarray(h.normal)[both]
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-3)


def _v2_interpret(scene, org, d):
    """raycast_binned_v2 with the kernel in interpret mode."""
    from unittest import mock
    from pathtrace_tpu.ops.pallas import pair_kernel

    orig = pair_kernel.pair_blocks_search

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    with mock.patch.object(pair_kernel, "pair_blocks_search", patched):
        return binned.raycast_binned_v2(scene, org, d)


def test_shadow_mode_winner_identity(scene):
    """Shadow mode returns the same winning prim id as closest mode."""
    org, d = _rays(256, 5)
    r = org.shape[0]
    t_min = jnp.zeros((r,), jnp.float32)
    t_max = jnp.full((r,), 999999.0, jnp.float32)
    ch, _, cg, _, _, _ = _pallas_closest(scene, org, d)
    sh, st, sg, _, _, _ = binned.raycast_binned_pallas(
        scene, org, d, t_min, t_max, k_max=16, mode="shadow",
        interpret=True)
    # closest gates by exact recompute; shadow keeps banded accepts, so
    # compare only where both agree on hit
    both = np.asarray(ch) & np.asarray(sh)
    same = np.asarray(cg)[both] == np.asarray(sg)[both]
    assert same.mean() > 0.99


def test_pair_dispatch_structure(scene):
    """Every valid pair lands in a block of its own cluster."""
    org, d = _rays(128, 6)
    r = org.shape[0]
    from pathtrace_tpu.accel.traverse import safe_inv_dir
    t_min = jnp.zeros((r,), jnp.float32)
    t_max = jnp.full((r,), 999999.0, jnp.float32)
    hit_m, tnear = binned._slab_all(org, safe_inv_dir(d),
                                    scene.clusters.bmin, scene.clusters.bmax,
                                    t_min, t_max)
    b = 128
    disp = binned.build_pair_dispatch(scene.clusters, hit_m, tnear, 16, b)
    slot_ray = np.asarray(disp["slot_ray"])
    bc = np.asarray(disp["block_cluster"])
    bps = np.asarray(disp["block_prim_start"])
    slot_of = np.asarray(disp["slot_of"])
    pv = np.asarray(disp["pair_valid"])
    overflow = np.asarray(disp["overflow"])
    hm = np.asarray(hit_m)
    ps = np.asarray(scene.clusters.prim_start)
    cap = slot_ray.shape[0]
    for s in np.nonzero(slot_ray >= 0)[0]:
        blk = s // b
        assert bps[blk] >= 0
        assert hm[slot_ray[s], bc[blk]], (s, slot_ray[s], bc[blk])
        assert bps[blk] == ps[bc[blk]]
    # every valid (ray, cluster) pair appears exactly once, up to the
    # per-ray k_max cap (capped rays are flagged overflow)
    n_pairs_mask = int(np.minimum(hm.sum(axis=1), 16).sum())
    assert (slot_ray >= 0).sum() == n_pairs_mask
    assert (overflow == (hm.sum(axis=1) > 16)).all()
    # the inverse map points each valid (r, k) at a slot holding r
    rr, kk = np.nonzero(pv)
    assert (slot_of[rr, kk] < cap).all()
    assert (slot_ray[slot_of[rr, kk]] == rr).all()
    assert pv.sum() == n_pairs_mask


def test_raycast_binned_v3_hitrecord_packed_tail():
    """v3 over KD cells + the one-gather packed shading tail
    (finalize_hit_packed): every HitRecord field matches the brute
    raycast's generic finalize on a tri-only KD scene."""
    scene = procedural.sphere_mesh_scene(subdivisions=4).with_kd_binned(
        max_tris=128)
    assert scene.geom_pack is not None and scene.num_spheres == 0
    org, d = _rays(256, 6)
    a = raycast_brute(scene, org, d)
    with jax.disable_jit():  # interpret-mode pallas inside jit is slow
        h = _v3_interpret(scene, org, d)
    agree = np.asarray(a.hit) == np.asarray(h.hit)
    assert agree.mean() > 0.995
    both = np.asarray(a.hit) & np.asarray(h.hit) & agree
    for field, tol in (("t", 1e-3), ("p", 1e-3), ("normal", 1e-4),
                       ("tangent", 1e-4), ("bitangent", 1e-4),
                       ("uv", 1e-5)):
        np.testing.assert_allclose(
            np.asarray(getattr(a, field))[both],
            np.asarray(getattr(h, field))[both], rtol=1e-4, atol=tol,
            err_msg=field)
    assert np.array_equal(np.asarray(a.prim_id)[both],
                          np.asarray(h.prim_id)[both])
    for f in ("emittance", "albedo", "specular", "opacity", "roughness",
              "metallic"):
        np.testing.assert_allclose(
            np.asarray(getattr(a.mat, f))[both],
            np.asarray(getattr(h.mat, f))[both], err_msg=f)


def _v3_interpret(scene, org, d):
    from unittest import mock
    from pathtrace_tpu.ops.pallas import pair_kernel

    orig = pair_kernel.pair_blocks_search

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    with mock.patch.object(pair_kernel, "pair_blocks_search", patched):
        return binned.raycast_binned_v3(scene, org, d)
