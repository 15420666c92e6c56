"""Binned two-level traversal vs brute-force oracle."""

import numpy as np
import jax.numpy as jnp

from pathtrace_tpu.accel.binned import raycast_binned, raycast_binned_closest
from pathtrace_tpu.models import procedural
from pathtrace_tpu.ops.intersect import raycast_brute


def _rays(n, seed, lo=-25.0, hi=45.0):
    rng = np.random.default_rng(seed)
    org = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


def test_binned_matches_brute_dense_mesh():
    scene = procedural.sphere_mesh_scene(subdivisions=4).with_binned(
        max_tris=128)
    assert scene.clusters.num_clusters > 4
    org, d = _rays(512, 0)
    a = raycast_brute(scene, org, d)
    b = raycast_binned(scene, org, d)
    agree = np.asarray(a.hit) == np.asarray(b.hit)
    assert agree.mean() > 0.995, agree.mean()
    both = np.asarray(a.hit) & np.asarray(b.hit) & agree
    np.testing.assert_allclose(np.asarray(a.t)[both], np.asarray(b.t)[both],
                               rtol=1e-4, atol=1e-3)
    same = np.asarray(a.prim_id)[both] == np.asarray(b.prim_id)[both]
    assert same.mean() > 0.995


def test_binned_overflow_fallback_correct():
    """Tiny k_max forces overflow; the exact fallback must keep results
    correct."""
    scene = procedural.sphere_mesh_scene(subdivisions=3).with_binned(
        max_tris=64)
    org, d = _rays(256, 1)
    a = raycast_brute(scene, org, d)
    b = raycast_binned(scene, org, d, k_max=1)
    agree = np.asarray(a.hit) == np.asarray(b.hit)
    assert agree.mean() > 0.995, agree.mean()
    both = np.asarray(a.hit) & np.asarray(b.hit) & agree
    np.testing.assert_allclose(np.asarray(a.t)[both], np.asarray(b.t)[both],
                               rtol=1e-4, atol=1e-3)


def test_binned_overflow_rate_low():
    scene = procedural.sphere_mesh_scene(subdivisions=4).with_binned(
        max_tris=128)
    org, d = _rays(1024, 2)
    from pathtrace_tpu.accel.traverse import safe_inv_dir
    t_min = jnp.zeros((1024,))
    t_max = jnp.full((1024,), 999999.0)
    *_, overflow = raycast_binned_closest(scene.clusters, org, d, t_min,
                                          t_max, k_max=8)
    assert np.asarray(overflow).mean() < 0.15


def test_binned_render_matches():
    from pathtrace_tpu import render
    from pathtrace_tpu.utils import rng as prng
    from functools import partial
    from pathtrace_tpu.accel.binned import raycast_binned as rb

    scene = procedural.sphere_mesh_scene(subdivisions=3)
    scene_b = scene.with_binned(max_tris=64)
    cam = procedural.default_camera(12, 12)
    a = np.asarray(render(scene, cam, 2, prng.make_key(0)))
    b = np.asarray(render(scene_b, cam, 2, prng.make_key(0),
                          raycast_fn=rb))
    close = np.isclose(a, b, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.98, close.mean()
