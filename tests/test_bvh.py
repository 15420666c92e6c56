"""SAH BVH builder invariants + traversal vs brute-force oracle
(SURVEY.md §4: every prim in exactly one leaf, parent AABB ⊇ children,
hit-for-hit agreement on random ray sets)."""

import numpy as np
import jax.numpy as jnp

from pathtrace_tpu.accel.bvh import build_bvh, validate_bvh
from pathtrace_tpu.accel.traverse import raycast_bvh
from pathtrace_tpu.models import procedural
from pathtrace_tpu.ops.intersect import raycast_brute


def _positions(scene):
    return np.stack([np.asarray(scene.tris.v0), np.asarray(scene.tris.v1),
                     np.asarray(scene.tris.v2)], axis=1)


def test_build_invariants_cornell():
    scene = procedural.cornell_box_scene()
    pos = _positions(scene)
    bvh, order = build_bvh(pos)
    validate_bvh(bvh, pos, order)
    assert bvh.max_leaf <= 4


def test_build_invariants_dense_mesh():
    pos = procedural.icosphere(radius=2.0, center=(0, 1, 0), subdivisions=4)
    bvh, order = build_bvh(pos)
    validate_bvh(bvh, pos, order)
    # sanity: log-ish depth for ~5k tris
    assert bvh.max_depth < 64


def _random_rays(n, seed, lo=-25.0, hi=45.0):
    rng = np.random.default_rng(seed)
    org = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


def test_traversal_matches_brute_force():
    scene = procedural.cornell_box_scene(include_spheres=True)
    scene_bvh = scene.with_bvh()
    org, d = _random_rays(512, 0)

    brute = raycast_brute(scene_bvh, org, d)  # same (reordered) scene
    tree = raycast_bvh(scene_bvh, org, d)

    np.testing.assert_array_equal(np.asarray(brute.hit), np.asarray(tree.hit))
    hit = np.asarray(brute.hit)
    np.testing.assert_allclose(np.asarray(brute.t)[hit],
                               np.asarray(tree.t)[hit], rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(brute.prim_id)[hit],
                                  np.asarray(tree.prim_id)[hit])
    np.testing.assert_allclose(np.asarray(brute.normal)[hit],
                               np.asarray(tree.normal)[hit], atol=1e-5)


def test_traversal_matches_brute_force_dense():
    scene = procedural.sphere_mesh_scene(subdivisions=3)
    scene_bvh = scene.with_bvh()
    org, d = _random_rays(256, 1)
    brute = raycast_brute(scene_bvh, org, d)
    tree = raycast_bvh(scene_bvh, org, d)
    np.testing.assert_array_equal(np.asarray(brute.hit), np.asarray(tree.hit))
    hit = np.asarray(brute.hit)
    np.testing.assert_allclose(np.asarray(brute.t)[hit],
                               np.asarray(tree.t)[hit], rtol=1e-5, atol=1e-4)


def test_render_with_bvh_matches_brute():
    """Full renders (same seeds) through BVH vs brute paths must agree."""
    from pathtrace_tpu import render
    from pathtrace_tpu.utils import rng as prng

    scene = procedural.cornell_box_scene()
    scene_bvh = scene.with_bvh()
    cam = procedural.default_camera(16, 16)
    img_tree = np.asarray(render(scene_bvh, cam, 2, prng.make_key(3)))
    img_brute = np.asarray(render(scene_bvh, cam, 2, prng.make_key(3),
                                  raycast_fn=raycast_brute))
    np.testing.assert_allclose(img_tree, img_brute, rtol=1e-4, atol=1e-4)
