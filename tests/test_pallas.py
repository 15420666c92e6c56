"""Pallas fused intersection kernel vs the XLA matmul path (interpret
mode on CPU; compiled on TPU by the bench)."""

import numpy as np
import jax.numpy as jnp

from pathtrace_tpu.models import procedural
from pathtrace_tpu.ops.mt_matmul import mt_matmul_closest
from pathtrace_tpu.ops.pallas.intersect_kernel import mt_closest_pallas


def _rays(n, seed):
    rng = np.random.default_rng(seed)
    org = rng.uniform(-25.0, 45.0, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


def test_pallas_matches_matmul():
    scene = procedural.cornell_box_scene().with_mt()
    org, d = _rays(300, 0)  # odd count exercises ray padding
    t_min = jnp.zeros((300,))
    t_max = jnp.full((300,), 999999.0)
    hit_a, t_a, idx_a, u_a, v_a = mt_matmul_closest(scene.mt, org, d,
                                                    t_min, t_max)
    hit_b, t_b, idx_b, u_b, v_b = mt_closest_pallas(
        scene.mt, org, d, t_min, t_max, block_r=128, block_t=128,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(hit_a), np.asarray(hit_b))
    h = np.asarray(hit_a)
    np.testing.assert_allclose(np.asarray(t_a)[h], np.asarray(t_b)[h],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx_a)[h], np.asarray(idx_b)[h])
    np.testing.assert_allclose(np.asarray(u_a)[h], np.asarray(u_b)[h],
                               rtol=1e-4, atol=1e-5)


def test_pallas_multi_block_tris():
    """Dense mesh spanning several triangle blocks."""
    scene = procedural.sphere_mesh_scene(subdivisions=3).with_mt()
    org, d = _rays(128, 1)
    t_min = jnp.zeros((128,))
    t_max = jnp.full((128,), 999999.0)
    hit_a, t_a, idx_a, _, _ = mt_matmul_closest(scene.mt, org, d, t_min,
                                                t_max)
    hit_b, t_b, idx_b, _, _ = mt_closest_pallas(
        scene.mt, org, d, t_min, t_max, block_r=128, block_t=512,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(hit_a), np.asarray(hit_b))
    h = np.asarray(hit_a)
    np.testing.assert_allclose(np.asarray(t_a)[h], np.asarray(t_b)[h],
                               rtol=1e-5, atol=1e-4)


def test_pallas_raycast_render():
    """Full render through the Pallas raycast (interpret) matches matmul."""
    from functools import partial
    from pathtrace_tpu import render
    from pathtrace_tpu.ops.pallas.intersect_kernel import raycast_pallas
    from pathtrace_tpu.utils import rng as prng

    scene = procedural.cornell_box_scene().with_mt()
    cam = procedural.default_camera(8, 8)
    a = np.asarray(render(scene, cam, 2, prng.make_key(0)))
    rp = partial(raycast_pallas, interpret=True)
    rp.__name__ = "raycast_pallas_interp"
    b = np.asarray(render(scene, cam, 2, prng.make_key(0),
                          raycast_fn=rp))
    close = np.isclose(a, b, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.99
