"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4):
shard-invariance (N-device render == 1-device render given identical
keys) and distributed gradient steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu.models import procedural
from pathtrace_tpu.parallel import (make_ray_mesh, render_grad_sharded,
                                    render_sharded)
from pathtrace_tpu.utils import rng


@pytest.fixture(scope="module")
def setup():
    scene = procedural.cornell_box_scene().with_bvh()
    cam = procedural.default_camera(16, 16)
    return scene, cam


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_shard_invariance(setup):
    scene, cam = setup
    key = rng.make_key(0)
    mesh1 = make_ray_mesh(1)
    mesh8 = make_ray_mesh(8)
    img1 = np.asarray(render_sharded(scene, cam, 4, key, mesh1))
    img8 = np.asarray(render_sharded(scene, cam, 4, key, mesh8))
    np.testing.assert_allclose(img1, img8, rtol=2e-5, atol=2e-5)


def test_grad_sharded_runs_and_improves(setup):
    """Distributed grad step: loss and psum'd grads are replicated and
    finite; one SGD step on albedo decreases the loss."""
    scene, cam = setup
    key = rng.make_key(1)
    mesh = make_ray_mesh(8)
    target = render_sharded(scene, cam, 4, rng.make_key(99), mesh)

    # perturb the scene's albedo so there is something to recover
    import dataclasses
    mat = dataclasses.replace(scene.mat, albedo=scene.mat.albedo * 0.5)
    scene_p = dataclasses.replace(scene, mat=mat)

    loss0, (g_tri, g_sph) = render_grad_sharded(scene_p, cam, target, 4, key,
                                                mesh)
    assert np.isfinite(float(loss0))
    assert np.isfinite(np.asarray(g_tri.albedo)).all()

    lr = 1e-4
    mat2 = dataclasses.replace(mat, albedo=mat.albedo - lr * g_tri.albedo)
    scene_p2 = dataclasses.replace(scene_p, mat=mat2)
    loss1, _ = render_grad_sharded(scene_p2, cam, target, 4, key, mesh)
    assert float(loss1) < float(loss0)
