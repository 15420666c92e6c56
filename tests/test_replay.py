"""Compact path-record replay backward (diff/replay.py).

Pins the north-star capability: "backward pass replaying BVH hits from a
compact path record". Three contracts:
  (a) replay primal == record primal (and == megakernel primal),
  (b) replay gradients == scan-AD gradients (diff/grad.py) to ~1e-5,
  (c) the record stores O(R) discrete outcomes only (no (R, T) residual).
Reference estimator being differentiated: GetColor_iter
(CudaUtil.cuh:193-382).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu.diff import material_grads, material_grads_replay
from pathtrace_tpu.diff.replay import record_paths, replay_paths
from pathtrace_tpu.integrator.config import IntegratorConfig
from pathtrace_tpu.integrator.megakernel import trace_paths
from pathtrace_tpu.integrator.render import render
from pathtrace_tpu.models import procedural
from pathtrace_tpu.utils import rng


@pytest.fixture(scope="module")
def scene():
    return procedural.cornell_box_scene(include_spheres=True).with_mt()


@pytest.fixture(scope="module")
def camera():
    return procedural.default_camera(12, 12)


def _camera_rays(camera, sample_idx, base_key):
    px, py = camera.pixel_grid()
    num_pix = px.shape[0]
    ray_ids = sample_idx * num_pix + jnp.arange(num_pix, dtype=jnp.int32)
    ju = rng.pixel_jitter(base_key, ray_ids)
    dirs = camera.ray_directions(px, py, ju[:, 0], ju[:, 1])
    org = jnp.broadcast_to(camera.pos, dirs.shape)
    return org, dirs, ray_ids


def test_replay_primal_matches_record_and_megakernel(scene, camera):
    cfg = IntegratorConfig()
    key = rng.make_key(7)
    org, dirs, ray_ids = _camera_rays(camera, 0, key)

    rad_rec, records = jax.jit(record_paths, static_argnames=("cfg",))(
        scene, org, dirs, ray_ids, key, cfg)
    rad_rep = jax.jit(replay_paths, static_argnames=("cfg",))(
        scene, records, org, dirs, ray_ids, key, cfg)
    rad_mk = trace_paths(scene, org, dirs, ray_ids, key, cfg)

    # same winner recompute (mt_gather) in both paths; the two programs
    # compile to different fusions, so agreement is up to float
    # reassociation, not bit-for-bit
    np.testing.assert_allclose(np.asarray(rad_rep), np.asarray(rad_rec),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rad_rec), np.asarray(rad_mk),
                               rtol=1e-5, atol=1e-4)


def test_record_is_compact(scene, camera):
    """The tape must hold only O(R) discrete outcomes per bounce - the
    whole point of replay vs storing scan activations."""
    cfg = IntegratorConfig()
    key = rng.make_key(7)
    org, dirs, ray_ids = _camera_rays(camera, 0, key)
    _, records = record_paths(scene, org, dirs, ray_ids, key, cfg)

    r = org.shape[0]
    assert set(records) == {"hit", "pid", "sph", "s_hit", "s_pid", "s_sph"}
    for name, arr in records.items():
        assert arr.shape == (cfg.max_iters, r), (name, arr.shape)
        assert arr.dtype in (jnp.int32, jnp.bool_), (name, arr.dtype)


def test_replay_grads_match_scan_ad(scene, camera):
    """Summed pixel gradients: record/replay vs plain scan-AD through the
    megakernel, on the ALL-LOBES scene (refractive/metal spheres).

    material_grads (render) and material_grads_replay compile to different
    XLA programs; float reassociation between them can flip knife-edge
    discrete decisions inside the transparent-sphere lobes (sample kills,
    reflect/refract picks) on ~1 late-bounce lane per 144x2 paths, each
    worth ~1e-4..1e-3 of radiance. Gradients of such a lane legitimately
    differ between the two (both unbiased) realizations, so this test
    asserts at GLOBAL-scale tolerance; the tight per-element contract is
    pinned on the flip-free diffuse configuration below."""
    cfg = IntegratorConfig()
    key = rng.make_key(3)
    spp = 2

    g_tri, g_sph, loss = material_grads(scene, camera, spp, key, cfg=cfg)
    g_tri_r, g_sph_r, img_r = material_grads_replay(scene, camera, spp, key,
                                                    cfg)

    img = render(scene, camera, spp, key, cfg)
    # a realization flip on one late-bounce lane is worth ~1e-3 radiance
    np.testing.assert_allclose(np.asarray(img_r), np.asarray(img),
                               rtol=1e-4, atol=5e-3)

    for name in ("albedo", "emittance", "specular", "roughness", "metallic",
                 "opacity"):
        a = np.asarray(getattr(g_tri, name))
        b = np.asarray(getattr(g_tri_r, name))
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=1e-4 * scale,
                                   err_msg=f"tri.{name}")
        a = np.asarray(getattr(g_sph, name))
        b = np.asarray(getattr(g_sph_r, name))
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=1e-4 * scale,
                                   err_msg=f"sph.{name}")


@pytest.fixture(scope="module")
def diffuse_scene():
    """Single-lobe (gltfpbr) Cornell: no transparent/metal spheres, so the
    only cross-program knife edges left are ~1e-7-probability sample
    coincidences - realizations match deterministically (verified over
    many seeds), enabling per-element gradient assertions."""
    return procedural.cornell_box_scene(include_spheres=False).with_mt()


def test_replay_grads_per_element_diffuse(diffuse_scene, camera):
    """Tight per-element contract: same realization -> same gradients.

    The primal-equality precondition proves the realizations matched; if
    an XLA upgrade ever introduces a flip here, it fails with a clear
    message rather than a mysterious gradient mismatch."""
    cfg = IntegratorConfig()
    key = rng.make_key(7)
    spp = 2

    g_tri, _, _ = material_grads(diffuse_scene, camera, spp, key, cfg=cfg)
    g_tri_r, _, img_r = material_grads_replay(diffuse_scene, camera, spp,
                                              key, cfg)
    img = render(diffuse_scene, camera, spp, key, cfg)
    np.testing.assert_allclose(
        np.asarray(img_r), np.asarray(img), rtol=0, atol=1e-5,
        err_msg="realizations diverged (cross-program discrete flip); "
                "per-element gradient comparison is only meaningful on "
                "matching realizations")

    for name in ("albedo", "emittance", "specular", "roughness", "metallic",
                 "opacity"):
        a = np.asarray(getattr(g_tri, name))
        b = np.asarray(getattr(g_tri_r, name))
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-7 * scale,
                                   err_msg=f"tri.{name}")


def test_replay_weighted_loss_grad(diffuse_scene, camera):
    """loss_grad_img plumbs a non-uniform pixel weighting (the L2-loss
    use case: loss_grad = 2*(img-target)); per-element tight on the
    flip-free diffuse configuration (see above)."""
    cfg = IntegratorConfig()
    key = rng.make_key(11)
    w = jnp.linspace(0.0, 1.0, camera.width * camera.height * 3)
    w = w.reshape(camera.height, camera.width, 3)

    g_tri, _, _ = material_grads(
        diffuse_scene, camera, 1, key,
        loss_fn=lambda img: jnp.sum(img * w), cfg=cfg)
    g_tri_r, _, img_r = material_grads_replay(diffuse_scene, camera, 1, key,
                                              cfg, loss_grad_img=w)
    img = render(diffuse_scene, camera, 1, key, cfg)
    np.testing.assert_allclose(
        np.asarray(img_r), np.asarray(img), rtol=0, atol=1e-5,
        err_msg="realizations diverged (cross-program discrete flip)")

    a = np.asarray(g_tri.albedo)
    b = np.asarray(g_tri_r.albedo)
    scale = max(np.abs(a).max(), 1e-6)
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-7 * scale)
