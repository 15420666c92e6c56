"""End-to-end smoke tests (the reference's only test-like artifact is a
vector-add benchmark, cudaTest.cu:69-118; we do better per SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pathtrace_tpu import Camera, render
from pathtrace_tpu.models import procedural
from pathtrace_tpu.integrator.config import IntegratorConfig
from pathtrace_tpu.utils import rng


def test_devices_visible():
    assert len(jax.devices()) >= 1


@pytest.fixture(scope="module")
def cornell():
    return procedural.cornell_box_scene()


def test_cornell_smoke_render(cornell):
    cam = procedural.default_camera(32, 32)
    img = render(cornell, cam, 4, rng.make_key(0))
    img = np.asarray(img)
    assert img.shape == (32, 32, 3)
    assert np.all(np.isfinite(img))
    assert img.mean() > 0.01, "image should not be black"
    assert img.max() > 0.5, "light should be visible/bright"


def test_render_deterministic(cornell):
    cam = procedural.default_camera(16, 16)
    a = np.asarray(render(cornell, cam, 2, rng.make_key(7)))
    b = np.asarray(render(cornell, cam, 2, rng.make_key(7)))
    np.testing.assert_array_equal(a, b)


def test_render_seed_sensitivity(cornell):
    cam = procedural.default_camera(16, 16)
    a = np.asarray(render(cornell, cam, 2, rng.make_key(1)))
    b = np.asarray(render(cornell, cam, 2, rng.make_key(2)))
    assert np.abs(a - b).max() > 0.0


def test_nee_reduces_variance(cornell):
    """NEE on vs off A/B, the reference's README experiment (README.md:56-58).
    On diffuse surfaces lit directly by the area light (the floor), NEE
    should sharply reduce relative noise at equal spp. Note NEE-on is
    *brighter* by design: the reference double-counts direct light
    (additive NEE + emissive hit without MIS, CudaUtil.cuh:220-224+272),
    so we compare coefficient of variation, not absolute variance."""
    cam = procedural.default_camera(24, 24)
    spp = 4
    on = IntegratorConfig(nee=True)
    off = IntegratorConfig(nee=False)
    imgs_on, imgs_off = [], []
    for seed in range(6):
        imgs_on.append(np.asarray(render(cornell, cam, spp, rng.make_key(seed),
                                         on)))
        imgs_off.append(np.asarray(render(cornell, cam, spp,
                                          rng.make_key(seed), off)))

    def floor_cv(imgs):
        # bottom third of the image = floor, diffuse, directly lit
        region = np.stack(imgs)[:, 16:, :, :]
        return (region.std(axis=0) / np.maximum(region.mean(axis=0), 1e-3)).mean()

    assert floor_cv(imgs_on) < floor_cv(imgs_off)


def test_emissive_pixels_bright(cornell):
    """Pixels looking straight at the light should carry ~the emittance."""
    cam = procedural.default_camera(48, 48)
    img = np.asarray(render(cornell, cam, 2, rng.make_key(0)))
    # the light is at the ceiling center: top-middle of the image
    top = img[: img.shape[0] // 4, img.shape[1] // 3: 2 * img.shape[1] // 3]
    assert top.max() > 5.0
