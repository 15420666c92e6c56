"""The reference's committed A/B ablations, reproduced as tests.

The reference's de-facto regression practice is comparing rendered
artifacts (SURVEY.md §4): NEE on/off (Img/Render/16spp_NEE.png vs
16spp_woNEE.png) and cosine vs uniform hemisphere sampling
(64sppWithCosineSampling.png vs 64sppWithUniformSampling.png,
SampleHemisphere Bxdf.cuh:23-41). Here both are statistical assertions:
same converged mean, strictly higher variance for the weaker technique.
"""

import numpy as np
import pytest

from pathtrace_tpu import render
from pathtrace_tpu.integrator.config import IntegratorConfig
from pathtrace_tpu.models import procedural
from pathtrace_tpu.utils import rng


def _per_seed_images(scene, cam, cfg, spp, seeds):
    return np.stack([np.asarray(render(scene, cam, spp, rng.make_key(s),
                                       cfg)) for s in seeds])


@pytest.fixture(scope="module")
def scene_cam():
    return (procedural.cornell_box_scene(include_spheres=False).with_mt(),
            procedural.default_camera(16, 16))


def test_uniform_hemisphere_same_mean_higher_variance(scene_cam):
    """--hemisphere uniform must converge to the SAME image (unbiased via
    the 1/(2*pi) pdf) with HIGHER variance (the reference's visual A/B
    point at 64 spp)."""
    scene, cam = scene_cam
    seeds = [1, 2, 3, 4]
    cos_cfg = IntegratorConfig()
    uni_cfg = IntegratorConfig(hemisphere="uniform")
    cos_imgs = _per_seed_images(scene, cam, cos_cfg, 32, seeds)
    uni_imgs = _per_seed_images(scene, cam, uni_cfg, 32, seeds)

    cos_mean, uni_mean = cos_imgs.mean(), uni_imgs.mean()
    assert abs(cos_mean - uni_mean) / cos_mean < 0.05, (cos_mean, uni_mean)

    # across-seed per-pixel variance, averaged over the film
    cos_var = cos_imgs.var(axis=0).mean()
    uni_var = uni_imgs.var(axis=0).mean()
    # measured ~1.45x on this config (NEE carries much of the direct
    # light, softening the gap vs the reference's NEE-free A/B images)
    assert uni_var > 1.2 * cos_var, (cos_var, uni_var)


def test_nee_off_ablation(scene_cam):
    """README.md:56-58 A/B: the --no-nee estimator drops the additive NEE
    term (which the reference deliberately double-counts on direct
    light), so NEE-on is strictly brighter but structurally the same
    image. (A variance gap, the reference's visual point at 16 spp, is
    config-dependent: on this box the big easy-to-hit ceiling light makes
    BSDF-only direct sampling competitive, and the double-count adds its
    own variance - measured ~parity at 32 spp, so only the estimator
    relationship is asserted.)"""
    scene, cam = scene_cam
    seeds = [1, 2, 3]
    on = _per_seed_images(scene, cam, IntegratorConfig(), 32, seeds)
    off = _per_seed_images(scene, cam, IntegratorConfig(nee=False), 32,
                           seeds)
    assert np.isfinite(on).all() and np.isfinite(off).all()
    ratio = on.mean() / off.mean()
    assert 1.0 < ratio < 2.5, ratio
    # same structure: strong per-pixel correlation between the estimators
    a = on.mean(axis=0).ravel()
    b = off.mean(axis=0).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.95, corr


def test_cross_engine_statistical_256spp():
    """Megakernel vs wavefront at 256 spp: identical per-path estimators
    scheduled differently must agree pixelwise to float-sum reordering
    (VERDICT r2: the previous goldens never exceeded 8 spp)."""
    from pathtrace_tpu.integrator.wavefront import render_wavefront

    scene = procedural.cornell_box_scene(include_spheres=True).with_mt()
    cam = procedural.default_camera(12, 12)
    key = rng.make_key(11)
    img_mk = np.asarray(render(scene, cam, 256, key))
    img_wf = np.asarray(render_wavefront(scene, cam, 256, key, lanes=576))
    np.testing.assert_allclose(img_wf, img_mk, rtol=5e-4, atol=5e-4)
