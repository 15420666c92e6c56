"""Golden-image regression tests.

The reference's de-facto regression suite is its committed render
artifacts (Img/Render/*, SURVEY.md §4); ours are small linear-space .npy
films with fixed seeds. Regenerate via tests/golden/README if the
estimator changes DELIBERATELY; any unintentional drift fails here.

Tolerances are loose enough for XLA version/fusion reordering but tight
enough to catch semantic changes (which shift pixel values by >> 1%).
"""

import os

import numpy as np
import pytest

from pathtrace_tpu import render
from pathtrace_tpu.models import procedural
from pathtrace_tpu.utils import rng

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _compare(img, golden_name):
    ref = np.load(os.path.join(GOLDEN, golden_name))
    img = np.asarray(img)
    assert img.shape == ref.shape
    # per-pixel: nearly all pixels must match closely; mean must be tight
    close = np.isclose(img, ref, rtol=5e-3, atol=5e-3)
    assert close.mean() > 0.999, f"pixel agreement {close.mean()}"
    assert abs(img.mean() - ref.mean()) / ref.mean() < 1e-3


def test_cornell_golden():
    scene = procedural.cornell_box_scene()
    img = render(scene, procedural.default_camera(32, 32), 8,
                 rng.make_key(123))
    _compare(img, "cornell_32x32_8spp_seed123.npy")


def test_glass_golden():
    scene = procedural.glass_scene()
    img = render(scene, procedural.default_camera(24, 24), 8, rng.make_key(7))
    _compare(img, "glass_24x24_8spp_seed7.npy")


def test_cornell_golden_via_accel_paths():
    """The BVH and MT-matmul backends must reproduce the same film."""
    scene = procedural.cornell_box_scene().with_bvh().with_mt()
    img = render(scene, procedural.default_camera(32, 32), 8,
                 rng.make_key(123))
    _compare(img, "cornell_32x32_8spp_seed123.npy")


def test_cornell_golden_via_wavefront():
    """The wavefront engine reproduces the committed megakernel golden
    (same per-path estimator, different scheduler; film sums reorder)."""
    from pathtrace_tpu.integrator.wavefront import render_wavefront

    scene = procedural.cornell_box_scene().with_mt()
    img = render_wavefront(scene, procedural.default_camera(32, 32), 8,
                           rng.make_key(123), lanes=1024)
    _compare(img, "cornell_32x32_8spp_seed123.npy")


def test_glass_golden_via_wavefront():
    """Glass transport is chaotic: the two engines' differently-compiled
    programs round ~1e-7 apart and a few paths diverge macroscopically
    (measured 99.3% pixel agreement at 8 spp), so the per-pixel bar is
    lower than the diffuse golden's; the mean stays tight."""
    from pathtrace_tpu.integrator.wavefront import render_wavefront

    ref = np.load(os.path.join(GOLDEN, "glass_24x24_8spp_seed7.npy"))
    scene = procedural.glass_scene().with_mt()
    img = np.asarray(render_wavefront(
        scene, procedural.default_camera(24, 24), 8, rng.make_key(7),
        lanes=576))
    close = np.isclose(img, ref, rtol=5e-3, atol=5e-3)
    assert close.mean() > 0.98, f"pixel agreement {close.mean()}"
    assert abs(img.mean() - ref.mean()) / ref.mean() < 5e-3


def test_tpu_cpu_agreement_artifact():
    """The committed TPU-vs-CPU agreement artifact (regenerate on TPU via
    tools/tpu_cpu_agreement.py) must pass: all three engines' TPU renders
    match the CPU goldens statistically."""
    import json
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "tpu_cpu_agreement.json")
    if not os.path.exists(path):
        pytest.skip("artifact not yet generated on TPU")
    with open(path) as f:
        report = json.load(f)
    assert report["pass"] is True
    assert len(report["results"]) >= 4
