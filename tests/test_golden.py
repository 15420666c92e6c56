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
