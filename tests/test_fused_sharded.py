"""Sharded fused engine: N-chip == 1-chip == unsharded, interpret mode.

The fused Pallas bounce kernel keys RNG and camera rays by GLOBAL path
id (bounce_kernel to_global), so sharding the lane pool over a mesh must
not change the image at all (same contract as test_sharding's wavefront
invariance). Runs the kernel in interpret mode on the fake 8-device CPU
mesh.
"""

import numpy as np
import pytest

from pathtrace_tpu.models import procedural
from pathtrace_tpu.parallel.mesh import make_ray_mesh, render_fused_sharded
from pathtrace_tpu.ops.pallas.bounce_kernel import render_wavefront_fused
from pathtrace_tpu.integrator.config import IntegratorConfig
from pathtrace_tpu.utils import rng


@pytest.fixture(scope="module")
def setup():
    scene = procedural.cornell_box_scene().with_mt().to_device()
    cam = procedural.default_camera(16, 16)
    return scene, cam


def test_fused_shard_invariance(setup):
    scene, cam = setup
    key = rng.make_key(5)
    cfg = IntegratorConfig()
    kw = dict(cfg=cfg, lanes=512, interpret=True, block_r=512)
    img1, rays1 = render_fused_sharded(scene, cam, 4, key,
                                       make_ray_mesh(1), **kw)
    img8, rays8 = render_fused_sharded(scene, cam, 4, key,
                                       make_ray_mesh(8), **kw)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img8),
                               rtol=1e-6, atol=1e-7)
    assert float(rays1) == float(rays8)


def test_fused_sharded_matches_unsharded(setup):
    scene, cam = setup
    key = rng.make_key(5)
    cfg = IntegratorConfig()
    img8, _ = render_fused_sharded(scene, cam, 4, key, make_ray_mesh(8),
                                   cfg=cfg, lanes=512, interpret=True,
                                   block_r=512)
    ref, _ = render_wavefront_fused(scene, cam, 4, key, cfg, lanes=512,
                                    block_r=512, interpret=True)
    np.testing.assert_allclose(np.asarray(img8), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
