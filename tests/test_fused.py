"""Fused Pallas bounce engine vs the XLA wavefront (interpret on CPU).

The fused kernel (ops/pallas/bounce_kernel.py) is the production TPU
engine; this pins its estimator against integrator/wavefront.py: same
Philox streams keyed by (ray_id, path-local iteration), same reference
quirks (GetColor_iter, CudaUtil.cuh:193-382). Winner selection runs on
bf16 products with an approximate ordering key, so near-tie winners can
differ - images agree statistically, most pixels exactly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pathtrace_tpu.integrator.config import IntegratorConfig
from pathtrace_tpu.integrator.wavefront import render_wavefront_stats
from pathtrace_tpu.models import procedural
from pathtrace_tpu.ops.pallas.bounce_kernel import (build_fused_pack,
                                                    render_wavefront_fused)
from pathtrace_tpu.utils import rng


def test_fused_matches_wavefront_planar():
    """Tri-only Cornell: planar transport is non-chaotic, so the fused
    and XLA engines - identical Philox streams, different float
    rounding - must agree essentially pixel-for-pixel."""
    scene = procedural.cornell_box_scene(include_spheres=False).with_mt()
    camera = procedural.default_camera(16, 16)
    cfg = IntegratorConfig()
    key = rng.make_key(5)
    spp = 8
    lanes = 256  # lanes | num_pix: static strided assignment in both

    img_w, rays_w = render_wavefront_stats(scene, camera, spp, key, cfg,
                                           lanes=lanes)
    img_f, rays_f = render_wavefront_fused(scene, camera, spp, key, cfg,
                                           lanes=lanes, chunk_spp=spp,
                                           block_r=lanes, interpret=True)

    a = np.asarray(img_w)
    b = np.asarray(img_f)
    close = np.isclose(a, b, rtol=1e-4, atol=1e-4)
    # near-tie winner flips may move a couple of pixels; the film must
    # otherwise agree pixel-for-pixel and in the mean
    assert close.mean() > 0.99, f"pixel agreement {close.mean()}"
    assert abs(a.mean() - b.mean()) / a.mean() < 2e-3
    assert rays_f == pytest.approx(float(rays_w), rel=1e-3)


def test_fused_matches_wavefront_spheres_statistical():
    """With curved (sphere) transport, reflect/refract chains amplify
    any float-rounding difference exponentially per bounce (and shadow
    rays leaving a sphere surface knife-edge on their own t~0 root), so
    two float implementations can only agree statistically: identical
    ray counts per path pool, means within a fraction of a percent, and
    most pixels still matching exactly."""
    scene = procedural.cornell_box_scene(include_spheres=True).with_mt()
    camera = procedural.default_camera(16, 16)
    cfg = IntegratorConfig()
    key = rng.make_key(5)
    spp = 16
    lanes = 256

    img_w, rays_w = render_wavefront_stats(scene, camera, spp, key, cfg,
                                           lanes=lanes)
    img_f, rays_f = render_wavefront_fused(scene, camera, spp, key, cfg,
                                           lanes=lanes, chunk_spp=spp,
                                           block_r=lanes, interpret=True)

    a = np.asarray(img_w)
    b = np.asarray(img_f)
    assert abs(a.mean() - b.mean()) / a.mean() < 0.02
    close = np.isclose(a, b, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.5, f"pixel agreement {close.mean()}"
    assert rays_f == pytest.approx(float(rays_w), rel=0.02)


def test_fused_chunked_equals_single():
    """Chunked launches share the estimator with a single launch."""
    scene = procedural.cornell_box_scene(include_spheres=True).with_mt()
    camera = procedural.default_camera(8, 8)
    cfg = IntegratorConfig()
    key = rng.make_key(9)
    pack = build_fused_pack(scene)

    img_a, _ = render_wavefront_fused(scene, camera, 8, key, cfg, lanes=64,
                                      chunk_spp=8, block_r=64,
                                      interpret=True, pack=pack)
    img_b, _ = render_wavefront_fused(scene, camera, 8, key, cfg, lanes=64,
                                      chunk_spp=2, block_r=64,
                                      interpret=True, pack=pack)
    np.testing.assert_allclose(np.asarray(img_a), np.asarray(img_b),
                               rtol=1e-5, atol=1e-6)
