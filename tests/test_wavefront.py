"""Wavefront/megakernel equivalence: identical per-path streams => images
agree up to float accumulation order."""

import numpy as np

from pathtrace_tpu import render
from pathtrace_tpu.integrator.wavefront import render_wavefront
from pathtrace_tpu.models import procedural
from pathtrace_tpu.utils import rng


def test_wavefront_matches_megakernel():
    scene = procedural.cornell_box_scene()
    cam = procedural.default_camera(16, 16)
    key = rng.make_key(0)
    a = np.asarray(render(scene, cam, 4, key))
    b = np.asarray(render_wavefront(scene, cam, 4, key, lanes=256))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_wavefront_small_lanes_matches_large():
    """Scheduling (lane count) must not change the estimate."""
    scene = procedural.cornell_box_scene()
    cam = procedural.default_camera(8, 8)
    key = rng.make_key(1)
    a = np.asarray(render_wavefront(scene, cam, 4, key, lanes=64))
    b = np.asarray(render_wavefront(scene, cam, 4, key, lanes=256))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_wavefront_with_spheres_and_bvh():
    scene = procedural.cornell_box_scene(include_spheres=True).with_bvh()
    cam = procedural.default_camera(12, 12)
    key = rng.make_key(2)
    a = np.asarray(render(scene, cam, 2, key))
    b = np.asarray(render_wavefront(scene, cam, 2, key, lanes=128))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_chunked_matches_single():
    """Chunked multi-launch rendering equals one launch (same path ids)."""
    import jax.numpy as jnp
    from pathtrace_tpu.integrator.wavefront import (render_wavefront_chunked,
                                                    render_wavefront_stats)

    scene = procedural.cornell_box_scene()
    cam = procedural.default_camera(8, 8)
    key = rng.make_key(3)
    one, _ = render_wavefront_stats(scene, cam, jnp.int32(8), key, lanes=256)
    chunked, _ = render_wavefront_chunked(scene, cam, 8, key, lanes=256,
                                          chunk_spp=3)
    np.testing.assert_allclose(np.asarray(one), np.asarray(chunked),
                               rtol=1e-5, atol=1e-5)
