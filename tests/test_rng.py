"""Philox RNG tests: determinism, uniformity, stream independence
(SURVEY.md §4: Philox determinism is a prerequisite for backward replay
and shard invariance)."""

import numpy as np
import jax.numpy as jnp

from pathtrace_tpu.utils import rng


def test_deterministic():
    key = rng.make_key(42)
    ids = jnp.arange(1000, dtype=jnp.int32)
    a = np.asarray(rng.uniforms(key, ids, 3))
    b = np.asarray(rng.uniforms(key, ids, 3))
    np.testing.assert_array_equal(a, b)


def test_seed_and_iteration_sensitivity():
    ids = jnp.arange(1000, dtype=jnp.int32)
    a = np.asarray(rng.uniforms(rng.make_key(1), ids, 3))
    b = np.asarray(rng.uniforms(rng.make_key(2), ids, 3))
    c = np.asarray(rng.uniforms(rng.make_key(1), ids, 4))
    assert np.abs(a - b).max() > 0.1
    assert np.abs(a - c).max() > 0.1


def test_per_lane_iteration_matches_scalar():
    """A lane with iteration counter k draws the same numbers whether the
    batch is lockstep (scalar it) or mixed (per-lane it) - the wavefront /
    megakernel equivalence hinges on this."""
    key = rng.make_key(7)
    ids = jnp.arange(64, dtype=jnp.int32)
    scalar = np.asarray(rng.uniforms(key, ids, 5))
    mixed_it = jnp.full((64,), 5, jnp.int32)
    mixed = np.asarray(rng.uniforms(key, ids, mixed_it))
    np.testing.assert_array_equal(scalar, mixed)


def test_uniformity_moments():
    key = rng.make_key(0)
    ids = jnp.arange(200_000, dtype=jnp.int32)
    u = np.asarray(rng.uniforms(key, ids, 0))
    assert u.min() >= 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 2e-3
    assert abs(u.var() - 1.0 / 12.0) < 2e-3
    # bin counts ~ chi^2: 16 bins over all draws
    counts, _ = np.histogram(u, bins=16, range=(0, 1))
    expected = u.size / 16
    chi2 = ((counts - expected) ** 2 / expected).sum()
    assert chi2 < 80.0, chi2  # dof=15, generous bound


def test_column_independence():
    key = rng.make_key(3)
    ids = jnp.arange(100_000, dtype=jnp.int32)
    u = np.asarray(rng.uniforms(key, ids, 1))
    corr = np.corrcoef(u.T)
    off_diag = corr - np.eye(corr.shape[0])
    assert np.abs(off_diag).max() < 0.02


def test_adjacent_ray_ids_uncorrelated():
    key = rng.make_key(4)
    ids = jnp.arange(100_000, dtype=jnp.int32)
    u = np.asarray(rng.uniforms(key, ids, 2))[:, 0]
    corr = np.corrcoef(u[:-1], u[1:])[0, 1]
    assert abs(corr) < 0.02


def test_jitter_in_unit_square():
    key = rng.make_key(5)
    ids = jnp.arange(50_000, dtype=jnp.int32)
    j = np.asarray(rng.pixel_jitter(key, ids))
    assert j.shape == (50_000, 2)
    assert j.min() >= 0.0 and j.max() < 1.0
    assert abs(j.mean() - 0.5) < 5e-3
