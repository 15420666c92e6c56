"""Counting-sort compaction op."""

import numpy as np
import jax.numpy as jnp

from pathtrace_tpu.ops.compact import (counting_sort_perm, inverse_perm,
                                       segment_starts)


def test_counting_sort_stable():
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 4, 1000), jnp.int32)
    perm = counting_sort_perm(keys, 4)
    sorted_keys = np.asarray(keys)[np.asarray(perm)]
    assert (np.diff(sorted_keys) >= 0).all()
    # stability: original indices within each class are increasing
    p = np.asarray(perm)
    for k in range(4):
        idx = p[sorted_keys == k]
        assert (np.diff(idx) > 0).all()


def test_inverse_perm_roundtrip():
    rng = np.random.default_rng(1)
    keys = jnp.asarray(rng.integers(0, 7, 513), jnp.int32)
    perm = counting_sort_perm(keys, 7)
    inv = inverse_perm(perm)
    vals = jnp.arange(513, dtype=jnp.int32)
    shuffled = vals[perm]
    np.testing.assert_array_equal(np.asarray(shuffled[inv]), np.asarray(vals))


def test_segment_starts():
    keys = jnp.asarray([0, 0, 1, 1, 1, 3], jnp.int32)
    starts = segment_starts(keys, 4)
    np.testing.assert_array_equal(np.asarray(starts), [0, 2, 5, 5])
