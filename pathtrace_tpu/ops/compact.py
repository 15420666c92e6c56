"""Counting-sort ray compaction (the wavefront "expert dispatch" analog).

The north star restructures divergent per-ray control flow into dense
batches via counting-sort compaction by (alive, lobe) keys (SURVEY.md §2
"Path integrator" row). On a TPU the four-lobe shade is usually cheaper
branchless (masked select over lobes, VPU) than a per-bounce sort - but
the compaction op itself is needed for:

- lobe-sorted shading experiments (measured SLOWER than branchless: the
  sort + 4 gather/scatter passes cost more than evaluating all four
  lobes' VPU arithmetic on every lane; see tools/lobe_sort_bench.py)
- any fixed-capacity queue maintenance

NOTE: the production mesh traversal does NOT use this module - its
dispatch is sort-free (accel/binned.py build_pair_dispatch_v3's
arithmetic slot inversion replaced the counting-sort generation after
per-op tracing showed every p-sized routed op costing 2-9 ms at
p = R*K). The consumers today are tools/lobe_sort_bench.py and the
unit test; the module stays as the reusable compaction primitive the
survey prescribes.

Implemented as a stable vectorized counting sort: O(R*K) one-hot
histogram + exclusive-scan offsets + rank-within-class, all dense ops
(no data-dependent shapes).
"""

from __future__ import annotations

import jax.numpy as jnp


def counting_sort_perm(keys: jnp.ndarray, num_keys: int) -> jnp.ndarray:
    """Stable permutation `perm` with keys[perm] sorted ascending.

    keys: (R,) int32 in [0, num_keys). Ties keep original order.
    """
    r = keys.shape[0]
    onehot = (keys[:, None] == jnp.arange(num_keys)[None, :])      # (R, K)
    within = jnp.cumsum(onehot.astype(jnp.int32), axis=0) - 1      # rank in class
    counts = jnp.sum(onehot.astype(jnp.int32), axis=0)             # (K,)
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(counts)[:-1]])           # (K,)
    pos = offsets[keys] + jnp.take_along_axis(
        within, keys[:, None], axis=1)[:, 0]
    perm = jnp.zeros((r,), jnp.int32).at[pos].set(
        jnp.arange(r, dtype=jnp.int32))
    return perm


def inverse_perm(perm: jnp.ndarray) -> jnp.ndarray:
    r = perm.shape[0]
    return jnp.zeros((r,), jnp.int32).at[perm].set(
        jnp.arange(r, dtype=jnp.int32))


def segment_starts(keys_sorted: jnp.ndarray, num_keys: int) -> jnp.ndarray:
    """(K,) start offset of each key segment in a sorted key array."""
    onehot = (keys_sorted[:, None] == jnp.arange(num_keys)[None, :])
    counts = jnp.sum(onehot.astype(jnp.int32), axis=0)
    return jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(counts)[:-1]])
