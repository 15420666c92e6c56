"""Deterministic counter-based RNG for path tracing.

Replaces the reference's curand XORWOW seeded with wall-clock
(pathtracer.cu:70-71, `curand_init(offset + SampleIDX*W*H, clock64(), 0, &s)`),
which is irreproducible by design. Here every random draw is a pure function
of (base seed, logical ray id, bounce iteration, column), using JAX's
counter-based threefry. This gives:

- bit-reproducible renders
- shard-invariance: an N-device render equals a 1-device render because
  streams are keyed by *logical* ray id, not array position
- replayability: the backward pass can regenerate the identical sample
  stream per bounce from counters alone (no stored randomness)

Column layout per (ray, iteration) — one row of `uniforms(...)`:
  0: NEE light pick              (reference: CudaUtil.cuh:235)
  1: NEE area-sample r1          (CudaUtil.cuh:42)
  2: NEE area-sample r2          (CudaUtil.cuh:43)
  3: lobe/fresnel selector       (Bxdf.cuh:182/278/343)
  4: microfacet/hemisphere phi   (Bxdf.cuh:142/26)
  5: microfacet ry / hemi cos    (Bxdf.cuh:143/28)
  6: russian roulette            (CudaUtil.cuh:363)
  7: reserved
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NUM_COLS = 8
COL_LIGHT_PICK = 0
COL_NEE_R1 = 1
COL_NEE_R2 = 2
COL_LOBE = 3
COL_PHI = 4
COL_RY = 5
COL_RR = 6


def make_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def iter_key(base_key: jax.Array, iteration) -> jax.Array:
    """Key for one bounce iteration of the whole wavefront."""
    return jax.random.fold_in(base_key, iteration)


def uniforms(base_key: jax.Array, ray_ids: jnp.ndarray, iteration,
             num: int = NUM_COLS) -> jnp.ndarray:
    """(R, num) uniforms in [0,1), a pure function of (key, ray_id, iteration).

    ray_ids are *logical* ids (pixel*spp_stream etc.), so the stream is
    invariant to how rays are batched or sharded across devices.
    """
    k = iter_key(base_key, iteration)
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(k, ray_ids)
    return jax.vmap(lambda kk: jax.random.uniform(kk, (num,), dtype=jnp.float32))(keys)


def uniform_grid(base_key: jax.Array, tag: int, shape, num: int) -> jnp.ndarray:
    """(*shape, num) uniforms for per-pixel use (e.g. subpixel jitter)."""
    k = jax.random.fold_in(base_key, tag)
    return jax.random.uniform(k, tuple(shape) + (num,), dtype=jnp.float32)


def randint_from_uniform(u: jnp.ndarray, n) -> jnp.ndarray:
    """Map u in [0,1) to an int in [0, n). Replaces `curand(s) % Nl`."""
    return jnp.minimum((u * n).astype(jnp.int32), n - 1)
