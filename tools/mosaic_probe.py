"""Probe which rank-2 <-> rank-3 Mosaic ops compile on this TPU.

The paneled bounce kernel needs per-lane data as (rows, 8, L) tiles with
occasional flat (rows, 8L) views at the matmul boundary. Mosaic rejects
some shape casts (jnp.stack's broadcast_in_dim rank-2 -> rank-3 is
confirmed unsupported); this probes the alternatives one tiny kernel at
a time and prints ok/FAIL per primitive.

    python tools/mosaic_probe.py   # one TPU process at a time
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

L = 256


def probe(name, kernel, out_shape, scratch_shapes=()):
    try:
        fn = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=out_shape,
            scratch_shapes=list(scratch_shapes),
        )
        x = jnp.ones((3, 8, L), jnp.float32)
        jax.block_until_ready(jax.jit(fn)(x))
        print(f"{name:>44}: ok", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:90]
        print(f"{name:>44}: FAIL {msg}", flush=True)


# (a) rank-3 elementwise + rank-3 ref read/write
def k_elem(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0 + x_ref[:] ** 2


probe("rank3 elementwise", k_elem,
      jax.ShapeDtypeStruct((3, 8, L), jnp.float32))


# (b) rank-3 -> rank-2 via x[r] basic index
def k_slice(x_ref, o_ref):
    o_ref[:] = x_ref[0] + x_ref[1] * x_ref[2]


probe("x[r] rank3->rank2", k_slice,
      jax.ShapeDtypeStruct((8, L), jnp.float32))


# (c) store rank-2 into rank-3 ref slot
def k_store(x_ref, o_ref):
    for r in range(3):
        o_ref[r] = x_ref[r] * 2.0


probe("store rank2 into rank3 ref slot", k_store,
      jax.ShapeDtypeStruct((3, 8, L), jnp.float32))


# (d) reshape (3,8,L) -> (24,L) and back
def k_flat(x_ref, o_ref):
    f = x_ref[:].reshape(24, L)
    o_ref[:] = (f + 1.0).reshape(3, 8, L)


probe("reshape (3,8,L)<->(24,L)", k_flat,
      jax.ShapeDtypeStruct((3, 8, L), jnp.float32))


# (e) concat rank-3 along axis 0
def k_cat(x_ref, o_ref):
    o_ref[:] = jnp.concatenate([x_ref[0:1], x_ref[1:2] * 2.0,
                                x_ref[2:3]], axis=0)


probe("concat rank3 axis0", k_cat,
      jax.ShapeDtypeStruct((3, 8, L), jnp.float32))


# (f) reshape (3,8,L) -> (3, 8L): the unpan direction
def k_unpan(x_ref, o_ref):
    o_ref[:] = x_ref[:].reshape(3, 8 * L) + 1.0


probe("reshape (3,8,L)->(3,8L)", k_unpan,
      jax.ShapeDtypeStruct((3, 8 * L), jnp.float32))


# (g) reshape (3,8L) -> (3,8,L): the pan direction (rank-3 direct)
def k_pan(x_ref, o_ref):
    f = x_ref[:].reshape(3, 8 * L)
    o_ref[:] = f.reshape(3, 8, L) * 2.0


probe("reshape (3,8L)->(3,8,L)", k_pan,
      jax.ShapeDtypeStruct((3, 8, L), jnp.float32))


# (h) scratch roundtrip: store rank-2 reshapes into rank-3 scratch, read
def k_scratch(x_ref, o_ref, sc):
    flat = x_ref[:].reshape(3, 8 * L)          # (3, 8L)
    for r in range(3):
        sc[r] = flat[r:r + 1].reshape(8, L)
    o_ref[:] = sc[:] * 2.0


probe("scratch pan roundtrip", k_scratch,
      jax.ShapeDtypeStruct((3, 8, L), jnp.float32),
      [pltpu.VMEM((3, 8, L), jnp.float32)])


# (i) rank-3 reductions / where / iota mixes used by the kernel
def k_mix(x_ref, o_ref):
    s = jnp.sum(x_ref[:], axis=0, keepdims=True)          # (1,8,L)
    w = jnp.where(x_ref[0:1] > 0.5, s, -s)
    i = jax.lax.broadcasted_iota(jnp.int32, (3, 8, L), 0)
    o_ref[:] = w + x_ref[:] * 0.0 + i.astype(jnp.float32)


probe("rank3 sum/where/iota", k_mix,
      jax.ShapeDtypeStruct((3, 8, L), jnp.float32))
