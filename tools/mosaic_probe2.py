"""Second round of Mosaic probes: find the exact pan construction that
compiles for COMPUTED flat rows (not ref-read reshapes, which fold).

    python tools/mosaic_probe2.py   # one TPU process at a time
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
        print(f"{name:>52}: ok", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:80]
        print(f"{name:>52}: FAIL {msg}", flush=True)


# computed flat row (min-reduce like the search winner), reshaped (8, L)
def _computed_row(x_ref):
    flat = x_ref[:].reshape(3, 8 * L)          # (3, 8L)
    return jnp.min(flat, axis=0, keepdims=True)  # (1, 8L) computed


# (a) computed (1,8L) -> reshape (8,L) -> rank-2 out
def k_a(x_ref, o_ref):
    o_ref[:] = _computed_row(x_ref).reshape(8, L) * 2.0


probe("computed (1,8L)->(8,L) out rank2", k_a,
      jax.ShapeDtypeStruct((8, L), jnp.float32))


# (b) computed (1,8L) -> (8,L) -> store into rank-3 scratch -> read
def k_b(x_ref, o_ref, sc):
    sc[0] = _computed_row(x_ref).reshape(8, L)
    sc[1] = _computed_row(x_ref).reshape(8, L) * 2.0
    sc[2] = x_ref[0]
    o_ref[:] = sc[:] + 1.0


probe("computed row -> scratch slot -> rank3 read", k_b,
      jax.ShapeDtypeStruct((3, 8, L), jnp.float32),
      [pltpu.VMEM((3, 8, L), jnp.float32)])


# (c) same but store into the rank-3 OUTPUT ref directly
def k_c(x_ref, o_ref):
    o_ref[0] = _computed_row(x_ref).reshape(8, L)
    o_ref[1] = x_ref[1]
    o_ref[2] = x_ref[2]


probe("computed row -> output rank3 slot", k_c,
      jax.ShapeDtypeStruct((3, 8, L), jnp.float32))


# (d) multi-row computed (3,8L) -> direct rank-3 reshape
def k_d(x_ref, o_ref):
    flat = x_ref[:].reshape(3, 8 * L) * 2.0    # computed (3, 8L)
    o_ref[:] = flat.reshape(3, 8, L)


probe("computed (3,8L)->(3,8,L) direct", k_d,
      jax.ShapeDtypeStruct((3, 8, L), jnp.float32))


# (e) computed (1,8L) -> (1,8,L) direct (the original failure shape)
def k_e(x_ref, o_ref):
    o_ref[:] = _computed_row(x_ref).reshape(1, 8, L)


probe("computed (1,8L)->(1,8,L) direct", k_e,
      jax.ShapeDtypeStruct((1, 8, L), jnp.float32))


# (f) int32 variant of (d)
def k_f(x_ref, o_ref):
    flat = (x_ref[:].reshape(3, 8 * L) * 2.0).astype(jnp.int32)
    o_ref[:] = flat.reshape(3, 8, L)


probe("computed i32 (3,8L)->(3,8,L)", k_f,
      jax.ShapeDtypeStruct((3, 8, L), jnp.int32))
