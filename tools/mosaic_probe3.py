"""Third Mosaic probe round: validate the concat-packed pan/unpan.

Single computed rows (e.g. a min-reduce winner) carry layouts Mosaic
cannot shape-cast; concatenating rows first materializes a standard
layout, after which the multi-row (r, 8L) <-> (r, 8, L) reshape compiles
(probe2). Verify the exact patterns the kernel will use.

    python tools/mosaic_probe3.py
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
B = 8 * L


def probe(name, kernel, out_shape):
    try:
        fn = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=out_shape,
        )
        x = jnp.ones((3, 8, L), jnp.float32)
        out = jax.jit(fn)(x)
        jax.block_until_ready(out)
        print(f"{name:>52}: ok", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:80]
        print(f"{name:>52}: FAIL {msg}", flush=True)


def _minrow(x_ref):
    return jnp.min(x_ref[:].reshape(3, B), axis=0, keepdims=True)


# (a) single min-reduced row -> double-concat -> (2,8,L) -> [0:1]
def k_a(x_ref, o_ref):
    r = _minrow(x_ref)
    two = jnp.concatenate([r, r], axis=0).reshape(2, 8, L)
    o_ref[:] = two[0:1] * 2.0


probe("minrow double-concat pan [0:1]", k_a,
      jax.ShapeDtypeStruct((1, 8, L), jnp.float32))


# (b) computed rank-3 concat -> multi-row unpan (8,8,L)->(8,8L)
def k_b(x_ref, o_ref):
    a = x_ref[:] * 2.0                       # (3,8,L) computed
    b = x_ref[:] + 1.0
    c = jnp.sum(x_ref[:], axis=0, keepdims=True)  # (1,8,L) reduced
    pack = jnp.concatenate([a, b, c, c], axis=0)  # (8,8,L)
    o_ref[:] = pack.reshape(8, B)


probe("computed rank3 pack unpan (8,8,L)->(8,8L)", k_b,
      jax.ShapeDtypeStruct((8, B), jnp.float32))


# (c) mixed concat: minrow + big computed block -> (49,8,L) pan, slice
def k_c(x_ref, o_ref):
    r = _minrow(x_ref)                       # (1, B) special layout
    big = jnp.broadcast_to(x_ref[:].reshape(3, B), (3, B)) * 0.5
    big48 = jnp.concatenate([big] * 16, axis=0)   # (48, B)
    pack = jnp.concatenate([r, big48], axis=0).reshape(49, 8, L)
    o_ref[:] = pack[0:3] + pack[3:6]


probe("minrow+block pack pan (49,8,L) slice", k_c,
      jax.ShapeDtypeStruct((3, 8, L), jnp.float32))


# (d) i32/bool pack: compare + iota-derived rows
def k_d(x_ref, o_ref):
    flat = x_ref[:].reshape(3, B)
    hit = (jnp.min(flat, axis=0, keepdims=True) < 0.5)
    arg = jnp.argmin(flat[0:1], axis=0, keepdims=True).astype(jnp.int32) \
        if False else (flat[0:1] > 0).astype(jnp.int32)
    pack = jnp.concatenate([hit.astype(jnp.int32), arg], axis=0)
    o_ref[:] = pack.reshape(2, 8, L)


probe("i32 pack pan (2,8,L)", k_d,
      jax.ShapeDtypeStruct((2, 8, L), jnp.int32))


# (e) full cycle at kernel-realistic width: unpan state, matmul-ish,
#     reduce, repan
def k_e(x_ref, o_ref):
    st = x_ref[:]                            # (3,8,L) "state"
    flat = jnp.concatenate([st * 1.0, st * 2.0, st[0:1] * 0.0,
                            st[0:1] + 9.0], axis=0).reshape(8, B)
    prods = jnp.concatenate([flat] * 16, axis=0)  # (128, B) "products"
    t = jnp.min(prods, axis=0, keepdims=True)
    tri = jax.lax.broadcasted_iota(jnp.int32, prods.shape, 0)
    arg = jnp.min(jnp.where(prods <= t, tri, 128), axis=0, keepdims=True)
    fpack = jnp.concatenate([t, prods[0:48]], axis=0).reshape(49, 8, L)
    ipack = jnp.concatenate([arg, arg], axis=0).reshape(2, 8, L)
    o_ref[:] = fpack[0:3] + ipack[0:1].astype(jnp.float32)


probe("full search-boundary cycle", k_e,
      jax.ShapeDtypeStruct((3, 8, L), jnp.float32))
