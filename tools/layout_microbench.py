"""Layout microbenchmarks deciding the fused-kernel data layout.

The fused bounce kernel keeps per-lane scalars as (1, B) rows - 1/8 of
each (8, 128) f32 VPU tile - so every elementwise op over B=2048-lane
blocks costs ~16 tile-cycles where a "paneled" (8, B/8) layout costs 2.
Round 3 measurements (TPU v5e, 65536 lanes, block 2048, 256-iter fori):

    state-copy 21 rows:   0.69 us/iter   -> state round-trip is ~free
                                            (while/fori carry stays in VMEM)

so neither launch overhead nor HBM traffic explains the 193 us/iter
all-sections-ablated floor (tools/fused_ablate.py); the floor is the
~380 leftover (1, B) row-ops at ~0.5 us per full-lane row-op. This tool
measures the row vs panel cost and - critically - whether Mosaic lowers
jnp.reshape((r, B) -> (r, 8, B/8)) relayouts cheaply enough to panel just
the elementwise middle of the kernel while keeping the matmul boundaries
flat.

    python tools/layout_microbench.py   # one TPU process at a time
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pathtrace_tpu.utils import rng

LANES = 65536
BLOCK = 2048
L = BLOCK // 8
GRID = LANES // BLOCK
ITERS = 256
N_FMA = 120


def timed(name, fn, *args):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = jfn(*args)
    jax.block_until_ready(out)
    us = (time.perf_counter() - t0) / ITERS * 1e6
    print(f"{name:>34}: {us:8.2f} us/iter", flush=True)
    return us


def loop(step, state):
    def body(_, c):
        return step(c)
    return jax.lax.fori_loop(0, ITERS, body, state)


def call21(kernel, c):
    """(21, LANES) f32 in -> (21, LANES) f32 out, blocked at (21, BLOCK)."""
    return pl.pallas_call(
        kernel,
        grid=(GRID,),
        in_specs=[pl.BlockSpec((21, BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((21, BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((21, LANES), jnp.float32),
    )(c)


# 1. floor: body = copy (+1.0)
def copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0


# 2. FMA chain on a (1, B) row
def fma_rows_kernel(x_ref, o_ref):
    a = x_ref[0:1]
    b = x_ref[1:2]
    for _ in range(N_FMA):
        a = a * b + 1e-7
    o_ref[:] = x_ref[:]
    o_ref[0:1] = a


# 3. FMA chain paneled via in-kernel reshape (1, B) -> (8, L) -> back
def fma_panel_kernel(x_ref, o_ref):
    a = x_ref[0:1].reshape(8, L)
    b = x_ref[1:2].reshape(8, L)
    for _ in range(N_FMA):
        a = a * b + 1e-7
    o_ref[:] = x_ref[:]
    o_ref[0:1] = a.reshape(1, BLOCK)


# 4. reshape round-trip only (cost of the relayout itself), x12 rows
def relayout_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:]
    for r in range(12):
        p = x_ref[r:r + 1].reshape(8, L)
        o_ref[r:r + 1] = (p + 1.0).reshape(1, BLOCK)


# 5. philox x3 on (1, B) rows vs paneled (8, L)
def philox_kernel(x_ref, o_ref, *, paneled):
    if paneled:
        rid = pltpu.bitcast(x_ref[0:1].reshape(8, L), jnp.uint32)
        it = pltpu.bitcast(x_ref[1:2].reshape(8, L), jnp.uint32)
    else:
        rid = pltpu.bitcast(x_ref[0:1], jnp.uint32)
        it = pltpu.bitcast(x_ref[1:2], jnp.uint32)
    k0 = jnp.uint32(123)
    k1 = jnp.uint32(456)
    outs = []
    for block in range(2):
        outs.extend(rng.philox4x32(
            rid, it, jnp.full_like(rid, np.uint32(block)),
            jnp.full_like(rid, np.uint32(0x50415448)), k0, k1))
    z = jnp.zeros_like(rid)
    outs.extend(rng.philox4x32(rid, z, z,
                               jnp.full_like(rid, np.uint32(0x4A495454)),
                               k0, k1))
    acc = jnp.zeros_like(rid)
    for o in outs:
        acc = acc ^ o
    o_ref[:] = x_ref[:]
    row = acc.reshape(1, BLOCK) if paneled else acc
    o_ref[0:1] = pltpu.bitcast(row, jnp.int32).astype(jnp.float32) * 1e-30


# 6. transcendental chain (BSDF-like): exp/log/rsqrt x12 rows vs paneled
def transc_kernel(x_ref, o_ref, *, paneled):
    if paneled:
        a = x_ref[0:1].reshape(8, L)
        b = x_ref[1:2].reshape(8, L)
    else:
        a = x_ref[0:1]
        b = x_ref[1:2]
    for _ in range(12):
        a = jnp.exp(a * 0.1) + jax.lax.rsqrt(jnp.abs(b) + 1.0) \
            + jnp.log(jnp.abs(a) + 1.0)
    o_ref[:] = x_ref[:]
    row = a.reshape(1, BLOCK) if paneled else a
    o_ref[0:1] = row * 1e-30


def run(kernel):
    def go(c):
        return loop(lambda s: call21(kernel, s), c)
    return go


x21 = jnp.full((21, LANES), 0.999, jnp.float32)

timed("state-copy 21 rows", run(copy_kernel), x21)
timed(f"fma x{N_FMA} rows (1,B)", run(fma_rows_kernel), x21)
timed(f"fma x{N_FMA} panel+reshape", run(fma_panel_kernel), x21)
timed("reshape roundtrip x12 rows", run(relayout_kernel), x21)
timed("philox x3 rows", run(functools.partial(philox_kernel,
                                              paneled=False)), x21)
timed("philox x3 panel", run(functools.partial(philox_kernel,
                                               paneled=True)), x21)
timed("transcendental x12 rows", run(functools.partial(transc_kernel,
                                                       paneled=False)), x21)
timed("transcendental x12 panel", run(functools.partial(transc_kernel,
                                                        paneled=True)), x21)
