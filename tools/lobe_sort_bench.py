"""Lobe-sorted vs branchless wavefront shading on TPU - the measurement
that decides SURVEY.md's "expert dispatch analog" design question.

On a GPU, sorting rays by BSDF lobe removes warp divergence. On a TPU
all shapes are static: after a counting-sort the four lobes' segments
are contiguous but a dense op still runs over ALL R lanes, so the only
possible saving is replacing 4x masked lobe arithmetic with 1x - IF the
segments could be processed at fixed capacity (they can't without
overflow handling). This bench measures what each side actually costs:

  branchless : eval_bsdfcos over R lanes (all four lobes, masked select)
  sorted     : counting_sort_perm by lobe key + gather of the shade
               inputs into sorted order + the same eval + scatter back

If sort+permute alone costs more than 3/4 of the branchless eval, lobe
sorting cannot win even with ideal per-segment dispatch. Result on TPU
v5e (65536 lanes, run 2026-08-20): branchless eval 232 us, sort+permute
overhead alone 1393 us (6x the eval) -> branchless wins by a wide
margin; wavefront.py keeps masked-select shading.

    python tools/lobe_sort_bench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pathtrace_tpu.models.scene import Material
from pathtrace_tpu.ops import bsdf
from pathtrace_tpu.ops.bsdf import ShadeFrame
from pathtrace_tpu.ops.compact import counting_sort_perm

R = int(os.environ.get("LS_LANES", 65536))
ITERS = 100

rng_ = np.random.default_rng(0)


def _unit(n):
    v = rng_.normal(size=(n, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


normal = jnp.asarray(_unit(R))
tangent = jnp.asarray(_unit(R))
bitangent = jnp.asarray(np.cross(np.asarray(normal), np.asarray(tangent)))
frame = ShadeFrame(normal=normal, tangent=tangent, bitangent=bitangent,
                   front_face=jnp.asarray(rng_.random(R) > 0.5))
wo = jnp.asarray(_unit(R))
wi = jnp.asarray(_unit(R))
mat = Material(
    emittance=jnp.zeros((R, 3), jnp.float32),
    albedo=jnp.asarray(rng_.random((R, 3)).astype(np.float32)),
    specular=jnp.full((R, 3), 0.04, jnp.float32),
    opacity=jnp.asarray((rng_.random(R) > 0.25).astype(np.float32)),
    roughness=jnp.asarray(rng_.random(R).astype(np.float32)),
    metallic=jnp.asarray((rng_.random(R) > 0.75).astype(np.float32)),
)
# lobe key as the wavefront would compute it (bsdf.py selection policy)
lobe = jnp.asarray(rng_.integers(0, 4, R).astype(np.int32))


@jax.jit
def branchless(mat, frame, wo, wi):
    def body(_, acc):
        return acc + bsdf.eval_bsdfcos(mat, frame, wo, wi)
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((R, 3)))


@jax.jit
def sort_only(lobe, mat, frame, wo, wi):
    def body(_, acc):
        perm, _ = counting_sort_perm(lobe, 4)
        g = lambda x: jnp.take(x, perm, axis=0)
        out = bsdf.eval_bsdfcos(
            Material(*(g(getattr(mat, f)) for f in
                       ("emittance", "albedo", "specular", "opacity",
                        "roughness", "metallic"))),
            ShadeFrame(g(frame.normal), g(frame.tangent), g(frame.bitangent),
                       g(frame.front_face)),
            g(wo), g(wi))
        # scatter back to lane order (film/path state is lane-indexed)
        return acc.at[perm].set(out)
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((R, 3)))


def timeit(f, *a):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1e6


us_b = timeit(branchless, mat, frame, wo, wi)
us_s = timeit(sort_only, lobe, mat, frame, wo, wi)
print(f"branchless 4-lobe eval: {us_b:8.1f} us / {R} lanes")
print(f"sorted (sort+permute+eval+scatter): {us_s:8.1f} us")
print(f"sort overhead alone: {us_s - us_b:8.1f} us "
      f"({(us_s - us_b) / us_b:.1f}x the full branchless eval; "
      f"ideal per-segment dispatch could save at most 0.75x)")
