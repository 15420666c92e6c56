"""Headline benchmark: rays/sec/chip on the 1024-spp Cornell box.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares camera-path throughput against the reference's only
derivable number (BASELINE.md): the DiffuseRoom 13-minute render on a
GTX-10xx implies ~54M camera paths/s; rays/s is measured directly by
instrumented counting (closest-hit + shadow traversals, the reference's
HOT LOOP #1/#2, SURVEY.md §3.4).

Env overrides for quick local runs: BENCH_W, BENCH_H, BENCH_SPP.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compile cache: remote XLA compiles cost 5-15 min per program
# on this TPU tunnel; cached binaries load in seconds across processes.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REF_PATHS_PER_SEC = 54e6  # BASELINE.md derived ballpark (13-min DiffuseRoom)


def main():
    from pathtrace_tpu.models import procedural
    from pathtrace_tpu.integrator.wavefront import render_wavefront_stats
    from pathtrace_tpu.integrator.config import IntegratorConfig
    from pathtrace_tpu.utils import rng

    w = int(os.environ.get("BENCH_W", 256))
    h = int(os.environ.get("BENCH_H", 256))
    spp = int(os.environ.get("BENCH_SPP", 1024))
    default_lanes = 49152 if os.environ.get("BENCH_SCENE") == "mesh" else 65536
    # mesh: 49152 measured 974k vs 853k paths/s at 65536 - the
    # power-of-2 lane count is a pathological point for the dispatch's
    # scatter/gather strides, and any size in 40-57k lands ~970k
    lanes = int(os.environ.get("BENCH_LANES", default_lanes))
    which = os.environ.get("BENCH_SCENE", "cornell")

    if which == "mesh":
        # the committed 82k-tri OBJ asset through the OBJ/MTL loader and
        # the KD-cell Pallas pair-block traversal (assets/blob82k.obj)
        scene = procedural.blob_mesh_scene().with_kd_binned(max_tris=1024)
    elif which == "glass":
        scene = procedural.glass_scene().with_mt()
    else:
        scene = procedural.cornell_box_scene(include_spheres=True).with_mt()
    scene = scene.to_device()  # ONE batched transfer (eager per-leaf
    # uploads through the remote-TPU tunnel cost seconds each)
    camera = procedural.default_camera(w, h)
    cfg = IntegratorConfig()
    key = rng.make_key(0)

    # warmup/compile at small spp (spp/offset are traced: ONE compilation
    # serves everything - remote XLA compiles cost minutes here), then a
    # chunked timed run (single launches running minutes get killed by the
    # device runtime watchdog).
    from pathtrace_tpu.integrator.wavefront import render_wavefront_chunked

    # default engine: the fused Pallas bounce kernel for single-tile
    # scenes (cornell/glass), the XLA wavefront + binned traversal for
    # large meshes (blob82k exceeds the kernel's T_pad budget). CPU smoke
    # runs fall back to the wavefront (Pallas-TPU kernels don't lower on
    # the CPU backend outside interpret mode).
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    default_engine = ("wavefront" if (which == "mesh" or not on_tpu)
                      else "fused")
    engine = os.environ.get("BENCH_ENGINE", default_engine)
    if engine == "fused":
        # fully fused Pallas bounce kernel (small scenes, T_pad <= 512)
        from pathtrace_tpu.ops.pallas.bounce_kernel import (
            build_fused_pack, render_wavefront_fused)
        block_r = int(os.environ.get("BENCH_BLOCK_R", 2048))
        g_inner = int(os.environ.get("BENCH_GINNER", 12))
        pack = build_fused_pack(scene)
        run = lambda n, c: render_wavefront_fused(
            scene, camera, n, key, cfg, lanes, chunk_spp=c,
            block_r=block_r, pack=pack, g_inner=g_inner)
    else:
        run = lambda n, c: render_wavefront_chunked(
            scene, camera, n, key, cfg, lanes, chunk_spp=c)

    # fused: one launch for the whole run when it stays under the
    # device watchdog (~1.3 s at 1024 spp Cornell); wavefront keeps
    # 64-spp chunks (its per-iteration cost is ~4x higher)
    default_chunk = min(spp, 1024) if engine == "fused" else 64
    chunk = int(os.environ.get("BENCH_CHUNK", default_chunk))
    # warmup MUST go through the same jitted chunk program as the timed
    # run (a different wrapper would hide a second multi-minute remote
    # compile inside the timed region)
    img, _ = run(4, 4)
    img.block_until_ready()
    # best-of-N: the remote-TPU tunnel adds +-2% run-to-run dispatch
    # noise WITHIN a process on a ~1.3 s measurement, and up to +-5-7%
    # ACROSS processes (interleaved same-code A/B runs in round 5
    # measured 0.93-1.00x on identical binaries; slow streaks span whole
    # processes). min over repeats reports the device's throughput for
    # THIS process; cross-process comparisons need interleaved A/B runs.
    repeats = int(os.environ.get("BENCH_REPEATS", 5))
    dt = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        img, nrays = run(spp, chunk)
        img.block_until_ready()
        dt = min(dt, time.perf_counter() - t0)

    paths = w * h * spp
    paths_per_sec = paths / dt
    rays_per_path = float(nrays) / paths
    rays_per_sec = paths_per_sec * rays_per_path

    print(json.dumps({
        "metric": f"rays_per_sec_per_chip_{which}_{spp}spp",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(paths_per_sec / REF_PATHS_PER_SEC, 4),
        "detail": {
            "paths_per_sec": round(paths_per_sec, 1),
            "rays_per_path": round(rays_per_path, 3),
            "resolution": [w, h],
            "spp": spp,
            "engine": engine,
            "seconds": round(dt, 3),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
