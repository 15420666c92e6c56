"""Scaling-efficiency harness: rays/s/chip vs mesh size.

North-star metric: >= 75% rays/s scaling efficiency from 1 chip to 2
hosts. Real multi-chip hardware is not available in this environment
(one v5e chip behind a tunnel), so this harness:

  - on a multi-chip TPU: sweeps real mesh sizes and reports measured
    rays/s and efficiency vs n=1 (the number that will certify the
    metric when run on a slice);
  - on CPU (default here): runs the same sweep over the fake 8-device
    mesh to validate the harness end-to-end; CPU "efficiency" numbers
    reflect host contention, not ICI, and are labeled as such.

    python tools/scaling_bench.py            # current platform
    env SCALE_ENGINE=wavefront python ...    # engine override

Writes docs/scaling_bench.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SCALE_PLATFORM", "cpu") == "cpu":
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
import jax

if os.environ.get("SCALE_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from pathtrace_tpu.models import procedural
from pathtrace_tpu.parallel.mesh import (make_ray_mesh,
                                         render_fused_sharded,
                                         render_wavefront_sharded)
from pathtrace_tpu.integrator.config import IntegratorConfig
from pathtrace_tpu.utils import rng

ENGINE = os.environ.get("SCALE_ENGINE", "wavefront")
W = H = int(os.environ.get("SCALE_SIDE", 64))
SPP = int(os.environ.get("SCALE_SPP", 8))
LANES = int(os.environ.get("SCALE_LANES", 4096))

on_tpu = jax.devices()[0].platform == "tpu"
scene = procedural.cornell_box_scene(include_spheres=True).with_mt()
scene = scene.to_device()
cam = procedural.default_camera(W, H)
cfg = IntegratorConfig()
key = rng.make_key(0)

n_avail = len(jax.devices())
sizes = [n for n in (1, 2, 4, 8) if n <= n_avail]
rows = []
for n in sizes:
    mesh = make_ray_mesh(n)
    if ENGINE == "fused":
        run = lambda s: render_fused_sharded(
            scene, cam, s, key, mesh, cfg, lanes=LANES,
            block_r=min(2048, LANES // n), interpret=not on_tpu)
    else:
        run = lambda s: render_wavefront_sharded(
            scene, cam, s, key, mesh, cfg, lanes=LANES)
    img, nrays = run(2)
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    img, nrays = run(SPP)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    rays = float(np.asarray(nrays))
    rows.append({"n_devices": n, "seconds": round(dt, 4),
                 "rays_per_sec": round(rays / dt, 1),
                 "rays_per_sec_per_chip": round(rays / dt / n, 1)})
    print(rows[-1], flush=True)

base = rows[0]["rays_per_sec"]
for r in rows:
    r["efficiency_vs_1"] = round(
        r["rays_per_sec"] / (base * r["n_devices"]), 4)

out = {
    "engine": ENGINE,
    "platform": jax.devices()[0].platform,
    "note": ("CPU fake-device run validates the harness; efficiency "
             "reflects host contention, not ICI. Re-run on a real slice "
             "for the >=75% 1-chip -> 2-host certification."
             if not on_tpu else
             "real TPU sweep"),
    "config": {"side": W, "spp": SPP, "lanes": LANES},
    "rows": rows,
}
os.makedirs("docs", exist_ok=True)
with open("docs/scaling_bench.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps({"rows": len(rows), "platform": out["platform"]}))
