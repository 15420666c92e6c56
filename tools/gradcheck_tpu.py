"""TPU-side gradient validation + production-backward timing.

The r3 NEE-shadow-t_min episode showed this codebase's characteristic
bug class is CROSS-COMPILATION flips: a borderline accept that differs
between differently-compiled realizations of the same estimator. The
committed CPU oracle (gradcheck_r03.json, frozen-sampling FD at 1e-3)
pins the estimator; this tool pins the TPU-COMPILED programs:

  1. replay-backward grads vs scan-AD grads, both compiled FOR TPU, on
     the full demo scene (agreement bounds the replay approximation and
     any TPU-side compile flips at once);
  2. TPU reverse-mode vs forward-mode (JVP) agreement on a probe
     direction (the exact check that caught the r3 bug);
  3. wall-time of the production distributed training steps at
     128x128 @ 64 spp: the r4 per-sample replay step
     (train_step_replay_sharded) and the r5 wavefront-taped step
     (train_step_wavetape_sharded);
  4. record-tape bytes/lane from XLA's memory analysis of the
     TPU-compiled programs;
  5. mesh-scene gradients (blob82k through the KD v3 backend):
     wavetape-replay vs scan-AD agreement on TPU.

Writes gradcheck_tpu_r05.json.  One TPU process at a time.
"""
import json
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

from pathtrace_tpu.diff import material_grads, material_grads_replay
from pathtrace_tpu.integrator.config import IntegratorConfig
from pathtrace_tpu.models import procedural
from pathtrace_tpu.parallel.mesh import (make_ray_mesh,
                                         train_step_replay_sharded,
                                         train_step_wavetape_sharded)
from pathtrace_tpu.utils import rng
from pathtrace_tpu.utils.pytree import replace

assert jax.devices()[0].platform == "tpu", jax.devices()

out = {"device": str(jax.devices()[0])}
t0 = time.time()

scene = procedural.cornell_box_scene(include_spheres=True).with_mt()
scene = scene.to_device()
cam = procedural.default_camera(24, 24)
cfg = IntegratorConfig()
key = rng.make_key(11)

# --- 1. replay vs scan-AD grads, both on TPU
from pathtrace_tpu.diff.grad import render_with_params as _rwp

g_tri_r, g_sph_r, img_r = material_grads_replay(scene, cam, 8, key, cfg=cfg)
g_tri_s, g_sph_s, _loss_s = material_grads(scene, cam, 8, key, cfg=cfg)
# true image-vs-image primal pin (material_grads' 3rd return is the
# SCALAR loss; r4's artifact compared the image against it elementwise,
# a meaningless broadcast - the 2570.4 figure. Fixed in r5.)
img_s = _rwp(scene, scene.mat, scene.spheres.mat, cam, 8, key, cfg)
jax.block_until_ready((g_tri_r, g_tri_s))


def rel_err(a, b):
    a, b = np.asarray(a), np.asarray(b)
    denom = np.maximum(np.abs(a).max(), 1e-6)
    return float(np.abs(a - b).max() / denom)


fields = ("emittance", "albedo", "specular", "opacity", "roughness",
          "metallic")
errs = {f: rel_err(getattr(g_tri_r, f), getattr(g_tri_s, f))
        for f in fields}
errs_sph = {f: rel_err(getattr(g_sph_r, f), getattr(g_sph_s, f))
            for f in fields}
out["replay_vs_scan_ad"] = {
    "tri_max_rel_err": errs, "sphere_max_rel_err": errs_sph,
    "primal_max_abs_diff": float(np.abs(np.asarray(img_r)
                                        - np.asarray(img_s)).max()),
    "pass": all(e < 1e-3 for e in list(errs.values())
                + list(errs_sph.values())),
}
print("replay-vs-scan:", out["replay_vs_scan_ad"]["pass"],
      max(errs.values()), flush=True)

# --- 2. forward vs reverse AD on TPU (probe direction on albedo)
from pathtrace_tpu.diff.grad import render_with_params


def loss_fn(tri_mat):
    img = render_with_params(scene, tri_mat, scene.spheres.mat, cam, 4,
                             key, cfg)
    return jnp.sum(img)


tri_mat = scene.mat
g = np.random.default_rng(0)
tangent = replace(
    tri_mat,
    **{f: jnp.asarray(g.normal(size=np.asarray(getattr(tri_mat, f)).shape)
                      .astype(np.float32)) for f in fields})
fwd = jax.jit(lambda m, t: jax.jvp(loss_fn, (m,), (t,))[1])
rev = jax.jit(lambda m, t: sum(
    jnp.vdot(a, b) for a, b in zip(
        jax.tree_util.tree_leaves(jax.grad(loss_fn)(m)),
        jax.tree_util.tree_leaves(t))))
d_fwd = float(fwd(tri_mat, tangent))
d_rev = float(rev(tri_mat, tangent))
out["forward_vs_reverse"] = {
    "jvp": d_fwd, "vjp_dot": d_rev,
    "rel_err": abs(d_fwd - d_rev) / max(abs(d_fwd), 1e-9),
    "pass": abs(d_fwd - d_rev) / max(abs(d_fwd), 1e-9) < 1e-3,
}
print("fwd-vs-rev:", out["forward_vs_reverse"], flush=True)

# --- 3. production training-step timing at 128x128 @ 64 spp
cam128 = procedural.default_camera(128, 128)
mesh1 = make_ray_mesh(1)
target = jnp.zeros((128, 128, 3), jnp.float32)
loss, grads, img = train_step_replay_sharded(scene, cam128, target, 64,
                                             key, mesh1, cfg)
jax.block_until_ready(loss)
t1 = time.perf_counter()
N = 3
for _ in range(N):
    loss, grads, img = train_step_replay_sharded(scene, cam128, target, 64,
                                                 key, mesh1, cfg)
jax.block_until_ready(loss)
dt = (time.perf_counter() - t1) / N
out["train_step_replay"] = {
    "resolution": [128, 128], "spp": 64,
    "seconds_per_step": round(dt, 3),
    "steps_per_sec": round(1.0 / dt, 4),
    "paths_per_sec": round(128 * 128 * 64 / dt, 1),
}
print("train step (replay r4):", out["train_step_replay"], flush=True)

# --- 3b. the r5 wavefront-taped production step
step_wt = jax.jit(lambda s, t, k: train_step_wavetape_sharded(
    s, cam128, t, 64, k, mesh1, cfg, 16384, 32768))
out_wt = step_wt(scene, target, key)
jax.block_until_ready(out_wt)
t1 = time.perf_counter()
for i in range(N):
    # fresh key per call: defeats any same-args fast-path artifact
    out_wt = step_wt(scene, target, rng.make_key(100 + i))
jax.block_until_ready(out_wt)
dtw = (time.perf_counter() - t1) / N
out["train_step_wavetape"] = {
    "resolution": [128, 128], "spp": 64,
    "seconds_per_step": round(dtw, 3),
    "steps_per_sec": round(1.0 / dtw, 4),
    "paths_per_sec": round(128 * 128 * 64 / dtw, 1),
    "speedup_vs_replay_step": round(dt / dtw, 2),
}
print("train step (wavetape r5):", out["train_step_wavetape"], flush=True)

# --- 4. tape memory from XLA analysis (TPU-compiled)
from pathtrace_tpu.diff.replay import record_paths


def recorded(org, dirn, ids):
    rad, recs = record_paths(scene, org, dirn, ids, key, cfg)
    return rad, recs


r = 4096
orgs = jnp.zeros((r, 3), jnp.float32) + jnp.asarray([0.0, 20.0, 50.0])
dirs = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (r, 1))
ids = jnp.arange(r, dtype=jnp.int32)
rad, recs = jax.jit(recorded)(orgs, dirs, ids)
tape_bytes = sum(np.asarray(x).dtype.itemsize * np.asarray(x).size
                 for x in jax.tree_util.tree_leaves(recs))
out["record_tape"] = {
    "lanes": r, "max_iters": cfg.max_iters,
    "tape_bytes_total": int(tape_bytes),
    "tape_bytes_per_lane_per_iter": round(
        tape_bytes / r / cfg.max_iters, 2),
}
print("tape:", out["record_tape"], flush=True)

# --- 5. mesh-scene gradients: blob82k via the KD v3 backend on TPU
from pathtrace_tpu.diff import material_grads
from pathtrace_tpu.diff.wavetape import material_grads_wavetape

blob = procedural.blob_mesh_scene().with_kd_binned().to_device()
cam32 = procedural.default_camera(32, 32)
kb = rng.make_key(5)
gm_tri_w, _, img_w = material_grads_wavetape(blob, cam32, 4, kb, cfg,
                                             lanes=4096, chunk=4096)
gm_tri_s, _, _ = material_grads(blob, cam32, 4, kb, cfg=cfg)
img_s = _rwp(blob, blob.mat, blob.spheres.mat, cam32, 4, kb, cfg)
jax.block_until_ready((gm_tri_w, gm_tri_s))
errs_mesh = {f: rel_err(getattr(gm_tri_w, f), getattr(gm_tri_s, f))
             for f in fields}
out["mesh_grads"] = {
    "scene": "blob82k (81934 tris, KD pair-block v3 backend)",
    "resolution": [32, 32], "spp": 4,
    "wavetape_vs_scan_ad_max_rel_err": errs_mesh,
    "primal_max_abs_diff": float(np.abs(np.asarray(img_w)
                                        - np.asarray(img_s)).max()),
    "pass": all(e < 1e-3 for e in errs_mesh.values()),
}
print("mesh grads:", out["mesh_grads"]["pass"],
      max(errs_mesh.values()), flush=True)

out["wall_seconds_total"] = round(time.time() - t0, 1)
out["pass"] = bool(out["replay_vs_scan_ad"]["pass"]
                   and out["forward_vs_reverse"]["pass"]
                   and out["mesh_grads"]["pass"])
with open("gradcheck_tpu_r05.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps({"pass": out["pass"]}), flush=True)
