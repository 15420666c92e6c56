"""Compact path-record replay differentiation (the north-star backward).

The scan-megakernel backward (diff/grad.py) lets JAX store (or remat) the
full per-bounce activations - including the O(R*T) intersection search.
This module implements the renderer analog of recompute-based long-context
training the survey prescribes (SURVEY.md §5 "long-context", §7 M5):

1. RECORD (primal, no AD): run the lockstep bounce scan with the fast
   detached intersection backend and save, per bounce, only the compact
   discrete outcome the search produced:
       primary:  hit (bool), prim_id (i32), is_sphere (bool)
       shadow:   hit (bool), prim_id (i32), is_sphere (bool)
   ~10 bytes/lane/bounce - everything else (barycentrics, hit points,
   BSDF draws, RR decisions) is deterministically recomputable because
   the RNG is counter-based Philox keyed by (ray_id, path-local bounce).

2. REPLAY (differentiable): run the identical bounce math, but with the
   raycast replaced by a *record-driven* hit reconstruction: gather the
   recorded primitive, recompute t/u/v with the per-lane Moller-Trumbore
   (mt_gather) or the analytic sphere test, and rebuild shading attributes
   differentiably w.r.t. the material/emission parameter pytree. No O(T)
   search appears in the replayed graph, so its VJP stores only O(R)
   per-bounce residuals and never re-walks the scene.

The replay primal equals the record primal up to XLA fusion-reassociation
(~1e-5; the two graphs compile differently) because the recording backend
recomputes (t, u, v) at the winner via the same mt_gather the replay uses
(the MT-matmul and Pallas backends do exactly that; the brute backend
additionally reorders the search). Gradients match the scan-AD estimator because
the recorded discrete outcomes are precisely the quantities scan-AD
detaches at the raycast boundary (ops/mt_matmul.py raycast_matmul).

Reference behavior being differentiated: GetColor_iter's estimator
(CudaUtil.cuh:193-382), quirks preserved by make_bounce_fn.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from pathtrace_tpu.core.camera import Camera
from pathtrace_tpu.integrator.config import IntegratorConfig
from pathtrace_tpu.integrator.megakernel import (default_raycast,
                                                 make_bounce_fn)
from pathtrace_tpu.models.scene import Material, Scene
from pathtrace_tpu.ops.intersect import (BIG_T, HitRecord, _gather_sphere_hit,
                                         _gather_tri_hit, mt_gather)
from pathtrace_tpu.utils import math3, rng
from pathtrace_tpu.utils.pytree import replace


# ---------------------------------------------------------------------------
# record phase
# ---------------------------------------------------------------------------

def record_paths(scene: Scene, org, dirn, ray_ids, base_key,
                 cfg: IntegratorConfig = IntegratorConfig(),
                 raycast_fn=None):
    """Primal bounce scan that tapes the discrete intersection outcomes.

    Returns (radiance (R,3), records) where records is a dict of
    (max_iters, R)-shaped arrays: hit/pid/sph for the primary raycast and
    s_hit/s_pid/s_sph for the NEE shadow raycast of every bounce.
    """
    if raycast_fn is None:
        raycast_fn = default_raycast(scene)
    backend = partial(raycast_fn, scene)

    r = org.shape[0]
    tape: dict = {}

    def rec_raycast(o, d, tn, tx):
        h = backend(o, d, tn, tx)
        tape["hit"] = h.hit
        tape["pid"] = h.prim_id
        tape["sph"] = h.is_sphere
        return h

    from pathtrace_tpu.integrator.megakernel import default_shadow_raycast
    shadow_backend = default_shadow_raycast(scene)

    def rec_shadow(o, d, tn, tx):
        s_hit, s_pid, s_sph = shadow_backend(scene, o, d, tn, tx)
        tape["s_hit"] = s_hit
        tape["s_pid"] = s_pid
        tape["s_sph"] = s_sph
        return s_hit, s_pid, s_sph

    bounce = make_bounce_fn(scene, rec_raycast, cfg, base_key,
                            shadow_fn=rec_shadow)

    def step(state, it):
        tape.clear()
        new_state = bounce(*state[:8], ray_ids, it)[:8]
        if "s_hit" not in tape:  # NEE disabled or no lights
            tape["s_hit"] = jnp.zeros((r,), bool)
            tape["s_pid"] = jnp.zeros((r,), jnp.int32)
            tape["s_sph"] = jnp.zeros((r,), bool)
        rec = dict(tape)
        return new_state, rec

    state0 = _init_state(org, dirn, r)
    state, records = jax.lax.scan(step, state0, jnp.arange(cfg.max_iters))
    return state[2], records


def _init_state(org, dirn, r):
    return (
        org, dirn,
        jnp.zeros((r, 3), jnp.float32),   # radiance
        jnp.ones((r, 3), jnp.float32),    # weight
        jnp.zeros((r,), jnp.int32),       # depth
        jnp.zeros((r,), jnp.int32),       # refract count
        jnp.zeros((r,), bool),            # sticky refraction flag
        jnp.ones((r,), bool),             # alive
    )


# ---------------------------------------------------------------------------
# replay phase: record-driven differentiable hit reconstruction
# ---------------------------------------------------------------------------

def _sphere_t_at(scene: Scene, idx, org, dirn, t_min):
    """Nearest valid root of the recorded sphere, per lane (analytic
    quadratic, Sphere::hit CudaPrimitive.cuh:255-303). t_max plays no role
    at replay: the record already decided this sphere is the winner, and
    for a winning sphere the near root is excluded only by t_min."""
    center = math3.gather_rows(scene.spheres.center, idx)
    radius = math3.gather_rows(scene.spheres.radius, idx)
    oc = org - center
    a = math3.squared_length(dirn)
    half_b = math3.dot(oc, dirn)
    c = math3.squared_length(oc) - radius * radius
    disc = half_b * half_b - a * c
    sqrtd = math3.safe_sqrt(jnp.maximum(disc, 0.0))
    root0 = (-half_b - sqrtd) / a
    root1 = (-half_b + sqrtd) / a
    return jnp.where(root0 >= t_min, root0, root1)


def _replay_hit(scene: Scene, org, dirn, t_min, rec) -> HitRecord:
    """Rebuild the full HitRecord differentiably from a bounce record."""
    r = org.shape[0]
    hit = rec["hit"]
    use_sphere = rec["sph"]
    tri_sel = hit & ~use_sphere

    if scene.num_tris > 0:
        safe_tri = jnp.where(tri_sel, rec["pid"], 0)
        # differentiable recompute at the recorded winner (mirrors
        # raycast_matmul): transport grads flow through org/dirn
        t_tri, u, v, _ = mt_gather(scene.tris, safe_tri, org, dirn, t_min,
                                   jnp.full((r,), BIG_T, jnp.float32))
        tp, tn, tt, tb, tf, tuv = _gather_tri_hit(
            scene, org, dirn, jnp.where(tri_sel, t_tri, 0.0), u, v, safe_tri)
        tmat = scene.mat.gather(safe_tri)
    else:
        z3 = jnp.zeros((r, 3), jnp.float32)
        t_tri = jnp.zeros((r,), jnp.float32)
        tp = tn = tt = tb = z3
        tf = jnp.zeros((r,), bool)
        tuv = jnp.zeros((r, 2), jnp.float32)
        tmat = Material.make(1).gather(jnp.zeros((r,), jnp.int32))

    if scene.num_spheres > 0:
        safe_sph = jnp.where(use_sphere, rec["pid"], 0)
        sph_t = _sphere_t_at(scene, safe_sph, org, dirn, t_min)
        sp, sn, stt, sb, sf, suv = _gather_sphere_hit(
            scene, org, dirn, jnp.where(use_sphere, sph_t, 0.0), safe_sph)
        smat = scene.spheres.mat.gather(safe_sph)
        sel = use_sphere[:, None]
        p = jnp.where(sel, sp, tp)
        normal = jnp.where(sel, sn, tn)
        tangent = jnp.where(sel, stt, tt)
        bitangent = jnp.where(sel, sb, tb)
        front = jnp.where(use_sphere, sf, tf)
        uv = jnp.where(sel, suv, tuv)
        mat = Material(
            emittance=jnp.where(sel, smat.emittance, tmat.emittance),
            albedo=jnp.where(sel, smat.albedo, tmat.albedo),
            specular=jnp.where(sel, smat.specular, tmat.specular),
            opacity=jnp.where(use_sphere, smat.opacity, tmat.opacity),
            roughness=jnp.where(use_sphere, smat.roughness, tmat.roughness),
            metallic=jnp.where(use_sphere, smat.metallic, tmat.metallic),
        )
        t_final = jnp.where(use_sphere, sph_t,
                            jnp.where(tri_sel, t_tri, BIG_T))
    else:
        p, normal, tangent, bitangent, front, uv = tp, tn, tt, tb, tf, tuv
        mat = tmat
        t_final = jnp.where(tri_sel, t_tri, BIG_T)

    return HitRecord(hit=hit, t=t_final, p=p, normal=normal, tangent=tangent,
                     bitangent=bitangent, front_face=front, uv=uv,
                     prim_id=rec["pid"], is_sphere=use_sphere, mat=mat)


def _replay_shadow(scene: Scene, org, dirn, t_min, rec):
    """Recorded shadow outcome as (hit, prim_id, is_sphere) - NEE's
    identity acceptance (nee_contribution) consumes the tape directly;
    light emittance gradients flow through nee_contribution's own
    gather."""
    return rec["s_hit"], rec["s_pid"], rec["s_sph"]


def replay_paths(scene: Scene, records, org, dirn, ray_ids, base_key,
                 cfg: IntegratorConfig = IntegratorConfig()):
    """Differentiable re-execution of recorded paths -> radiance (R, 3).

    Reverse-mode through this scan stores O(R) residuals per bounce and
    performs zero intersection searches.
    """
    r = org.shape[0]

    def step(state, xs):
        rec, it = xs
        bounce = make_bounce_fn(
            scene,
            lambda o, d, tn, tx: _replay_hit(scene, o, d, tn, rec),
            cfg, base_key,
            shadow_fn=lambda o, d, tn, tx: _replay_shadow(scene, o, d, tn,
                                                          rec))
        return bounce(*state[:8], ray_ids, it)[:8], None

    state0 = _init_state(org, dirn, r)
    state, _ = jax.lax.scan(step, state0,
                            (records, jnp.arange(cfg.max_iters)))
    return state[2]


# ---------------------------------------------------------------------------
# user-facing: render + material grads via record/replay
# ---------------------------------------------------------------------------

def _camera_rays(scene: Scene, camera: Camera, sample_idx, base_key,
                 pix_offset=0, num_pix_local=None):
    """Camera rays for sample `sample_idx`, optionally restricted to the
    contiguous pixel slice [pix_offset, pix_offset + num_pix_local) - the
    sharded path gives each chip a slice but keys RNG by GLOBAL ray id so
    N-chip gradients are path-identical to 1-chip (SURVEY.md §4)."""
    num_pix = camera.width * camera.height
    npl = num_pix if num_pix_local is None else num_pix_local
    pixel_ids = pix_offset + jnp.arange(npl, dtype=jnp.int32)
    px = (pixel_ids % camera.width).astype(jnp.float32)
    py = (pixel_ids // camera.width).astype(jnp.float32)
    ray_ids = sample_idx * num_pix + pixel_ids
    ju = rng.pixel_jitter(base_key, ray_ids)
    dirs = camera.ray_directions(px, py, ju[:, 0], ju[:, 1])
    org = jnp.broadcast_to(camera.pos, dirs.shape)
    return org, dirs, ray_ids


def _material_grads_replay_impl(scene: Scene, camera: Camera, spp: int,
                                base_key, cfg, loss_grad_flat,
                                pix_offset=0, num_pix_local=None):
    """Record/replay gradient core over a pixel slice (full image when
    num_pix_local is None). loss_grad_flat: (num_pix_local, 3) cotangent.
    Returns (g_tri, g_sph, flat (num_pix_local, 3) image slice)."""
    num_pix = camera.width * camera.height
    npl = num_pix if num_pix_local is None else num_pix_local
    ct = loss_grad_flat / float(spp)

    def per_sample(carry, s):
        g_tri, g_sph, accum = carry
        org, dirs, ray_ids = _camera_rays(scene, camera, s, base_key,
                                          pix_offset, num_pix_local)
        _, records = record_paths(scene, org, dirs, ray_ids, base_key, cfg)

        def f(tri_mat, sph_mat):
            sc = replace(scene, mat=tri_mat,
                         spheres=replace(scene.spheres, mat=sph_mat))
            rad = replay_paths(sc, records, org, dirs, ray_ids, base_key,
                               cfg)
            return jnp.sum(rad * ct), rad

        (_, rad), grads = jax.value_and_grad(f, argnums=(0, 1),
                                             has_aux=True)(
            scene.mat, scene.spheres.mat)
        g_tri = jax.tree.map(jnp.add, g_tri, grads[0])
        g_sph = jax.tree.map(jnp.add, g_sph, grads[1])
        return (g_tri, g_sph, accum + rad), None

    zero_tri = jax.tree.map(jnp.zeros_like, scene.mat)
    zero_sph = jax.tree.map(jnp.zeros_like, scene.spheres.mat)
    accum0 = jnp.zeros((npl, 3), jnp.float32)
    (g_tri, g_sph, accum), _ = jax.lax.scan(
        per_sample, (zero_tri, zero_sph, accum0), jnp.arange(spp))
    return g_tri, g_sph, accum / spp


@partial(jax.jit, static_argnames=("spp", "cfg"))
def material_grads_replay(scene: Scene, camera: Camera, spp: int, base_key,
                          cfg: IntegratorConfig = IntegratorConfig(),
                          loss_grad_img=None):
    """(d loss / d tri_materials, d loss / d sphere_materials, image).

    loss = sum(image * loss_grad_img) with loss_grad_img defaulting to
    ones - i.e. summed pixel gradients, directly comparable to
    diff/grad.material_grads and the FD oracle.

    Per sample: one fast recorded forward (detached search backend), then
    a VJP of the cheap replay. Gradients accumulate across samples so peak
    memory is one sample's O(R * max_iters) compact record.
    """
    num_pix = camera.width * camera.height
    if loss_grad_img is None:
        loss_grad_img = jnp.ones((camera.height, camera.width, 3),
                                 jnp.float32)
    g_tri, g_sph, flat = _material_grads_replay_impl(
        scene, camera, spp, base_key, cfg,
        loss_grad_img.reshape(num_pix, 3))
    return g_tri, g_sph, flat.reshape(camera.height, camera.width, 3)
