"""Finite-difference gradient oracle.

The reference has no gradients at all; the north star requires our pixel
gradients w.r.t. material parameters and light emission to match a
finite-difference oracle (allclose @ 1e-3). With deterministic
counter-based RNG the render is a pure function of its inputs, so central
differences with the *same key* estimate the derivative of the exact same
estimator realization that autodiff differentiates.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp

from pathtrace_tpu.core.camera import Camera
from pathtrace_tpu.diff.grad import render_with_params
from pathtrace_tpu.integrator.config import IntegratorConfig
from pathtrace_tpu.models.scene import Scene


def make_frozen_sampler(scene: Scene):
    """HitRecord -> Material gather of the UNPERTURBED scene's materials,
    for make_bounce_fn's sample_mat_fn.

    Freezing the sampling-side materials pins the entire path realization
    (sampled directions, lobe families, pdf denominators, transparency
    flags) while the eval-side materials vary, so a central difference
    measures exactly the detached-sampling derivative production autodiff
    computes (cfg.detach_sampling) - including on chaotic transport
    (glass/metal spheres) where FD of the live sampler is dominated by
    O(1/h) discrete-flip jump terms."""
    import jax

    tri_mat = jax.lax.stop_gradient(scene.mat)
    sph_mat = jax.lax.stop_gradient(scene.spheres.mat)
    n_tris = max(scene.num_tris, 1)
    n_sph = scene.num_spheres

    def sample_mat_fn(hit):
        tm = tri_mat.gather(jnp.clip(hit.prim_id, 0, n_tris - 1))
        if n_sph == 0:
            return tm
        sm = sph_mat.gather(jnp.clip(hit.prim_id, 0, n_sph - 1))
        sel = hit.is_sphere[:, None]
        import dataclasses
        return dataclasses.replace(
            tm,
            emittance=jnp.where(sel, sm.emittance, tm.emittance),
            albedo=jnp.where(sel, sm.albedo, tm.albedo),
            specular=jnp.where(sel, sm.specular, tm.specular),
            opacity=jnp.where(hit.is_sphere, sm.opacity, tm.opacity),
            roughness=jnp.where(hit.is_sphere, sm.roughness, tm.roughness),
            metallic=jnp.where(hit.is_sphere, sm.metallic, tm.metallic),
        )

    return sample_mat_fn


def _perturb(mat, field: str, index, h: float):
    # leaves may be numpy (host-built scenes) or jax arrays
    arr = jnp.asarray(getattr(mat, field))
    flat_idx = index if isinstance(index, tuple) else (index,)
    plus = arr.at[flat_idx].add(h)
    minus = arr.at[flat_idx].add(-h)
    import dataclasses
    return (dataclasses.replace(mat, **{field: plus}),
            dataclasses.replace(mat, **{field: minus}))


def fd_material_grad(scene: Scene, camera: Camera, spp: int, key,
                     target: str, field: str, index,
                     h: float = 1e-2,
                     loss_fn: Optional[Callable] = None,
                     cfg: IntegratorConfig = IntegratorConfig(),
                     sample_mat_fn=None) -> float:
    """Central-difference d loss / d mat.field[index].

    target: "tris" or "spheres". index: int or tuple into the field array.

    The default loss sums the rendered image in float64 ON THE HOST: a
    float32 device-side sum quantizes at ~loss * 2^-24, which dominates
    (lp - lm) once h gets small (the adaptive probe below shrinks h to
    step over discontinuity crossings); the host f64 sum keeps the noise
    floor at the per-pixel f32 resolution instead.
    """
    if loss_fn is None:
        loss_fn = lambda img: np.asarray(img, np.float64).sum()
    tri_mat, sph_mat = scene.mat, scene.spheres.mat
    smf = sample_mat_fn
    if target == "tris":
        mp, mm = _perturb(tri_mat, field, index, h)
        lp = loss_fn(render_with_params(scene, mp, sph_mat, camera, spp, key,
                                        cfg, sample_mat_fn=smf))
        lm = loss_fn(render_with_params(scene, mm, sph_mat, camera, spp, key,
                                        cfg, sample_mat_fn=smf))
    elif target == "spheres":
        mp, mm = _perturb(sph_mat, field, index, h)
        lp = loss_fn(render_with_params(scene, tri_mat, mp, camera, spp, key,
                                        cfg, sample_mat_fn=smf))
        lm = loss_fn(render_with_params(scene, tri_mat, mm, camera, spp, key,
                                        cfg, sample_mat_fn=smf))
    else:
        raise ValueError(target)
    return float((lp - lm) / (2.0 * h))


def fd_material_grad_auto(scene: Scene, camera: Camera, spp: int, key,
                          target: str, field: str, index,
                          h0: float = 1e-2, h_min: float = 4e-5,
                          agree: float = 0.02, richardson: bool = False,
                          loss_fn: Optional[Callable] = None,
                          cfg: IntegratorConfig = IntegratorConfig(),
                          sample_mat_fn=None):
    """Adaptive-step central difference: halve h until two consecutive
    estimates agree to `agree` relative error.

    The estimator is only piecewise-smooth in material parameters: a
    sampled direction can cross an accept/reject boundary (zero-direction
    path death, CudaUtil.cuh:335-338) or a lobe-selection threshold, which
    shows up in a fixed-h difference as an O(1/h) spike. Crossings are
    isolated points, so shrinking h eventually brackets none of them and
    the difference quotient converges to the one-sided-smooth derivative
    that autodiff computes. h_min floors the step where float32 loss
    quantization would start to dominate.

    richardson: on convergence, return the h^2-extrapolated combination
    (4*f(h) - f(2h)) / 3 of the two agreeing central differences - kills
    the leading truncation term, typically one to two extra digits on
    smooth parameters without shrinking h into the float32 noise floor.

    Returns (fd, h_used, converged).
    """
    prev = None
    h = h0
    while True:
        cur = fd_material_grad(scene, camera, spp, key, target, field,
                               index, h=h, loss_fn=loss_fn, cfg=cfg,
                               sample_mat_fn=sample_mat_fn)
        if prev is not None:
            scale = max(abs(cur), abs(prev), 1.0)
            if abs(cur - prev) <= agree * scale:
                if richardson:
                    return (4.0 * cur - prev) / 3.0, h, True
                return cur, h, True
        if h <= h_min:
            return cur, h, False
        prev = cur
        h = h / 2.0
