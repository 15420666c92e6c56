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
                     cfg: IntegratorConfig = IntegratorConfig()) -> float:
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
    if target == "tris":
        mp, mm = _perturb(tri_mat, field, index, h)
        lp = loss_fn(render_with_params(scene, mp, sph_mat, camera, spp, key,
                                        cfg))
        lm = loss_fn(render_with_params(scene, mm, sph_mat, camera, spp, key,
                                        cfg))
    elif target == "spheres":
        mp, mm = _perturb(sph_mat, field, index, h)
        lp = loss_fn(render_with_params(scene, tri_mat, mp, camera, spp, key,
                                        cfg))
        lm = loss_fn(render_with_params(scene, tri_mat, mm, camera, spp, key,
                                        cfg))
    else:
        raise ValueError(target)
    return float((lp - lm) / (2.0 * h))


def fd_material_grad_auto(scene: Scene, camera: Camera, spp: int, key,
                          target: str, field: str, index,
                          h0: float = 1e-2, h_min: float = 4e-5,
                          agree: float = 0.02,
                          loss_fn: Optional[Callable] = None,
                          cfg: IntegratorConfig = IntegratorConfig()):
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

    Returns (fd, h_used, converged).
    """
    prev = None
    h = h0
    while True:
        cur = fd_material_grad(scene, camera, spp, key, target, field,
                               index, h=h, loss_fn=loss_fn, cfg=cfg)
        if prev is not None:
            scale = max(abs(cur), abs(prev), 1.0)
            if abs(cur - prev) <= agree * scale:
                return cur, h, True
        if h <= h_min:
            return cur, h, False
        prev = cur
        h = h / 2.0
