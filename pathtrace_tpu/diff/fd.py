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
    """
    if loss_fn is None:
        loss_fn = jnp.sum
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
