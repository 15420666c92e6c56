"""Differentiable rendering: gradients w.r.t. material parameters.

The whole estimator (megakernel bounce scan) is reverse-differentiable;
with IntegratorConfig.detach_sampling the sampled directions, pdfs, RR
decisions and discrete lobe/light picks are stop_gradient'ed, giving the
standard *detached sampling* differentiable-rendering estimator: unbiased
gradients of the radiance estimate w.r.t. albedo / roughness / metallic /
specular (hence IOR, which the reference derives from specular,
CudaUtil.cuh:231) / opacity thresholds aside, and emission - the
capability set the north star demands, verified against the
finite-difference oracle in diff/fd.py.

Geometry (vertex positions, silhouettes, visibility) is explicitly out of
scope and detached at the raycast boundary.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from pathtrace_tpu.core.camera import Camera
from pathtrace_tpu.integrator.config import IntegratorConfig
from pathtrace_tpu.integrator.render import render
from pathtrace_tpu.models.scene import Material, Scene
from pathtrace_tpu.utils.pytree import replace


def render_with_params(scene: Scene, tri_mat: Material, sph_mat: Material,
                       camera: Camera, spp: int, key,
                       cfg: IntegratorConfig = IntegratorConfig(),
                       sample_mat_fn=None):
    """Render with the material pytrees as explicit (differentiable) args.

    sample_mat_fn (static): optional sampling-side material override, see
    make_bounce_fn / diff.fd.make_frozen_sampler."""
    s = replace(scene, mat=tri_mat,
                spheres=replace(scene.spheres, mat=sph_mat))
    return render(s, camera, spp, key, cfg, sample_mat_fn=sample_mat_fn)


def material_grads(scene: Scene, camera: Camera, spp: int, key,
                   loss_fn: Optional[Callable] = None,
                   cfg: IntegratorConfig = IntegratorConfig()):
    """(d loss / d tri_materials, d loss / d sphere_materials, loss).

    loss_fn maps the (H, W, 3) linear image to a scalar; default: sum
    (so gradients are summed pixel gradients, directly comparable to the
    FD oracle's per-parameter pixel-sum derivative).
    """
    if loss_fn is None:
        loss_fn = jnp.sum

    def f(tri_mat, sph_mat):
        img = render_with_params(scene, tri_mat, sph_mat, camera, spp, key,
                                 cfg)
        return loss_fn(img)

    loss, grads = jax.value_and_grad(f, argnums=(0, 1))(
        scene.mat, scene.spheres.mat)
    return grads[0], grads[1], loss
