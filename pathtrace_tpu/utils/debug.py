"""Debug / numerical-sanity modes.

Replaces the reference's crash-on-NaN macros and device asserts
(CHECKNAN CudaVector.cuh:9-10; integrator asserts CudaUtil.cuh:304-346;
checkCudaErrors -> exit(99) CudaUtil.cuh:23-36) with JAX-native tooling:

- debug_nans(): context manager enabling jax_debug_nans (any NaN produced
  under jit raises with a traceback to the op)
- check_image(): host-side post-hoc validation of a rendered film
- checked_render(): render + invariant checks, for harness/debug use
"""

from __future__ import annotations

import contextlib

import jax
import numpy as np


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


class RenderCheckError(AssertionError):
    pass


def check_image(img, context: str = "render") -> None:
    """Invariants every film must satisfy: finite, non-negative."""
    a = np.asarray(img)
    if not np.isfinite(a).all():
        bad = int((~np.isfinite(a)).sum())
        raise RenderCheckError(f"{context}: {bad} non-finite film values")
    if (a < 0).any():
        raise RenderCheckError(f"{context}: negative radiance in film")


def checked_render(scene, camera, spp, key, cfg=None, **kw):
    from pathtrace_tpu.integrator.render import render
    from pathtrace_tpu.integrator.config import IntegratorConfig

    cfg = cfg or IntegratorConfig()
    img = render(scene, camera, spp, key, cfg, **kw)
    check_image(img)
    return img
