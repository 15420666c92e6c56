"""Film output: ACES tonemap, quantization, PNG/npy export.

Replaces exportImage + ACESFilm + ConverToUint8 (pathtracer.cu:94-122,
CudaUtil.cuh:383-391, image.h:6-8). Oracle comparisons are done in linear
pre-tonemap space (float32 .npy); tonemapping is for preview PNGs only.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def aces_film(x: jnp.ndarray) -> jnp.ndarray:
    """ACES filmic fit, exact reference constants (CudaUtil.cuh:383-391)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def to_uint8(x) -> np.ndarray:
    """uint8(v * 255.99) (image.h:6-8)."""
    x = np.asarray(x)
    return (np.clip(x, 0.0, 1.0) * 255.99).astype(np.uint8)


def write_png(path: str, linear_image, tonemap: bool = True) -> None:
    from PIL import Image

    img = jnp.asarray(linear_image)
    if tonemap:
        img = aces_film(img)
    arr = to_uint8(np.asarray(img))
    Image.fromarray(arr, mode="RGB").save(path)


def write_npy(path: str, linear_image) -> None:
    np.save(path, np.asarray(linear_image, np.float32))


def read_npy(path: str) -> np.ndarray:
    return np.load(path)
