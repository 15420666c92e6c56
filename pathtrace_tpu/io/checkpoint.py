"""Checkpoint / resume of accumulation state.

The reference's only persistence is re-exporting temp.png per pass with
the accumulation buffer living in unified memory - lost on exit
(pathtracer.cu:236-246; SURVEY.md §5). Here the full accumulation state
(accum image, passes done, base seed, and optionally the material pytree)
round-trips through a single .npz, so a long render or optimization can
resume pass-exactly: with counter-based RNG, resuming pass k reproduces
exactly the samples the uninterrupted run would have drawn.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import numpy as np

from pathtrace_tpu.models.scene import Material

FORMAT_VERSION = 1


def save_state(path: str, accum_image, passes_done: int, seed: int,
               spp_per_pass: int, tri_mat: Optional[Material] = None,
               sph_mat: Optional[Material] = None) -> None:
    arrays = {
        "accum_image": np.asarray(accum_image, np.float32),
        "meta": np.frombuffer(json.dumps({
            "version": FORMAT_VERSION,
            "passes_done": int(passes_done),
            "seed": int(seed),
            "spp_per_pass": int(spp_per_pass),
            "has_materials": tri_mat is not None,
        }).encode(), dtype=np.uint8),
    }
    if tri_mat is not None:
        for f in dataclasses.fields(Material):
            arrays[f"tri_{f.name}"] = np.asarray(getattr(tri_mat, f.name))
    if sph_mat is not None:
        for f in dataclasses.fields(Material):
            arrays[f"sph_{f.name}"] = np.asarray(getattr(sph_mat, f.name))
    tmp = path + ".tmp"
    np.savez(tmp, **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_state(path: str):
    """Returns dict with accum_image, passes_done, seed, spp_per_pass,
    and tri_mat/sph_mat Materials when present."""
    import jax.numpy as jnp

    z = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(z["meta"]).decode())
    assert meta["version"] == FORMAT_VERSION
    out = {
        "accum_image": z["accum_image"],
        "passes_done": meta["passes_done"],
        "seed": meta["seed"],
        "spp_per_pass": meta["spp_per_pass"],
        "tri_mat": None,
        "sph_mat": None,
    }
    if meta.get("has_materials"):
        fields = [f.name for f in dataclasses.fields(Material)]
        out["tri_mat"] = Material(**{f: jnp.asarray(z[f"tri_{f}"])
                                     for f in fields})
        if f"sph_{fields[0]}" in z:
            out["sph_mat"] = Material(**{f: jnp.asarray(z[f"sph_{f}"])
                                         for f in fields})
    return out
