"""Shipped scene/config presets: the five BASELINE.json configs.

The reference hardcodes its scene and config in the viewer + #defines
(renderer.cpp:102-144, CudaUtil.cuh:15-19, main.cpp:15-16) and lists a
JSON scene description as TODO (README.md:33); here presets are data.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

from pathtrace_tpu.integrator.config import IntegratorConfig
from pathtrace_tpu.models import procedural


@dataclasses.dataclass(frozen=True)
class Preset:
    name: str
    description: str
    build_scene: Callable
    width: int
    height: int
    spp: int
    cfg: IntegratorConfig = IntegratorConfig()
    use_bvh: bool = True


PRESETS = {
    # BASELINE.json configs[0]
    "cornell64": Preset(
        name="cornell64",
        description="Cornell box (diffuse walls + area light), 64x64 @ "
                    "16spp, NEE on, CPU-runnable JAX reference",
        build_scene=lambda: procedural.cornell_box_scene(),
        width=64, height=64, spp=16, use_bvh=False,
    ),
    # configs[1]
    "diffuse256": Preset(
        name="diffuse256",
        description="Diffuse room 256x256 @ 256spp (NEE vs no-NEE A/B)",
        build_scene=lambda: procedural.cornell_box_scene(),
        width=256, height=256, spp=256,
    ),
    "diffuse256_nonee": Preset(
        name="diffuse256_nonee",
        description="Diffuse room 256x256 @ 256spp without NEE",
        build_scene=lambda: procedural.cornell_box_scene(),
        width=256, height=256, spp=256,
        cfg=IntegratorConfig(nee=False),
    ),
    # configs[2] - bunny-class real OBJ asset through the OBJ/MTL loader
    "mesh512": Preset(
        name="mesh512",
        description="82k-tri OBJ asset (assets/blob82k.obj) via the "
                    "OBJ/MTL loader + SAH BVH, 512x512 @ 256spp",
        build_scene=lambda: procedural.blob_mesh_scene(),
        width=512, height=512, spp=256,
    ),
    # configs[3]
    "glass512": Preset(
        name="glass512",
        description="Reflection/refraction scene (specular + dielectric, "
                    "IOR grads) 512x512 @ 1024spp",
        build_scene=lambda: procedural.glass_scene(),
        width=512, height=512, spp=1024,
    ),
    # configs[4] - multi-host target
    "multihost1024": Preset(
        name="multihost1024",
        description="Bunny-in-box 1024x1024 @ 2048spp, tiles sharded over "
                    "hosts with grad allreduce",
        build_scene=lambda: procedural.sphere_mesh_scene(subdivisions=6),
        width=1024, height=1024, spp=2048,
    ),
    # the reference demo scene (renderer.cpp:102-144)
    "reference_demo": Preset(
        name="reference_demo",
        description="Cornell room + the reference's two analytic spheres "
                    "(metallic rough 0.2, transparent rough 0.05)",
        build_scene=lambda: procedural.cornell_box_scene(include_spheres=True,
                                                        include_boxes=False),
        width=240, height=540, spp=64,
    ),
}


def get_preset(name: str) -> Preset:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; have {sorted(PRESETS)}")
    return PRESETS[name]


def build_preset_scene(preset: Preset, to_device: bool = True):
    scene = preset.build_scene()
    if preset.use_bvh:
        # accel structure by scene size: MT-matmul handles small scenes
        # outright; large ones get the KD-cell Pallas pair-block
        # traversal (accel/kdgrid.py - the round-4 production mesh path).
        if scene.num_tris > 4096:
            scene = scene.with_kd_binned()
        else:
            scene = scene.with_bvh().with_mt()
    if to_device:
        scene = scene.to_device()
    return scene
