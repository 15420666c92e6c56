"""Test configuration: force CPU with a virtual 8-device mesh.

This image preloads jax in EVERY interpreter via an axon sitecustomize and
sets JAX_PLATFORMS=axon globally, so plain env manipulation here is too
late (jax is already imported) - but backends initialize lazily, so
switching the platform via jax.config before the first device use still
works. The TPU is a single exclusively-locked device; tests must never
touch it (SURVEY.md §4: distributed tests use
xla_force_host_platform_device_count fake devices).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", (
    "tests must run on CPU, not the exclusive TPU")
