"""Test configuration: run on CPU with a virtual 8-device mesh.

Must set env vars BEFORE jax is imported anywhere (SURVEY.md §4:
distributed tests use xla_force_host_platform_device_count fake devices).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
