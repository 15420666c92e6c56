"""Tracing / profiling utilities.

The reference's only telemetry is std::chrono millisecond prints per pass
(pathtracer.cu:234-248) and an occupancy query (227). Here:
- Timer: wall-clock scopes with device sync (block_until_ready)
- RayMeter: rays/sec + paths/sec accounting from the integrator's
  instrumented counters (the north-star metric is rays/sec/chip)
- trace(): context manager around jax.profiler for TensorBoard traces
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Optional

import jax


class Timer:
    """Wall-clock scope timing with optional device sync."""

    def __init__(self):
        self.laps: dict = {}

    @contextlib.contextmanager
    def scope(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            self.laps.setdefault(name, []).append(time.perf_counter() - t0)

    def mean(self, name: str) -> float:
        laps = self.laps.get(name, [])
        return sum(laps) / max(len(laps), 1)

    def report(self) -> str:
        return "\n".join(
            f"{k}: n={len(v)} mean={sum(v)/len(v)*1e3:.2f}ms total={sum(v):.3f}s"
            for k, v in self.laps.items())


@dataclass
class RayMeter:
    """Accumulates path/ray counts and elapsed time for throughput."""

    paths: float = 0.0
    rays: float = 0.0
    seconds: float = 0.0

    def add(self, num_paths: float, num_rays: float, seconds: float) -> None:
        self.paths += num_paths
        self.rays += num_rays
        self.seconds += seconds

    @property
    def paths_per_sec(self) -> float:
        return self.paths / max(self.seconds, 1e-12)

    @property
    def rays_per_sec(self) -> float:
        return self.rays / max(self.seconds, 1e-12)

    def summary(self) -> dict:
        return {
            "paths_per_sec": self.paths_per_sec,
            "rays_per_sec": self.rays_per_sec,
            "rays_per_path": self.rays / max(self.paths, 1.0),
            "seconds": self.seconds,
        }


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace scope (view in TensorBoard / xprof)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
