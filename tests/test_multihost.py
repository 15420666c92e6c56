"""Two-process jax.distributed exercise of the multi-host path.

Spawns two localhost processes (4 fake CPU devices each -> 8 global),
which initialize a jax.distributed cluster, build
parallel.distributed.global_ray_mesh(), and render through the sharded
production wavefront with cross-process collectives. The gathered image
must equal the single-process 8-device render of the same configuration:
RNG is keyed by global path id, so the partition across processes is
invisible (the multi-host analog of test_sharding's shard-invariance).

The reference has no multi-host story (single GPU, pathtracer.cu); this
is pure north-star scope.
"""

import os
import socket
import subprocess
import sys

import numpy as np


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


# (no pytest.mark.timeout: pytest-timeout is not installed here; the
# subprocess communicate(timeout=540) below is the real guard)
def test_two_process_render_matches_single_process(tmp_path):
    port = _free_port()
    out = str(tmp_path / "mh.npz")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own 4-device count
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools/multihost_worker.py"),
             str(i), str(port), out],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(o.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-3000:]}"
    data = np.load(out)
    assert data["process_count"] == 2
    assert data["global_devices"] == 8

    # single-process 8-device reference (this process has 8 fake devices)
    import jax.numpy as jnp
    from pathtrace_tpu.models import procedural
    from pathtrace_tpu.parallel.mesh import (make_ray_mesh,
                                             render_wavefront_sharded)
    from pathtrace_tpu.integrator.config import IntegratorConfig
    from pathtrace_tpu.utils import rng

    scene = procedural.cornell_box_scene().with_mt()
    cam = procedural.default_camera(16, 16)
    film, rays = render_wavefront_sharded(scene, cam, 4, rng.make_key(3),
                                          make_ray_mesh(8),
                                          IntegratorConfig(), lanes=512)
    ref = np.asarray(film).reshape(data["img"].shape)
    np.testing.assert_allclose(data["img"], ref, rtol=1e-5, atol=1e-6)
    assert float(data["rays"]) == float(np.asarray(rays))
