"""The committed bunny-class OBJ asset through the full ingestion path.

Covers what the reference exercises with its assimp bunny import
(renderer.cpp:108-115, model.h:77-93): a real multi-megabyte OBJ file
parsed from disk, smooth normals generated, SAH built over genuinely
irregular geometry (~37x triangle-area ratio), and a render through the
accelerated traversal agreeing with brute force.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pathtrace_tpu.models import procedural
from pathtrace_tpu.models.procedural import blob_mesh_scene
from pathtrace_tpu.utils import rng


@pytest.fixture(scope="module")
def scene():
    return blob_mesh_scene()


def test_blob_asset_loads(scene):
    assert scene.num_tris > 80000
    v0 = np.asarray(scene.tris.v0)
    assert np.isfinite(v0).all()
    # smooth normals were generated (no vn in the file)
    n = np.asarray(scene.tris.n0)
    assert np.allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-3)
    # MTL applied to the blob tris (Kd 0.9 0.75 0.4), room appended after
    alb = np.asarray(scene.mat.albedo)
    assert np.allclose(alb[0], (0.9, 0.75, 0.4), atol=1e-5)
    assert scene.num_lights > 0  # room light discovered


def test_blob_bvh_invariants(scene):
    from pathtrace_tpu.accel.bvh import build_bvh, validate_bvh

    positions = np.stack([np.asarray(scene.tris.v0),
                          np.asarray(scene.tris.v1),
                          np.asarray(scene.tris.v2)], axis=1)
    bvh, order = build_bvh(positions)
    validate_bvh(bvh, positions, order)
    # irregular geometry: the asset's point is a non-uniform triangulation
    areas = np.asarray(scene.tris.area)
    blob = areas[:81920]
    assert blob.max() / blob.min() > 10.0


def test_blob_binned_matches_brute(scene):
    """Closest hits through the binned two-level traversal == brute force
    on random rays into the asset."""
    from pathtrace_tpu.accel.binned import raycast_binned
    from pathtrace_tpu.ops.intersect import raycast_brute

    sc = scene.with_binned()
    r = 128
    g = np.random.default_rng(0)
    org = np.tile(np.array([[0.0, 20.0, 55.0]], np.float32), (r, 1))
    target = g.uniform(-12, 12, (r, 3)).astype(np.float32)
    target[:, 1] += 10.0
    d = target - org
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    org_j, d_j = jnp.asarray(org), jnp.asarray(d)
    t_min = jnp.zeros((r,), jnp.float32)
    t_max = jnp.full((r,), 999999.0, jnp.float32)

    hb = raycast_brute(scene, org_j, d_j, t_min, t_max)
    ha = raycast_binned(sc, org_j, d_j, t_min, t_max)
    np.testing.assert_array_equal(np.asarray(hb.hit), np.asarray(ha.hit))
    h = np.asarray(hb.hit)
    np.testing.assert_allclose(np.asarray(ha.t)[h], np.asarray(hb.t)[h],
                               rtol=1e-5, atol=1e-4)
