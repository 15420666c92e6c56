"""Golden intersection cases: Möller-Trumbore semantics incl. backface
cull, sphere roots, slab test, and the swapped barycentric attribute
convention (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp

from pathtrace_tpu.models.scene import Material, Scene, Spheres, Triangles
from pathtrace_tpu.ops.intersect import raycast_brute
from pathtrace_tpu.accel.traverse import slab_test, safe_inv_dir


def _single_tri_scene(v0, v1, v2, n0=None, n1=None, n2=None):
    pos = np.asarray([[v0, v1, v2]], np.float32)
    if n0 is None:
        e1 = pos[0, 1] - pos[0, 0]
        e2 = pos[0, 2] - pos[0, 0]
        gn = np.cross(e1, e2)
        gn = gn / np.linalg.norm(gn)
        normals = np.broadcast_to(gn, (1, 3, 3)).copy()
    else:
        normals = np.asarray([[n0, n1, n2]], np.float32)
    tris = Triangles.from_vertices(pos, normals)
    return Scene.build(tris, Material.make(1, albedo=(1, 0, 0)))


def test_hit_front_face():
    scene = _single_tri_scene([-1, -1, 0], [1, -1, 0], [0, 1, 0])
    org = jnp.asarray([[0.0, 0.0, 5.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    hit = raycast_brute(scene, org, d)
    assert bool(hit.hit[0])
    np.testing.assert_allclose(float(hit.t[0]), 5.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hit.p[0]), [0, 0, 0], atol=1e-4)
    assert bool(hit.front_face[0])


def test_backface_culled():
    """Same triangle from behind: det < EPS rejects (CudaPrimitive.cuh:99)."""
    scene = _single_tri_scene([-1, -1, 0], [1, -1, 0], [0, 1, 0])
    org = jnp.asarray([[0.0, 0.0, -5.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    hit = raycast_brute(scene, org, d)
    assert not bool(hit.hit[0])


def test_miss_outside():
    scene = _single_tri_scene([-1, -1, 0], [1, -1, 0], [0, 1, 0])
    org = jnp.asarray([[5.0, 5.0, 5.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    hit = raycast_brute(scene, org, d)
    assert not bool(hit.hit[0])


def test_swapped_barycentric_attribute_convention():
    """Reference interpolates attr = (1-u-v)A0 + v*A1 + u*A2 where u is the
    MT weight of V1 and v of V2 (CudaPrimitive.cuh:141-146). Hitting very
    close to V1 must therefore return ~A2's... no: close to V1 means u~1,
    so attr ~ A2 under the swapped convention. Verify exactly that."""
    n0 = [1.0, 0.0, 0.0]
    n1 = [0.0, 1.0, 0.0]
    n2 = [0.0, 0.0, 1.0]
    scene = _single_tri_scene([-1, -1, 0], [1, -1, 0], [0, 1, 0],
                              n0, n1, n2)
    # aim very near V1 = (1,-1,0)
    target = np.array([0.96, -0.94, 0.0])
    org = jnp.asarray([[target[0], target[1], 5.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    hit = raycast_brute(scene, org, d)
    assert bool(hit.hit[0])
    n = np.asarray(hit.normal[0])
    # swapped convention: weight of V1 goes to A2 -> normal ~ n2 = +z
    assert n[2] > 0.9, n


def test_sphere_two_roots():
    spheres = Spheres(center=jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32),
                      radius=jnp.asarray([1.0], jnp.float32),
                      mat=Material.make(1))
    tris = Triangles.from_vertices(np.zeros((0, 3, 3), np.float32),
                                   np.zeros((0, 3, 3), np.float32))
    scene = Scene.build(tris, Material.make(0), spheres)
    org = jnp.asarray([[0.0, 0.0, 5.0], [0.0, 0.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]], jnp.float32)
    hit = raycast_brute(scene, org, d)
    # outside: near root t=4; inside: far root t=1 (near root negative)
    np.testing.assert_allclose(np.asarray(hit.t), [4.0, 1.0], atol=1e-4)
    assert bool(hit.front_face[0])
    assert not bool(hit.front_face[1])  # inside hit is a back face


def test_sphere_behind_misses():
    spheres = Spheres(center=jnp.asarray([[0.0, 0.0, 10.0]], jnp.float32),
                      radius=jnp.asarray([1.0], jnp.float32),
                      mat=Material.make(1))
    tris = Triangles.from_vertices(np.zeros((0, 3, 3), np.float32),
                                   np.zeros((0, 3, 3), np.float32))
    scene = Scene.build(tris, Material.make(0), spheres)
    org = jnp.asarray([[0.0, 0.0, 5.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    hit = raycast_brute(scene, org, d)
    assert not bool(hit.hit[0])


def test_slab_test_basic():
    org = jnp.asarray([[0.0, 0.0, 5.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    inv = safe_inv_dir(d)
    bmin = jnp.asarray([[-1.0, -1.0, -1.0]], jnp.float32)
    bmax = jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32)
    tmin = jnp.zeros((1,))
    tmax = jnp.full((1,), 1e5)
    assert bool(slab_test(org, inv, bmin, bmax, tmin, tmax)[0])
    # box behind the ray
    d2 = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    assert not bool(slab_test(org, safe_inv_dir(d2), bmin, bmax, tmin, tmax)[0])
    # ray starting inside
    org2 = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    assert bool(slab_test(org2, inv, bmin, bmax, tmin, tmax)[0])
    # axis-parallel ray outside slab
    org3 = jnp.asarray([[5.0, 0.0, 5.0]], jnp.float32)
    assert not bool(slab_test(org3, inv, bmin, bmax, tmin, tmax)[0])


def test_closest_of_two():
    pos = np.asarray([
        [[-1, -1, 0], [1, -1, 0], [0, 1, 0]],
        [[-1, -1, -2], [1, -1, -2], [0, 1, -2]],
    ], np.float32)
    e1 = pos[:, 1] - pos[:, 0]
    e2 = pos[:, 2] - pos[:, 0]
    gn = np.cross(e1, e2)
    gn /= np.linalg.norm(gn, axis=-1, keepdims=True)
    normals = np.broadcast_to(gn[:, None, :], pos.shape).copy()
    tris = Triangles.from_vertices(pos, normals)
    scene = Scene.build(tris, Material.make(2))
    org = jnp.asarray([[0.0, 0.0, 5.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    hit = raycast_brute(scene, org, d)
    assert bool(hit.hit[0])
    assert int(hit.prim_id[0]) == 0
    np.testing.assert_allclose(float(hit.t[0]), 5.0, atol=1e-4)
