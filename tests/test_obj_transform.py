"""Full model-matrix OBJ import (reference BVH::AddModel, bvh.cpp:153-189).

The reference places models with a general 4x4 model matrix: positions
through the full affine map, N/T/B through the plain linear part with
w=0 (bvh.cpp:173-184). These tests pin our obj_to_arrays equivalents:
a rotated import must match pre-rotated geometry, and the two normal
modes must agree for rotations but differ for non-uniform scale.
"""

import numpy as np
import pytest

from pathtrace_tpu.models.obj import (compose_model_matrix, load_obj,
                                      obj_to_arrays, rotation_matrix)

TINY_OBJ = """
mtllib none.mtl
v 0 0 0
v 1 0 0
v 0 1 0
v 0 0 1
f 1 2 3
f 1 3 4
f 1 4 2
f 2 4 3
"""


@pytest.fixture()
def mesh(tmp_path):
    p = tmp_path / "tet.obj"
    p.write_text(TINY_OBJ)
    return load_obj(str(p))


def test_scale_translation_shorthand_matches_matrix(mesh):
    pos_a, nrm_a, _, _ = obj_to_arrays(mesh, translation=(1, 2, 3), scale=2.5)
    m = compose_model_matrix(translation=(1, 2, 3), scale=2.5)
    pos_b, nrm_b, _, _ = obj_to_arrays(mesh, model_matrix=m)
    np.testing.assert_allclose(pos_a, pos_b, atol=1e-5)
    np.testing.assert_allclose(nrm_a, nrm_b, atol=1e-5)


def test_rotated_import_matches_prerotated_geometry(mesh):
    rot = rotation_matrix((0.3, 1.0, -0.2), 1.1)
    m = compose_model_matrix(translation=(5, -1, 0), scale=1.7, rotation=rot)
    pos_r, nrm_r, _, _ = obj_to_arrays(mesh, model_matrix=m)

    # pre-rotate the raw vertices, then import with identity
    pre = type(mesh)(
        vertices=(mesh.vertices @ (rot * 1.7).T + np.array([5, -1, 0])).astype(
            np.float32),
        normals=(mesh.normals @ rot.T).astype(np.float32),
        uvs=mesh.uvs, faces=mesh.faces, face_mtl=mesh.face_mtl,
        materials=mesh.materials)
    pos_i, nrm_i, _, _ = obj_to_arrays(pre)
    np.testing.assert_allclose(pos_r, pos_i, atol=1e-4)
    np.testing.assert_allclose(nrm_r, nrm_i, atol=1e-5)


def test_normals_stay_unit_and_modes_differ_under_shear(mesh):
    m = compose_model_matrix(scale=(1.0, 4.0, 1.0))
    _, n_ref, _, _ = obj_to_arrays(mesh, model_matrix=m,
                                   normal_mode="reference")
    _, n_it, _, _ = obj_to_arrays(mesh, model_matrix=m,
                                  normal_mode="inverse_transpose")
    np.testing.assert_allclose(np.linalg.norm(n_ref, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(n_it, axis=-1), 1.0, atol=1e-5)
    # non-uniform scale: the reference's plain-linear normal transform
    # (bvh.cpp:178) skews normals; inverse-transpose keeps them normal to
    # the surface. The oblique faces must disagree between modes.
    assert np.abs(n_ref - n_it).max() > 0.1
    # analytic pin: inverse-transpose of diag(1,4,1) is diag(1,1/4,1)
    # followed by renormalization
    raw = mesh.normals @ np.diag([1.0, 0.25, 1.0])
    raw /= np.linalg.norm(raw, axis=-1, keepdims=True)
    np.testing.assert_allclose(n_it, raw.astype(np.float32), atol=1e-5)


def test_rotation_matrix_is_orthonormal():
    r = rotation_matrix((1, 2, 3), 0.7)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-12)
