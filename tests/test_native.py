"""Native C++ BVH builder vs numpy reference: identical build semantics."""

import numpy as np
import pytest

from pathtrace_tpu import native
from pathtrace_tpu.accel.bvh import build_bvh, validate_bvh
from pathtrace_tpu.models import procedural


needs_native = pytest.mark.skipif(native.get_lib() is None,
                                  reason="no C++ toolchain")


@needs_native
def test_native_matches_numpy_small():
    scene = procedural.cornell_box_scene()
    pos = np.stack([np.asarray(scene.tris.v0), np.asarray(scene.tris.v1),
                    np.asarray(scene.tris.v2)], axis=1)
    b_np, o_np = build_bvh(pos, backend="numpy")
    b_cc, o_cc = build_bvh(pos, backend="native")
    assert b_np.num_nodes == b_cc.num_nodes
    np.testing.assert_array_equal(np.asarray(b_np.prim_start),
                                  np.asarray(b_cc.prim_start))
    np.testing.assert_array_equal(np.asarray(b_np.next_hit),
                                  np.asarray(b_cc.next_hit))
    np.testing.assert_array_equal(np.asarray(b_np.next_miss),
                                  np.asarray(b_cc.next_miss))
    np.testing.assert_array_equal(o_np, o_cc)
    np.testing.assert_allclose(np.asarray(b_np.bmin), np.asarray(b_cc.bmin),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(b_np.bmax), np.asarray(b_cc.bmax),
                               atol=1e-5)


@needs_native
def test_native_matches_numpy_dense():
    pos = procedural.icosphere(radius=3.0, center=(0, 5, 0), subdivisions=4)
    b_np, o_np = build_bvh(pos, backend="numpy")
    b_cc, o_cc = build_bvh(pos, backend="native")
    assert b_np.num_nodes == b_cc.num_nodes
    assert b_np.max_depth == b_cc.max_depth
    np.testing.assert_array_equal(o_np, o_cc)
    np.testing.assert_array_equal(np.asarray(b_np.next_hit),
                                  np.asarray(b_cc.next_hit))
    validate_bvh(b_cc, pos, o_cc)


@needs_native
def test_native_valid_on_large():
    pos = procedural.icosphere(radius=3.0, center=(0, 5, 0), subdivisions=6)
    b_cc, o_cc = build_bvh(pos, backend="native")
    validate_bvh(b_cc, pos, o_cc)
    assert b_cc.max_leaf <= 4
