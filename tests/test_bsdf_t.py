"""Transposed BSDF (ops/pallas/bsdf_t) must match ops/bsdf row-for-row."""

import numpy as np
import jax.numpy as jnp

from pathtrace_tpu.models.scene import Material
from pathtrace_tpu.ops import bsdf
from pathtrace_tpu.ops.bsdf import ShadeFrame
from pathtrace_tpu.ops.pallas import bsdf_t
from pathtrace_tpu.utils import math3


def _random_setup(seed=0, n=512):
    rs = np.random.default_rng(seed)
    normal = rs.normal(size=(n, 3)).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    # orthonormal tangent frame
    helper = np.where(np.abs(normal[:, 0:1]) < 0.9,
                      np.array([[1.0, 0, 0]], np.float32),
                      np.array([[0, 1.0, 0]], np.float32))
    tangent = np.cross(helper, normal)
    tangent /= np.linalg.norm(tangent, axis=-1, keepdims=True)
    bitangent = np.cross(normal, tangent).astype(np.float32)
    wo = rs.normal(size=(n, 3)).astype(np.float32)
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    wi = rs.normal(size=(n, 3)).astype(np.float32)
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    front = rs.random(n) < 0.7
    # materials spanning all four lobes
    rough = np.where(rs.random(n) < 0.4, rs.random(n) * 5e-3,
                     0.02 + rs.random(n)).astype(np.float32)
    opac = np.where(rs.random(n) < 0.5, 1.0,
                    rs.random(n) * 0.9).astype(np.float32)
    mat = Material(
        emittance=np.zeros((n, 3), np.float32),
        albedo=rs.random((n, 3)).astype(np.float32),
        specular=(rs.random((n, 3)) * 0.5).astype(np.float32),
        opacity=opac, roughness=rough,
        metallic=rs.random(n).astype(np.float32),
    )
    frame = ShadeFrame(normal=jnp.asarray(normal), tangent=jnp.asarray(tangent),
                       bitangent=jnp.asarray(bitangent),
                       front_face=jnp.asarray(front))
    u = rs.random((3, n)).astype(np.float32)
    return mat, frame, jnp.asarray(wo), jnp.asarray(wi), u


def _transpose(mat: Material, frame: ShadeFrame, wo, wi):
    mat_t = dict(
        emittance=jnp.asarray(mat.emittance).T,
        albedo=jnp.asarray(mat.albedo).T,
        specular=jnp.asarray(mat.specular).T,
        opacity=jnp.asarray(mat.opacity)[None, :],
        roughness=jnp.asarray(mat.roughness)[None, :],
        metallic=jnp.asarray(mat.metallic)[None, :],
    )
    frame_t = dict(normal=frame.normal.T, tangent=frame.tangent.T,
                   bitangent=frame.bitangent.T,
                   front=frame.front_face[None, :])
    return mat_t, frame_t, wo.T, wi.T


def test_eval_matches():
    mat, frame, wo, wi, _ = _random_setup()
    ref = np.asarray(bsdf.eval_bsdfcos(mat, frame, wo, wi))
    mat_t, frame_t, wo_t, wi_t = _transpose(mat, frame, wo, wi)
    got = np.asarray(bsdf_t.eval_bsdfcos(mat_t, frame_t, wo_t, wi_t)).T
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_pdf_matches():
    mat, frame, wo, wi, _ = _random_setup(1)
    ref = np.asarray(bsdf.pdf_bsdf(mat, frame, wo, wi))
    mat_t, frame_t, wo_t, wi_t = _transpose(mat, frame, wo, wi)
    got = np.asarray(bsdf_t.pdf_bsdf(mat_t, frame_t, wo_t, wi_t))[0]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_sample_matches():
    """sample_microfacet uses algebraic sin/cos(arctan q) instead of
    arctan+sin+cos - same math, so directions agree to float tolerance."""
    mat, frame, wo, _, u = _random_setup(2)
    ref = np.asarray(bsdf.sample_bsdf(mat, frame, wo, u[0], u[1], u[2]))
    mat_t, frame_t, wo_t, _ = _transpose(mat, frame, wo, wo)
    got = np.asarray(bsdf_t.sample_bsdf(
        mat_t, frame_t, wo_t, u[0][None, :], u[1][None, :],
        u[2][None, :])).T
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-5)
