"""BSDF unit tests: Fresnel identities, sample/pdf consistency (χ²-light),
importance-sampled vs uniform-sampled reflectance agreement, energy bounds
(SURVEY.md §4 test plan)."""

import numpy as np
import jax
import jax.numpy as jnp

from pathtrace_tpu.models.scene import Material
from pathtrace_tpu.ops import bsdf
from pathtrace_tpu.ops.bsdf import ShadeFrame
from pathtrace_tpu.utils import math3


def _frame(n):
    normal = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n, 1))
    tangent = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (n, 1))
    bitangent = np.tile(np.array([[0.0, 1.0, 0.0]], np.float32), (n, 1))
    return ShadeFrame(normal=jnp.asarray(normal), tangent=jnp.asarray(tangent),
                      bitangent=jnp.asarray(bitangent),
                      front_face=jnp.ones((n,), bool))


def _uniform_sphere(n, seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return jnp.asarray(v)


def test_fresnel_normal_incidence():
    eta = jnp.asarray([1.5], jnp.float32)
    n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    wo = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    f = bsdf.fresnel_dielectric(eta, n, wo)
    expected = ((1.5 - 1) / (1.5 + 1)) ** 2
    np.testing.assert_allclose(np.asarray(f), [expected], atol=1e-5)


def test_fresnel_tir():
    # from inside glass (eta < 1) at grazing angle -> total internal reflection
    eta = jnp.asarray([1 / 1.5], jnp.float32)
    n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    grazing = math3.normalize(jnp.asarray([[1.0, 0.0, 0.2]], jnp.float32))
    f = bsdf.fresnel_dielectric(eta, n, grazing)
    np.testing.assert_allclose(np.asarray(f), [1.0], atol=1e-6)


def test_eta_reflectivity_roundtrip():
    eta = jnp.asarray([1.1, 1.5, 2.0], jnp.float32)
    r = bsdf.eta_to_reflectivity(eta)
    back = bsdf.reflectivity_to_eta(r)
    np.testing.assert_allclose(np.asarray(back), np.asarray(eta), rtol=1e-4)


def test_reflect_refract_conventions():
    n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    w = math3.normalize(jnp.asarray([[1.0, 0.0, 1.0]], jnp.float32))
    r = math3.reflect(w, n)
    np.testing.assert_allclose(np.asarray(r[0]),
                               np.asarray(math3.normalize(
                                   jnp.asarray([[-1.0, 0.0, 1.0]]))[0]),
                               atol=1e-6)
    # Snell: sin(theta_t) = inv_eta * sin(theta_i)
    inv_eta = jnp.asarray([1 / 1.5], jnp.float32)
    t = math3.refract(w, n, inv_eta)
    sin_i = np.sqrt(1 - np.dot(np.asarray(w[0]), [0, 0, 1]) ** 2)
    sin_t = np.sqrt(max(0.0, 1 - np.asarray(t[0] @ jnp.asarray([0., 0., -1.])) ** 2))
    np.testing.assert_allclose(sin_t, sin_i / 1.5, atol=1e-5)


def test_gltfpbr_pdf_integrates_to_one():
    """MC over the sphere: ∫ pdf dω ≈ 1 for the gltfpbr sampler."""
    n = 200_000
    mat = Material.make(n, albedo=(0.6, 0.4, 0.3), roughness=0.5,
                        specular=(0.04,) * 3, metallic=0.3)
    frame = _frame(n)
    wo = math3.normalize(jnp.broadcast_to(
        jnp.asarray([0.3, 0.1, 0.8], jnp.float32), (n, 3)))
    wi = _uniform_sphere(n, 0)
    pdf = np.asarray(bsdf.pdf_gltfpbr(mat, frame, wo, wi))
    integral = pdf.mean() * 4.0 * np.pi
    assert abs(integral - 1.0) < 0.05, integral


def test_gltfpbr_importance_matches_uniform():
    """Reflectance ∫ f·cos dω estimated two ways must agree."""
    n = 400_000
    mat = Material.make(n, albedo=(0.7, 0.5, 0.2), roughness=0.6,
                        specular=(0.04,) * 3, metallic=0.0)
    frame = _frame(n)
    wo = math3.normalize(jnp.broadcast_to(
        jnp.asarray([0.2, -0.1, 0.9], jnp.float32), (n, 3)))

    # uniform-sphere estimator
    wi_u = _uniform_sphere(n, 1)
    f_u = np.asarray(bsdf.eval_gltfpbr(mat, frame, wo, wi_u))
    est_u = f_u.mean(axis=0) * 4.0 * np.pi

    # importance-sampled estimator
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.random((3, n), dtype=np.float64).astype(np.float32))
    wi_s = bsdf.sample_gltfpbr(mat, frame, wo, u[0], u[1], u[2])
    alive = np.asarray(math3.squared_length(wi_s)) > 1e-8
    f_s = np.asarray(bsdf.eval_gltfpbr(mat, frame, wo, wi_s))
    pdf_s = np.maximum(np.asarray(bsdf.pdf_gltfpbr(mat, frame, wo, wi_s)), 1e-8)
    est_s = np.where(alive[:, None], f_s / pdf_s[:, None], 0.0).mean(axis=0)

    np.testing.assert_allclose(est_s, est_u, rtol=0.05, atol=0.01)


def test_gltfpbr_energy_bound():
    """White albedo, dielectric: reflectance must stay <= ~1 per channel."""
    n = 200_000
    mat = Material.make(n, albedo=(1.0, 1.0, 1.0), roughness=0.8,
                        specular=(0.04,) * 3, metallic=0.0)
    frame = _frame(n)
    wo = math3.normalize(jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (n, 3)))
    wi = _uniform_sphere(n, 3)
    f = np.asarray(bsdf.eval_gltfpbr(mat, frame, wo, wi))
    est = f.mean(axis=0) * 4 * np.pi
    assert (est < 1.15).all(), est  # reference BRDF is not strictly conserving


def test_refractive_pdf_total_mass_matches_reference_quirk():
    """The reference's rough-refractive pdf (Bxdf.cuh:291-315, Walter 2007
    eq. 17 *without* the eta^2 Jacobian factor) integrates to
    E_h[F + (1-F)/rel_ior^2], NOT to 1 - the transmission lobe's mass is
    (1-F)/eta^2. We reproduce the estimator faithfully (estimator parity),
    so assert the quirk-correct total mass."""
    n = 400_000
    mat = Material.make(n, albedo=(1.0, 1.0, 1.0), roughness=0.3,
                        specular=(0.04,) * 3, opacity=0.0, metallic=0.0)
    frame = _frame(n)
    wo = math3.normalize(jnp.broadcast_to(
        jnp.asarray([0.2, 0.0, 0.95], jnp.float32), (n, 3)))
    wi = _uniform_sphere(n, 4)
    pdf = np.asarray(bsdf.pdf_refractive(mat, frame, wo, wi))
    integral = pdf.mean() * 4.0 * np.pi

    # expected mass from the sampler's own halfway distribution
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.random((2, n)), jnp.float32)
    h = bsdf.sample_microfacet(mat.roughness, frame, u[0], u[1])
    rel_ior = np.asarray(bsdf.ior_from_specular(mat.specular))
    f = np.asarray(bsdf.fresnel_dielectric(jnp.asarray(rel_ior), h, wo))
    expected = (f + (1.0 - f) / rel_ior ** 2).mean()
    assert abs(integral - expected) < 0.06, (integral, expected)
    assert integral < 0.75  # definitively not normalized - the quirk is real


def test_lobe_selection_policy():
    mat = Material(
        emittance=jnp.zeros((4, 3)), albedo=jnp.ones((4, 3)),
        specular=jnp.full((4, 3), 0.04),
        opacity=jnp.asarray([1.0, 1.0, 0.0, 0.0], jnp.float32),
        roughness=jnp.asarray([0.5, 0.001, 0.5, 0.001], jnp.float32),
        metallic=jnp.zeros((4,)),
    )
    lobes = np.asarray(bsdf.select_lobe(mat))
    np.testing.assert_array_equal(
        lobes, [bsdf.LOBE_GLTFPBR, bsdf.LOBE_REFLECTIVE,
                bsdf.LOBE_REFRACTIVE, bsdf.LOBE_PURE_REFRACTIVE])


def test_all_lobes_nan_free_on_garbage():
    """Every lobe must be finite on arbitrary inputs (masked-lane safety:
    gradients die if any lane produces NaN before its `where`)."""
    n = 10_000
    rng = np.random.default_rng(5)
    mat = Material(
        emittance=jnp.zeros((n, 3)),
        albedo=jnp.asarray(rng.random((n, 3), dtype=np.float64), jnp.float32),
        specular=jnp.asarray(rng.random((n, 3)) * 0.99, jnp.float32),
        opacity=jnp.asarray(rng.random(n), jnp.float32),
        roughness=jnp.asarray(rng.random(n), jnp.float32),
        metallic=jnp.asarray(rng.random(n), jnp.float32),
    )
    frame = _frame(n)
    wo = _uniform_sphere(n, 6)
    wi = _uniform_sphere(n, 7)
    u = jnp.asarray(rng.random((3, n)), jnp.float32)
    for fn in (bsdf.eval_gltfpbr, bsdf.eval_reflective, bsdf.eval_refractive,
               bsdf.eval_pure_refractive):
        assert np.isfinite(np.asarray(fn(mat, frame, wo, wi))).all(), fn
    for fn in (bsdf.pdf_gltfpbr, bsdf.pdf_reflective, bsdf.pdf_refractive,
               bsdf.pdf_pure_refractive):
        assert np.isfinite(np.asarray(fn(mat, frame, wo, wi))).all(), fn
    assert np.isfinite(np.asarray(
        bsdf.sample_gltfpbr(mat, frame, wo, u[0], u[1], u[2]))).all()
    assert np.isfinite(np.asarray(
        bsdf.sample_refractive(mat, frame, wo, u[0], u[1], u[2]))).all()
    assert np.isfinite(np.asarray(
        bsdf.sample_pure_refractive(mat, frame, wo, u[0]))).all()
    assert np.isfinite(np.asarray(
        bsdf.sample_reflective(mat, frame, wo))).all()


def test_grad_nan_free():
    """d(render-style weight)/d(material) finite on random lanes."""
    n = 512
    rng = np.random.default_rng(8)
    frame = _frame(n)
    wo = _uniform_sphere(n, 9)
    wi = _uniform_sphere(n, 10)

    def loss(roughness, albedo):
        mat = Material(
            emittance=jnp.zeros((n, 3)), albedo=albedo,
            specular=jnp.full((n, 3), 0.04), opacity=jnp.ones((n,)),
            roughness=roughness, metallic=jnp.zeros((n,)))
        val = bsdf.eval_bsdfcos(mat, frame, wo, wi)
        return jnp.sum(jnp.where(jnp.isfinite(val), val, 0.0))

    rough = jnp.asarray(rng.random(n), jnp.float32)
    alb = jnp.asarray(rng.random((n, 3)), jnp.float32)
    g1, g2 = jax.grad(loss, argnums=(0, 1))(rough, alb)
    assert np.isfinite(np.asarray(g1)).all()
    assert np.isfinite(np.asarray(g2)).all()
