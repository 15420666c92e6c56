"""Transposed BSDF library for the fused Pallas bounce kernel.

Same lobe set and semantics as ops/bsdf.py (yocto-gl-derived, Bxdf.cuh),
but every quantity is laid out LANE-MAJOR: scalars are (1, B) rows and
3-vectors are (3, B) blocks. On TPU the lane axis (last dim) is the
128-wide vector axis, so per-ray math vectorizes across rays and channel
reductions run along the cheap sublane axis - the layout the fused bounce
kernel keeps all state in (tris-on-sublanes / rays-on-lanes, validated at
~6x the XLA matmul raycast's speed in ops/pallas/intersect_t.py).

Everything here is plain jnp, so the functions run identically inside a
Pallas kernel, under interpret mode, and in ordinary XLA (the unit tests
compare them row-for-row against ops/bsdf.py).

One deliberate numeric deviation: sample_microfacet computes sin/cos of
theta = arctan(q) algebraically (cos = rsqrt(1+q^2), sin = q*cos) instead
of arctan+sin+cos (Bxdf.cuh:142-149) - identical math, fewer
transcendentals, ulp-level differences only.

Materials are dicts of rows: emittance/albedo/specular (3, B);
opacity/roughness/metallic (1, B). Frames are dicts: normal/tangent/
bitangent (3, B), front (1, B) bool.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PI = 3.141592
INV_PI = 1.0 / PI
EPS = 1e-4    # math3.EPS (reference CudaPrimitive.cuh:11)
TINY = 1e-20  # math3.TINY


# ---------------------------------------------------------------------------
# transposed vector helpers ((3, B) blocks, (1, B) rows)
# ---------------------------------------------------------------------------

def dot3(a, b):
    return jnp.sum(a * b, axis=0, keepdims=True)          # (1, B)


def cross3(a, b):
    return jnp.concatenate([
        a[1:2] * b[2:3] - a[2:3] * b[1:2],
        a[2:3] * b[0:1] - a[0:1] * b[2:3],
        a[0:1] * b[1:2] - a[1:2] * b[0:1],
    ], axis=0)


def sqlen3(v):
    return jnp.sum(v * v, axis=0, keepdims=True)


def len3(v):
    return jnp.sqrt(jnp.maximum(sqlen3(v), TINY))


def normalize3(v):
    """0 -> 0 like math3.normalize (zero = dead-sample sentinel)."""
    sq = sqlen3(v)
    inv = jnp.where(sq > TINY, jax.lax.rsqrt(jnp.maximum(sq, TINY)), 0.0)
    return v * inv


def reflect3(w, n):
    return -w + 2.0 * dot3(n, w) * n


def refract3(w, n, inv_eta):
    """inv_eta: (1, B). TIR -> zero vector (math3.refract)."""
    cosine = dot3(n, w)
    k = 1.0 + inv_eta * inv_eta * (cosine * cosine - 1.0)
    k_pos = k > 0.0
    k_safe = jnp.where(k_pos, k, 1.0)
    out = -w * inv_eta + (inv_eta * cosine - jnp.sqrt(k_safe)) * n
    return jnp.where(k_pos, out, 0.0)


def lerp3(x, y, alpha):
    return x * (1.0 - alpha) + y * alpha


def mean3_t(v):
    """(3, B) -> (1, B) with the reference's 0.333333 (Bxdf.cuh:18-21)."""
    return jnp.sum(v, axis=0, keepdims=True) * 0.333333


def max3_t(v):
    return jnp.max(v, axis=0, keepdims=True)


def safe_div(a, b, eps=TINY):
    return a / jnp.where(jnp.abs(b) > eps, b, jnp.where(b >= 0, eps, -eps))


def safe_sqrt(x):
    positive = x > 1e-12
    return jnp.where(positive, jnp.sqrt(jnp.where(positive, x, 1.0)), 0.0)


# ---------------------------------------------------------------------------
# Fresnel / microfacet building blocks (Bxdf.cuh:49-158)
# ---------------------------------------------------------------------------

def reflectivity_to_eta(reflectivity):
    r = jnp.clip(reflectivity, 0.0, 0.99)
    sr = safe_sqrt(r)
    return (1.0 + sr) / (1.0 - sr)


def ior_from_specular(specular):
    """(1, B) from (3, B) specular: channel x only (CudaUtil.cuh:231)."""
    return reflectivity_to_eta(specular[0:1])


def fresnel_dielectric(eta, normal, outgoing):
    cosw = jnp.abs(dot3(normal, outgoing))
    sin2 = 1.0 - cosw * cosw
    eta2 = eta * eta
    cos2t = 1.0 - sin2 / jnp.maximum(eta2, TINY)
    tir = cos2t < 0.0
    t0 = safe_sqrt(cos2t)
    t1 = eta * t0
    t2 = eta * cosw
    rs = safe_div(cosw - t1, cosw + t1)
    rp = safe_div(t0 - t2, t0 + t2)
    f = (rs * rs + rp * rp) / 2.0
    return jnp.where(tir, 1.0, f)


def fresnel_schlick(specular, normal, outgoing):
    cosine = dot3(normal, outgoing)
    pow5 = jnp.clip(1.0 - jnp.abs(cosine), EPS, 0.999) ** 5.0
    f = specular + (1.0 - specular) * pow5
    zero = sqlen3(specular) < EPS
    return jnp.where(zero, 0.0, f)


def microfacet_distribution(roughness, normal, halfway):
    cosine = dot3(normal, halfway)
    r2 = roughness * roughness
    c2 = cosine * cosine
    divisor = jnp.maximum(c2 * r2 + 1.0 - c2, 1e-2)
    d = r2 / (PI * divisor * divisor)
    return jnp.where(cosine <= EPS, 0.0, d)


def microfacet_shadowing1(roughness, normal, halfway, direction):
    cosine = dot3(normal, direction)
    cosineh = dot3(halfway, direction)
    c2 = cosine * cosine
    r2 = roughness * roughness
    denom = jnp.abs(cosine) + safe_sqrt(c2 - r2 * c2 + r2)
    g = 2.0 * jnp.abs(cosine) / jnp.maximum(denom, TINY)
    return jnp.where(cosine * cosineh <= 0.0, 0.0, g)


def microfacet_shadowing(roughness, normal, halfway, outgoing, incoming):
    return (microfacet_shadowing1(roughness, normal, halfway, outgoing)
            * microfacet_shadowing1(roughness, normal, halfway, incoming))


def sample_microfacet(roughness, frame, u_phi, u_ry):
    phi = 2.0 * PI * u_phi
    ry = jnp.clip(u_ry, 0.0, 1.0 - 1e-6)
    # tan(theta) = roughness * sqrt(ry/(1-ry)); algebraic sin/cos of
    # arctan (see module docstring)
    q = roughness * safe_sqrt(ry / (1.0 - ry))
    ct = jax.lax.rsqrt(1.0 + q * q)
    st = q * ct
    return (jnp.cos(phi) * st * frame["tangent"]
            + jnp.sin(phi) * st * frame["bitangent"]
            + ct * frame["normal"])


def sample_microfacet_pdf(roughness, frame, halfway):
    cosine = dot3(frame["normal"], halfway)
    pdf = microfacet_distribution(roughness, frame["normal"], halfway) * cosine
    return jnp.where(cosine < 0.0, 0.0, pdf)


def sample_hemisphere_cosine(frame, u_phi, u_ct):
    phi = 2.0 * PI * u_phi
    ct = safe_sqrt(u_ct)
    st = safe_sqrt(1.0 - ct * ct)
    v = (jnp.cos(phi) * st * frame["tangent"]
         + jnp.sin(phi) * st * frame["bitangent"]
         + ct * frame["normal"])
    return normalize3(v)


def outward_normal(frame):
    """Geometric-side normal (Bxdf.cuh:238)."""
    return jnp.where(frame["front"], frame["normal"], -frame["normal"])


# ---------------------------------------------------------------------------
# Lobe 0: gltfpbr (Bxdf.cuh:160-207)
# ---------------------------------------------------------------------------

def eval_gltfpbr(mat, frame, wo, wi):
    n = frame["normal"]
    same_hemi = dot3(n, wi) * dot3(n, wo) > 0.0
    reflectivity = lerp3(mat["specular"], mat["albedo"], mat["metallic"])
    f1 = fresnel_schlick(reflectivity, n, wo)
    halfway = normalize3(wi + wo)
    f = fresnel_schlick(reflectivity, halfway, wi)
    d = microfacet_distribution(mat["roughness"], n, halfway)
    g = microfacet_shadowing(mat["roughness"], n, halfway, wo, wi)
    k = (1.0 - mat["metallic"]) * (1.0 - f1)
    abs_cos_wi = jnp.abs(dot3(n, wi))
    denom = 4.0 * dot3(n, wo) * dot3(n, wi)
    spec = f * d * g * safe_div(abs_cos_wi, denom)
    diffuse = mat["albedo"] * k * INV_PI * abs_cos_wi
    return jnp.where(same_hemi, diffuse + spec, 0.0)


def sample_gltfpbr(mat, frame, wo, u_lobe, u_phi, u_ry):
    n = frame["normal"]
    reflectivity = lerp3(mat["specular"], mat["albedo"], mat["metallic"])
    f_mean = mean3_t(fresnel_schlick(reflectivity, n, wo))
    pick_spec = u_lobe < f_mean
    halfway = sample_microfacet(mat["roughness"], frame, u_phi, u_ry)
    wi_spec = reflect3(wo, halfway)
    bad = dot3(n, wi_spec) * dot3(n, wo) < -EPS
    wi_spec = jnp.where(bad, 0.0, wi_spec)
    wi_diff = sample_hemisphere_cosine(frame, u_phi, u_ry)
    return jnp.where(pick_spec, wi_spec, wi_diff)


def pdf_gltfpbr(mat, frame, wo, wi):
    n = frame["normal"]
    same_hemi = dot3(n, wi) * dot3(n, wo) > 0.0
    halfway = normalize3(wo + wi)
    reflectivity = lerp3(mat["specular"], mat["albedo"], mat["metallic"])
    f = mean3_t(fresnel_schlick(reflectivity, n, wo))
    pdf_spec = safe_div(sample_microfacet_pdf(mat["roughness"], frame, halfway),
                        4.0 * jnp.abs(dot3(wo, halfway)))
    pdf_diff = dot3(n, wi) * INV_PI
    pdf = f * pdf_spec + (1.0 - f) * pdf_diff
    return jnp.where(same_hemi, pdf, 0.0)


# ---------------------------------------------------------------------------
# Lobe 1: delta reflective (Bxdf.cuh:211-234)
# ---------------------------------------------------------------------------

def eval_reflective(mat, frame, wo, wi):
    n = frame["normal"]
    same_hemi = dot3(n, wi) * dot3(n, wo) > 0.0
    reflectivity = lerp3(mat["specular"], mat["albedo"], mat["metallic"])
    f1 = fresnel_schlick(reflectivity, n, wo)
    f = fresnel_schlick(reflectivity, n, wi)
    k = (1.0 - mat["metallic"]) * (1.0 - f1)
    abs_cos_wi = jnp.abs(dot3(n, wi))
    val = mat["albedo"] * k * INV_PI * abs_cos_wi + f * abs_cos_wi
    return jnp.where(same_hemi, val, 0.0)


def sample_reflective(mat, frame, wo):
    return reflect3(wo, frame["normal"])


# ---------------------------------------------------------------------------
# Lobes 2/3: refractive (Walter 2007) + delta refractive (Bxdf.cuh:236-370)
# ---------------------------------------------------------------------------

def _refractive_setup(mat, frame, wo):
    normal = outward_normal(frame)
    entering = dot3(normal, wo) >= 0.0
    up_normal = jnp.where(entering, normal, -normal)
    ior = ior_from_specular(mat["specular"])
    rel_ior = jnp.where(entering, ior, 1.0 / jnp.maximum(ior, TINY))
    return normal, entering, up_normal, ior, rel_ior


def _walter_halfway(rel_ior, entering, wi, wo):
    h = -normalize3(rel_ior * wi + wo)
    return jnp.where(entering, h, -h)


def eval_refractive(mat, frame, wo, wi):
    normal, entering, up_normal, _, rel_ior = _refractive_setup(mat, frame, wo)
    reflecting = dot3(normal, wi) * dot3(normal, wo) >= 0.0
    abs_cos_wi = jnp.abs(dot3(normal, wi))

    h_r = normalize3(wi + wo)
    f_r = fresnel_dielectric(rel_ior, h_r, wo)
    d_r = microfacet_distribution(mat["roughness"], up_normal, h_r)
    g_r = microfacet_shadowing(mat["roughness"], up_normal, h_r, wo, wi)
    denom_r = jnp.abs(4.0 * dot3(normal, wo) * dot3(normal, wi))
    val_r = f_r * d_r * g_r * safe_div(abs_cos_wi, denom_r)

    h_t = _walter_halfway(rel_ior, entering, wi, wo)
    f_t = fresnel_dielectric(rel_ior, h_t, wo)
    d_t = microfacet_distribution(mat["roughness"], up_normal, h_t)
    g_t = microfacet_shadowing(mat["roughness"], up_normal, h_t, wo, wi)
    jac_num = dot3(wo, h_t) * dot3(wi, h_t)
    jac_den = dot3(wo, normal) * dot3(wi, normal)
    denom_t = (rel_ior * dot3(h_t, wi) + dot3(h_t, wo)) ** 2
    val_t = (jnp.abs(safe_div(jac_num, jac_den))
             * (1.0 - f_t) * d_t * g_t * safe_div(abs_cos_wi, denom_t))

    return mat["albedo"] * jnp.where(reflecting, val_r, val_t)


def sample_refractive(mat, frame, wo, u_lobe, u_phi, u_ry):
    normal, entering, up_normal, ior, rel_ior = _refractive_setup(mat, frame,
                                                                  wo)
    halfway = sample_microfacet(mat["roughness"], frame, u_phi, u_ry)
    f = fresnel_dielectric(rel_ior, halfway, wo)
    pick_reflect = u_lobe < f

    wi_r = reflect3(wo, halfway)
    bad_r = ~(dot3(normal, wo) * dot3(normal, wi_r) >= 0.0)
    wi_r = jnp.where(bad_r, 0.0, wi_r)

    inv_eta = jnp.where(entering, 1.0 / jnp.maximum(ior, TINY), ior)
    wi_t = refract3(wo, halfway, inv_eta)
    bad_t = dot3(normal, wo) * dot3(normal, wi_t) >= 0.0
    wi_t = jnp.where(bad_t, 0.0, wi_t)
    return jnp.where(pick_reflect, wi_r, wi_t)


def pdf_refractive(mat, frame, wo, wi):
    normal, entering, up_normal, _, rel_ior = _refractive_setup(mat, frame, wo)
    reflecting = dot3(normal, wi) * dot3(normal, wo) >= 0.0
    h_r = normalize3(wi + wo)
    pdf_r = (fresnel_dielectric(rel_ior, h_r, wo)
             * sample_microfacet_pdf(mat["roughness"], frame, h_r)
             * safe_div(jnp.ones_like(rel_ior), 4.0 * jnp.abs(dot3(wo, h_r))))
    h_t = _walter_halfway(rel_ior, entering, wi, wo)
    denom_t = (rel_ior * dot3(h_t, wi) + dot3(h_t, wo)) ** 2
    pdf_t = ((1.0 - fresnel_dielectric(rel_ior, h_t, wo))
             * sample_microfacet_pdf(mat["roughness"], frame, h_t)
             * safe_div(jnp.abs(dot3(h_t, wi)), denom_t))
    return jnp.where(reflecting, pdf_r, pdf_t)


def eval_pure_refractive(mat, frame, wo, wi):
    normal, entering, up_normal, _, rel_ior = _refractive_setup(mat, frame, wo)
    reflecting = dot3(normal, wi) * dot3(normal, wo) >= 0.0
    h_r = normalize3(wi + wo)
    f_r = fresnel_dielectric(rel_ior, h_r, wo)
    h_t = _walter_halfway(rel_ior, entering, wi, wo)
    f_t = fresnel_dielectric(rel_ior, h_t, wo)
    val_t = (1.0 - f_t) / jnp.maximum(rel_ior * rel_ior, TINY)
    return mat["albedo"] * jnp.where(reflecting, f_r, val_t)


def sample_pure_refractive(mat, frame, wo, u_lobe):
    normal, entering, up_normal, ior, rel_ior = _refractive_setup(mat, frame,
                                                                  wo)
    f = fresnel_dielectric(rel_ior, up_normal, wo)
    pick_reflect = u_lobe < f
    wi_r = reflect3(wo, up_normal)
    inv_eta = jnp.where(entering, 1.0 / jnp.maximum(ior, TINY), ior)
    wi_t = refract3(wo, up_normal, inv_eta)
    return jnp.where(pick_reflect, wi_r, wi_t)


def pdf_pure_refractive(mat, frame, wo, wi):
    normal, entering, up_normal, _, rel_ior = _refractive_setup(mat, frame, wo)
    reflecting = dot3(normal, wi) * dot3(normal, wo) >= 0.0
    h_r = normalize3(wi + wo)
    f_r = fresnel_dielectric(rel_ior, h_r, wo)
    h_t = _walter_halfway(rel_ior, entering, wi, wo)
    f_t = 1.0 - fresnel_dielectric(rel_ior, h_t, wo)
    return jnp.where(reflecting, f_r, f_t)


# ---------------------------------------------------------------------------
# Branchless four-lobe dispatch (opacity/roughness policy,
# CudaUtil.cuh:248-270/284-334)
# ---------------------------------------------------------------------------

def _lobe_masks(mat):
    transparent = mat["opacity"] < (1.0 - EPS)
    delta = mat["roughness"] < 1e-2
    return transparent, delta


def eval_bsdfcos(mat, frame, wo, wi):
    transparent, delta = _lobe_masks(mat)
    opaque_v = jnp.where(delta, eval_reflective(mat, frame, wo, wi),
                         eval_gltfpbr(mat, frame, wo, wi))
    trans_v = jnp.where(delta, eval_pure_refractive(mat, frame, wo, wi),
                        eval_refractive(mat, frame, wo, wi))
    return jnp.where(transparent, trans_v, opaque_v)


def sample_bsdf(mat, frame, wo, u_lobe, u_phi, u_ry):
    transparent, delta = _lobe_masks(mat)
    opaque_v = jnp.where(delta, sample_reflective(mat, frame, wo),
                         sample_gltfpbr(mat, frame, wo, u_lobe, u_phi, u_ry))
    trans_v = jnp.where(delta, sample_pure_refractive(mat, frame, wo, u_lobe),
                        sample_refractive(mat, frame, wo, u_lobe, u_phi, u_ry))
    return jnp.where(transparent, trans_v, opaque_v)


def pdf_bsdf(mat, frame, wo, wi):
    transparent, delta = _lobe_masks(mat)
    ones = jnp.ones_like(mat["roughness"])  # pdf_reflective == 1
    opaque_v = jnp.where(delta, ones, pdf_gltfpbr(mat, frame, wo, wi))
    trans_v = jnp.where(delta, pdf_pure_refractive(mat, frame, wo, wi),
                        pdf_refractive(mat, frame, wo, wi))
    return jnp.where(transparent, trans_v, opaque_v)
