"""Batched BSDF/volume shading kernels.

TPU-native equivalents of the reference shading library (yocto_shading.h in
xelatihy/yocto-gl): Fresnel terms, GGX microfacet distribution/shadowing and
sampling, per-lobe eval/sample/pdf triplets (matte, glossy, reflective,
transparent, refractive, translucent, passthrough, gltfpbr — rough and
delta variants), volume transmittance and the Henyey-Greenstein phase
function. All functions broadcast over leading axes: `normal`/`outgoing`/
`incoming` are [..., 3], scalars like `roughness`/`ior` are [...].

Sampling "misses" (e.g. reflected ray below the horizon) return the zero
vector, matching the reference contract so callers can mask on it.
"""

from __future__ import annotations

import jax.numpy as jnp

from .mathops import (basis_fromz, dot, lerp, normalize, pif, reflect,
                      refract, vec)
from .sampling import sample_hemisphere_cos, sample_hemisphere_cos_pdf

ZERO3 = (0.0, 0.0, 0.0)


def _z3(ref):
    return jnp.zeros(ref.shape, jnp.float32)


def same_hemisphere(normal, outgoing, incoming):
    return dot(normal, outgoing) * dot(normal, incoming) >= 0.0


def up_normal(normal, outgoing):
    return jnp.where((dot(normal, outgoing) <= 0.0)[..., None],
                     -normal, normal)


# ----------------------------------------------------------------------------
# Fresnel (yocto_shading.h:309-366)
# ----------------------------------------------------------------------------

def fresnel_schlick(specular, normal, outgoing):
    cosine = dot(normal, outgoing)
    f = specular + (1.0 - specular) * jnp.power(
        jnp.clip(1.0 - jnp.abs(cosine), 0.0, 1.0), 5.0)[..., None]
    zero = ((specular[..., 0] == 0.0) & (specular[..., 1] == 0.0)
            & (specular[..., 2] == 0.0))[..., None]
    return jnp.where(zero, 0.0, f)


def fresnel_dielectric(eta, normal, outgoing):
    cosw = jnp.abs(dot(normal, outgoing))
    sin2 = 1.0 - cosw * cosw
    eta2 = eta * eta
    cos2t = 1.0 - sin2 / eta2
    t0 = jnp.sqrt(jnp.maximum(cos2t, 0.0))
    t1 = eta * t0
    t2 = eta * cosw
    rs = (cosw - t1) / (cosw + t1)
    rp = (t0 - t2) / (t0 + t2)
    f = (rs * rs + rp * rp) / 2.0
    return jnp.where(cos2t < 0.0, 1.0, f)  # total internal reflection


def fresnel_conductor(eta, etak, normal, outgoing):
    cosw = dot(normal, outgoing)
    valid = cosw > 0.0
    cosw = jnp.clip(cosw, -1.0, 1.0)[..., None]
    cos2 = cosw * cosw
    sin2 = jnp.clip(1.0 - cos2, 0.0, 1.0)
    eta2 = eta * eta
    etak2 = etak * etak
    t0 = eta2 - etak2 - sin2
    a2plusb2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * eta2 * etak2, 0.0))
    t1 = a2plusb2 + cos2
    a = jnp.sqrt(jnp.maximum((a2plusb2 + t0) / 2.0, 0.0))
    t2 = 2.0 * a * cosw
    rs = (t1 - t2) / (t1 + t2)
    t3 = cos2 * a2plusb2 + sin2 * sin2
    t4 = t2 * sin2
    rp = rs * (t3 - t4) / (t3 + t4)
    return jnp.where(valid[..., None], (rp + rs) / 2.0, 0.0)


def eta_to_reflectivity(eta):
    return ((eta - 1.0) ** 2) / ((eta + 1.0) ** 2)


def reflectivity_to_eta(reflectivity):
    r = jnp.clip(reflectivity, 0.0, 0.99)
    return (1.0 + jnp.sqrt(r)) / (1.0 - jnp.sqrt(r))


def eta_to_edgetint(eta, etak):
    reflectivity = ((eta - 1.0) ** 2 + etak ** 2) / ((eta + 1.0) ** 2 + etak ** 2)
    numer = (1.0 + jnp.sqrt(reflectivity)) / (1.0 - jnp.sqrt(reflectivity)) - eta
    denom = ((1.0 + jnp.sqrt(reflectivity)) / (1.0 - jnp.sqrt(reflectivity))
             - (1.0 - reflectivity) / (1.0 + reflectivity))
    return reflectivity, numer / denom


def edgetint_to_eta(reflectivity, edgetint):
    r = jnp.clip(reflectivity, 0.0, 0.99)
    g = edgetint
    r_sqrt = jnp.sqrt(r)
    n_min = (1.0 - r) / (1.0 + r)
    n_max = (1.0 + r_sqrt) / (1.0 - r_sqrt)
    n = lerp(n_max, n_min, g)
    k2 = jnp.maximum(((n + 1.0) ** 2 * r - (n - 1.0) ** 2) / (1.0 - r), 0.0)
    return n, jnp.sqrt(k2)


# ----------------------------------------------------------------------------
# Microfacets (GGX; yocto_shading.h:409-560)
# ----------------------------------------------------------------------------

def microfacet_distribution(roughness, normal, halfway, ggx=True):
    cosine = dot(normal, halfway)
    r2 = roughness * roughness
    c2 = cosine * cosine
    if ggx:
        d = r2 / (pif * (c2 * r2 + 1.0 - c2) ** 2)
    else:
        d = jnp.exp((c2 - 1.0) / (r2 * c2)) / (pif * r2 * c2 * c2)
    return jnp.where(cosine <= 0.0, 0.0, d)


def microfacet_shadowing1(roughness, normal, halfway, direction, ggx=True):
    cosine = dot(normal, direction)
    cosineh = dot(halfway, direction)
    r2 = roughness * roughness
    c2 = cosine * cosine
    if ggx:
        g = 2.0 * jnp.abs(cosine) / (
            jnp.abs(cosine) + jnp.sqrt(jnp.maximum(c2 - r2 * c2 + r2, 0.0)))
    else:
        ci = jnp.abs(cosine) / (
            roughness * jnp.sqrt(jnp.maximum(1.0 - c2, 1e-20)))
        g = jnp.where(ci < 1.6,
                      (3.535 * ci + 2.181 * ci * ci)
                      / (1.0 + 2.276 * ci + 2.577 * ci * ci), 1.0)
    return jnp.where(cosine * cosineh <= 0.0, 0.0, g)


def microfacet_shadowing(roughness, normal, halfway, outgoing, incoming,
                         ggx=True):
    return (microfacet_shadowing1(roughness, normal, halfway, outgoing, ggx)
            * microfacet_shadowing1(roughness, normal, halfway, incoming, ggx))


def sample_microfacet(roughness, normal, rn, ggx=True):
    """Sample the NDF (not VNDF), yocto_shading.h:457-472."""
    phi = 2.0 * pif * rn[..., 0]
    if ggx:
        theta = jnp.arctan(
            roughness * jnp.sqrt(rn[..., 1] / (1.0 - rn[..., 1])))
    else:
        r2 = roughness * roughness
        theta = jnp.arctan(jnp.sqrt(-r2 * jnp.log(1.0 - rn[..., 1])))
    local = vec(jnp.cos(phi) * jnp.sin(theta),
                jnp.sin(phi) * jnp.sin(theta), jnp.cos(theta))
    basis = basis_fromz(normal)
    return (local[..., 0:1] * basis[..., 0, :]
            + local[..., 1:2] * basis[..., 1, :]
            + local[..., 2:3] * basis[..., 2, :])


def sample_microfacet_pdf(roughness, normal, halfway, ggx=True):
    cosine = dot(normal, halfway)
    return jnp.where(
        cosine < 0.0, 0.0,
        microfacet_distribution(roughness, normal, halfway, ggx) * cosine)


def microfacet_cosintegral(roughness, normal, outgoing):
    S = (-0.170718, 4.07985, -11.5295, 18.4961, -9.23618)
    T = (0.0632331, 3.1434, -7.47567, 13.0482, -7.0401)
    m = jnp.abs(dot(normal, outgoing))
    r = roughness
    s = (S[0] * jnp.sqrt(m) + S[1] * r + S[2] * r**2 + S[3] * r**3
         + S[4] * r**4)
    t = T[0] * m + T[1] * r + T[2] * r**2 + T[3] * r**3 + T[4] * r**4
    return 1.0 - jnp.power(s, 6.0) * jnp.power(m, 0.75) / (
        jnp.power(t, 6.0) + jnp.power(m, 2.0))


def microfacet_compensation(color, roughness, normal, outgoing):
    E = microfacet_cosintegral(jnp.sqrt(roughness), normal, outgoing)
    return 1.0 + color * ((1.0 - E) / E)[..., None]


# ----------------------------------------------------------------------------
# Matte (yocto_shading.h:562-585)
# ----------------------------------------------------------------------------

def eval_matte(color, normal, outgoing, incoming):
    valid = dot(normal, incoming) * dot(normal, outgoing) > 0.0
    f = color / pif * jnp.abs(dot(normal, incoming))[..., None]
    return jnp.where(valid[..., None], f, 0.0)


def sample_matte(color, normal, outgoing, rn):
    return sample_hemisphere_cos(rn, up_normal(normal, outgoing))


def sample_matte_pdf(color, normal, outgoing, incoming):
    valid = dot(normal, incoming) * dot(normal, outgoing) > 0.0
    pdf = sample_hemisphere_cos_pdf(up_normal(normal, outgoing), incoming)
    return jnp.where(valid, pdf, 0.0)


# ----------------------------------------------------------------------------
# Glossy: diffuse + dielectric microfacet (yocto_shading.h:587-633)
# ----------------------------------------------------------------------------

def eval_glossy(color, ior, roughness, normal, outgoing, incoming):
    valid = dot(normal, incoming) * dot(normal, outgoing) > 0.0
    up = up_normal(normal, outgoing)
    F1 = fresnel_dielectric(ior, up, outgoing)
    halfway = normalize(incoming + outgoing)
    F = fresnel_dielectric(ior, halfway, incoming)
    D = microfacet_distribution(roughness, up, halfway)
    G = microfacet_shadowing(roughness, up, halfway, outgoing, incoming)
    cosi = jnp.abs(dot(up, incoming))
    denom = 4.0 * dot(up, outgoing) * dot(up, incoming)
    safe = jnp.where(denom == 0.0, 1.0, denom)
    f = (color * ((1.0 - F1) / pif * cosi)[..., None]
         + (F * D * G / safe * cosi)[..., None])
    return jnp.where(valid[..., None], f, 0.0)


def sample_glossy(color, ior, roughness, normal, outgoing, rnl, rn):
    up = up_normal(normal, outgoing)
    halfway = sample_microfacet(roughness, up, rn)
    refl = reflect(outgoing, halfway)
    refl_ok = same_hemisphere(up, outgoing, refl)
    diff = sample_hemisphere_cos(rn, up)
    take_refl = rnl < fresnel_dielectric(ior, up, outgoing)
    out = jnp.where(take_refl[..., None], refl, diff)
    bad = take_refl & ~refl_ok
    return jnp.where(bad[..., None], 0.0, out)


def sample_glossy_pdf(color, ior, roughness, normal, outgoing, incoming):
    valid = dot(normal, incoming) * dot(normal, outgoing) > 0.0
    up = up_normal(normal, outgoing)
    halfway = normalize(outgoing + incoming)
    F = fresnel_dielectric(ior, up, outgoing)
    pdf = (F * sample_microfacet_pdf(roughness, up, halfway)
           / (4.0 * jnp.abs(dot(outgoing, halfway)))
           + (1.0 - F) * sample_hemisphere_cos_pdf(up, incoming))
    return jnp.where(valid, pdf, 0.0)


# ----------------------------------------------------------------------------
# Reflective / metal (yocto_shading.h:635-731)
# ----------------------------------------------------------------------------

def eval_reflective(color, roughness, normal, outgoing, incoming):
    valid = dot(normal, incoming) * dot(normal, outgoing) > 0.0
    up = up_normal(normal, outgoing)
    halfway = normalize(incoming + outgoing)
    F = fresnel_conductor(reflectivity_to_eta(color), _z3(color),
                          halfway, incoming)
    D = microfacet_distribution(roughness, up, halfway)
    G = microfacet_shadowing(roughness, up, halfway, outgoing, incoming)
    denom = 4.0 * dot(up, outgoing) * dot(up, incoming)
    safe = jnp.where(denom == 0.0, 1.0, denom)
    f = F * (D * G / safe * jnp.abs(dot(up, incoming)))[..., None]
    return jnp.where(valid[..., None], f, 0.0)


def sample_reflective(color, roughness, normal, outgoing, rn):
    up = up_normal(normal, outgoing)
    halfway = sample_microfacet(roughness, up, rn)
    incoming = reflect(outgoing, halfway)
    ok = same_hemisphere(up, outgoing, incoming)
    return jnp.where(ok[..., None], incoming, 0.0)


def sample_reflective_pdf(color, roughness, normal, outgoing, incoming):
    valid = dot(normal, incoming) * dot(normal, outgoing) > 0.0
    up = up_normal(normal, outgoing)
    halfway = normalize(outgoing + incoming)
    pdf = sample_microfacet_pdf(roughness, up, halfway) / (
        4.0 * jnp.abs(dot(outgoing, halfway)))
    return jnp.where(valid, pdf, 0.0)


def eval_reflective_delta(color, normal, outgoing, incoming):
    valid = dot(normal, incoming) * dot(normal, outgoing) > 0.0
    up = up_normal(normal, outgoing)
    f = fresnel_conductor(reflectivity_to_eta(color), _z3(color), up, outgoing)
    return jnp.where(valid[..., None], f, 0.0)


def sample_reflective_delta(color, normal, outgoing):
    return reflect(outgoing, up_normal(normal, outgoing))


def sample_reflective_delta_pdf(color, normal, outgoing, incoming):
    valid = dot(normal, incoming) * dot(normal, outgoing) > 0.0
    return jnp.where(valid, 1.0, 0.0)


# ----------------------------------------------------------------------------
# glTF PBR (yocto_shading.h:733-785)
# ----------------------------------------------------------------------------

def _gltf_reflectivity(color, ior, metallic):
    base = eta_to_reflectivity(
        jnp.stack([ior, ior, ior], axis=-1))
    return lerp(base, color, metallic[..., None])


def eval_gltfpbr(color, ior, roughness, metallic, normal, outgoing, incoming):
    valid = dot(normal, incoming) * dot(normal, outgoing) > 0.0
    reflectivity = _gltf_reflectivity(color, ior, metallic)
    up = up_normal(normal, outgoing)
    F1 = fresnel_schlick(reflectivity, up, outgoing)
    halfway = normalize(incoming + outgoing)
    F = fresnel_schlick(reflectivity, halfway, incoming)
    D = microfacet_distribution(roughness, up, halfway)
    G = microfacet_shadowing(roughness, up, halfway, outgoing, incoming)
    cosi = jnp.abs(dot(up, incoming))
    denom = 4.0 * dot(up, outgoing) * dot(up, incoming)
    safe = jnp.where(denom == 0.0, 1.0, denom)
    f = (color * (1.0 - metallic[..., None]) * (1.0 - F1)
         * (cosi / pif)[..., None]
         + F * (D * G / safe * cosi)[..., None])
    return jnp.where(valid[..., None], f, 0.0)


def sample_gltfpbr(color, ior, roughness, metallic, normal, outgoing, rnl, rn):
    up = up_normal(normal, outgoing)
    reflectivity = _gltf_reflectivity(color, ior, metallic)
    take_refl = rnl < jnp.mean(
        fresnel_schlick(reflectivity, up, outgoing), axis=-1)
    halfway = sample_microfacet(roughness, up, rn)
    refl = reflect(outgoing, halfway)
    refl_ok = same_hemisphere(up, outgoing, refl)
    diff = sample_hemisphere_cos(rn, up)
    out = jnp.where(take_refl[..., None], refl, diff)
    bad = take_refl & ~refl_ok
    return jnp.where(bad[..., None], 0.0, out)


def sample_gltfpbr_pdf(color, ior, roughness, metallic, normal, outgoing,
                       incoming):
    valid = dot(normal, incoming) * dot(normal, outgoing) > 0.0
    up = up_normal(normal, outgoing)
    halfway = normalize(outgoing + incoming)
    reflectivity = _gltf_reflectivity(color, ior, metallic)
    F = jnp.mean(fresnel_schlick(reflectivity, up, outgoing), axis=-1)
    pdf = (F * sample_microfacet_pdf(roughness, up, halfway)
           / (4.0 * jnp.abs(dot(outgoing, halfway)))
           + (1.0 - F) * sample_hemisphere_cos_pdf(up, incoming))
    return jnp.where(valid, pdf, 0.0)


# ----------------------------------------------------------------------------
# Transparent: thin sheet (yocto_shading.h:787-880)
# ----------------------------------------------------------------------------

def eval_transparent(color, ior, roughness, normal, outgoing, incoming):
    up = up_normal(normal, outgoing)
    refl_side = dot(normal, incoming) * dot(normal, outgoing) >= 0.0
    # reflection branch
    halfway_r = normalize(incoming + outgoing)
    Fr = fresnel_dielectric(ior, halfway_r, outgoing)
    Dr = microfacet_distribution(roughness, up, halfway_r)
    Gr = microfacet_shadowing(roughness, up, halfway_r, outgoing, incoming)
    denom_r = 4.0 * dot(up, outgoing) * dot(up, incoming)
    safe_r = jnp.where(denom_r == 0.0, 1.0, denom_r)
    f_refl = (Fr * Dr * Gr / safe_r * jnp.abs(dot(up, incoming)))[..., None] \
        * jnp.ones_like(color)
    # transmission branch
    reflected = reflect(-incoming, up)
    halfway_t = normalize(reflected + outgoing)
    Ft = fresnel_dielectric(ior, halfway_t, outgoing)
    Dt = microfacet_distribution(roughness, up, halfway_t)
    Gt = microfacet_shadowing(roughness, up, halfway_t, outgoing, reflected)
    denom_t = 4.0 * dot(up, outgoing) * dot(up, reflected)
    safe_t = jnp.where(denom_t == 0.0, 1.0, denom_t)
    f_trans = color * ((1.0 - Ft) * Dt * Gt / safe_t
                       * jnp.abs(dot(up, reflected)))[..., None]
    return jnp.where(refl_side[..., None], f_refl, f_trans)


def sample_transparent(color, ior, roughness, normal, outgoing, rnl, rn):
    up = up_normal(normal, outgoing)
    halfway = sample_microfacet(roughness, up, rn)
    take_refl = rnl < fresnel_dielectric(ior, halfway, outgoing)
    refl = reflect(outgoing, halfway)
    refl_ok = same_hemisphere(up, outgoing, refl)
    trans = -reflect(refl, up)
    trans_ok = ~same_hemisphere(up, outgoing, trans)
    out = jnp.where(take_refl[..., None], refl, trans)
    ok = jnp.where(take_refl, refl_ok, trans_ok)
    return jnp.where(ok[..., None], out, 0.0)


def sample_transparent_pdf(color, ior, roughness, normal, outgoing, incoming):
    up = up_normal(normal, outgoing)
    refl_side = dot(normal, incoming) * dot(normal, outgoing) >= 0.0
    halfway_r = normalize(incoming + outgoing)
    pdf_r = (fresnel_dielectric(ior, halfway_r, outgoing)
             * sample_microfacet_pdf(roughness, up, halfway_r)
             / (4.0 * jnp.abs(dot(outgoing, halfway_r))))
    reflected = reflect(-incoming, up)
    halfway_t = normalize(reflected + outgoing)
    pdf_t = ((1.0 - fresnel_dielectric(ior, halfway_t, outgoing))
             * sample_microfacet_pdf(roughness, up, halfway_t)
             / (4.0 * jnp.abs(dot(outgoing, halfway_t))))
    return jnp.where(refl_side, pdf_r, pdf_t)


def eval_transparent_delta(color, ior, normal, outgoing, incoming):
    up = up_normal(normal, outgoing)
    refl_side = dot(normal, incoming) * dot(normal, outgoing) >= 0.0
    F = fresnel_dielectric(ior, up, outgoing)
    f_refl = jnp.ones_like(color) * F[..., None]
    f_trans = color * (1.0 - F)[..., None]
    return jnp.where(refl_side[..., None], f_refl, f_trans)


def sample_transparent_delta(color, ior, normal, outgoing, rnl):
    up = up_normal(normal, outgoing)
    take_refl = rnl < fresnel_dielectric(ior, up, outgoing)
    return jnp.where(take_refl[..., None], reflect(outgoing, up), -outgoing)


def sample_transparent_delta_pdf(color, ior, normal, outgoing, incoming):
    up = up_normal(normal, outgoing)
    refl_side = dot(normal, incoming) * dot(normal, outgoing) >= 0.0
    F = fresnel_dielectric(ior, up, outgoing)
    return jnp.where(refl_side, F, 1.0 - F)


# ----------------------------------------------------------------------------
# Refractive: true refraction (yocto_shading.h:882-1012)
# ----------------------------------------------------------------------------

def eval_refractive(color, ior, roughness, normal, outgoing, incoming):
    entering = dot(normal, outgoing) >= 0.0
    up = jnp.where(entering[..., None], normal, -normal)
    rel_ior = jnp.where(entering, ior, 1.0 / ior)
    refl_side = dot(normal, incoming) * dot(normal, outgoing) >= 0.0
    # reflection branch
    halfway_r = normalize(incoming + outgoing)
    Fr = fresnel_dielectric(rel_ior, halfway_r, outgoing)
    Dr = microfacet_distribution(roughness, up, halfway_r)
    Gr = microfacet_shadowing(roughness, up, halfway_r, outgoing, incoming)
    denom_r = jnp.abs(4.0 * dot(normal, outgoing) * dot(normal, incoming))
    safe_r = jnp.where(denom_r == 0.0, 1.0, denom_r)
    f_refl = (Fr * Dr * Gr / safe_r
              * jnp.abs(dot(normal, incoming)))[..., None]
    # transmission branch ([Walter 2007] eq. 21)
    halfway_t = -normalize(rel_ior[..., None] * incoming + outgoing) \
        * jnp.where(entering, 1.0, -1.0)[..., None]
    Ft = fresnel_dielectric(rel_ior, halfway_t, outgoing)
    Dt = microfacet_distribution(roughness, up, halfway_t)
    Gt = microfacet_shadowing(roughness, up, halfway_t, outgoing, incoming)
    denom_t = dot(outgoing, normal) * dot(incoming, normal)
    safe_t = jnp.where(denom_t == 0.0, 1.0, denom_t)
    jac_den = (rel_ior * dot(halfway_t, incoming)
               + dot(halfway_t, outgoing)) ** 2
    safe_jd = jnp.where(jac_den == 0.0, 1.0, jac_den)
    f_trans = (jnp.abs(dot(outgoing, halfway_t) * dot(incoming, halfway_t)
                       / safe_t)
               * (1.0 - Ft) * Dt * Gt / safe_jd
               * jnp.abs(dot(normal, incoming)))[..., None]
    f = jnp.where(refl_side[..., None], f_refl, f_trans)
    return f * jnp.ones_like(color)


def sample_refractive(color, ior, roughness, normal, outgoing, rnl, rn):
    entering = dot(normal, outgoing) >= 0.0
    up = jnp.where(entering[..., None], normal, -normal)
    halfway = sample_microfacet(roughness, up, rn)
    rel_ior = jnp.where(entering, ior, 1.0 / ior)
    take_refl = rnl < fresnel_dielectric(rel_ior, halfway, outgoing)
    refl = reflect(outgoing, halfway)
    refl_ok = same_hemisphere(up, outgoing, refl)
    inv_eta = jnp.where(entering, 1.0 / ior, ior)
    trans = refract(outgoing, halfway, inv_eta)
    trans_ok = ~same_hemisphere(up, outgoing, trans)
    out = jnp.where(take_refl[..., None], refl, trans)
    ok = jnp.where(take_refl, refl_ok, trans_ok)
    return jnp.where(ok[..., None], out, 0.0)


def sample_refractive_pdf(color, ior, roughness, normal, outgoing, incoming):
    entering = dot(normal, outgoing) >= 0.0
    up = jnp.where(entering[..., None], normal, -normal)
    rel_ior = jnp.where(entering, ior, 1.0 / ior)
    refl_side = dot(normal, incoming) * dot(normal, outgoing) >= 0.0
    halfway_r = normalize(incoming + outgoing)
    pdf_r = (fresnel_dielectric(rel_ior, halfway_r, outgoing)
             * sample_microfacet_pdf(roughness, up, halfway_r)
             / (4.0 * jnp.abs(dot(outgoing, halfway_r))))
    halfway_t = -normalize(rel_ior[..., None] * incoming + outgoing) \
        * jnp.where(entering, 1.0, -1.0)[..., None]
    jac_den = (rel_ior * dot(halfway_t, incoming)
               + dot(halfway_t, outgoing)) ** 2
    safe_jd = jnp.where(jac_den == 0.0, 1.0, jac_den)
    pdf_t = ((1.0 - fresnel_dielectric(rel_ior, halfway_t, outgoing))
             * sample_microfacet_pdf(roughness, up, halfway_t)
             * jnp.abs(dot(halfway_t, incoming)) / safe_jd)
    return jnp.where(refl_side, pdf_r, pdf_t)


def eval_refractive_delta(color, ior, normal, outgoing, incoming):
    passthrough_ior = jnp.abs(ior - 1.0) < 1e-3
    opposite = dot(normal, incoming) * dot(normal, outgoing) <= 0.0
    entering = dot(normal, outgoing) >= 0.0
    up = jnp.where(entering[..., None], normal, -normal)
    rel_ior = jnp.where(entering, ior, 1.0 / ior)
    refl_side = dot(normal, incoming) * dot(normal, outgoing) >= 0.0
    F = fresnel_dielectric(rel_ior, up, outgoing)
    f = jnp.where(refl_side, F, (1.0 / (rel_ior * rel_ior)) * (1.0 - F))
    f = jnp.where(passthrough_ior,
                  jnp.where(opposite, 1.0, 0.0), f)
    return f[..., None] * jnp.ones_like(color)


def sample_refractive_delta(color, ior, normal, outgoing, rnl):
    passthrough_ior = jnp.abs(ior - 1.0) < 1e-3
    entering = dot(normal, outgoing) >= 0.0
    up = jnp.where(entering[..., None], normal, -normal)
    rel_ior = jnp.where(entering, ior, 1.0 / ior)
    take_refl = rnl < fresnel_dielectric(rel_ior, up, outgoing)
    out = jnp.where(take_refl[..., None], reflect(outgoing, up),
                    refract(outgoing, up, 1.0 / rel_ior))
    return jnp.where(passthrough_ior[..., None], -outgoing, out)


def sample_refractive_delta_pdf(color, ior, normal, outgoing, incoming):
    passthrough_ior = jnp.abs(ior - 1.0) < 1e-3
    opposite = dot(normal, incoming) * dot(normal, outgoing) < 0.0
    entering = dot(normal, outgoing) >= 0.0
    up = jnp.where(entering[..., None], normal, -normal)
    rel_ior = jnp.where(entering, ior, 1.0 / ior)
    refl_side = dot(normal, incoming) * dot(normal, outgoing) >= 0.0
    F = fresnel_dielectric(rel_ior, up, outgoing)
    pdf = jnp.where(refl_side, F, 1.0 - F)
    return jnp.where(passthrough_ior, jnp.where(opposite, 1.0, 0.0), pdf)


# ----------------------------------------------------------------------------
# Translucent + passthrough (yocto_shading.h:1014-1060)
# ----------------------------------------------------------------------------

def eval_translucent(color, normal, outgoing, incoming):
    valid = dot(normal, incoming) * dot(normal, outgoing) < 0.0
    f = color / pif * jnp.abs(dot(normal, incoming))[..., None]
    return jnp.where(valid[..., None], f, 0.0)


def sample_translucent(color, normal, outgoing, rn):
    return sample_hemisphere_cos(rn, -up_normal(normal, outgoing))


def sample_translucent_pdf(color, normal, outgoing, incoming):
    valid = dot(normal, incoming) * dot(normal, outgoing) < 0.0
    pdf = sample_hemisphere_cos_pdf(-up_normal(normal, outgoing), incoming)
    return jnp.where(valid, pdf, 0.0)


def eval_passthrough(color, normal, outgoing, incoming):
    same = dot(normal, incoming) * dot(normal, outgoing) >= 0.0
    return jnp.where(same[..., None], jnp.zeros_like(color),
                     jnp.ones_like(color))


def sample_passthrough(color, normal, outgoing):
    return -outgoing


def sample_passthrough_pdf(color, normal, outgoing, incoming):
    same = dot(normal, incoming) * dot(normal, outgoing) >= 0.0
    return jnp.where(same, 0.0, 1.0)


# ----------------------------------------------------------------------------
# Volumes + phase function (yocto_shading.h:1062-1110)
# ----------------------------------------------------------------------------

def mfp_to_transmission(mfp, depth):
    return jnp.exp(-depth / mfp)


def eval_transmittance(density, distance):
    return jnp.exp(-density * distance[..., None])


def sample_transmittance(density, max_distance, rl, rd):
    channel = jnp.clip((rl * 3.0).astype(jnp.int32), 0, 2)
    dch = jnp.where(channel == 0, density[..., 0],
                    jnp.where(channel == 1, density[..., 1],
                              density[..., 2]))
    distance = jnp.where(dch == 0.0, jnp.float32(3.4e38),
                         -jnp.log(1.0 - rd) / jnp.where(dch == 0.0, 1.0, dch))
    return jnp.minimum(distance, max_distance)


def sample_transmittance_pdf(density, distance, max_distance):
    from .mathops import sum3
    inside = distance < max_distance
    pdf_in = sum3(density * jnp.exp(-density * distance[..., None])) / 3.0
    pdf_out = sum3(jnp.exp(-density * max_distance[..., None])) / 3.0
    return jnp.where(inside, pdf_in, pdf_out)


def eval_phasefunction(anisotropy, outgoing, incoming):
    cosine = -dot(outgoing, incoming)
    denom = 1.0 + anisotropy * anisotropy - 2.0 * anisotropy * cosine
    denom = jnp.maximum(denom, 1e-20)
    return (1.0 - anisotropy * anisotropy) / (
        4.0 * pif * denom * jnp.sqrt(denom))


def sample_phasefunction(anisotropy, outgoing, rn):
    iso = jnp.abs(anisotropy) < 1e-3
    sq = (1.0 - anisotropy * anisotropy) / (
        1.0 + anisotropy - 2.0 * anisotropy * rn[..., 1])
    cos_aniso = (1.0 + anisotropy * anisotropy - sq * sq) / (
        2.0 * jnp.where(anisotropy == 0.0, 1.0, anisotropy))
    cos_theta = jnp.where(iso, 1.0 - 2.0 * rn[..., 1], cos_aniso)
    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * pif * rn[..., 0]
    local = vec(sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta)
    basis = basis_fromz(-outgoing)
    return (local[..., 0:1] * basis[..., 0, :]
            + local[..., 1:2] * basis[..., 1, :]
            + local[..., 2:3] * basis[..., 2, :])


def sample_phasefunction_pdf(anisotropy, outgoing, incoming):
    return eval_phasefunction(anisotropy, outgoing, incoming)


# Tabulated conductor etas (n + ik per RGB channel), the reference's
# named metal IOR table (yocto_shading.h:1116-1199). Values are the
# spec: copied verbatim so `conductor_eta` lookups match the reference.
CONDUCTOR_ETAS = {
    "a-C": ((2.9440999183, 2.2271502925, 1.9681668794),
            (0.8874329109, 0.7993216383, 0.8152862927)),
    "Ag": ((0.1552646489, 0.1167232965, 0.1383806959),
           (4.8283433224, 3.1222459278, 2.1469504455)),
    "Al": ((1.6574599595, 0.8803689579, 0.5212287346),
           (9.2238691996, 6.2695232477, 4.8370012281)),
    "AlAs": ((3.6051023902, 3.2329365777, 2.2175611545),
             (0.0006670247, -0.0004999400, 0.0074261204)),
    "AlSb": ((-0.0485225705, 4.1427547893, 4.6697691348),
             (-0.0363741915, 0.0937665154, 1.3007390124)),
    "Au": ((0.1431189557, 0.3749570432, 1.4424785571),
           (3.9831604247, 2.3857207478, 1.6032152899)),
    "Be": ((4.1850592788, 3.1850604423, 2.7840913457),
           (3.8354398268, 3.0101260162, 2.8690088743)),
    "Cr": ((4.3696828663, 2.9167024892, 1.6547005413),
           (5.2064337956, 4.2313645277, 3.7549467933)),
    "CsI": ((2.1449030413, 1.7023164587, 1.6624194173),
            (0.0000000000, 0.0000000000, 0.0000000000)),
    "Cu": ((0.2004376970, 0.9240334304, 1.1022119527),
           (3.9129485033, 2.4528477015, 2.1421879552)),
    "Cu2O": ((3.5492833755, 2.9520622449, 2.7369202137),
             (0.1132179294, 0.1946659670, 0.6001681264)),
    "CuO": ((3.2453822204, 2.4496293965, 2.1974114493),
            (0.5202739621, 0.5707372756, 0.7172250613)),
    "d-C": ((2.7112524747, 2.3185812849, 2.2288565009),
            (0.0000000000, 0.0000000000, 0.0000000000)),
    "Hg": ((2.3989314904, 1.4400254917, 0.9095512090),
           (6.3276269444, 4.3719414152, 3.4217899270)),
    "HgTe": ((4.7795267752, 3.2309984581, 2.6600252401),
             (1.6319827058, 1.5808189339, 1.7295753852)),
    "Ir": ((3.0864098394, 2.0821938440, 1.6178866805),
           (5.5921510077, 4.0671757150, 3.2672611269)),
    "K": ((0.0640493070, 0.0464100621, 0.0381842017),
          (2.1042155920, 1.3489364357, 0.9132113889)),
    "Li": ((0.2657871942, 0.1956102432, 0.2209198538),
           (3.5401743407, 2.3111306542, 1.6685930000)),
    "MgO": ((2.0895885542, 1.6507224525, 1.5948759692),
            (0.0000000000, -0.0000000000, 0.0000000000)),
    "Mo": ((4.4837010280, 3.5254578255, 2.7760769438),
           (4.1111307988, 3.4208716252, 3.1506031404)),
    "Na": ((0.0602665320, 0.0561412435, 0.0619909494),
           (3.1792906496, 2.1124800781, 1.5790940266)),
    "Nb": ((3.4201353595, 2.7901921379, 2.3955856658),
           (3.4413817900, 2.7376437930, 2.5799132708)),
    "Ni": ((2.3672753521, 1.6633583302, 1.4670554172),
           (4.4988329911, 3.0501643957, 2.3454274399)),
    "Rh": ((2.5857954933, 1.8601866068, 1.5544279524),
           (6.7822927110, 4.7029501026, 3.9760892461)),
    "Se-e": ((5.7242724833, 4.1653992967, 4.0816099264),
             (0.8713747439, 1.1052845009, 1.5647788766)),
    "Se": ((4.0592611085, 2.8426947380, 2.8207582835),
           (0.7543791750, 0.6385150558, 0.5215872029)),
    "SiC": ((3.1723450205, 2.5259677964, 2.4793623897),
            (0.0000007284, -0.0000006859, 0.0000100150)),
    "SnTe": ((4.5251865890, 1.9811525984, 1.2816819226),
             (0.0000000000, 0.0000000000, 0.0000000000)),
    "Ta": ((2.0625846607, 2.3930915569, 2.6280684948),
           (2.4080467973, 1.7413705864, 1.9470377016)),
    "Te-e": ((7.5090397678, 4.2964603080, 2.3698732430),
             (5.5842076830, 4.9476231084, 3.9975145063)),
    "Te": ((7.3908396088, 4.4821028985, 2.6370708478),
           (3.2561412892, 3.5273908133, 3.2921683116)),
    "ThF4": ((1.8307187117, 1.4422274283, 1.3876488528),
             (0.0000000000, 0.0000000000, 0.0000000000)),
    "TiC": ((3.7004673762, 2.8374356509, 2.5823030278),
            (3.2656905818, 2.3515586388, 2.1727857800)),
    "TiN": ((1.6484691607, 1.1504482522, 1.3797795097),
            (3.3684596226, 1.9434888540, 1.1020123347)),
    "TiO2-e": ((3.1065574823, 2.5131551146, 2.5823844157),
               (0.0000289537, -0.0000251484, 0.0001775555)),
    "TiO2": ((3.4566203131, 2.8017076558, 2.9051485020),
             (0.0001026662, -0.0000897534, 0.0006356902)),
    "VC": ((3.6575665991, 2.7527298065, 2.5326814570),
           (3.0683516659, 2.1986687713, 1.9631816252)),
    "VN": ((2.8656011588, 2.1191817791, 1.9400767149),
           (3.0323264950, 2.0561075580, 1.6162930914)),
    "V": ((4.2775126218, 3.5131538236, 2.7611257461),
          (3.4911844504, 2.8893580874, 3.1116965117)),
    "W": ((4.3707029924, 3.3002972445, 2.9982666528),
          (3.5006778591, 2.6048652781, 2.2731930614)),
}


def conductor_eta(name):
    """Named conductor (eta, etak) lookup (yocto_shading.h:1116).
    Returns ((0,0,0), (0,0,0)) for unknown names like the reference."""
    return CONDUCTOR_ETAS.get(name, ((0.0, 0.0, 0.0), (0.0, 0.0, 0.0)))
