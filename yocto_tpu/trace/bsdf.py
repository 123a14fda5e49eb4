"""Material dispatch: eval/sample/pdf over batched SoA material points.

The reference dispatches by material type with virtual-style if-chains per
path vertex (yocto_trace.cpp:172-316). On TPU all lanes evaluate the
relevant lobes and a masked select picks the active one — branch-free VPU
code. `material.roughness == 0` switches between the rough and delta lobe
families exactly as the reference does.

Every dispatcher takes a static `types` tuple (the material types actually
used by the scene, from SceneFeatures.mat_types): lobes no lane can select
are not traced at all, which matches the reference's pay-per-use dispatch
and is bit-identical to masking them out.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.scene import MaterialType as MT
from ..ops import shading as S
from .sceneval import MaterialPoint

ALL_TYPES = tuple(range(8))


def _is(material, t):
    return material.type == int(t)


def _has(types, *ts):
    return any(int(t) in types for t in ts)


def eval_emission(material: MaterialPoint, normal, outgoing):
    facing = jnp.sum(normal * outgoing, axis=-1) >= 0.0
    return jnp.where(facing[..., None], material.emission, 0.0)


def eval_bsdfcos(material: MaterialPoint, normal, outgoing, incoming,
                 types=ALL_TYPES):
    c, r, i = material.color, material.roughness, material.ior
    f = jnp.zeros_like(c)
    if _has(types, MT.matte):
        f = jnp.where(_is(material, MT.matte)[..., None],
                      S.eval_matte(c, normal, outgoing, incoming), f)
    if _has(types, MT.glossy):
        f = jnp.where(_is(material, MT.glossy)[..., None],
                      S.eval_glossy(c, i, r, normal, outgoing, incoming), f)
    if _has(types, MT.reflective):
        f = jnp.where(_is(material, MT.reflective)[..., None],
                      S.eval_reflective(c, r, normal, outgoing, incoming), f)
    if _has(types, MT.transparent):
        f = jnp.where(
            _is(material, MT.transparent)[..., None],
            S.eval_transparent(c, i, r, normal, outgoing, incoming), f)
    if _has(types, MT.refractive, MT.subsurface):
        refr = (_is(material, MT.refractive) | _is(material, MT.subsurface))
        f = jnp.where(refr[..., None],
                      S.eval_refractive(c, i, r, normal, outgoing, incoming),
                      f)
    if _has(types, MT.gltfpbr):
        f = jnp.where(_is(material, MT.gltfpbr)[..., None],
                      S.eval_gltfpbr(c, i, r, material.metallic, normal,
                                     outgoing, incoming), f)
    return jnp.where((r == 0.0)[..., None], 0.0, f)


def eval_delta(material: MaterialPoint, normal, outgoing, incoming,
               types=ALL_TYPES):
    c, i = material.color, material.ior
    f = jnp.zeros_like(c)
    if _has(types, MT.reflective):
        f = jnp.where(
            _is(material, MT.reflective)[..., None],
            S.eval_reflective_delta(c, normal, outgoing, incoming), f)
    if _has(types, MT.transparent):
        f = jnp.where(
            _is(material, MT.transparent)[..., None],
            S.eval_transparent_delta(c, i, normal, outgoing, incoming), f)
    if _has(types, MT.refractive):
        f = jnp.where(
            _is(material, MT.refractive)[..., None],
            S.eval_refractive_delta(c, i, normal, outgoing, incoming), f)
    if _has(types, MT.volumetric):
        f = jnp.where(_is(material, MT.volumetric)[..., None],
                      S.eval_passthrough(c, normal, outgoing, incoming), f)
    return jnp.where((material.roughness != 0.0)[..., None], 0.0, f)


def sample_bsdfcos(material: MaterialPoint, normal, outgoing, rnl, rn,
                   types=ALL_TYPES):
    c, r, i = material.color, material.roughness, material.ior
    out = jnp.zeros_like(c)
    if _has(types, MT.matte):
        out = jnp.where(_is(material, MT.matte)[..., None],
                        S.sample_matte(c, normal, outgoing, rn), out)
    if _has(types, MT.glossy):
        out = jnp.where(
            _is(material, MT.glossy)[..., None],
            S.sample_glossy(c, i, r, normal, outgoing, rnl, rn), out)
    if _has(types, MT.reflective):
        out = jnp.where(_is(material, MT.reflective)[..., None],
                        S.sample_reflective(c, r, normal, outgoing, rn), out)
    if _has(types, MT.transparent):
        out = jnp.where(
            _is(material, MT.transparent)[..., None],
            S.sample_transparent(c, i, r, normal, outgoing, rnl, rn), out)
    if _has(types, MT.refractive, MT.subsurface):
        refr = (_is(material, MT.refractive) | _is(material, MT.subsurface))
        out = jnp.where(
            refr[..., None],
            S.sample_refractive(c, i, r, normal, outgoing, rnl, rn), out)
    if _has(types, MT.gltfpbr):
        out = jnp.where(
            _is(material, MT.gltfpbr)[..., None],
            S.sample_gltfpbr(c, i, r, material.metallic, normal, outgoing,
                             rnl, rn), out)
    return jnp.where((r == 0.0)[..., None], 0.0, out)


def sample_delta(material: MaterialPoint, normal, outgoing, rnl,
                 types=ALL_TYPES):
    c, i = material.color, material.ior
    out = jnp.zeros_like(c)
    if _has(types, MT.reflective):
        out = jnp.where(_is(material, MT.reflective)[..., None],
                        S.sample_reflective_delta(c, normal, outgoing), out)
    if _has(types, MT.transparent):
        out = jnp.where(
            _is(material, MT.transparent)[..., None],
            S.sample_transparent_delta(c, i, normal, outgoing, rnl), out)
    if _has(types, MT.refractive):
        out = jnp.where(
            _is(material, MT.refractive)[..., None],
            S.sample_refractive_delta(c, i, normal, outgoing, rnl), out)
    if _has(types, MT.volumetric):
        out = jnp.where(_is(material, MT.volumetric)[..., None],
                        S.sample_passthrough(c, normal, outgoing), out)
    return jnp.where((material.roughness != 0.0)[..., None], 0.0, out)


def sample_bsdfcos_pdf(material: MaterialPoint, normal, outgoing, incoming,
                       types=ALL_TYPES):
    c, r, i = material.color, material.roughness, material.ior
    pdf = jnp.zeros(material.roughness.shape, jnp.float32)
    if _has(types, MT.matte):
        pdf = jnp.where(
            _is(material, MT.matte),
            S.sample_matte_pdf(c, normal, outgoing, incoming), pdf)
    if _has(types, MT.glossy):
        pdf = jnp.where(
            _is(material, MT.glossy),
            S.sample_glossy_pdf(c, i, r, normal, outgoing, incoming), pdf)
    if _has(types, MT.reflective):
        pdf = jnp.where(
            _is(material, MT.reflective),
            S.sample_reflective_pdf(c, r, normal, outgoing, incoming), pdf)
    if _has(types, MT.transparent):
        pdf = jnp.where(
            _is(material, MT.transparent),
            S.sample_transparent_pdf(c, i, r, normal, outgoing, incoming),
            pdf)
    if _has(types, MT.refractive, MT.subsurface):
        refr = (_is(material, MT.refractive) | _is(material, MT.subsurface))
        pdf = jnp.where(
            refr,
            S.sample_refractive_pdf(c, i, r, normal, outgoing, incoming),
            pdf)
    if _has(types, MT.gltfpbr):
        pdf = jnp.where(
            _is(material, MT.gltfpbr),
            S.sample_gltfpbr_pdf(c, i, r, material.metallic, normal,
                                 outgoing, incoming), pdf)
    return jnp.where(r == 0.0, 0.0, pdf)


def sample_delta_pdf(material: MaterialPoint, normal, outgoing, incoming,
                     types=ALL_TYPES):
    c, i = material.color, material.ior
    pdf = jnp.zeros(material.roughness.shape, jnp.float32)
    if _has(types, MT.reflective):
        pdf = jnp.where(
            _is(material, MT.reflective),
            S.sample_reflective_delta_pdf(c, normal, outgoing, incoming),
            pdf)
    if _has(types, MT.transparent):
        pdf = jnp.where(
            _is(material, MT.transparent),
            S.sample_transparent_delta_pdf(c, i, normal, outgoing, incoming),
            pdf)
    if _has(types, MT.refractive):
        pdf = jnp.where(
            _is(material, MT.refractive),
            S.sample_refractive_delta_pdf(c, i, normal, outgoing, incoming),
            pdf)
    if _has(types, MT.volumetric):
        pdf = jnp.where(
            _is(material, MT.volumetric),
            S.sample_passthrough_pdf(c, normal, outgoing, incoming), pdf)
    return jnp.where(material.roughness != 0.0, 0.0, pdf)


def eval_scattering(material_density, material_scattering, scanisotropy,
                    outgoing, incoming):
    from ..ops.mathops import is_zero3
    zero = is_zero3(material_density)
    f = material_scattering * material_density \
        * S.eval_phasefunction(scanisotropy, outgoing, incoming)[..., None]
    return jnp.where(zero[..., None], 0.0, f)


def sample_scattering(scanisotropy, outgoing, rn):
    return S.sample_phasefunction(scanisotropy, outgoing, rn)


def sample_scattering_pdf(material_density, scanisotropy, outgoing, incoming):
    from ..ops.mathops import is_zero3
    zero = is_zero3(material_density)
    return jnp.where(
        zero, 0.0,
        S.sample_phasefunction_pdf(scanisotropy, outgoing, incoming))
