"""Batched scene property evaluation on the flat device scene.

TPU-native equivalents of the reference's per-point scene eval
(yocto_scene.cpp:66-613): camera rays, texture lookups (bilinear, tiled,
sRGB-aware), geometric/shading normals with normal mapping, material
evaluation into an SoA `MaterialPoint`, and environment lookups. Every
function takes batches of instance/element indices and uvs and gathers from
the `FlatScene` pools — this is the data path the wavefront tracer runs
per bounce.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.scene import MaterialType
from ..ops import mathops as M
from ..ops.color import srgb_to_rgb
from .compile import (FlatScene, KIND_LINES, KIND_POINTS, KIND_QUADS,
                      KIND_TRIANGLES)

MIN_ROUGHNESS = 0.03 * 0.03  # yocto_scene.cpp:199


class SurfaceRows(NamedTuple):
    """Pre-gathered per-lane surface rows from FlatScene.cand_attrs: the
    whole material/shape/corner join in ONE [R,64]-row gather (gather cost
    on TPU scales with fetched rows). Values are bit-identical copies of
    the split tables, so evals produce bit-identical results."""

    corner: jax.Array   # [R,4,8] corner attrs (pos3 nrm3 uv2 per corner)
    mrow: jax.Array     # [R,15] material f32 columns (_mat_rows layout)
    irow: jax.Array     # [R,6] material i32 columns (type + 5 tex ids)
    srow: jax.Array     # [R,4] shape row (kind has_n has_t has_c)
    mat: jax.Array      # [R] i32 material id


def gather_surface_rows(scene: FlatScene, inst, elem_local):
    """One [R,64] gather keyed by global candidate id
    (inst_cand_start[instance] + local element). Returns None when the
    scene has no packed join table (huge scenes / differentiable renders
    after inject_theta)."""
    if scene.cand_attrs is None:
        return None
    cand = jnp.clip(scene.inst_cand_start[inst] + elem_local, 0,
                    scene.cand_attrs.shape[0] - 1)
    a = scene.cand_attrs[cand]
    return SurfaceRows(
        corner=a[..., 0:32].reshape(a.shape[:-1] + (4, 8)),
        mrow=a[..., 32:47],
        irow=a[..., 47:53].astype(jnp.int32),
        srow=a[..., 53:57].astype(jnp.int32),
        mat=a[..., 57].astype(jnp.int32))


class MaterialPoint(NamedTuple):
    """SoA material point (yocto_scene.h material_point equivalent)."""

    type: jax.Array          # [R] i32
    emission: jax.Array      # [R,3]
    color: jax.Array         # [R,3]
    opacity: jax.Array       # [R]
    roughness: jax.Array     # [R]
    metallic: jax.Array      # [R]
    ior: jax.Array           # [R]
    density: jax.Array       # [R,3]
    scattering: jax.Array    # [R,3]
    scanisotropy: jax.Array  # [R]
    trdepth: jax.Array       # [R]


# ----------------------------------------------------------------------------
# Camera (yocto_scene.cpp:66-101)
# ----------------------------------------------------------------------------

def eval_camera(scene: FlatScene, camera: int, image_uv, lens_uv):
    """Thin-lens/orthographic camera ray; returns (origin, direction)."""
    frame = scene.cam_frame[camera]
    lens = scene.cam_lens[camera]
    film_w = scene.cam_film[camera]
    aspect = scene.cam_aspect[camera]
    focus = scene.cam_focus[camera]
    aperture = scene.cam_aperture[camera]
    film_x = jnp.where(aspect >= 1.0, film_w, film_w * aspect)
    film_y = jnp.where(aspect >= 1.0, film_w / aspect, film_w)
    qx = film_x * (0.5 - image_uv[..., 0])
    qy = film_y * (image_uv[..., 1] - 0.5)

    # perspective branch
    q = M.vec(qx, qy, jnp.broadcast_to(lens, qx.shape))
    dc = -M.normalize(q)
    e_p = M.vec(lens_uv[..., 0] * aperture / 2.0,
                lens_uv[..., 1] * aperture / 2.0,
                jnp.zeros_like(qx))
    p_p = dc * (focus / jnp.abs(dc[..., 2]))[..., None]
    d_p = M.normalize(p_p - e_p)

    # orthographic branch
    scale = 1.0 / lens
    e_o = M.vec(-qx * scale + lens_uv[..., 0] * aperture / 2.0,
                -qy * scale + lens_uv[..., 1] * aperture / 2.0,
                jnp.zeros_like(qx))
    p_o = M.vec(-qx * scale, -qy * scale,
                jnp.broadcast_to(-focus, qx.shape))
    d_o = M.normalize(p_o - e_o)

    ortho = scene.cam_ortho[camera]
    e = jnp.where(ortho, e_o, e_p)
    d = jnp.where(ortho, d_o, d_p)
    return (M.transform_point(frame, e), M.transform_direction(frame, d))


# ----------------------------------------------------------------------------
# Textures (yocto_scene.cpp:111-178)
# ----------------------------------------------------------------------------

def eval_texture(scene: FlatScene, tex_id, uv, as_linear):
    """Bilinear/tiled texture lookup; tex_id == -1 returns white.

    tex_id: [R] i32; uv: [R,2]; as_linear: python bool (call-site static).
    The six per-texture metadata columns are packed in-trace into one
    [T,6] table so the lookup pays ONE R-row gather for them (gather
    cost on TPU scales with fetched rows)."""
    tid = jnp.maximum(tex_id, 0)
    meta = jnp.stack([scene.tex_offset, scene.tex_width, scene.tex_height,
                      scene.tex_linear.astype(jnp.int32),
                      scene.tex_nearest.astype(jnp.int32),
                      scene.tex_clamp.astype(jnp.int32)], axis=1)
    row = meta[tid]                       # [R,6]
    off = row[..., 0]
    w = row[..., 1]
    h = row[..., 2]
    stored_linear = row[..., 3] != 0
    nearest = row[..., 4] != 0
    clamp_e = row[..., 5] != 0
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)

    s_clamped = jnp.clip(uv[..., 0], 0.0, 1.0) * wf
    t_clamped = jnp.clip(uv[..., 1], 0.0, 1.0) * hf
    s_tiled = jnp.mod(uv[..., 0], 1.0) * wf
    s_tiled = jnp.where(s_tiled < 0.0, s_tiled + wf, s_tiled)
    t_tiled = jnp.mod(uv[..., 1], 1.0) * hf
    t_tiled = jnp.where(t_tiled < 0.0, t_tiled + hf, t_tiled)
    s = jnp.where(clamp_e, s_clamped, s_tiled)
    t = jnp.where(clamp_e, t_clamped, t_tiled)

    i = jnp.clip(s.astype(jnp.int32), 0, w - 1)
    j = jnp.clip(t.astype(jnp.int32), 0, h - 1)
    ii = (i + 1) % w
    jj = (j + 1) % h
    u = s - i.astype(jnp.float32)
    v = t - j.astype(jnp.float32)

    def conv(texel):
        if as_linear:
            texel = jnp.where(stored_linear[..., None], texel,
                              srgb_to_rgb(texel))
        return texel

    if scene.tex_quad is not None:
        # ONE R-row gather for all four bilinear taps (tex_quad packs the
        # 2x2 neighborhood per texel with the same wrap arithmetic as the
        # 4-tap path below — bit-identical values)
        q = scene.tex_quad[off + j * w + i]
        t00 = conv(q[..., 0:4])
        t10 = conv(q[..., 4:8])
        t01 = conv(q[..., 8:12])
        t11 = conv(q[..., 12:16])
    else:
        t00 = conv(scene.tex_data[off + j * w + i])
        t01 = conv(scene.tex_data[off + jj * w + i])
        t10 = conv(scene.tex_data[off + j * w + ii])
        t11 = conv(scene.tex_data[off + jj * w + ii])
    near = t00
    bil = (t00 * ((1 - u) * (1 - v))[..., None]
           + t01 * ((1 - u) * v)[..., None]
           + t10 * (u * (1 - v))[..., None]
           + t11 * (u * v)[..., None])
    out = jnp.where(nearest[..., None], near, bil)
    return jnp.where((tex_id < 0)[..., None], 1.0, out)


# ----------------------------------------------------------------------------
# Geometry attribute interpolation
# ----------------------------------------------------------------------------

def _gather_elem(scene: FlatScene, inst, elem, rows=None):
    """Common gathers: shape record, kind, instance frame.

    The per-shape int/bool columns are packed in-trace into one [S,4]
    table so every eval pays ONE R-row gather for them (XLA CSE merges
    the identical pack + gather across eval_* calls in the same jit);
    gather cost on TPU scales with fetched rows. With pre-gathered
    SurfaceRows, the shape-table gather is skipped entirely."""
    frame = scene.inst_frame[inst]        # [R,4,3]
    if rows is not None:
        return None, rows.srow[..., 0], frame, rows.srow
    shape = scene.inst_shape[inst]
    stab = jnp.stack([scene.shape_kind,
                      scene.shape_has_normals.astype(jnp.int32),
                      scene.shape_has_texcoords.astype(jnp.int32),
                      scene.shape_has_colors.astype(jnp.int32)], axis=1)
    srow = stab[shape]                    # [R,4]
    kind = srow[..., 0]
    return shape, kind, frame, srow


def _corner_attrs(scene: FlatScene, elem, rows=None):
    """ONE R-row gather for all per-corner attributes: the packed
    [E,32] elem_attrs row -> (pos [R,4,3], nrm [R,4,3], uv [R,4,2])."""
    if rows is not None:
        a = rows.corner
    else:
        a = scene.elem_attrs[elem]        # [R,32]
        a = a.reshape(a.shape[:-1] + (4, 8))
    return a[..., 0:3], a[..., 3:6], a[..., 6:8]


def _interp_from(a, kind, uv):
    """Interpolate pre-gathered corner values [R,4,K] over the unified
    element. Quad split interpolation handles triangles (w==z) exactly;
    lines and points switch on kind."""
    a0, a1, a2, a3 = a[..., 0, :], a[..., 1, :], a[..., 2, :], a[..., 3, :]
    u = uv[..., 0:1]
    v = uv[..., 1:2]
    lower = (uv[..., 0] + uv[..., 1]) <= 1.0
    tri_a = a0 * (1.0 - u - v) + a1 * u + a3 * v
    iu = 1.0 - uv[..., 0:1]
    iv = 1.0 - uv[..., 1:2]
    tri_b = a2 * (1.0 - iu - iv) + a3 * iu + a1 * iv
    quad = jnp.where(lower[..., None], tri_a, tri_b)
    line = a0 * (1.0 - u) + a1 * u
    point = a0
    out = jnp.where((kind == KIND_LINES)[..., None], line, quad)
    out = jnp.where((kind == KIND_POINTS)[..., None], point, out)
    return out


def _interp(attr_pool, verts, kind, uv):
    """Interpolate a vertex attribute gathered from a pool (the
    cold-path variant for attributes outside elem_attrs: colors)."""
    return _interp_from(attr_pool[verts], kind, uv)


def eval_position(scene: FlatScene, inst, elem, uv, rows=None):
    _, kind, frame, _ = _gather_elem(scene, inst, elem, rows)
    pos, _, _ = _corner_attrs(scene, elem, rows)
    local = _interp_from(pos, kind, uv)
    return M.transform_point(frame, local)


def _element_normal_local(pos, kind):
    p0, p1, p2, p3 = (pos[..., 0, :], pos[..., 1, :], pos[..., 2, :],
                      pos[..., 3, :])
    n_a = M.normalize(M.cross(p1 - p0, p3 - p0))
    n_b = M.normalize(M.cross(p3 - p2, p1 - p2))
    quad_n = M.normalize(n_a + n_b)
    line_t = M.normalize(p1 - p0)
    point_n = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], jnp.float32), p0.shape)
    local = jnp.where((kind == KIND_LINES)[..., None], line_t, quad_n)
    return jnp.where((kind == KIND_POINTS)[..., None], point_n, local)


def eval_element_normal(scene: FlatScene, inst, elem, rows=None):
    """Geometric normal (yocto_scene.cpp:318-341 equivalent)."""
    _, kind, frame, _ = _gather_elem(scene, inst, elem, rows)
    pos, _, _ = _corner_attrs(scene, elem, rows)
    return M.transform_normal(frame, _element_normal_local(pos, kind))


def eval_normal(scene: FlatScene, inst, elem, uv, rows=None):
    _, kind, frame, srow = _gather_elem(scene, inst, elem, rows)
    has_n = srow[..., 1] != 0
    pos, nrm, _ = _corner_attrs(scene, elem, rows)
    interp_n = M.normalize(_interp_from(nrm, kind, uv))
    shading = M.transform_normal(frame, interp_n)
    geometric = M.transform_normal(frame, _element_normal_local(pos, kind))
    return jnp.where(has_n[..., None], shading, geometric)


def eval_texcoord(scene: FlatScene, inst, elem, uv, rows=None):
    _, kind, _, srow = _gather_elem(scene, inst, elem, rows)
    has_t = srow[..., 2] != 0
    _, _, uvs = _corner_attrs(scene, elem, rows)
    interp_t = _interp_from(uvs, kind, uv)
    return jnp.where(has_t[..., None], interp_t, uv)


def eval_color(scene: FlatScene, inst, elem, uv, rows=None):
    _, kind, _, srow = _gather_elem(scene, inst, elem, rows)
    has_c = srow[..., 3] != 0
    verts = scene.elements[elem]
    interp_c = _interp(scene.colors, verts, kind, uv)
    return jnp.where(has_c[..., None], interp_c, 1.0)


def eval_element_tangents(scene: FlatScene, inst, elem, rows=None):
    """uv-space tangents of the element's first triangle
    (yocto_scene.cpp:409-443 equivalent; quads evaluated at uv = (0,0))."""
    _, kind, frame, _ = _gather_elem(scene, inst, elem, rows)
    p, _, t = _corner_attrs(scene, elem, rows)
    p0, p1, p3 = p[..., 0, :], p[..., 1, :], p[..., 3, :]
    uv0, uv1, uv3 = t[..., 0, :], t[..., 1, :], t[..., 3, :]
    pp = p1 - p0
    q = p3 - p0
    sx = uv1[..., 0] - uv0[..., 0]
    sy = uv3[..., 0] - uv0[..., 0]
    tx = uv1[..., 1] - uv0[..., 1]
    ty = uv3[..., 1] - uv0[..., 1]
    div = sx * ty - sy * tx
    safe = jnp.where(div == 0.0, 1.0, div)[..., None]
    tu = (ty[..., None] * pp - tx[..., None] * q) / safe
    tv = (sx[..., None] * q - sy[..., None] * pp) / safe
    bad = (div == 0.0)[..., None]
    tu = jnp.where(bad, jnp.asarray([1.0, 0.0, 0.0], jnp.float32), tu)
    tv = jnp.where(bad, jnp.asarray([0.0, 1.0, 0.0], jnp.float32), tv)
    return (M.transform_direction(frame, tu),
            M.transform_direction(frame, tv))


def eval_normalmap(scene: FlatScene, inst, elem, uv, features=None,
                   rows=None):
    """Normal mapping (yocto_scene.cpp:446-467)."""
    normal = eval_normal(scene, inst, elem, uv, rows)
    if features is not None and not features.has_normal_tex:
        return normal
    mat = rows.mat if rows is not None else scene.inst_material[inst]
    normal_tex = _mat_rows(scene, mat, rows)[1][..., 5]
    _, kind, _, _ = _gather_elem(scene, inst, elem, rows)
    surface = (kind == KIND_TRIANGLES) | (kind == KIND_QUADS)
    apply = (normal_tex >= 0) & surface

    texcoord = eval_texcoord(scene, inst, elem, uv, rows)
    normalmap = -1.0 + 2.0 * eval_texture(
        scene, normal_tex, texcoord, as_linear=False)[..., :3]
    tu, tv = eval_element_tangents(scene, inst, elem, rows)
    fx = M.orthonormalize(tu, normal)
    fy = M.normalize(M.cross(normal, fx))
    flip_v = M.dot(fy, tv) < 0.0
    ny = normalmap[..., 1] * jnp.where(flip_v, 1.0, -1.0)
    nm = jnp.stack([normalmap[..., 0], ny, normalmap[..., 2]], axis=-1)
    mapped = M.normalize(nm[..., 0:1] * fx + nm[..., 1:2] * fy
                         + nm[..., 2:3] * normal)
    return jnp.where(apply[..., None], mapped, normal)


def eval_shading_position(scene: FlatScene, inst, elem, uv, outgoing,
                          rows=None):
    return eval_position(scene, inst, elem, uv, rows)


def eval_shading_normal(scene: FlatScene, inst, elem, uv, outgoing,
                        features=None, rows=None):
    """Shading normal with facing flip / line / point handling
    (yocto_scene.cpp:469-505)."""
    shape, kind, _, _ = _gather_elem(scene, inst, elem, rows)
    mat = rows.mat if rows is not None else scene.inst_material[inst]
    normal = eval_normalmap(scene, inst, elem, uv, features=features,
                            rows=rows)
    if features is None:
        kinds = (KIND_POINTS, KIND_LINES, KIND_TRIANGLES, KIND_QUADS)
        mat_types = tuple(range(8))
    else:
        kinds, mat_types = features.kinds, features.mat_types
    if int(MaterialType.refractive) in mat_types:
        mtype = _mat_rows(scene, mat, rows)[1][..., 0]
        is_refractive = mtype == int(MaterialType.refractive)
        flip = (M.dot(normal, outgoing) < 0.0) & ~is_refractive
    else:
        flip = M.dot(normal, outgoing) < 0.0
    out = jnp.where(flip[..., None], -normal, normal)
    if KIND_LINES in kinds:
        line_n = M.orthonormalize(outgoing,
                                  eval_normal(scene, inst, elem, uv, rows))
        out = jnp.where((kind == KIND_LINES)[..., None], line_n, out)
    if KIND_POINTS in kinds:
        out = jnp.where((kind == KIND_POINTS)[..., None], outgoing, out)
    return out


# ----------------------------------------------------------------------------
# Materials (yocto_scene.cpp:531-581)
# ----------------------------------------------------------------------------

def _mat_rows(scene: FlatScene, mat, rows=None):
    """All per-material columns in TWO R-row gathers (f32 + i32).

    Columns (f32): emission 0:3, color 3:6, roughness 6, metallic 7,
    ior 8, scattering 9:12, scanisotropy 12, trdepth 13, opacity 14.
    Columns (i32): type 0, emission/color/roughness/scattering/normal
    texture ids 1-5. Built in-trace from the SoA leaves (so
    diff.inject_theta values flow through) and CSE-merged across every
    eval in the same jit. Pre-gathered SurfaceRows short-circuit both."""
    if rows is not None:
        return rows.mrow, rows.irow
    mtab = jnp.concatenate([
        scene.mat_emission, scene.mat_color,
        scene.mat_roughness[:, None], scene.mat_metallic[:, None],
        scene.mat_ior[:, None], scene.mat_scattering,
        scene.mat_scanisotropy[:, None], scene.mat_trdepth[:, None],
        scene.mat_opacity[:, None]], axis=1)
    itab = jnp.stack([scene.mat_type, scene.mat_emission_tex,
                      scene.mat_color_tex, scene.mat_roughness_tex,
                      scene.mat_scattering_tex, scene.mat_normal_tex],
                     axis=1)
    return mtab[mat], itab[mat]


def eval_material(scene: FlatScene, inst, elem, uv,
                  features=None, rows=None) -> MaterialPoint:
    mrow, irow = _mat_rows(
        scene, None if rows is not None else scene.inst_material[inst],
        rows)
    f = features
    need_texcoord = f is None or (f.has_emission_tex or f.has_color_tex
                                  or f.has_roughness_tex
                                  or f.has_scattering_tex)
    texcoord = (eval_texcoord(scene, inst, elem, uv, rows) if need_texcoord
                else None)

    def tex(slot_has, tex_ids, as_linear):
        if f is not None and not slot_has:
            return None
        return eval_texture(scene, tex_ids, texcoord, as_linear=as_linear)

    emission_tex = tex(f is None or f.has_emission_tex, irow[..., 1], True)
    color_tex = tex(f is None or f.has_color_tex, irow[..., 2], True)
    roughness_tex = tex(f is None or f.has_roughness_tex, irow[..., 3],
                        False)
    scattering_tex = tex(f is None or f.has_scattering_tex, irow[..., 4],
                         True)
    color_shp = (eval_color(scene, inst, elem, uv, rows)
                 if f is None or f.has_shape_colors else None)

    def mul3(base, *factors):
        out = base
        for fac in factors:
            if fac is not None:
                out = out * fac[..., :3]
        return out

    def mul1(base, *factors):
        out = base
        for fac in factors:
            if fac is not None:
                out = out * fac[..., 3]
        return out

    mtype = irow[..., 0]
    emission = mul3(mrow[..., 0:3], emission_tex, color_shp)
    color = mul3(mrow[..., 3:6], color_tex, color_shp)
    opacity = mul1(mrow[..., 14], color_tex, color_shp)
    metallic = mrow[..., 7] * (
        roughness_tex[..., 2] if roughness_tex is not None else 1.0)
    roughness = mrow[..., 6] * (
        roughness_tex[..., 1] if roughness_tex is not None else 1.0)
    roughness = roughness * roughness
    ior = mrow[..., 8]
    scattering = mul3(mrow[..., 9:12], scattering_tex)
    scanisotropy = mrow[..., 12]
    trdepth = mrow[..., 13]
    # broadcast scalar-per-material columns that skipped texture modulation
    emission = jnp.broadcast_to(emission, uv.shape[:-1] + (3,))
    color = jnp.broadcast_to(color, uv.shape[:-1] + (3,))
    opacity = jnp.broadcast_to(opacity, uv.shape[:-1])
    metallic = jnp.broadcast_to(metallic, uv.shape[:-1])
    roughness = jnp.broadcast_to(roughness, uv.shape[:-1])
    scattering = jnp.broadcast_to(scattering, uv.shape[:-1] + (3,))

    mat_types = tuple(range(8)) if f is None else f.mat_types
    volumetric_types = (
        (mtype == int(MaterialType.refractive))
        | (mtype == int(MaterialType.volumetric))
        | (mtype == int(MaterialType.subsurface)))
    if any(t in mat_types for t in (int(MaterialType.refractive),
                                    int(MaterialType.volumetric),
                                    int(MaterialType.subsurface))):
        density = jnp.where(
            volumetric_types[..., None],
            -jnp.log(jnp.clip(color, 0.0001, 1.0)) / trdepth[..., None],
            0.0)
    else:
        density = jnp.zeros_like(color)

    clamped_types = ((mtype == int(MaterialType.matte))
                     | (mtype == int(MaterialType.gltfpbr))
                     | (mtype == int(MaterialType.glossy)))
    roughness = jnp.where(
        clamped_types, jnp.clip(roughness, MIN_ROUGHNESS, 1.0),
        jnp.where(mtype == int(MaterialType.volumetric), 0.0,
                  jnp.where(roughness < MIN_ROUGHNESS, 0.0, roughness)))

    return MaterialPoint(
        type=mtype, emission=emission, color=color, opacity=opacity,
        roughness=roughness, metallic=metallic, ior=ior, density=density,
        scattering=scattering, scanisotropy=scanisotropy, trdepth=trdepth)


def is_delta_point(material: MaterialPoint):
    """Delta test on evaluated material (yocto_scene.cpp:249-266)."""
    t = material.type
    zero_rough = material.roughness == 0.0
    return (((t == int(MaterialType.reflective)) & zero_rough)
            | ((t == int(MaterialType.refractive)) & zero_rough)
            | ((t == int(MaterialType.transparent)) & zero_rough)
            | (t == int(MaterialType.volumetric)))


def is_volumetric_type(t):
    """Volumetric test on a material-type array (yocto_scene.cpp:268-278;
    type is never texture-modulated, so this equals the instance test)."""
    return ((t == int(MaterialType.refractive))
            | (t == int(MaterialType.volumetric))
            | (t == int(MaterialType.subsurface)))


def is_volumetric_instance(scene: FlatScene, inst):
    mat = scene.inst_material[inst]
    return is_volumetric_type(_mat_rows(scene, mat)[1][..., 0])


# ----------------------------------------------------------------------------
# Environments (yocto_scene.cpp:596-613)
# ----------------------------------------------------------------------------

def eval_environment(scene: FlatScene, direction):
    """Sum of all environment emissions along `direction` [R,3]."""
    n_envs = scene.env_frame.shape[0]
    total = jnp.zeros_like(direction)
    for e in range(n_envs):
        frame = scene.env_frame[e]
        wl = M.transform_direction(M.inverse_frame(frame), direction)
        tx = jnp.arctan2(wl[..., 2], wl[..., 0]) / (2.0 * M.pif)
        tx = jnp.where(tx < 0.0, tx + 1.0, tx)
        ty = jnp.arccos(jnp.clip(wl[..., 1], -1.0, 1.0)) / M.pif
        texcoord = jnp.stack([tx, ty], axis=-1)
        tex_id = jnp.broadcast_to(scene.env_tex[e], tx.shape)
        # as_linear=False matches the reference default at this call site
        emission = scene.env_emission[e] * eval_texture(
            scene, tex_id, texcoord, as_linear=False)[..., :3]
        total = total + emission
    return total


def eval_material_deferred(scene: FlatScene, mat, texcoord, color_shp,
                           features=None) -> MaterialPoint:
    """Material point from a deferred hit record (material id + texcoord +
    vertex color carried with the ray) instead of instance/element gathers
    — the shading path of the instance-sharded renderer, where the winning
    hit's geometry lives on another device but materials/textures are
    replicated. Identical arithmetic to eval_material."""
    f = features
    mrow, irow = _mat_rows(scene, mat)

    def tex(slot_has, tex_ids, as_linear):
        if f is not None and not slot_has:
            return None
        return eval_texture(scene, tex_ids, texcoord, as_linear=as_linear)

    emission_tex = tex(f is None or f.has_emission_tex, irow[..., 1], True)
    color_tex = tex(f is None or f.has_color_tex, irow[..., 2], True)
    roughness_tex = tex(f is None or f.has_roughness_tex, irow[..., 3],
                        False)
    scattering_tex = tex(f is None or f.has_scattering_tex, irow[..., 4],
                         True)
    if f is not None and not f.has_shape_colors:
        color_shp = None

    def mul3(base, *factors):
        out = base
        for fac in factors:
            if fac is not None:
                out = out * fac[..., :3]
        return out

    def mul1(base, *factors):
        out = base
        for fac in factors:
            if fac is not None:
                out = out * fac[..., 3]
        return out

    mtype = irow[..., 0]
    n = mat.shape[0]
    emission = jnp.broadcast_to(
        mul3(mrow[..., 0:3], emission_tex, color_shp), (n, 3))
    color = jnp.broadcast_to(
        mul3(mrow[..., 3:6], color_tex, color_shp), (n, 3))
    opacity = jnp.broadcast_to(
        mul1(mrow[..., 14], color_tex, color_shp), (n,))
    metallic = jnp.broadcast_to(mrow[..., 7] * (
        roughness_tex[..., 2] if roughness_tex is not None else 1.0), (n,))
    roughness = mrow[..., 6] * (
        roughness_tex[..., 1] if roughness_tex is not None else 1.0)
    roughness = jnp.broadcast_to(roughness * roughness, (n,))
    ior = mrow[..., 8]
    scattering = jnp.broadcast_to(
        mul3(mrow[..., 9:12], scattering_tex), (n, 3))
    scanisotropy = mrow[..., 12]
    trdepth = mrow[..., 13]

    mat_types = tuple(range(8)) if f is None else f.mat_types
    volumetric_types = (
        (mtype == int(MaterialType.refractive))
        | (mtype == int(MaterialType.volumetric))
        | (mtype == int(MaterialType.subsurface)))
    if any(t in mat_types for t in (int(MaterialType.refractive),
                                    int(MaterialType.volumetric),
                                    int(MaterialType.subsurface))):
        density = jnp.where(
            volumetric_types[..., None],
            -jnp.log(jnp.clip(color, 0.0001, 1.0)) / trdepth[..., None],
            0.0)
    else:
        density = jnp.zeros_like(color)

    clamped_types = ((mtype == int(MaterialType.matte))
                     | (mtype == int(MaterialType.gltfpbr))
                     | (mtype == int(MaterialType.glossy)))
    roughness = jnp.where(
        clamped_types, jnp.clip(roughness, MIN_ROUGHNESS, 1.0),
        jnp.where(mtype == int(MaterialType.volumetric), 0.0,
                  jnp.where(roughness < MIN_ROUGHNESS, 0.0, roughness)))

    return MaterialPoint(
        type=mtype, emission=emission, color=color, opacity=opacity,
        roughness=roughness, metallic=metallic, ior=ior, density=density,
        scattering=scattering, scanisotropy=scanisotropy, trdepth=trdepth)
