"""Scene compilation: host SceneData -> flat SoA device arrays.

The TPU analogue of the reference's CUDA scene flattening
(cuscene_data, yocto_cutrace.h:270-282): geometry is concatenated into
global vertex/element pools with per-shape offset tables, textures into one
flat texel pool, materials into SoA columns. Everything the tracer touches
per-ray becomes a gather into these arrays inside jit.

Element unification: every surface element is stored as a 4-index "quad";
triangles are stored as (x, y, z, z), which makes quad intersection and
quad interpolation degrade exactly to the triangle versions (the second
triangle of the split has zero area — same trick the reference uses for
quads-as-triangles). Lines are (a, b, b, b) and points (p, p, p, p), with
the shape `kind` switching the intersector.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.scene import INVALID, SceneData
from ..ops.color import srgb_to_rgb  # noqa: F401  (used by texture eval)

KIND_POINTS = 0
KIND_LINES = 1
KIND_TRIANGLES = 2
KIND_QUADS = 3

TEX_QUAD_MAX = 16_777_216   # texel budget for the 2x2-packed quad pool
CAND_ATTRS_MAX = 8_000_000  # candidate budget for the surface join table


class FlatScene(NamedTuple):
    """Device scene. All leaves are jnp arrays; static metadata (counts)
    lives in plain ints so jit treats them as compile-time constants."""

    # vertex pools
    positions: jax.Array    # [V,3] f32
    normals: jax.Array      # [V,3] f32 (zeros if shape lacks them)
    texcoords: jax.Array    # [V,2]
    colors: jax.Array       # [V,4] (ones if shape lacks them)
    radius: jax.Array       # [V]
    # element pool (unified quads, global vertex ids)
    elements: jax.Array     # [E,4] i32
    # per-element packed corner attributes: 4 corners x (pos3 nrm3 uv2)
    # = [E,32] f32. The shade stage is gather-bound on TPU (cost ~ rows
    # fetched): interpolating pos/nrm/uv through `elements` costs 13R
    # gathered rows per bounce (1R element ids + 3 attrs x 4 corners);
    # this pre-join makes it ONE R-row gather. Derived from positions —
    # diff.inject_theta rebuilds the position columns differentiably.
    elem_attrs: jax.Array   # [E,32] f32
    # per-shape tables
    shape_elem_start: jax.Array  # [S] i32
    shape_elem_count: jax.Array  # [S] i32
    shape_kind: jax.Array        # [S] i32
    shape_has_normals: jax.Array    # [S] bool
    shape_has_texcoords: jax.Array  # [S] bool
    shape_has_colors: jax.Array     # [S] bool
    # instances
    inst_frame: jax.Array   # [I,4,3]
    inst_inv_frame: jax.Array  # [I,4,3] full (non-rigid) inverse
    inst_shape: jax.Array   # [I] i32
    inst_material: jax.Array  # [I] i32
    # materials SoA
    mat_type: jax.Array       # [M] i32
    mat_emission: jax.Array   # [M,3]
    mat_color: jax.Array      # [M,3]
    mat_roughness: jax.Array  # [M]
    mat_metallic: jax.Array   # [M]
    mat_ior: jax.Array        # [M]
    mat_scattering: jax.Array  # [M,3]
    mat_scanisotropy: jax.Array  # [M]
    mat_trdepth: jax.Array    # [M]
    mat_opacity: jax.Array    # [M]
    mat_emission_tex: jax.Array   # [M] i32 (-1 = none)
    mat_color_tex: jax.Array      # [M] i32
    mat_roughness_tex: jax.Array  # [M] i32
    mat_scattering_tex: jax.Array  # [M] i32
    mat_normal_tex: jax.Array     # [M] i32
    # textures: flat texel pool (f32 rgba; byte textures prescaled /255)
    tex_data: jax.Array     # [N,4] f32
    tex_offset: jax.Array   # [T] i32
    tex_width: jax.Array    # [T] i32
    tex_height: jax.Array   # [T] i32
    tex_linear: jax.Array   # [T] bool (True = stored values are linear)
    tex_nearest: jax.Array  # [T] bool
    tex_clamp: jax.Array    # [T] bool
    # environments
    env_frame: jax.Array     # [Env,4,3]
    env_emission: jax.Array  # [Env,3]
    env_tex: jax.Array       # [Env] i32
    # cameras
    cam_frame: jax.Array     # [C,4,3]
    cam_ortho: jax.Array     # [C] bool
    cam_lens: jax.Array      # [C]
    cam_film: jax.Array      # [C]
    cam_aspect: jax.Array    # [C]
    cam_focus: jax.Array     # [C]
    cam_aperture: jax.Array  # [C]
    # brute-force candidate list: all (instance, element) pairs
    cand_inst: jax.Array    # [Cand] i32
    cand_elem: jax.Array    # [Cand] i32 (global element idx)
    # 2x2-packed texel quads: row q[j*w+i] = [t(i,j), t(i+1,j), t(i,j+1),
    # t(i+1,j+1)] (x/y wrap mod w/h, matching eval_texture's ii/jj
    # arithmetic). One R-row gather per bilinear lookup instead of four —
    # gather cost on TPU scales with fetched rows, and rows up to 128
    # lanes cost the same as narrow ones. None when the texel pool
    # exceeds TEX_QUAD_MAX (memory is 4x the base pool) or for
    # differentiable renders (tex_data is a theta leaf; inject_theta
    # clears this cache).
    tex_quad: jax.Array = None  # [N,16] f32
    # per-candidate surface join: everything the wavefront shade needs at
    # a hit in ONE [Cand,64] row gather (vs 7 split gathers: inst_shape,
    # shape row, inst_material, material f32/i32 rows, elem_attrs). Keyed
    # by global candidate id = inst_cand_start[instance] + local element,
    # so instanced shapes with different materials stay correct. Columns:
    #   0:32  corner attrs (pos3 nrm3 uv2 x 4, == elem_attrs row)
    #   32:47 material f32 row (emission3 color3 rough metal ior
    #         scattering3 scanis trdepth opacity)
    #   47:53 material i32 row as exact f32 (type + 5 texture ids)
    #   53:57 shape row (kind has_n has_t has_c)
    #   57    material id
    # None when Cand > CAND_ATTRS_MAX or for differentiable renders
    # (inject_theta clears it: positions/materials are theta leaves).
    cand_attrs: jax.Array = None       # [Cand,64] f32
    inst_cand_start: jax.Array = None  # [I] i32


class SceneFeatures(NamedTuple):
    """Static scene capabilities, baked into the jitted sampler.

    The reference renderer pays only for what a material actually does via
    per-vertex branching (yocto_trace.cpp:524-582); on TPU the masked-select
    equivalent would evaluate EVERY lobe/branch for every lane. These
    host-side flags restore the reference's economy at compile time: code
    for a feature no scene material can trigger is simply not traced, which
    is bit-identical to tracing it behind an all-false mask (and keeps the
    per-pixel RNG streams unchanged, since all draw sites are mask-guarded).
    """

    kinds: tuple          # sorted element kinds among instanced shapes
    mat_types: tuple      # sorted MaterialType ints used by instances
    has_volumes: bool     # any used material is volumetric (scene.cpp:268)
    has_opacity: bool     # any lane can see opacity < 1
    has_delta: bool       # any used material can be a delta lobe
    has_emission_tex: bool
    has_color_tex: bool
    has_roughness_tex: bool
    has_scattering_tex: bool
    has_normal_tex: bool
    has_shape_colors: bool  # any instanced shape carries vertex colors


ALL_FEATURES = SceneFeatures(
    kinds=(KIND_POINTS, KIND_LINES, KIND_TRIANGLES, KIND_QUADS),
    mat_types=tuple(range(8)),
    has_volumes=True, has_opacity=True, has_delta=True,
    has_emission_tex=True, has_color_tex=True, has_roughness_tex=True,
    has_scattering_tex=True, has_normal_tex=True, has_shape_colors=True)


def scene_features(scene: SceneData) -> SceneFeatures:
    """Host-side feature scan over materials/shapes reachable by instances."""
    from ..models.scene import MaterialType as MT

    used_mats = sorted({i.material for i in scene.instances
                        if 0 <= i.material < len(scene.materials)})
    used_shapes = sorted({i.shape for i in scene.instances
                          if 0 <= i.shape < len(scene.shapes)})
    mats = [scene.materials[m] for m in used_mats]
    shapes = [scene.shapes[s] for s in used_shapes]

    kinds = set()
    has_colors = False
    for s in shapes:
        if len(s.triangles):
            kinds.add(KIND_TRIANGLES)
        elif len(s.quads):
            kinds.add(KIND_QUADS)
        elif len(s.lines):
            kinds.add(KIND_LINES)
        elif len(s.points):
            kinds.add(KIND_POINTS)
        if len(s.colors) == len(s.positions) and len(s.positions):
            has_colors = True

    def tex_alpha_lt1(tid):
        if tid == INVALID or tid >= len(scene.textures):
            return False
        t = scene.textures[tid]
        if t.pixelsf is not None and np.asarray(t.pixelsf).size:
            return bool(np.asarray(t.pixelsf).reshape(-1, 4)[:, 3].min() < 1)
        if t.pixelsb is not None and np.asarray(t.pixelsb).size:
            return bool(np.asarray(t.pixelsb).reshape(-1, 4)[:, 3].min() < 255)
        return False

    mat_types = sorted({int(m.type) for m in mats})
    vol_types = {int(MT.refractive), int(MT.volumetric), int(MT.subsurface)}
    has_volumes = any(int(m.type) in vol_types for m in mats)
    has_opacity = any(
        m.opacity < 1.0 or tex_alpha_lt1(m.color_tex) for m in mats)
    if has_colors:
        has_opacity = has_opacity or any(
            len(s.colors) == len(s.positions) and len(s.positions)
            and np.asarray(s.colors).reshape(-1, 4)[:, 3].min() < 1
            for s in shapes)
    # delta-capable: zero-roughness reflective/transparent/refractive or a
    # passthrough volumetric (roughness textures can pull roughness to 0)
    min_r = 0.03  # sqrt(MIN_ROUGHNESS): roughness below this becomes delta
    delta_types = {int(MT.reflective), int(MT.transparent),
                   int(MT.refractive)}
    has_delta = any(
        (int(m.type) in delta_types
         and (m.roughness < min_r or m.roughness_tex != INVALID))
        or int(m.type) == int(MT.volumetric)
        for m in mats)

    return SceneFeatures(
        kinds=tuple(sorted(kinds)) or (KIND_TRIANGLES,),
        mat_types=tuple(mat_types) or (0,),
        has_volumes=has_volumes,
        has_opacity=has_opacity,
        has_delta=has_delta,
        has_emission_tex=any(m.emission_tex != INVALID for m in mats),
        has_color_tex=any(m.color_tex != INVALID for m in mats),
        has_roughness_tex=any(m.roughness_tex != INVALID for m in mats),
        has_scattering_tex=any(m.scattering_tex != INVALID for m in mats),
        has_normal_tex=any(m.normal_tex != INVALID for m in mats),
        has_shape_colors=has_colors)


def _pad1(a, fill=0):
    """Ensure arrays are non-empty so gathers never see zero extents."""
    if len(a) == 0:
        shape = (1,) + a.shape[1:]
        return np.full(shape, fill, a.dtype)
    return a


def compile_scene(scene: SceneData) -> FlatScene:
    # --- shapes -> pools
    positions, normals, texcoords, colors, radius = [], [], [], [], []
    elements = []
    elem_start, elem_count, kinds = [], [], []
    has_n, has_t, has_c = [], [], []
    voff = 0
    eoff = 0
    for shape in scene.shapes:
        nv = len(shape.positions)
        positions.append(np.asarray(shape.positions, np.float32).reshape(-1, 3))
        normals.append(
            np.asarray(shape.normals, np.float32).reshape(-1, 3)
            if len(shape.normals) == nv else np.zeros((nv, 3), np.float32))
        texcoords.append(
            np.asarray(shape.texcoords, np.float32).reshape(-1, 2)
            if len(shape.texcoords) == nv else np.zeros((nv, 2), np.float32))
        colors.append(
            np.asarray(shape.colors, np.float32).reshape(-1, 4)
            if len(shape.colors) == nv else np.ones((nv, 4), np.float32))
        radius.append(
            np.asarray(shape.radius, np.float32).reshape(-1)
            if len(shape.radius) == nv else np.zeros(nv, np.float32))
        has_n.append(len(shape.normals) == nv and nv > 0)
        has_t.append(len(shape.texcoords) == nv and nv > 0)
        has_c.append(len(shape.colors) == nv and nv > 0)
        if len(shape.triangles):
            tris = np.asarray(shape.triangles, np.int32)
            elem = np.concatenate([tris, tris[:, 2:3]], axis=1)
            kind = KIND_TRIANGLES
        elif len(shape.quads):
            elem = np.asarray(shape.quads, np.int32)
            kind = KIND_QUADS
        elif len(shape.lines):
            lines = np.asarray(shape.lines, np.int32)
            elem = np.concatenate(
                [lines, lines[:, 1:2], lines[:, 1:2]], axis=1)
            kind = KIND_LINES
        elif len(shape.points):
            pts = np.asarray(shape.points, np.int32).reshape(-1, 1)
            elem = np.repeat(pts, 4, axis=1)
            kind = KIND_POINTS
        else:
            elem = np.zeros((0, 4), np.int32)
            kind = KIND_TRIANGLES
        elements.append(elem + voff)
        elem_start.append(eoff)
        elem_count.append(len(elem))
        kinds.append(kind)
        voff += nv
        eoff += len(elem)

    positions = _pad1(np.concatenate(positions) if positions
                      else np.zeros((0, 3), np.float32))
    normals = _pad1(np.concatenate(normals) if normals
                    else np.zeros((0, 3), np.float32))
    texcoords = _pad1(np.concatenate(texcoords) if texcoords
                      else np.zeros((0, 2), np.float32))
    colors = _pad1(np.concatenate(colors) if colors
                   else np.zeros((0, 4), np.float32), 1)
    radius = _pad1(np.concatenate(radius) if radius
                   else np.zeros((0,), np.float32))
    elements = _pad1(np.concatenate(elements) if elements
                     else np.zeros((0, 4), np.int32))
    elem_attrs = np.concatenate(
        [np.concatenate([positions[elements[:, k]],
                         normals[elements[:, k]],
                         texcoords[elements[:, k]]], axis=1)
         for k in range(4)], axis=1).astype(np.float32)  # [E,32]

    # --- instances
    inst_frame = _pad1(np.stack([np.asarray(i.frame, np.float32)
                                 for i in scene.instances])
                       if scene.instances else np.zeros((0, 4, 3), np.float32))
    if not scene.instances:
        inst_frame[:, :3, :3] = np.eye(3, dtype=np.float32)[None]
    # full inverses support scaled instance frames (the reference uses
    # inverse(frame, non_rigid=true) in intersect_scene_bvh)
    rot = inst_frame[:, :3, :]
    inv_rot = np.linalg.inv(rot.astype(np.float64)).astype(np.float32)
    inv_o = -np.einsum("ij,ijk->ik", inst_frame[:, 3, :], inv_rot)
    inst_inv_frame = np.concatenate([inv_rot, inv_o[:, None, :]], axis=1)
    inst_shape = _pad1(np.asarray(
        [i.shape for i in scene.instances], np.int32))
    inst_material = _pad1(np.asarray(
        [i.material for i in scene.instances], np.int32))

    # --- materials
    mats = scene.materials
    def mcol(fn, default, dt=np.float32, width=None):
        arr = np.asarray([fn(m) for m in mats], dt)
        if len(mats) == 0:
            arr = np.full((1,) if width is None else (1, width), default, dt)
        return arr

    mat_type = mcol(lambda m: int(m.type), 0, np.int32)
    mat_emission = mcol(lambda m: np.asarray(m.emission, np.float32), 0,
                        width=3)
    mat_color = mcol(lambda m: np.asarray(m.color, np.float32), 0, width=3)
    mat_roughness = mcol(lambda m: m.roughness, 0)
    mat_metallic = mcol(lambda m: m.metallic, 0)
    mat_ior = mcol(lambda m: m.ior, 1.5)
    mat_scattering = mcol(lambda m: np.asarray(m.scattering, np.float32), 0,
                          width=3)
    mat_scanisotropy = mcol(lambda m: m.scanisotropy, 0)
    mat_trdepth = mcol(lambda m: m.trdepth, 0.01)
    mat_opacity = mcol(lambda m: m.opacity, 1)
    mat_emission_tex = mcol(lambda m: m.emission_tex, INVALID, np.int32)
    mat_color_tex = mcol(lambda m: m.color_tex, INVALID, np.int32)
    mat_roughness_tex = mcol(lambda m: m.roughness_tex, INVALID, np.int32)
    mat_scattering_tex = mcol(lambda m: m.scattering_tex, INVALID, np.int32)
    mat_normal_tex = mcol(lambda m: m.normal_tex, INVALID, np.int32)

    # --- textures -> flat pool
    tex_data, tex_offset, tex_w, tex_h = [], [], [], []
    tex_linear, tex_nearest, tex_clamp = [], [], []
    toff = 0
    for tex in scene.textures:
        if tex.pixelsf is not None and tex.pixelsf.size:
            px = np.asarray(tex.pixelsf, np.float32).reshape(-1, 4)
            stored_linear = tex.linear
        elif tex.pixelsb is not None and tex.pixelsb.size:
            px = (np.asarray(tex.pixelsb, np.float32) / 255.0).reshape(-1, 4)
            stored_linear = tex.linear
        else:
            px = np.zeros((1, 4), np.float32)
            stored_linear = True
        tex_data.append(px)
        tex_offset.append(toff)
        tex_w.append(tex.width)
        tex_h.append(tex.height)
        tex_linear.append(stored_linear)
        tex_nearest.append(tex.nearest)
        tex_clamp.append(tex.clamp)
        toff += len(px)
    # 2x2-packed texel quads (see FlatScene.tex_quad): built per texture
    # with the SAME wrap arithmetic as eval_texture (ii=(i+1)%w,
    # jj=(j+1)%h) so the packed path is bit-identical to the 4-tap path
    total_texels = sum(len(px) for px in tex_data)
    if 0 < total_texels <= TEX_QUAD_MAX:
        quads = []
        for px, w_, h_ in zip(tex_data, tex_w, tex_h):
            if len(px) == w_ * h_ and w_ > 0 and h_ > 0:
                pxr = px.reshape(h_, w_, 4)
                xi = (np.arange(w_) + 1) % w_
                yi = (np.arange(h_) + 1) % h_
                q = np.concatenate(
                    [pxr, pxr[:, xi], pxr[yi], pxr[yi][:, xi]],
                    axis=2).reshape(-1, 16)  # [t00, t10, t01, t11]
            else:  # degenerate/empty placeholder texture
                q = np.concatenate([px] * 4, axis=1)
            quads.append(q.astype(np.float32))
        tex_quad = np.concatenate(quads)
    else:
        tex_quad = None
    tex_data = _pad1(np.concatenate(tex_data) if tex_data
                     else np.zeros((0, 4), np.float32))

    # --- environments (NOT padded: env count is static metadata and
    # eval_environment unrolls a python loop over it)
    env_frame = (np.stack([np.asarray(e.frame, np.float32)
                           for e in scene.environments])
                 if scene.environments else np.zeros((0, 4, 3), np.float32))
    env_emission = np.asarray(
        [e.emission for e in scene.environments], np.float32).reshape(-1, 3)
    env_tex = np.asarray(
        [e.emission_tex for e in scene.environments], np.int32)

    # --- cameras
    cams = scene.cameras
    cam_frame = _pad1(np.stack([np.asarray(c.frame, np.float32)
                                for c in cams])
                      if cams else np.zeros((0, 4, 3), np.float32))
    if not cams:
        cam_frame[:, :3, :3] = np.eye(3, dtype=np.float32)[None]

    # --- brute-force candidates
    cand_inst, cand_elem = [], []
    inst_cand_start = []
    coff = 0
    for iidx, inst in enumerate(scene.instances):
        s = inst.shape
        start, count = elem_start[s], elem_count[s]
        cand_inst.append(np.full(count, iidx, np.int32))
        cand_elem.append(np.arange(start, start + count, dtype=np.int32))
        inst_cand_start.append(coff)
        coff += count
    cand_inst = _pad1(np.concatenate(cand_inst) if cand_inst
                      else np.zeros((0,), np.int32))
    cand_elem = _pad1(np.concatenate(cand_elem) if cand_elem
                      else np.zeros((0,), np.int32))
    inst_cand_start = _pad1(np.asarray(inst_cand_start, np.int32))

    # --- per-candidate surface join table (see FlatScene.cand_attrs)
    if 0 < coff <= CAND_ATTRS_MAX:
        m_ids = np.clip(inst_material[cand_inst], 0, len(mat_type) - 1)
        s_ids = np.clip(inst_shape[cand_inst], 0,
                        len(elem_start) - 1 if elem_start else 0)
        mtab = np.concatenate([
            mat_emission, mat_color, mat_roughness[:, None],
            mat_metallic[:, None], mat_ior[:, None], mat_scattering,
            mat_scanisotropy[:, None], mat_trdepth[:, None],
            mat_opacity[:, None]], axis=1).astype(np.float32)  # [M,15]
        itab = np.stack([mat_type, mat_emission_tex, mat_color_tex,
                         mat_roughness_tex, mat_scattering_tex,
                         mat_normal_tex], axis=1).astype(np.float32)
        srow = np.stack([np.asarray(kinds, np.int32),
                         np.asarray(has_n, np.int32),
                         np.asarray(has_t, np.int32),
                         np.asarray(has_c, np.int32)],
                        axis=1).astype(np.float32) if kinds else \
            np.zeros((1, 4), np.float32)
        cand_attrs = np.zeros((len(cand_inst), 64), np.float32)
        cand_attrs[:, 0:32] = elem_attrs[cand_elem]
        cand_attrs[:, 32:47] = mtab[m_ids]
        cand_attrs[:, 47:53] = itab[m_ids]
        cand_attrs[:, 53:57] = srow[s_ids]
        cand_attrs[:, 57] = m_ids.astype(np.float32)
    else:
        cand_attrs = None

    j = jnp.asarray
    return FlatScene(
        positions=j(positions), normals=j(normals), texcoords=j(texcoords),
        colors=j(colors), radius=j(radius), elements=j(elements),
        elem_attrs=j(elem_attrs),
        shape_elem_start=j(_pad1(np.asarray(elem_start, np.int32))),
        shape_elem_count=j(_pad1(np.asarray(elem_count, np.int32))),
        shape_kind=j(_pad1(np.asarray(kinds, np.int32), KIND_TRIANGLES)),
        shape_has_normals=j(_pad1(np.asarray(has_n, bool))),
        shape_has_texcoords=j(_pad1(np.asarray(has_t, bool))),
        shape_has_colors=j(_pad1(np.asarray(has_c, bool))),
        inst_frame=j(inst_frame), inst_inv_frame=j(inst_inv_frame),
        inst_shape=j(inst_shape), inst_material=j(inst_material),
        mat_type=j(mat_type), mat_emission=j(mat_emission),
        mat_color=j(mat_color), mat_roughness=j(mat_roughness),
        mat_metallic=j(mat_metallic), mat_ior=j(mat_ior),
        mat_scattering=j(mat_scattering),
        mat_scanisotropy=j(mat_scanisotropy), mat_trdepth=j(mat_trdepth),
        mat_opacity=j(mat_opacity),
        mat_emission_tex=j(mat_emission_tex), mat_color_tex=j(mat_color_tex),
        mat_roughness_tex=j(mat_roughness_tex),
        mat_scattering_tex=j(mat_scattering_tex),
        mat_normal_tex=j(mat_normal_tex),
        tex_data=j(tex_data),
        tex_offset=j(_pad1(np.asarray(tex_offset, np.int32))),
        tex_width=j(_pad1(np.asarray(tex_w, np.int32), 1)),
        tex_height=j(_pad1(np.asarray(tex_h, np.int32), 1)),
        tex_linear=j(_pad1(np.asarray(tex_linear, bool), True)),
        tex_nearest=j(_pad1(np.asarray(tex_nearest, bool))),
        tex_clamp=j(_pad1(np.asarray(tex_clamp, bool))),
        env_frame=j(env_frame), env_emission=j(env_emission),
        env_tex=j(env_tex),
        cam_frame=j(cam_frame),
        cam_ortho=j(_pad1(np.asarray([c.orthographic for c in cams], bool))),
        cam_lens=j(_pad1(np.asarray([c.lens for c in cams], np.float32),
                         0.050)),
        cam_film=j(_pad1(np.asarray([c.film for c in cams], np.float32),
                         0.036)),
        cam_aspect=j(_pad1(np.asarray([c.aspect for c in cams], np.float32),
                           1.5)),
        cam_focus=j(_pad1(np.asarray([c.focus for c in cams], np.float32),
                          10000.0)),
        cam_aperture=j(_pad1(np.asarray(
            [c.aperture for c in cams], np.float32))),
        cand_inst=j(cand_inst), cand_elem=j(cand_elem),
        tex_quad=None if tex_quad is None else j(tex_quad),
        cand_attrs=None if cand_attrs is None else j(cand_attrs),
        inst_cand_start=j(inst_cand_start),
    )


def num_environments(scene: SceneData) -> int:
    return len(scene.environments)
