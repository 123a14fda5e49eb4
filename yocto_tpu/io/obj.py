"""OBJ model IO.

Native-equivalent of the reference OBJ layer (yocto_modelio.h:233-374):
positions/normals/texcoords with per-face vertex triplets, MTL materials,
face/line/point elements, triangulated accessors, and scene-level load/save
(obj scenes map each (shape, material) pair to an instance as the
reference's obj converter does, yocto_sceneio.cpp obj path). Vertices are
deduplicated per (pos, norm, uv) triplet to build indexed shapes.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from ..models.scene import (InstanceData, MaterialData, MaterialType,
                            SceneData, TextureData)
from ..models.shape import FvShapeData, ShapeData


@dataclass
class ObjMaterial:
    name: str = ""
    emission: tuple = (0.0, 0.0, 0.0)
    diffuse: tuple = (0.0, 0.0, 0.0)
    specular: tuple = (0.0, 0.0, 0.0)
    transmission: tuple = (0.0, 0.0, 0.0)
    roughness: float = 0.0
    exponent: float = 10.0
    metallic: float = 0.0
    opacity: float = 1.0
    ior: float = 1.5
    illum: int = 2
    emission_tex: int = -1
    diffuse_tex: int = -1
    normal_tex: int = -1


@dataclass
class ObjShape:
    name: str = ""
    # face/line/point elements: list of (etype, size, material)
    elements: list = field(default_factory=list)
    vertices: list = field(default_factory=list)  # (pos, uv, norm) 1-based


@dataclass
class ObjModel:
    positions: np.ndarray = None
    normals: np.ndarray = None
    texcoords: np.ndarray = None
    materials: list = field(default_factory=list)
    textures: list = field(default_factory=list)  # texture file paths
    shapes: list = field(default_factory=list)


def _parse_mtl(path: str, obj: ObjModel):
    if not os.path.exists(path):
        return
    tex_index = {}

    def add_tex(name):
        if name not in tex_index:
            tex_index[name] = len(obj.textures)
            obj.textures.append(name)
        return tex_index[name]

    cur = None
    with open(path) as f:
        for line in f:
            toks = line.split()
            if not toks or toks[0].startswith("#"):
                continue
            cmd = toks[0]
            if cmd == "newmtl":
                cur = ObjMaterial(name=toks[1] if len(toks) > 1 else "")
                obj.materials.append(cur)
            elif cur is None:
                continue
            elif cmd == "Ke":
                cur.emission = tuple(float(v) for v in toks[1:4])
            elif cmd == "Kd":
                cur.diffuse = tuple(float(v) for v in toks[1:4])
            elif cmd == "Ks":
                cur.specular = tuple(float(v) for v in toks[1:4])
            elif cmd == "Kt" or cmd == "Tf":
                cur.transmission = tuple(float(v) for v in toks[1:4])
            elif cmd == "Ns":
                cur.exponent = float(toks[1])
                # exponent -> roughness (reference convention)
                e = cur.exponent
                cur.roughness = (2 / (e + 2)) ** (1 / 4) if e > 0 else 1.0
            elif cmd == "d":
                cur.opacity = float(toks[1])
            elif cmd == "Ni":
                cur.ior = float(toks[1])
            elif cmd == "illum":
                cur.illum = int(toks[1])
            elif cmd == "Pr":
                cur.roughness = float(toks[1])
            elif cmd == "Pm":
                cur.metallic = float(toks[1])
            elif cmd == "map_Ke":
                cur.emission_tex = add_tex(toks[-1])
            elif cmd == "map_Kd":
                cur.diffuse_tex = add_tex(toks[-1])
            elif cmd in ("map_bump", "bump", "norm", "map_norm"):
                cur.normal_tex = add_tex(toks[-1])


def load_obj(path: str, split_shapes: bool = True) -> ObjModel:
    obj = ObjModel()
    positions, normals, texcoords = [], [], []
    mat_index = {}
    cur_mat = -1
    shape = ObjShape()
    obj.shapes.append(shape)

    def maybe_split(name):
        nonlocal shape
        if not split_shapes:
            return
        if shape.elements:
            shape = ObjShape(name=name)
            obj.shapes.append(shape)
        else:
            shape.name = name

    with open(path) as f:
        for line in f:
            toks = line.split()
            if not toks or toks[0].startswith("#"):
                continue
            cmd = toks[0]
            if cmd == "v":
                positions.append([float(v) for v in toks[1:4]])
            elif cmd == "vn":
                normals.append([float(v) for v in toks[1:4]])
            elif cmd == "vt":
                texcoords.append([float(v) for v in toks[1:3]])
            elif cmd in ("f", "l", "p"):
                etype = {"f": "face", "l": "line", "p": "point"}[cmd]
                verts = []
                for tok in toks[1:]:
                    parts = (tok.split("/") + ["", ""])[:3]
                    vp = int(parts[0]) if parts[0] else 0
                    vt = int(parts[1]) if parts[1] else 0
                    vn = int(parts[2]) if parts[2] else 0
                    # negative indices are relative
                    if vp < 0:
                        vp = len(positions) + vp + 1
                    if vt < 0:
                        vt = len(texcoords) + vt + 1
                    if vn < 0:
                        vn = len(normals) + vn + 1
                    verts.append((vp, vt, vn))
                shape.elements.append((etype, len(verts), cur_mat))
                shape.vertices.extend(verts)
            elif cmd in ("o", "g"):
                maybe_split(toks[1] if len(toks) > 1 else "")
            elif cmd == "usemtl":
                name = toks[1] if len(toks) > 1 else ""
                cur_mat = mat_index.get(name, -1)
            elif cmd == "mtllib":
                mtl_path = os.path.join(os.path.dirname(path), toks[1])
                _parse_mtl(mtl_path, obj)
                mat_index = {m.name: i for i, m in enumerate(obj.materials)}
    obj.positions = np.asarray(positions, np.float32).reshape(-1, 3)
    obj.normals = np.asarray(normals, np.float32).reshape(-1, 3)
    obj.texcoords = np.asarray(texcoords, np.float32).reshape(-1, 2)
    return obj


def _index_shape(obj: ObjModel, shape: ObjShape, flip_texcoord: bool):
    """Deduplicate (pos,uv,norm) triplets -> indexed ShapeData + per-element
    material ids."""
    out = ShapeData()
    vmap = {}
    indices = np.empty(len(shape.vertices), np.int32)
    pos_out, nrm_out, tc_out = [], [], []
    for i, key in enumerate(shape.vertices):
        idx = vmap.get(key)
        if idx is None:
            idx = len(pos_out)
            vmap[key] = idx
            vp, vt, vn = key
            pos_out.append(obj.positions[vp - 1] if vp else (0, 0, 0))
            if len(obj.texcoords):
                tc_out.append(obj.texcoords[vt - 1] if vt else (0, 0))
            if len(obj.normals):
                nrm_out.append(obj.normals[vn - 1] if vn else (0, 0, 1))
        indices[i] = idx
    out.positions = np.asarray(pos_out, np.float32).reshape(-1, 3)
    has_uv = any(vt for _, vt, _ in shape.vertices)
    has_n = any(vn for _, _, vn in shape.vertices)
    if tc_out and has_uv:
        tc = np.asarray(tc_out, np.float32).reshape(-1, 2)
        if flip_texcoord:
            tc[:, 1] = 1.0 - tc[:, 1]
        out.texcoords = tc
    if nrm_out and has_n:
        out.normals = np.asarray(nrm_out, np.float32).reshape(-1, 3)

    has_quads = any(e[0] == "face" and e[1] == 4 for e in shape.elements)
    tris, quads, lines, points, ematerials = [], [], [], [], []
    cur = 0
    for etype, size, mat in shape.elements:
        vi = indices[cur:cur + size]
        cur += size
        if etype == "face":
            if has_quads:
                if size == 4:
                    quads.append(vi)
                    ematerials.append(mat)
                elif size == 3:
                    quads.append([vi[0], vi[1], vi[2], vi[2]])
                    ematerials.append(mat)
                else:
                    for c in range(2, size):
                        quads.append([vi[0], vi[c - 1], vi[c], vi[c]])
                        ematerials.append(mat)
            else:
                for c in range(2, size):
                    tris.append([vi[0], vi[c - 1], vi[c]])
                    ematerials.append(mat)
        elif etype == "line":
            for c in range(1, size):
                lines.append([vi[c - 1], vi[c]])
                ematerials.append(mat)
        else:
            for v in vi:
                points.append(v)
                ematerials.append(mat)
    if tris:
        out.triangles = np.asarray(tris, np.int32)
    if quads:
        out.quads = np.asarray(quads, np.int32)
    if lines:
        out.lines = np.asarray(lines, np.int32)
    if points:
        out.points = np.asarray(points, np.int32)
    return out, ematerials


def load_shape_obj(path: str, flip_texcoord: bool = True) -> ShapeData:
    obj = load_obj(path, split_shapes=False)
    shape, _ = _index_shape(obj, obj.shapes[0], flip_texcoord)
    return shape


def load_fvshape_obj(path: str, flip_texcoord: bool = True) -> FvShapeData:
    """Face-varying load: keep separate pos/norm/uv topologies."""
    obj = load_obj(path, split_shapes=False)
    shape = obj.shapes[0]
    fv = FvShapeData()
    fv.positions = obj.positions
    fv.normals = obj.normals
    tc = obj.texcoords.copy()
    if flip_texcoord and len(tc):
        tc[:, 1] = 1.0 - tc[:, 1]
    fv.texcoords = tc
    qp, qn, qt = [], [], []
    cur = 0
    for etype, size, _ in shape.elements:
        verts = shape.vertices[cur:cur + size]
        cur += size
        if etype != "face":
            continue
        if size == 3:
            verts = list(verts) + [verts[2]]
        elif size != 4:
            continue
        qp.append([v[0] - 1 for v in verts])
        if all(v[2] for v in verts):
            qn.append([v[2] - 1 for v in verts])
        if all(v[1] for v in verts):
            qt.append([v[1] - 1 for v in verts])
    fv.quadspos = np.asarray(qp, np.int32).reshape(-1, 4)
    fv.quadsnorm = np.asarray(qn, np.int32).reshape(-1, 4)
    fv.quadstexcoord = np.asarray(qt, np.int32).reshape(-1, 4)
    return fv


def _obj_material_to_yocto(m: ObjMaterial, tex_base: int) -> MaterialData:
    """OBJ material -> scene material (reference conversion rules)."""
    mat = MaterialData()
    mat.emission = np.asarray(m.emission, np.float32)
    if any(v > 0 for v in m.transmission):
        mat.type = MaterialType.transparent
        mat.color = np.asarray(m.transmission, np.float32)
    elif any(v > 0 for v in m.specular) and m.metallic > 0:
        mat.type = MaterialType.reflective
        mat.color = np.asarray(m.diffuse, np.float32)
    elif any(v > 0 for v in m.specular):
        mat.type = MaterialType.glossy
        mat.color = np.asarray(m.diffuse, np.float32)
    else:
        mat.type = MaterialType.matte
        mat.color = np.asarray(m.diffuse, np.float32)
    mat.roughness = m.roughness
    mat.metallic = m.metallic
    mat.ior = m.ior
    mat.opacity = m.opacity
    if m.emission_tex >= 0:
        mat.emission_tex = tex_base + m.emission_tex
    if m.diffuse_tex >= 0:
        mat.color_tex = tex_base + m.diffuse_tex
    if m.normal_tex >= 0:
        mat.normal_tex = tex_base + m.normal_tex
    return mat


def load_obj_scene(path: str) -> SceneData:
    from .sceneio import (add_missing_camera, add_missing_lights,
                          add_missing_material, add_missing_radius,
                          load_texture)

    obj = load_obj(path, split_shapes=True)
    scene = SceneData()
    for uri in obj.textures:
        tex_path = os.path.join(os.path.dirname(path), uri)
        try:
            scene.textures.append(load_texture(tex_path))
        except Exception:
            scene.textures.append(TextureData())
        scene.texture_names.append(os.path.splitext(os.path.basename(uri))[0])
    for m in obj.materials:
        scene.materials.append(_obj_material_to_yocto(m, 0))
        scene.material_names.append(m.name)
    for oshape in obj.shapes:
        if not oshape.elements:
            continue
        shape, emats = _index_shape(obj, oshape, flip_texcoord=True)
        mats = sorted(set(emats))
        for mat in mats:
            if len(mats) == 1:
                sub = shape
            else:
                sub = _filter_shape_by_material(shape, emats, mat)
            scene.shapes.append(sub)
            scene.shape_names.append(oshape.name or "shape")
            scene.instances.append(InstanceData(
                shape=len(scene.shapes) - 1, material=max(mat, -1)))
            scene.instance_names.append(oshape.name or "shape")
    add_missing_material(scene)
    add_missing_camera(scene)
    add_missing_radius(scene)
    add_missing_lights(scene)
    return scene


def _filter_shape_by_material(shape: ShapeData, emats, mat) -> ShapeData:
    sel = np.asarray([m == mat for m in emats], bool)
    out = ShapeData(positions=shape.positions, normals=shape.normals,
                    texcoords=shape.texcoords, colors=shape.colors,
                    radius=shape.radius)
    consumed = 0
    if len(shape.triangles):
        k = len(shape.triangles)
        out.triangles = shape.triangles[sel[consumed:consumed + k]]
        consumed += k
    if len(shape.quads):
        k = len(shape.quads)
        out.quads = shape.quads[sel[consumed:consumed + k]]
        consumed += k
    if len(shape.lines):
        k = len(shape.lines)
        out.lines = shape.lines[sel[consumed:consumed + k]]
        consumed += k
    if len(shape.points):
        k = len(shape.points)
        out.points = shape.points[sel[consumed:consumed + k]]
    return out


def save_shape_obj(path: str, shape: ShapeData,
                   flip_texcoord: bool = True) -> None:
    with open(path, "w") as f:
        f.write("# Written by yocto-tpu\n")
        for p in shape.positions:
            f.write(f"v {p[0]:.7g} {p[1]:.7g} {p[2]:.7g}\n")
        has_uv = len(shape.texcoords) == len(shape.positions)
        has_n = len(shape.normals) == len(shape.positions)
        if has_uv:
            for t in shape.texcoords:
                tv = 1.0 - t[1] if flip_texcoord else t[1]
                f.write(f"vt {t[0]:.7g} {tv:.7g}\n")
        if has_n:
            for n in shape.normals:
                f.write(f"vn {n[0]:.7g} {n[1]:.7g} {n[2]:.7g}\n")

        def vref(i):
            i1 = i + 1
            if has_uv and has_n:
                return f"{i1}/{i1}/{i1}"
            if has_uv:
                return f"{i1}/{i1}"
            if has_n:
                return f"{i1}//{i1}"
            return str(i1)

        for t in shape.triangles:
            f.write("f " + " ".join(vref(int(v)) for v in t) + "\n")
        for q in shape.quads:
            idx = q[:3] if q[2] == q[3] else q
            f.write("f " + " ".join(vref(int(v)) for v in idx) + "\n")
        for l in shape.lines:
            f.write("l " + " ".join(vref(int(v)) for v in l) + "\n")
        for p in shape.points:
            f.write("p " + vref(int(p)) + "\n")


def save_obj_scene(path: str, scene: SceneData) -> None:
    """Minimal OBJ scene writer: transformed shapes + MTL materials."""
    mtl_path = os.path.splitext(path)[0] + ".mtl"
    with open(mtl_path, "w") as f:
        f.write("# Written by yocto-tpu\n")
        for idx, mat in enumerate(scene.materials):
            name = scene.material_names[idx] \
                if idx < len(scene.material_names) else f"material{idx}"
            f.write(f"newmtl {name or f'material{idx}'}\n")
            f.write(f"Ke {mat.emission[0]} {mat.emission[1]} "
                    f"{mat.emission[2]}\n")
            f.write(f"Kd {mat.color[0]} {mat.color[1]} {mat.color[2]}\n")
            f.write(f"d {mat.opacity}\n")
            f.write(f"Ni {mat.ior}\n")
            f.write(f"Pr {mat.roughness}\nPm {mat.metallic}\n")
    with open(path, "w") as f:
        f.write("# Written by yocto-tpu\n")
        f.write(f"mtllib {os.path.basename(mtl_path)}\n")
        voff = toff = noff = 1
        for iidx, inst in enumerate(scene.instances):
            shape = scene.shapes[inst.shape]
            frame = np.asarray(inst.frame, np.float32)
            pos = shape.positions @ frame[:3] + frame[3]
            f.write(f"o instance{iidx}\n")
            mat_name = scene.material_names[inst.material] \
                if inst.material < len(scene.material_names) else \
                f"material{inst.material}"
            f.write(f"usemtl {mat_name or f'material{inst.material}'}\n")
            for p in pos:
                f.write(f"v {p[0]:.7g} {p[1]:.7g} {p[2]:.7g}\n")
            has_uv = len(shape.texcoords) == len(shape.positions)
            has_n = len(shape.normals) == len(shape.positions)
            if has_uv:
                for t in shape.texcoords:
                    f.write(f"vt {t[0]:.7g} {1.0 - t[1]:.7g}\n")
            if has_n:
                rot = frame[:3]
                nrm = shape.normals @ rot
                nrm = nrm / np.maximum(
                    np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)
                for n in nrm:
                    f.write(f"vn {n[0]:.7g} {n[1]:.7g} {n[2]:.7g}\n")

            def vref(i):
                parts = [str(voff + i)]
                if has_uv:
                    parts.append(str(toff + i))
                elif has_n:
                    parts.append("")
                if has_n:
                    parts.append(str(noff + i))
                return "/".join(parts)

            for t in shape.triangles:
                f.write("f " + " ".join(vref(int(v)) for v in t) + "\n")
            for q in shape.quads:
                idx = q[:3] if q[2] == q[3] else q
                f.write("f " + " ".join(vref(int(v)) for v in idx) + "\n")
            for l in shape.lines:
                f.write("l " + " ".join(vref(int(v)) for v in l) + "\n")
            for p in shape.points:
                f.write("p " + vref(int(p)) + "\n")
            voff += len(shape.positions)
            if has_uv:
                toff += len(shape.positions)
            if has_n:
                noff += len(shape.positions)
