"""PBRT v3/v4 subset scene IO (the reference's yocto_pbrtio equivalent,
yocto_pbrtio.cpp:1268-2330 conversion semantics, reimplemented as a pure
Python tokenizer + graphics-state machine that produces SceneData
directly).

Supported commands: LookAt/Translate/Scale/Rotate/Transform/
ConcatTransform/Identity, Attribute/Transform/Object blocks +
ObjectInstance, Film, Camera (perspective/realistic), Texture (imagemap/
constant and the reference's constant-fallbacks), Material/
MakeNamedMaterial/NamedMaterial (matte/diffuse, plastic/coateddiffuse/
substrate/uber/kdsubsurface, metal/conductor/mirror, glass/dielectric,
thindielectric, translucent/disney/hair fallbacks), AreaLightSource
diffuse, LightSource (infinite -> environment, distant -> far area quad,
point/spot/goniometric -> tiny sphere), Shape (trianglemesh, plymesh,
sphere, disk, loopsubdiv as trimesh), Include.

Material type mapping follows load_pbrt_scene (yocto_sceneio.cpp:
5139-5185): matte->matte, plastic->glossy, metal->reflective,
glass->refractive, thinglass->transparent; emissive shapes become matte.
"""

from __future__ import annotations

import math
import os
import re

import numpy as np

from ..models.scene import (INVALID, CameraData, EnvironmentData,
                            InstanceData, MaterialData, MaterialType,
                            SceneData)
from ..models.shape import ShapeData

_TOKEN_RE = re.compile(r'"[^"]*"|\[|\]|[^\s"\[\]]+')


def _tokenize(text: str):
    # strip comments
    lines = []
    for line in text.split("\n"):
        h = line.find("#")
        lines.append(line[:h] if h >= 0 else line)
    return _TOKEN_RE.findall("\n".join(lines))


class _Tokens:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse_params(self):
        """Parse '"type name" value-or-[values]' pairs until the next
        command token (non-quoted, non-bracket)."""
        params = {}
        while True:
            t = self.peek()
            if t is None or not t.startswith('"'):
                return params
            decl = self.next().strip('"').split()
            ptype, pname = (decl[0], decl[1]) if len(decl) == 2 \
                else ("string", decl[0])
            vals = []
            if self.peek() == "[":
                self.next()
                while self.peek() != "]":
                    vals.append(self.next())
                self.next()
            else:
                vals.append(self.next())
            if ptype in ("float", "point", "point3", "point2", "normal",
                         "vector", "vector3", "rgb", "color", "blackbody",
                         "spectrum", "xyz"):
                try:
                    vals = [float(v) for v in vals]
                except ValueError:
                    vals = [v.strip('"') for v in vals]  # spectrum file
            elif ptype == "integer":
                vals = [int(float(v)) for v in vals]
            elif ptype == "bool":
                vals = [v.strip('"') in ("true", "True") for v in vals]
            else:
                vals = [v.strip('"') for v in vals]
            params[pname] = (ptype, vals)
        return params


def _get(params, name, default):
    if name not in params:
        return default
    vals = params[name][1]
    if isinstance(default, (list, tuple, np.ndarray)):
        return list(vals)
    return vals[0]


def _get_textured(params, name, default_color, named_textures):
    """-> (color[3], texture_filename) per the reference's get_texture
    (yocto_pbrtio.cpp:1457-1471): named constant textures collapse to
    their color; imagemaps yield white + filename."""
    if name not in params:
        return list(default_color), ""
    ptype, vals = params[name]
    if ptype == "texture":
        tex = named_textures.get(vals[0], {})
        fn = tex.get("filename", "")
        if fn:
            return [1.0, 1.0, 1.0], fn
        return list(tex.get("constant", [1.0, 1.0, 1.0])), ""
    if len(vals) == 1:
        return [float(vals[0])] * 3, ""
    return [float(v) for v in vals[:3]], ""


def _get_roughness(params, default=0.1):
    """Reference remaproughness polynomial (yocto_pbrtio.cpp:1482-1509)."""
    def mean(name, d):
        c, _ = _get_textured(params, name, [d, d, d], {})
        return sum(c) / 3

    r = mean("roughness", default)
    ur = mean("uroughness", r)
    vr = mean("vroughness", r)
    remap = _get(params, "remaproughness", True)
    if ur == 0.0 or vr == 0.0:
        return 0.0
    rough = (ur + vr) / 2
    if remap:
        rough = max(rough, 1e-3)
        x = math.log(rough)
        rough = (1.62142 + 0.819955 * x + 0.1734 * x * x
                 + 0.0171201 * x ** 3 + 0.000640711 * x ** 4)
    return math.sqrt(max(rough, 0.0))


def _eta_to_reflectivity(eta, etak):
    out = []
    for e, k in zip(eta, etak):
        out.append(((e - 1) ** 2 + k * k) / ((e + 1) ** 2 + k * k))
    return out


def _convert_material(mtype, params, named_textures) -> MaterialData:
    """pbrt material -> MaterialData (yocto_pbrtio.cpp:1413-1700 +
    yocto_sceneio.cpp material_type_map)."""
    mat = MaterialData(type=MaterialType.matte,
                       color=np.array([0.5, 0.5, 0.5], np.float32))
    tex = ""
    if mtype in ("matte", "diffuse", "translucent", "diffusetransmission",
                 "hair", "disney"):
        key = ("reflectance" if mtype in ("diffuse", "diffusetransmission")
               else ("color" if mtype in ("hair", "disney") else "Kd"))
        dflt = [0.5, 0.5, 0.5]
        if mtype == "translucent":
            key, dflt = "Kd", [0.25, 0.25, 0.25]
        if mtype == "hair":
            dflt = [0.0, 0.0, 0.0]
        c, tex = _get_textured(params, key, dflt, named_textures)
        mat.type = MaterialType.matte
        mat.color = np.asarray(c, np.float32)
    elif mtype in ("plastic", "coateddiffuse", "substrate", "uber",
                   "kdsubsurface"):
        key = "reflectance" if mtype == "coateddiffuse" else "Kd"
        dflt = [0.5, 0.5, 0.5] if mtype in ("substrate", "kdsubsurface") \
            else [0.25, 0.25, 0.25]
        c, tex = _get_textured(params, key, dflt, named_textures)
        mat.type = MaterialType.glossy
        mat.color = np.asarray(c, np.float32)
        mat.ior = float(_get(params, "eta", 1.5)) \
            if params.get("eta", ("f", [0]))[0] != "texture" else 1.5
        mat.roughness = _get_roughness(params, 0.1)
        if mtype == "uber":
            kt, kt_tex = _get_textured(params, "Kt", [0, 0, 0],
                                       named_textures)
            if max(kt) > 0.1:
                mat.type = MaterialType.transparent
                mat.color = np.asarray(kt, np.float32)
                tex = kt_tex
    elif mtype in ("metal", "conductor", "coatedconductor", "mirror"):
        if mtype == "mirror":
            c, tex = _get_textured(params, "Kr", [0.9, 0.9, 0.9],
                                   named_textures)
            mat.type = MaterialType.reflective
            mat.color = np.asarray(c, np.float32)
            mat.roughness = 0.0
        else:
            pre = "conductor." if mtype == "coatedconductor" else ""
            eta, _ = _get_textured(
                params, pre + "eta",
                [0.2004376970, 0.9240334304, 1.1022119527], named_textures)
            etak, _ = _get_textured(
                params, pre + "k",
                [3.9129485033, 2.4528477015, 2.1421879552], named_textures)
            mat.type = MaterialType.reflective
            mat.color = np.asarray(_eta_to_reflectivity(eta, etak),
                                   np.float32)
            mat.roughness = _get_roughness(params, 0.01)
    elif mtype in ("glass", "dielectric"):
        if mtype == "glass":
            c, tex = _get_textured(params, "Kt", [1, 1, 1], named_textures)
        else:
            c = [1, 1, 1]
        mat.type = MaterialType.refractive
        mat.color = np.asarray(c, np.float32)
        mat.ior = float(_get(params, "eta", 1.5))
        mat.roughness = _get_roughness(params, 0.0)
    elif mtype == "thindielectric":
        mat.type = MaterialType.transparent
        mat.color = np.ones(3, np.float32)
        mat.ior = float(_get(params, "eta", 1.5))
        mat.roughness = _get_roughness(params, 0.0)
    elif mtype in ("subsurface",):
        mat.type = MaterialType.matte
        mat.color = np.ones(3, np.float32)
        mat.roughness = _get_roughness(params, 0.0)
    elif mtype in ("", "none"):
        pass
    else:
        # unknown: keep matte grey (reference warns/skips)
        pass
    op, _ = _get_textured(params, "opacity", [1, 1, 1], named_textures)
    mat.opacity = sum(op) / 3
    mat._pbrt_color_tex = tex  # attached for texture resolution
    return mat


def _translate(v):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = v
    return m


def _scale_m(v):
    return np.diag(np.asarray(list(v) + [1.0], np.float32))


def _rotate(angle_deg, axis):
    a = math.radians(angle_deg)
    x, y, z = np.asarray(axis, np.float64) / max(
        np.linalg.norm(axis), 1e-20)
    c, s = math.cos(a), math.sin(a)
    r = np.array([
        [c + x * x * (1 - c), x * y * (1 - c) - z * s,
         x * z * (1 - c) + y * s, 0],
        [y * x * (1 - c) + z * s, c + y * y * (1 - c),
         y * z * (1 - c) - x * s, 0],
        [z * x * (1 - c) - y * s, z * y * (1 - c) + x * s,
         c + z * z * (1 - c), 0],
        [0, 0, 0, 1]], np.float32)
    return r


def _lookat(eye, look, up):
    eye = np.asarray(eye, np.float64)
    look = np.asarray(look, np.float64)
    up = np.asarray(up, np.float64)
    d = look - eye
    d /= max(np.linalg.norm(d), 1e-20)
    left = np.cross(up / max(np.linalg.norm(up), 1e-20), d)
    left /= max(np.linalg.norm(left), 1e-20)
    newup = np.cross(d, left)
    m = np.eye(4, dtype=np.float32)  # camera-to-world
    m[:3, 0] = left
    m[:3, 1] = newup
    m[:3, 2] = d
    m[:3, 3] = eye
    # pbrt LookAt multiplies CTM by world-to-camera
    return np.linalg.inv(m).astype(np.float32)


def _mat_to_frame(m):
    f = np.zeros((4, 3), np.float32)
    f[0] = m[:3, 0]
    f[1] = m[:3, 1]
    f[2] = m[:3, 2]
    f[3] = m[:3, 3]
    return f


def _uvsphere_tri(steps, radius):
    """Triangulated uv-sphere (pbrtio's make_sphere equivalent)."""
    su, sv = steps
    us = np.linspace(0, 1, su + 1)
    vs = np.linspace(0, 1, sv + 1)
    uu, vv = np.meshgrid(us, vs, indexing="ij")
    theta = vv * np.pi
    phi = uu * 2 * np.pi
    pos = np.stack([np.cos(phi) * np.sin(theta),
                    np.sin(phi) * np.sin(theta),
                    np.cos(theta)], -1).reshape(-1, 3) * radius
    quads = []
    for i in range(su):
        for j in range(sv):
            v0 = i * (sv + 1) + j
            v1 = (i + 1) * (sv + 1) + j
            quads.append([v0, v1, v1 + 1, v0 + 1])
    q = np.asarray(quads, np.int32)
    tris = np.concatenate([q[:, [0, 1, 3]], q[:, [2, 3, 1]]], 0)
    nrm = pos / max(radius, 1e-20)
    return ShapeData(positions=pos.astype(np.float32),
                     normals=nrm.astype(np.float32),
                     triangles=tris.astype(np.int32))


def _disk_tri(steps, radius):
    su = steps[0]
    angs = np.linspace(0, 2 * np.pi, su + 1)[:-1]
    pos = np.concatenate(
        [np.zeros((1, 3), np.float32),
         np.stack([np.cos(angs) * radius, np.sin(angs) * radius,
                   np.zeros_like(angs)], -1).astype(np.float32)])
    tris = np.stack([np.zeros(su, np.int32),
                     np.arange(1, su + 1, dtype=np.int32),
                     np.roll(np.arange(1, su + 1, dtype=np.int32), -1)], -1)
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (len(pos), 1))
    return ShapeData(positions=pos, normals=nrm, triangles=tris)


def _quad_tri(size):
    s = size / 2
    pos = np.array([[-s, -s, 0], [s, -s, 0], [s, s, 0], [-s, s, 0]],
                   np.float32)
    tris = np.array([[0, 1, 3], [2, 3, 1]], np.int32)
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    return ShapeData(positions=pos, normals=nrm, triangles=tris)


def load_pbrt_scene(path: str) -> SceneData:
    scene = SceneData()
    dirname = os.path.dirname(path)

    named_textures = {}
    named_materials = {}
    texture_ids = {}     # filename -> scene texture id
    texture_paths = []
    material_ids = {}    # dedup key -> material id
    object_defs = {}     # name -> list of (shape_id, mat_id, def_frame)
    film_res = [512, 512]
    shape_ply_paths = {}

    def texture_id(filename):
        if not filename:
            return INVALID
        if filename not in texture_ids:
            texture_ids[filename] = len(texture_paths)
            texture_paths.append(filename)
        return texture_ids[filename]

    def material_id(mat: MaterialData, emission):
        key = (int(mat.type), tuple(np.round(np.asarray(mat.color), 6)),
               round(mat.roughness, 6), round(mat.ior, 6),
               round(mat.opacity, 6),
               getattr(mat, "_pbrt_color_tex", ""),
               tuple(np.round(np.asarray(emission), 6)))
        if key in material_ids:
            return material_ids[key]
        m = MaterialData(
            type=mat.type, color=np.asarray(mat.color, np.float32).copy(),
            roughness=mat.roughness, ior=mat.ior, opacity=mat.opacity,
            emission=np.asarray(emission, np.float32))
        if np.any(np.asarray(emission) != 0):
            m.type = MaterialType.matte
        m.color_tex = texture_id(getattr(mat, "_pbrt_color_tex", ""))
        scene.materials.append(m)
        scene.material_names.append(f"material{len(scene.materials)}")
        material_ids[key] = len(scene.materials) - 1
        return material_ids[key]

    class GState:
        def __init__(s, ctm=None, material=None, emission=None):
            s.ctm = np.eye(4, dtype=np.float32) if ctm is None else ctm
            s.material = material or MaterialData(
                type=MaterialType.matte,
                color=np.array([0.5, 0.5, 0.5], np.float32))
            s.emission = np.zeros(3, np.float32) if emission is None \
                else emission

        def copy(s):
            return GState(s.ctm.copy(), s.material, s.emission.copy())

    stack = [GState()]
    cur_object = None  # (name) while inside ObjectBegin
    pending_camera = None

    def run_file(fname):
        with open(fname) as f:
            toks = _Tokens(_tokenize(f.read()))
        nonlocal pending_camera, cur_object
        while True:
            cmd = toks.next()
            if cmd is None:
                break
            st = stack[-1]
            if cmd == "Include" or cmd == "Import":
                inc = toks.next().strip('"')
                run_file(os.path.join(dirname, inc))
            elif cmd in ("WorldBegin",):
                stack[-1].ctm = np.eye(4, dtype=np.float32)
            elif cmd in ("WorldEnd",):
                pass
            elif cmd in ("AttributeBegin", "TransformBegin"):
                stack.append(st.copy())
            elif cmd in ("AttributeEnd", "TransformEnd"):
                stack.pop()
            elif cmd == "ObjectBegin":
                name = toks.next().strip('"')
                stack.append(st.copy())
                object_defs[name] = []
                cur_object = name
            elif cmd == "ObjectEnd":
                stack.pop()
                cur_object = None
            elif cmd == "ObjectInstance":
                name = toks.next().strip('"')
                for shape_id, mat_id, def_frame in object_defs.get(name,
                                                                   []):
                    frame = _mat_to_frame(st.ctm @ def_frame)
                    scene.instances.append(InstanceData(
                        frame=frame, shape=shape_id, material=mat_id))
                    scene.instance_names.append(
                        f"instance{len(scene.instances)}")
            elif cmd == "Identity":
                st.ctm = np.eye(4, dtype=np.float32)
            elif cmd == "Translate":
                v = [float(toks.next()) for _ in range(3)]
                st.ctm = st.ctm @ _translate(v)
            elif cmd == "Scale":
                v = [float(toks.next()) for _ in range(3)]
                st.ctm = st.ctm @ _scale_m(v)
            elif cmd == "Rotate":
                v = [float(toks.next()) for _ in range(4)]
                st.ctm = st.ctm @ _rotate(v[0], v[1:])
            elif cmd == "LookAt":
                v = [float(toks.next()) for _ in range(9)]
                st.ctm = st.ctm @ _lookat(v[0:3], v[3:6], v[6:9])
            elif cmd in ("Transform", "ConcatTransform"):
                assert toks.next() == "["
                vals = []
                while toks.peek() != "]":
                    vals.append(float(toks.next()))
                toks.next()
                m = np.asarray(vals, np.float32).reshape(4, 4).T
                st.ctm = m if cmd == "Transform" else st.ctm @ m
            elif cmd == "Film":
                ftype = toks.next().strip('"')
                params = toks.parse_params()
                film_res[0] = int(_get(params, "xresolution", 512))
                film_res[1] = int(_get(params, "yresolution", 512))
            elif cmd == "Camera":
                ctype = toks.next().strip('"')
                params = toks.parse_params()
                pending_camera = (ctype, params, st.ctm.copy())
            elif cmd == "Texture":
                name = toks.next().strip('"')
                toks.next()  # value type (float/spectrum/color)
                ttype = toks.next().strip('"')
                params = toks.parse_params()
                entry = {"constant": [1.0, 1.0, 1.0], "filename": ""}
                if ttype == "imagemap":
                    entry["filename"] = _get(params, "filename", "")
                elif ttype == "constant":
                    v = _get(params, "value", [1.0, 1.0, 1.0])
                    entry["constant"] = (v if isinstance(v, list)
                                         else [v] * 3)
                elif ttype in ("scale", "mix"):
                    for sub in ("tex1", "tex2"):
                        if params.get(sub, ("", []))[0] == "texture":
                            subt = named_textures.get(
                                params[sub][1][0], {})
                            if subt.get("filename"):
                                entry["filename"] = subt["filename"]
                elif ttype in ("checkerboard", "dots", "fbm", "marble"):
                    entry["constant"] = [0.5, 0.5, 0.5]
                named_textures[name] = entry
            elif cmd == "Material":
                mtype = toks.next().strip('"')
                params = toks.parse_params()
                st.material = _convert_material(mtype, params,
                                                named_textures)
            elif cmd == "MakeNamedMaterial":
                name = toks.next().strip('"')
                params = toks.parse_params()
                mtype = _get(params, "type", "matte")
                named_materials[name] = _convert_material(
                    mtype, params, named_textures)
            elif cmd == "NamedMaterial":
                name = toks.next().strip('"')
                if name in named_materials:
                    st.material = named_materials[name]
            elif cmd == "AreaLightSource":
                ltype = toks.next().strip('"')
                params = toks.parse_params()
                if ltype == "diffuse":
                    el = _get(params, "L", [1.0, 1.0, 1.0])
                    sc = _get(params, "scale", [1.0, 1.0, 1.0])
                    el = el if isinstance(el, list) else [el] * 3
                    sc = sc if isinstance(sc, list) else [sc] * 3
                    st.emission = np.asarray(
                        [e * s for e, s in zip(el, sc)], np.float32)
            elif cmd == "LightSource":
                ltype = toks.next().strip('"')
                params = toks.parse_params()
                _convert_light(ltype, params, st.ctm)
            elif cmd == "Shape":
                stype = toks.next().strip('"')
                params = toks.parse_params()
                _convert_shape(stype, params, st)
            elif cmd in ("Integrator", "Sampler", "PixelFilter",
                         "Accelerator", "ColorSpace", "Option",
                         "MakeNamedMedium"):
                toks.next()
                toks.parse_params()
            elif cmd in ("MediumInterface",):
                toks.next()
                toks.next()
            elif cmd in ("ReverseOrientation", "ActiveTransform",
                         "TransformTimes", "CoordinateSystem",
                         "CoordSysTransform"):
                if cmd == "ActiveTransform":
                    toks.next()
                elif cmd == "TransformTimes":
                    toks.next()
                    toks.next()
                elif cmd in ("CoordinateSystem", "CoordSysTransform"):
                    toks.next()
            else:
                # unknown statement: try to skip its params
                toks.parse_params()

    def _convert_light(ltype, params, ctm):
        if ltype == "infinite":
            el = _get(params, "L", [1.0, 1.0, 1.0])
            sc = _get(params, "scale", [1.0, 1.0, 1.0])
            el = el if isinstance(el, list) else [el] * 3
            sc = sc if isinstance(sc, list) else [sc] * 3
            env = EnvironmentData()
            env.emission = np.asarray([e * s for e, s in zip(el, sc)],
                                      np.float32)
            mapname = _get(params, "mapname", "") or _get(
                params, "filename", "")
            env.emission_tex = texture_id(mapname)
            # y-up remap (yocto_pbrtio.cpp:1983-1993)
            remap = np.array([[1, 0, 0, 0], [0, 0, 1, 0],
                              [0, 1, 0, 0], [0, 0, 0, 1]],
                             np.float32).T
            env.frame = _mat_to_frame(ctm @ remap)
            scene.environments.append(env)
            scene.environment_names.append(
                f"environment{len(scene.environments)}")
        elif ltype == "distant":
            el = _get(params, "L", [1.0, 1.0, 1.0])
            sc = _get(params, "scale", [1.0, 1.0, 1.0])
            el = el if isinstance(el, list) else [el] * 3
            sc = sc if isinstance(sc, list) else [sc] * 3
            emission = np.asarray([e * s for e, s in zip(el, sc)],
                                  np.float32)
            frm = _get(params, "from", [0.0, 0.0, 0.0])
            to = _get(params, "to", [0.0, 0.0, 1.0])
            dist = 100.0
            size = dist * math.sin(math.radians(5))
            dscale = (dist * dist) / (size * size)
            d = np.asarray(frm, np.float64) - np.asarray(to, np.float64)
            d = d / max(np.linalg.norm(d), 1e-20)
            eye = d * dist
            # lookat frame towards the origin
            z = eye / np.linalg.norm(eye)
            x = np.cross(np.array([0, 1, 0.0]), z)
            x = x / max(np.linalg.norm(x), 1e-20)
            y = np.cross(z, x)
            lk = np.eye(4, dtype=np.float32)
            lk[:3, 0] = x
            lk[:3, 1] = y
            lk[:3, 2] = z
            lk[:3, 3] = eye
            shape = _quad_tri(size)
            scene.shapes.append(shape)
            scene.shape_names.append(f"light{len(scene.shapes)}")
            mat = MaterialData(emission=emission * dscale)
            scene.materials.append(mat)
            scene.material_names.append(f"light{len(scene.materials)}")
            scene.instances.append(InstanceData(
                frame=_mat_to_frame(ctm @ lk),
                shape=len(scene.shapes) - 1,
                material=len(scene.materials) - 1))
            scene.instance_names.append(f"light{len(scene.instances)}")
        elif ltype in ("point", "spot", "goniometric"):
            iv = _get(params, "I", [1.0, 1.0, 1.0])
            sc = _get(params, "scale", [1.0, 1.0, 1.0])
            iv = iv if isinstance(iv, list) else [iv] * 3
            sc = sc if isinstance(sc, list) else [sc] * 3
            emission = np.asarray([e * s for e, s in zip(iv, sc)],
                                  np.float32)
            frm = _get(params, "from", [0.0, 0.0, 0.0])
            shape = _uvsphere_tri((4, 2), 0.0025)
            scene.shapes.append(shape)
            scene.shape_names.append(f"light{len(scene.shapes)}")
            mat = MaterialData(emission=emission)
            scene.materials.append(mat)
            scene.material_names.append(f"light{len(scene.materials)}")
            scene.instances.append(InstanceData(
                frame=_mat_to_frame(ctm @ _translate(frm)),
                shape=len(scene.shapes) - 1,
                material=len(scene.materials) - 1))
            scene.instance_names.append(f"light{len(scene.instances)}")

    def _convert_shape(stype, params, st):
        shape = None
        ply_path = None
        if stype == "trianglemesh":
            shape = ShapeData()
            p = _get(params, "P", [])
            shape.positions = np.asarray(p, np.float32).reshape(-1, 3)
            n = _get(params, "N", [])
            if n:
                shape.normals = np.asarray(n, np.float32).reshape(-1, 3)
            uv = _get(params, "uv", []) or _get(params, "st", [])
            if uv:
                shape.texcoords = np.asarray(
                    uv, np.float32).reshape(-1, 2)
            idx = _get(params, "indices", [])
            shape.triangles = np.asarray(idx, np.int32).reshape(-1, 3)
        elif stype == "loopsubdiv":
            shape = ShapeData()
            p = _get(params, "P", [])
            shape.positions = np.asarray(p, np.float32).reshape(-1, 3)
            idx = _get(params, "indices", [])
            shape.triangles = np.asarray(idx, np.int32).reshape(-1, 3)
        elif stype == "plymesh":
            ply_path = _get(params, "filename", "")
            from .sceneio import load_shape
            shape = load_shape(os.path.join(dirname, ply_path))
        elif stype == "sphere":
            shape = _uvsphere_tri((32, 16), float(_get(params, "radius",
                                                       1.0)))
        elif stype == "disk":
            shape = _disk_tri((32, 1), float(_get(params, "radius", 1.0)))
        else:
            return
        scene.shapes.append(shape)
        scene.shape_names.append(f"shape{len(scene.shapes)}")
        shape_id = len(scene.shapes) - 1
        if ply_path:
            shape_ply_paths[shape_id] = ply_path
        mat_id = material_id(st.material, st.emission)
        if cur_object is not None:
            object_defs[cur_object].append(
                (shape_id, mat_id, st.ctm.copy()))
        else:
            scene.instances.append(InstanceData(
                frame=_mat_to_frame(st.ctm), shape=shape_id,
                material=mat_id))
            scene.instance_names.append(f"instance{len(scene.instances)}")

    run_file(path)

    # camera: world frame = inverse CTM with flipped z
    # (yocto_pbrtio.cpp:1291-1294)
    if pending_camera is not None:
        ctype, params, ctm = pending_camera
        cam = CameraData()
        c2w = np.linalg.inv(ctm.astype(np.float64)).astype(np.float32)
        c2w[:3, 2] = -c2w[:3, 2]
        cam.frame = _mat_to_frame(c2w)
        aspect = (film_res[0] / film_res[1]) if film_res[1] else 1.0
        cam.aspect = aspect
        cam.film = 0.036
        if ctype == "perspective":
            fov = float(_get(params, "fov", 90.0))
            if aspect >= 1:
                cam.lens = (0.036 / aspect) / (
                    2 * math.tan(math.radians(fov) / 2))
            else:
                cam.lens = (0.036 * aspect) / (
                    2 * math.tan(math.radians(fov) / 2))
            cam.aspect = float(_get(params, "frameaspectratio", aspect))
            cam.focus = float(_get(params, "focaldistance", 10.0))
        else:
            cam.lens = 0.05
            cam.focus = float(_get(params, "focusdistance", 10.0))
            cam.aperture = float(_get(params, "aperturediameter", 0.0))
        scene.cameras.append(cam)
        scene.camera_names.append("camera")

    # load referenced textures
    from .sceneio import load_texture
    from ..models.scene import TextureData
    for fn in texture_paths:
        try:
            scene.textures.append(
                load_texture(os.path.join(dirname, fn)))
        except Exception:
            scene.textures.append(TextureData(
                width=1, height=1, linear=True,
                pixelsf=np.ones((1, 1, 4), np.float32)))
        scene.texture_names.append(os.path.basename(fn))

    from .sceneio import (add_missing_camera, add_missing_lights,
                          add_missing_material, add_missing_radius)
    add_missing_material(scene)
    add_missing_camera(scene)
    add_missing_radius(scene)
    add_missing_lights(scene)
    return scene


def save_pbrt_scene(path: str, scene: SceneData) -> None:
    """Writer (save_pbrt_scene, yocto_sceneio.cpp:5250+ equivalent):
    camera + named materials + ply shape files + area lights + envs."""
    dirname = os.path.dirname(path) or "."
    os.makedirs(os.path.join(dirname, "shapes"), exist_ok=True)
    os.makedirs(os.path.join(dirname, "textures"), exist_ok=True)
    lines = []
    cam = scene.cameras[0] if scene.cameras else CameraData()
    f = np.asarray(cam.frame, np.float32)
    m = np.eye(4, dtype=np.float32)
    m[:3, 0] = f[0]
    m[:3, 1] = f[1]
    m[:3, 2] = -f[2]
    m[:3, 3] = f[3]
    w2c = np.linalg.inv(m.astype(np.float64)).astype(np.float32)
    film_y = cam.film / cam.aspect if cam.aspect >= 1 else cam.film
    fov = math.degrees(2 * math.atan(
        (cam.film / cam.aspect if cam.aspect >= 1 else
         cam.film * cam.aspect) / (2 * cam.lens)))
    res = 1280
    lines.append("Transform [ " + " ".join(
        f"{v:.9g}" for v in w2c.T.reshape(-1)) + " ]")
    lines.append(f'Camera "perspective" "float fov" [ {fov:.9g} ]')
    lines.append('Film "image" "integer xresolution" [ %d ]'
                 ' "integer yresolution" [ %d ]'
                 % (res, int(round(res / max(cam.aspect, 1e-3)))))
    lines.append('Integrator "path"')
    lines.append("WorldBegin")
    # environments
    for env in scene.environments:
        lines.append("AttributeBegin")
        ef = np.asarray(env.frame, np.float32)
        em = np.eye(4, dtype=np.float32)
        em[:3, 0] = ef[0]
        em[:3, 1] = ef[2]
        em[:3, 2] = ef[1]
        em[:3, 3] = ef[3]
        lines.append("Transform [ " + " ".join(
            f"{v:.9g}" for v in em.T.reshape(-1)) + " ]")
        e = env.emission
        lines.append('LightSource "infinite" "rgb L" '
                     f'[ {e[0]:.9g} {e[1]:.9g} {e[2]:.9g} ]')
        lines.append("AttributeEnd")
    # materials
    tmap = {int(MaterialType.matte): "matte",
            int(MaterialType.glossy): "plastic",
            int(MaterialType.reflective): "metal",
            int(MaterialType.refractive): "glass",
            int(MaterialType.transparent): "uber"}
    for midx, mat in enumerate(scene.materials):
        name = (scene.material_names[midx]
                if midx < len(scene.material_names) else f"material{midx}")
        ptype = tmap.get(int(mat.type), "matte")
        c = np.asarray(mat.color, np.float32)
        extra = ""
        if ptype == "matte":
            extra = f' "rgb Kd" [ {c[0]:.9g} {c[1]:.9g} {c[2]:.9g} ]'
        elif ptype == "plastic":
            extra = (f' "rgb Kd" [ {c[0]:.9g} {c[1]:.9g} {c[2]:.9g} ]'
                     f' "float roughness" [ {mat.roughness:.9g} ]'
                     ' "bool remaproughness" "false"')
        elif ptype == "metal":
            extra = f' "float roughness" [ {mat.roughness:.9g} ]' \
                    ' "bool remaproughness" "false"'
        elif ptype == "glass":
            extra = (f' "rgb Kt" [ {c[0]:.9g} {c[1]:.9g} {c[2]:.9g} ]'
                     f' "float eta" [ {mat.ior:.9g} ]')
        elif ptype == "uber":
            extra = f' "rgb Kt" [ {c[0]:.9g} {c[1]:.9g} {c[2]:.9g} ]'
        lines.append(f'MakeNamedMaterial "{name}" "string type" "{ptype}"'
                     + extra)
    # instances as ply shapes
    from .sceneio import save_shape
    for iidx, inst in enumerate(scene.instances):
        shape = scene.shapes[inst.shape]
        sname = (scene.shape_names[inst.shape]
                 if inst.shape < len(scene.shape_names)
                 else f"shape{inst.shape}")
        ply = f"shapes/{sname}.ply"
        if not os.path.exists(os.path.join(dirname, ply)):
            save_shape(os.path.join(dirname, ply), shape)
        lines.append("AttributeBegin")
        fr = np.asarray(inst.frame, np.float32)
        im = np.eye(4, dtype=np.float32)
        im[:3, 0] = fr[0]
        im[:3, 1] = fr[1]
        im[:3, 2] = fr[2]
        im[:3, 3] = fr[3]
        lines.append("Transform [ " + " ".join(
            f"{v:.9g}" for v in im.T.reshape(-1)) + " ]")
        if inst.material != INVALID:
            mat = scene.materials[inst.material]
            mname = (scene.material_names[inst.material]
                     if inst.material < len(scene.material_names)
                     else f"material{inst.material}")
            if np.any(np.asarray(mat.emission) != 0):
                e = mat.emission
                lines.append('AreaLightSource "diffuse" "rgb L" '
                             f'[ {e[0]:.9g} {e[1]:.9g} {e[2]:.9g} ]')
            lines.append(f'NamedMaterial "{mname}"')
        lines.append(f'Shape "plymesh" "string filename" [ "{ply}" ]')
        lines.append("AttributeEnd")
    with open(path, "w") as fp:
        fp.write("\n".join(lines) + "\n")
