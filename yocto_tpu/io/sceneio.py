"""Scene IO: JSON scene format (reference-compatible), dispatch by
extension, texture loading, and scene fixups.

Mirrors the reference scene IO layer (yocto_sceneio.cpp:2715-3900): the
JSON schema is the reference's own 4.2 format, so the reference `tests/`
corpus loads unchanged. Shapes load from PLY/OBJ/STL with flipped
texcoords; textures from PNG/JPG (bytes, sRGB) or HDR/EXR (floats,
linear); fixups add missing cameras/radius exactly as the reference
(yocto_sceneio.cpp:2119-2148).
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..models.scene import (INVALID, CameraData, EnvironmentData,
                            InstanceData, MaterialData, MaterialType,
                            SceneData, SubdivData, TextureData,
                            compute_bounds)
from ..models.shape import ShapeData
from . import imageio
from .ply import load_shape_ply, save_shape_ply


def _frame(vals):
    return np.asarray(vals, np.float32).reshape(4, 3)


def _lookat_frame(eye, center, up, inv_ok=False):
    eye = np.asarray(eye, np.float32)
    center = np.asarray(center, np.float32)
    up = np.asarray(up, np.float32)
    z = eye - center
    z = z / np.linalg.norm(z)
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    y = y / np.linalg.norm(y)
    return np.stack([x, y, z, eye], 0)


def load_texture(path: str) -> TextureData:
    if path.lower().endswith(".ypreset"):
        from .presets import make_texture_preset
        img = make_texture_preset(
            os.path.basename(path)[:-len(".ypreset")])
        px = np.asarray(img.pixels, np.float32)
        if img.linear:
            return TextureData(width=img.width, height=img.height,
                               linear=True, pixelsf=px)
        return TextureData(
            width=img.width, height=img.height, linear=False,
            pixelsb=np.clip(px * 255.0 + 0.5, 0, 255).astype(np.uint8))
    pixelsf, pixelsb, linear = imageio.load_image_bytes(path)
    if pixelsf is not None:
        h, w = pixelsf.shape[:2]
        return TextureData(width=w, height=h, linear=True, pixelsf=pixelsf)
    h, w = pixelsb.shape[:2]
    return TextureData(width=w, height=h, linear=False, pixelsb=pixelsb)


def load_shape(path: str, flip_texcoord: bool = True) -> ShapeData:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".ply":
        return load_shape_ply(path, flip_texcoord)
    if ext == ".obj":
        from .obj import load_shape_obj
        return load_shape_obj(path, flip_texcoord)
    if ext == ".stl":
        from .stl import load_shape_stl
        return load_shape_stl(path)
    if ext == ".ypreset":
        from .presets import make_shape_preset
        return make_shape_preset(os.path.basename(path)[:-len(".ypreset")])
    raise ValueError(f"unsupported shape format {ext}")


def save_shape(path: str, shape: ShapeData, flip_texcoord: bool = True,
               ascii_fmt: bool = False) -> None:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".ply":
        save_shape_ply(path, shape, flip_texcoord, ascii_fmt)
    elif ext == ".obj":
        from .obj import save_shape_obj
        save_shape_obj(path, shape, flip_texcoord)
    elif ext == ".stl":
        from .stl import save_shape_stl
        save_shape_stl(path, shape)
    else:
        raise ValueError(f"unsupported shape format {ext}")


def load_subdiv(path: str) -> SubdivData:
    from .obj import load_fvshape_obj
    ext = os.path.splitext(path)[1].lower()
    if ext == ".obj":
        fv = load_fvshape_obj(path, flip_texcoord=True)
    else:
        # PLY subdivs load as plain shapes promoted to face-varying
        shape = load_shape(path)
        from ..models.shape import triangles_to_quads
        quads = shape.quads if len(shape.quads) else \
            triangles_to_quads(shape.triangles)
        sub = SubdivData(quadspos=quads, positions=shape.positions)
        if len(shape.normals):
            sub.quadsnorm = quads
            sub.normals = shape.normals
        if len(shape.texcoords):
            sub.quadstexcoord = quads
            sub.texcoords = shape.texcoords
        return sub
    sub = SubdivData(
        quadspos=fv.quadspos, quadsnorm=fv.quadsnorm,
        quadstexcoord=fv.quadstexcoord, positions=fv.positions,
        normals=fv.normals, texcoords=fv.texcoords)
    return sub


# ----------------------------------------------------------------------------
# Scene fixups (yocto_sceneio.cpp:2119-2169)
# ----------------------------------------------------------------------------

def add_missing_camera(scene: SceneData) -> None:
    if scene.cameras:
        return
    cam = CameraData(film=0.036, aspect=16 / 9, aperture=0, lens=0.050)
    lo, hi = compute_bounds(scene)
    center = (lo + hi) / 2
    radius = np.linalg.norm(hi - lo) / 2
    camera_dist = radius * cam.lens / (cam.film / cam.aspect) * 2.0
    frm = _lookat_frame(center + np.array([0, 0, 1]) * camera_dist, center,
                        [0, 1, 0])
    cam.frame = frm
    scene.cameras.append(cam)
    scene.camera_names.append("camera")


def add_missing_radius(scene: SceneData, radius: float = 0.001) -> None:
    for shape in scene.shapes:
        if not len(shape.points) and not len(shape.lines):
            continue
        if len(shape.radius):
            continue
        shape.radius = np.full(len(shape.positions), radius, np.float32)


def add_missing_material(scene: SceneData) -> None:
    default_material = INVALID
    for inst in scene.instances:
        if inst.material >= 0:
            continue
        if default_material == INVALID:
            mat = MaterialData(type=MaterialType.matte,
                               color=np.asarray([0.8, 0.8, 0.8], np.float32))
            scene.materials.append(mat)
            scene.material_names.append("default")
            default_material = len(scene.materials) - 1
        inst.material = default_material


def has_lights(scene: SceneData) -> bool:
    for env in scene.environments:
        if np.any(np.asarray(env.emission) != 0):
            return True
    for inst in scene.instances:
        if inst.material < 0:
            continue
        if np.any(np.asarray(scene.materials[inst.material].emission) != 0):
            return True
    return False


def add_sky(scene: SceneData, sun_angle: float = np.pi / 4) -> None:
    """Procedural sky environment (yocto_scene.cpp:645 equivalent)."""
    from ..models.image import make_sunsky

    sky = make_sunsky(1024, 512, sun_angle)
    tex = TextureData(width=1024, height=512, linear=True,
                      pixelsf=np.asarray(sky, np.float32))
    scene.textures.append(tex)
    scene.texture_names.append("sky")
    env = EnvironmentData(emission=np.asarray([0.25, 0.25, 0.25], np.float32),
                          emission_tex=len(scene.textures) - 1)
    scene.environments.append(env)
    scene.environment_names.append("sky")


def add_missing_lights(scene: SceneData) -> None:
    if not has_lights(scene):
        add_sky(scene)


# ----------------------------------------------------------------------------
# JSON scene format (4.2 schema; yocto_sceneio.cpp:3618-3836)
# ----------------------------------------------------------------------------

def load_json_scene(path: str) -> SceneData:
    with open(path) as f:
        doc = json.load(f)
    version = doc.get("asset", {}).get("version", "")
    if version in ("", "4.0", "4.1"):
        # archived corpora (yocto_sceneio.cpp:3025, 3376): dict-keyed
        # groups, name references, extension-probed resource paths
        return _load_json_scene_v40(path, doc)
    if version not in ("4.2", "5.0"):
        raise ValueError(
            f"unsupported scene version {version!r} "
            f"(4.0/4.1/4.2/5.0 supported)")

    scene = SceneData()
    scene.copyright = doc.get("asset", {}).get("copyright", "")
    dirname = os.path.dirname(path)

    for element in doc.get("cameras", []):
        cam = CameraData()
        scene.camera_names.append(element.get("name", ""))
        if "frame" in element:
            cam.frame = _frame(element["frame"])
        cam.orthographic = element.get("orthographic", cam.orthographic)
        cam.lens = element.get("lens", cam.lens)
        cam.aspect = element.get("aspect", cam.aspect)
        cam.film = element.get("film", cam.film)
        cam.focus = element.get("focus", cam.focus)
        cam.aperture = element.get("aperture", cam.aperture)
        if "lookat" in element:
            mat = np.asarray(element["lookat"], np.float32).reshape(3, 3)
            cam.focus = float(np.linalg.norm(mat[0] - mat[1]))
            cam.frame = _lookat_frame(mat[0], mat[1], mat[2])
        scene.cameras.append(cam)

    texture_uris = []
    for element in doc.get("textures", []):
        tex = TextureData()
        scene.texture_names.append(element.get("name", ""))
        texture_uris.append(element.get("uri", ""))
        tex.linear = element.get("linear", tex.linear)
        tex.nearest = element.get("nearest", tex.nearest)
        tex.clamp = element.get("clamp", tex.clamp)
        scene.textures.append(tex)

    for element in doc.get("materials", []):
        mat = MaterialData()
        scene.material_names.append(element.get("name", ""))
        if "type" in element:
            # unknown type strings fall back to matte, matching the
            # reference's nlohmann enum deserialization (an unmatched
            # string maps to the first enum entry; e.g. the corpus'
            # "volume" in materials4.json renders as matte there too)
            try:
                mat.type = MaterialType[element["type"]]
            except KeyError:
                mat.type = MaterialType.matte
        for key in ("emission", "color", "scattering"):
            if key in element:
                setattr(mat, key, np.asarray(element[key], np.float32))
        for key in ("metallic", "roughness", "ior", "trdepth",
                    "scanisotropy", "opacity", "emission_tex", "color_tex",
                    "roughness_tex", "scattering_tex", "normal_tex"):
            if key in element:
                setattr(mat, key, element[key])
        scene.materials.append(mat)

    shape_uris = []
    for element in doc.get("shapes", []):
        scene.shape_names.append(element.get("name", ""))
        shape_uris.append(element.get("uri", ""))
        scene.shapes.append(ShapeData())

    subdiv_uris = []
    for element in doc.get("subdivs", []):
        sub = SubdivData()
        scene.subdiv_names.append(element.get("name", ""))
        subdiv_uris.append(element.get("uri", ""))
        sub.shape = element.get("shape", sub.shape)
        sub.subdivisions = element.get("subdivisions", sub.subdivisions)
        sub.catmullclark = element.get("catmullclark", sub.catmullclark)
        sub.smooth = element.get("smooth", sub.smooth)
        sub.displacement = element.get("displacement", sub.displacement)
        sub.displacement_tex = element.get("displacement_tex",
                                           sub.displacement_tex)
        scene.subdivs.append(sub)

    for element in doc.get("instances", []):
        inst = InstanceData()
        scene.instance_names.append(element.get("name", ""))
        if "frame" in element:
            inst.frame = _frame(element["frame"])
        inst.shape = element.get("shape", inst.shape)
        inst.material = element.get("material", inst.material)
        if "lookat" in element:
            mat = np.asarray(element["lookat"], np.float32).reshape(3, 3)
            inst.frame = _lookat_frame(mat[0], mat[1], mat[2])
        scene.instances.append(inst)

    for element in doc.get("environments", []):
        env = EnvironmentData()
        scene.environment_names.append(element.get("name", ""))
        if "frame" in element:
            env.frame = _frame(element["frame"])
        if "emission" in element:
            env.emission = np.asarray(element["emission"], np.float32)
        env.emission_tex = element.get("emission_tex", env.emission_tex)
        if "lookat" in element:
            mat = np.asarray(element["lookat"], np.float32).reshape(3, 3)
            env.frame = _lookat_frame(mat[0], mat[1], mat[2])
        scene.environments.append(env)

    # load resources (host thread pool stands in for parallel_foreach)
    from concurrent.futures import ThreadPoolExecutor

    def load_one_shape(idx):
        scene.shapes[idx] = load_shape(
            os.path.join(dirname, shape_uris[idx]), flip_texcoord=True)

    def load_one_texture(idx):
        tex = load_texture(os.path.join(dirname, texture_uris[idx]))
        tex.nearest = scene.textures[idx].nearest
        tex.clamp = scene.textures[idx].clamp
        scene.textures[idx] = tex

    def load_one_subdiv(idx):
        sub = load_subdiv(os.path.join(dirname, subdiv_uris[idx]))
        sub.shape = scene.subdivs[idx].shape
        sub.subdivisions = scene.subdivs[idx].subdivisions
        sub.catmullclark = scene.subdivs[idx].catmullclark
        sub.smooth = scene.subdivs[idx].smooth
        sub.displacement = scene.subdivs[idx].displacement
        sub.displacement_tex = scene.subdivs[idx].displacement_tex
        scene.subdivs[idx] = sub

    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(load_one_shape, range(len(shape_uris))))
        list(pool.map(load_one_texture, range(len(texture_uris))))
        list(pool.map(load_one_subdiv, range(len(subdiv_uris))))

    add_missing_camera(scene)
    add_missing_radius(scene)
    return scene


# 4.0 material enum names differ from the current ones at two slots
# (yocto_sceneio.cpp:2990-3001): index-compatible with MaterialType.
_MATERIAL_TYPE40 = ["matte", "glossy", "metallic", "transparent",
                    "refractive", "subsurface", "volume", "gltfpbr"]


def _load_json_scene_v40(path: str, doc: dict) -> SceneData:
    """Versions 4.0/4.1 (yocto_sceneio.cpp:3025-3375, 3376-3617):
    dict-keyed groups, references by NAME, resources discovered by
    probing shapes/<name>.{ply,obj} etc, optional "objects" synonym for
    instances with multi-frame PLY instancing, lookat triples."""
    scene = SceneData()
    scene.copyright = doc.get("asset", {}).get("copyright", "")
    dirname = os.path.dirname(path)

    def items(group):
        return doc.get(group, {}).items()

    def find_path(name, group, exts):
        for ext in exts:
            rel = os.path.join(group, name + ext)
            if os.path.exists(os.path.join(dirname, rel)):
                return rel
        return os.path.join(group, name + exts[0])

    shape_map, texture_map, material_map = {}, {}, {}
    shape_files, texture_files = [], []

    def get_shp(name):
        if not name:
            return INVALID
        if name not in shape_map:
            shape_map[name] = len(scene.shapes)
            scene.shapes.append(ShapeData())
            scene.shape_names.append(name)
            shape_files.append(None)
        return shape_map[name]

    def get_tex(name):
        if not name:
            return INVALID
        if name not in texture_map:
            texture_map[name] = len(scene.textures)
            scene.textures.append(TextureData())
            scene.texture_names.append(name)
            texture_files.append(None)
        return texture_map[name]

    def read_lookat(element, frame, focus=None):
        mat = np.asarray(element["lookat"], np.float32).reshape(3, 3)
        if focus is not None:
            return (_lookat_frame(mat[0], mat[1], mat[2]),
                    float(np.linalg.norm(mat[0] - mat[1])))
        return _lookat_frame(mat[0], mat[1], mat[2], inv_ok=False), None

    for name, element in items("cameras"):
        cam = CameraData()
        scene.camera_names.append(name)
        if "frame" in element:
            cam.frame = _frame(element["frame"])
        cam.orthographic = element.get(
            "orthographic", element.get("ortho", cam.orthographic))
        for key in ("lens", "aspect", "film", "focus", "aperture"):
            if key in element:
                setattr(cam, key, element[key])
        if "lookat" in element:
            cam.frame, cam.focus = read_lookat(element, cam.frame, True)
        scene.cameras.append(cam)

    for name, element in items("environments"):
        env = EnvironmentData()
        scene.environment_names.append(name)
        if "frame" in element:
            env.frame = _frame(element["frame"])
        if "emission" in element:
            env.emission = np.asarray(element["emission"], np.float32)
        env.emission_tex = get_tex(element.get("emission_tex", ""))
        if "lookat" in element:
            env.frame, _ = read_lookat(element, env.frame)
        scene.environments.append(env)

    # 4.1 explicit shape/texture groups with datafiles
    for name, element in items("textures"):
        tid = get_tex(name)
        if isinstance(element, str):
            texture_files[tid] = element
        else:
            texture_files[tid] = element.get("datafile") or None
            for key in ("linear", "nearest", "clamp"):
                if key in element:
                    setattr(scene.textures[tid], key, element[key])
    for name, element in items("shapes"):
        sid = get_shp(name)
        if isinstance(element, str):
            shape_files[sid] = element
        elif isinstance(element, dict):
            shape_files[sid] = element.get("datafile") or None

    for name, element in items("materials"):
        mat = MaterialData()
        scene.material_names.append(name)
        material_map[name] = len(scene.materials)
        tname = element.get("type", "matte")
        if tname in _MATERIAL_TYPE40:
            mat.type = MaterialType(_MATERIAL_TYPE40.index(tname))
        else:
            try:
                mat.type = MaterialType[tname]
            except KeyError:
                mat.type = MaterialType.matte
        for key in ("emission", "color", "scattering"):
            if key in element:
                setattr(mat, key, np.asarray(element[key], np.float32))
        for key in ("metallic", "roughness", "ior", "trdepth",
                    "scanisotropy", "opacity"):
            if key in element:
                setattr(mat, key, element[key])
        for key in ("emission_tex", "color_tex", "roughness_tex",
                    "scattering_tex", "normal_tex"):
            if key in element:
                setattr(mat, key, get_tex(element[key]))
        scene.materials.append(mat)

    ply_instances = {}   # name -> list of instance indices using it
    for group in ("instances", "objects"):
        for name, element in items(group):
            inst = InstanceData()
            scene.instance_names.append(name)
            if "frame" in element:
                inst.frame = _frame(element["frame"])
            inst.shape = get_shp(element.get("shape", ""))
            mname = element.get("material", "")
            inst.material = material_map[mname] if mname else INVALID
            if "lookat" in element:
                inst.frame, _ = read_lookat(element, inst.frame)
            if element.get("instance"):
                ply_instances.setdefault(element["instance"], []).append(
                    len(scene.instances))
            scene.instances.append(inst)

    for name, element in items("subdivs"):
        sub = SubdivData()
        scene.subdiv_names.append(name)
        sub.shape = get_shp(element.get("shape", ""))
        sub.subdivisions = element.get("subdivisions", sub.subdivisions)
        sub.catmullclark = element.get("catmullclark", sub.catmullclark)
        sub.smooth = element.get("smooth", sub.smooth)
        sub.displacement = element.get("displacement", sub.displacement)
        if "displacement_tex" in element:
            sub.displacement_tex = get_tex(element["displacement_tex"])
        sub._name = name
        scene.subdivs.append(sub)

    # load resources (extension probing like the reference's find_path)
    from concurrent.futures import ThreadPoolExecutor

    def load_one_shape(idx):
        rel = shape_files[idx] or find_path(
            scene.shape_names[idx], "shapes", [".ply", ".obj"])
        scene.shapes[idx] = load_shape(
            os.path.join(dirname, rel), flip_texcoord=True)

    def load_one_texture(idx):
        rel = texture_files[idx] or find_path(
            scene.texture_names[idx], "textures",
            [".hdr", ".exr", ".png", ".jpg"])
        tex = load_texture(os.path.join(dirname, rel))
        tex.nearest = scene.textures[idx].nearest
        tex.clamp = scene.textures[idx].clamp
        scene.textures[idx] = tex

    def load_one_subdiv(idx):
        old = scene.subdivs[idx]
        rel = find_path(getattr(old, "_name", ""), "subdivs",
                        [".ply", ".obj"])
        full = os.path.join(dirname, rel)
        if not os.path.exists(full):
            return  # subdiv cage shipped as the shape itself
        sub = load_subdiv(full)
        for key in ("shape", "subdivisions", "catmullclark", "smooth",
                    "displacement", "displacement_tex"):
            setattr(sub, key, getattr(old, key))
        scene.subdivs[idx] = sub

    with ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(load_one_shape, range(len(scene.shapes))))
        list(pool.map(load_one_texture, range(len(scene.textures))))
        list(pool.map(load_one_subdiv, range(len(scene.subdivs))))

    # expand multi-frame PLY instancing (yocto_sceneio.cpp:3333-3363)
    if ply_instances:
        from .ply import load_ply, _get_props
        expanded = {}
        for pname, users in ply_instances.items():
            rel = find_path(pname, "instances", [".ply"])
            ply = load_ply(os.path.join(dirname, rel))
            cols = _get_props(ply, "instance",
                             ["xx", "xy", "xz", "yx", "yy", "yz",
                              "zx", "zy", "zz", "ox", "oy", "oz"])
            frames = np.stack(cols, axis=1).reshape(-1, 4, 3)
            for idx in users:
                expanded[idx] = frames
        instances, names = scene.instances, scene.instance_names
        scene.instances, scene.instance_names = [], []
        for idx, inst in enumerate(instances):
            if idx not in expanded:
                scene.instances.append(inst)
                scene.instance_names.append(names[idx])
                continue
            base = np.asarray(inst.frame, np.float32)
            for k, fr in enumerate(expanded[idx]):
                # reference: new = ply_frame * json_frame — json frame
                # applies first under the row-vector convention
                rot = base[:3] @ fr[:3]
                org = base[3] @ fr[:3] + fr[3]
                scene.instances.append(InstanceData(
                    frame=np.concatenate([rot, org[None]], 0),
                    shape=inst.shape, material=inst.material))
                scene.instance_names.append(f"{names[idx]}_{k}")

    add_missing_camera(scene)
    add_missing_radius(scene)
    return scene


def save_json_scene(path: str, scene: SceneData) -> None:
    def name_of(names, idx, base):
        return names[idx] if idx < len(names) and names[idx] \
            else f"{base}{idx}"

    doc = {"asset": {
        "copyright": scene.copyright,
        "generator": "yocto-tpu",
        "version": "4.2"}}
    if not scene.copyright:
        doc["asset"].pop("copyright")

    def frame_list(frame):
        return np.asarray(frame, np.float32).reshape(-1).tolist()

    if scene.cameras:
        doc["cameras"] = []
        for idx, cam in enumerate(scene.cameras):
            el = {"name": name_of(scene.camera_names, idx, "camera"),
                  "frame": frame_list(cam.frame)}
            defaults = CameraData()
            for key in ("orthographic", "lens", "aspect", "film", "focus",
                        "aperture"):
                if getattr(cam, key) != getattr(defaults, key):
                    el[key] = getattr(cam, key)
            doc["cameras"].append(el)
    if scene.textures:
        doc["textures"] = []
        for idx, tex in enumerate(scene.textures):
            name = name_of(scene.texture_names, idx, "texture")
            ext = ".hdr" if (tex.pixelsf is not None
                             and tex.pixelsf.size) else ".png"
            el = {"name": name, "uri": f"textures/{name}{ext}"}
            if tex.nearest:
                el["nearest"] = True
            if tex.clamp:
                el["clamp"] = True
            doc["textures"].append(el)
    if scene.materials:
        doc["materials"] = []
        for idx, mat in enumerate(scene.materials):
            el = {"name": name_of(scene.material_names, idx, "material"),
                  "type": MaterialType(mat.type).name}
            for key in ("emission", "color", "scattering"):
                val = np.asarray(getattr(mat, key))
                if np.any(val != 0):
                    el[key] = val.tolist()
            defaults = MaterialData()
            for key in ("metallic", "roughness", "ior", "trdepth",
                        "scanisotropy", "opacity"):
                if getattr(mat, key) != getattr(defaults, key):
                    el[key] = getattr(mat, key)
            for key in ("emission_tex", "color_tex", "roughness_tex",
                        "scattering_tex", "normal_tex"):
                if getattr(mat, key) >= 0:
                    el[key] = getattr(mat, key)
            doc["materials"].append(el)
    if scene.shapes:
        doc["shapes"] = []
        for idx in range(len(scene.shapes)):
            name = name_of(scene.shape_names, idx, "shape")
            doc["shapes"].append(
                {"name": name, "uri": f"shapes/{name}.ply"})
    if scene.subdivs:
        doc["subdivs"] = []
        for idx, sub in enumerate(scene.subdivs):
            name = name_of(scene.subdiv_names, idx, "subdiv")
            el = {"name": name, "uri": f"subdivs/{name}.obj",
                  "shape": sub.shape}
            defaults = SubdivData()
            for key in ("subdivisions", "catmullclark", "smooth",
                        "displacement", "displacement_tex"):
                if getattr(sub, key) != getattr(defaults, key):
                    el[key] = getattr(sub, key)
            doc["subdivs"].append(el)
    if scene.instances:
        doc["instances"] = []
        for idx, inst in enumerate(scene.instances):
            doc["instances"].append({
                "name": name_of(scene.instance_names, idx, "instance"),
                "frame": frame_list(inst.frame),
                "shape": inst.shape, "material": inst.material})
    if scene.environments:
        doc["environments"] = []
        for idx, env in enumerate(scene.environments):
            el = {"name": name_of(scene.environment_names, idx,
                                  "environment"),
                  "frame": frame_list(env.frame),
                  "emission": np.asarray(env.emission).tolist()}
            if env.emission_tex >= 0:
                el["emission_tex"] = env.emission_tex
            doc["environments"].append(el)

    dirname = os.path.dirname(path)
    os.makedirs(dirname or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)

    # save resources
    for idx, shape in enumerate(scene.shapes):
        name = name_of(scene.shape_names, idx, "shape")
        os.makedirs(os.path.join(dirname, "shapes"), exist_ok=True)
        save_shape(os.path.join(dirname, "shapes", f"{name}.ply"), shape)
    for idx, tex in enumerate(scene.textures):
        name = name_of(scene.texture_names, idx, "texture")
        os.makedirs(os.path.join(dirname, "textures"), exist_ok=True)
        if tex.pixelsf is not None and tex.pixelsf.size:
            imageio.save_image(
                os.path.join(dirname, "textures", f"{name}.hdr"),
                tex.pixelsf, linear=True)
        elif tex.pixelsb is not None and tex.pixelsb.size:
            imageio.save_image(
                os.path.join(dirname, "textures", f"{name}.png"),
                tex.pixelsb.astype(np.float32) / 255.0, linear=False)


# ----------------------------------------------------------------------------
# Dispatch (yocto_sceneio.cpp:2715-2804)
# ----------------------------------------------------------------------------

def load_scene(path: str) -> SceneData:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".json":
        return load_json_scene(path)
    if ext == ".obj":
        from .obj import load_obj_scene
        return load_obj_scene(path)
    if ext == ".ply" or ext == ".stl":
        scene = SceneData()
        scene.shapes.append(load_shape(path))
        scene.shape_names.append("shape")
        scene.instances.append(InstanceData(shape=0, material=0))
        scene.instance_names.append("shape")
        scene.materials.append(MaterialData(
            color=np.asarray([0.8, 0.8, 0.8], np.float32)))
        scene.material_names.append("shape")
        add_missing_material(scene)
        add_missing_camera(scene)
        add_missing_radius(scene)
        add_missing_lights(scene)
        return scene
    if ext in (".gltf", ".glb"):
        from .gltf import load_gltf_scene
        return load_gltf_scene(path)
    if ext == ".pbrt":
        from .pbrt import load_pbrt_scene
        return load_pbrt_scene(path)
    raise ValueError(f"unsupported scene format {ext}")


def save_scene(path: str, scene: SceneData) -> None:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".json":
        save_json_scene(path, scene)
    elif ext == ".obj":
        from .obj import save_obj_scene
        save_obj_scene(path, scene)
    elif ext == ".pbrt":
        from .pbrt import save_pbrt_scene
        save_pbrt_scene(path, scene)
    elif ext in (".gltf", ".glb"):
        from .gltf import save_gltf_scene
        save_gltf_scene(path, scene)
    else:
        raise ValueError(f"unsupported scene format {ext}")


# ----------------------------------------------------------------------------
# Trace/colorgrade params IO (yocto_sceneio.h:256-284)
# ----------------------------------------------------------------------------

def load_trace_params(path: str):
    from ..trace.params import (FALSECOLOR_NAMES, SAMPLER_NAMES,
                                FalsecolorType, SamplerType, TraceParams)
    with open(path) as f:
        doc = json.load(f)
    params = TraceParams()
    for key, val in doc.items():
        if key == "sampler":
            params.sampler = SamplerType(SAMPLER_NAMES.index(val))
        elif key == "falsecolor":
            params.falsecolor = FalsecolorType(FALSECOLOR_NAMES.index(val))
        elif hasattr(params, key):
            setattr(params, key, val)
    return params


def save_trace_params(path: str, params) -> None:
    from ..trace.params import FALSECOLOR_NAMES, SAMPLER_NAMES, TraceParams
    defaults = TraceParams()
    doc = {}
    for key in vars(defaults):
        val = getattr(params, key)
        if val == getattr(defaults, key):
            continue
        if key == "sampler":
            val = SAMPLER_NAMES[int(val)]
        elif key == "falsecolor":
            val = FALSECOLOR_NAMES[int(val)]
        doc[key] = val
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)


# ----------------------------------------------------------------------------
# File watcher (yocto_sceneio.h:323-341: threaded mtime polling)
# ----------------------------------------------------------------------------

class WatchContext:
    """Polls file mtimes on a worker thread; `version` bumps on change."""

    def __init__(self, filenames, delay_ms: int = 500):
        import threading
        self.filenames = list(filenames)
        self.delay = delay_ms / 1000.0
        self.version = 0
        self._stop = False
        self._mtimes = [self._mtime(f) for f in self.filenames]
        self._thread = threading.Thread(target=self._loop, daemon=True)

    @staticmethod
    def _mtime(path):
        try:
            return os.path.getmtime(path)
        except OSError:
            return -1.0


    def _loop(self):
        import time as _time
        while not self._stop:
            now = [self._mtime(f) for f in self.filenames]
            if now != self._mtimes:
                self._mtimes = now
                self.version += 1
            _time.sleep(self.delay)


def watch_start(context: WatchContext) -> None:
    context._stop = False
    context._thread.start()


def watch_stop(context: WatchContext) -> None:
    context._stop = True
    if context._thread.is_alive():
        context._thread.join()
