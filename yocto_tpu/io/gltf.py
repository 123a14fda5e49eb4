"""glTF 2.0 scene IO — own minimal parser over JSON + BIN buffers.

The reference loads glTF through cgltf and converts to its scene model in
load_gltf_scene (yocto_sceneio.cpp:4430-4766); this module reimplements
that conversion in pure Python/NumPy with the same semantics:

- cameras: perspective yfov -> lens on a 36mm film, aspect default 16:9
  (yocto_sceneio.cpp:4468-4493)
- materials: pbrMetallicRoughness -> gltfpbr (color/opacity from
  baseColorFactor, metallic/roughness factors + textures), emissive
  (+ KHR_materials_emissive_strength), normal map,
  KHR_materials_transmission -> transparent (yocto_sceneio.cpp:4527-4561)
- meshes: one shape per primitive; POSITION/NORMAL/TEXCOORD_0/COLOR_0/
  TANGENT/RADIUS attributes; triangles/fan/strip and lines/loop/strip
  index topologies (yocto_sceneio.cpp:4563-4710)
- nodes: world transforms flattened to one instance per (node, primitive)
  (yocto_sceneio.cpp:4712-4733)
- textures loaded from image URIs / embedded buffers

The writer emits glTF JSON + one .bin buffer with the inverse mapping
(save_gltf_scene, yocto_sceneio.cpp:4769+).
"""

from __future__ import annotations

import base64
import json
import os
import struct

import numpy as np

from ..models.scene import (INVALID, CameraData, InstanceData, MaterialData,
                            MaterialType, SceneData, TextureData)
from ..models.shape import ShapeData

_COMPONENT_DTYPES = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16,
    5123: np.uint16, 5125: np.uint32, 5126: np.float32,
}
_TYPE_COUNTS = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4,
                "MAT2": 4, "MAT3": 9, "MAT4": 16}


def _load_buffers(gltf: dict, dirname: str, glb_bin):
    buffers = []
    for i, buf in enumerate(gltf.get("buffers", [])):
        uri = buf.get("uri")
        if uri is None:
            if glb_bin is None:
                raise ValueError("glTF buffer without uri outside GLB")
            buffers.append(glb_bin)
        elif uri.startswith("data:"):
            b64 = uri.split(",", 1)[1]
            buffers.append(np.frombuffer(base64.b64decode(b64), np.uint8))
        else:
            path = os.path.join(dirname, uri.replace("%20", " "))
            with open(path, "rb") as f:
                buffers.append(np.frombuffer(f.read(), np.uint8))
    return buffers


def _read_accessor(gltf, buffers, idx):
    """-> float or int ndarray [count, comps] (normalized ints scaled)."""
    acc = gltf["accessors"][idx]
    if acc.get("sparse"):
        raise ValueError("sparse accessors are not supported")
    comps = _TYPE_COUNTS[acc["type"]]
    count = acc["count"]
    dtype = _COMPONENT_DTYPES[acc["componentType"]]
    itemsize = np.dtype(dtype).itemsize
    if "bufferView" not in acc:
        return np.zeros((count, comps), np.float32)
    view = gltf["bufferViews"][acc["bufferView"]]
    buf = buffers[view["buffer"]]
    offset = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
    stride = view.get("byteStride") or comps * itemsize
    raw = buf[offset:offset + stride * (count - 1) + comps * itemsize]
    if stride == comps * itemsize:
        out = np.frombuffer(raw.tobytes(), dtype,
                            count * comps).reshape(count, comps)
    else:
        out = np.empty((count, comps), dtype)
        for i in range(count):
            out[i] = np.frombuffer(
                raw[i * stride:i * stride + comps * itemsize].tobytes(),
                dtype, comps)
    if acc.get("normalized") and dtype != np.float32:
        info = np.iinfo(dtype)
        out = np.maximum(out.astype(np.float32) / info.max, -1.0)
    return out


def _node_world_matrices(gltf):
    """World 4x4 (column-major glTF convention) per node index."""
    nodes = gltf.get("nodes", [])

    def local(node):
        if "matrix" in node:
            return np.asarray(node["matrix"],
                              np.float32).reshape(4, 4).T  # to row-major
        m = np.eye(4, dtype=np.float32)
        if "scale" in node:
            m = m @ np.diag(np.asarray(
                list(node["scale"]) + [1.0], np.float32))
        if "rotation" in node:
            x, y, z, w = node["rotation"]
            r = np.array([
                [1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                 2 * (x * z + y * w), 0],
                [2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                 2 * (y * z - x * w), 0],
                [2 * (x * z - y * w), 2 * (y * z + x * w),
                 1 - 2 * (x * x + y * y), 0],
                [0, 0, 0, 1]], np.float32)
            m = r @ m
        if "translation" in node:
            t = np.eye(4, dtype=np.float32)
            t[:3, 3] = node["translation"]
            m = t @ m
        return m

    world = [None] * len(nodes)

    def walk(idx, parent):
        m = parent @ local(nodes[idx])
        world[idx] = m
        for c in nodes[idx].get("children", []):
            walk(c, m)

    roots = []
    for scene in gltf.get("scenes", []):
        roots.extend(scene.get("nodes", []))
    if not roots:
        children = {c for n in nodes for c in n.get("children", [])}
        roots = [i for i in range(len(nodes)) if i not in children]
    for r in roots:
        walk(r, np.eye(4, dtype=np.float32))
    for i in range(len(nodes)):
        if world[i] is None:
            world[i] = local(nodes[i])
    return world


def _mat_to_frame(m):
    """Row-major 4x4 -> [4,3] frame (rows X,Y,Z,O), yocto convention."""
    f = np.zeros((4, 3), np.float32)
    f[0] = m[:3, 0]
    f[1] = m[:3, 1]
    f[2] = m[:3, 2]
    f[3] = m[:3, 3]
    return f


def _tex_index(gltf, tex_info):
    if not tex_info:
        return INVALID
    tex = gltf.get("textures", [])[tex_info["index"]]
    return tex.get("source", INVALID)


def load_gltf_scene(path: str) -> SceneData:
    dirname = os.path.dirname(path)
    glb_bin = None
    if path.lower().endswith(".glb"):
        with open(path, "rb") as f:
            data = f.read()
        magic, version, _ = struct.unpack_from("<III", data, 0)
        if magic != 0x46546C67:
            raise ValueError(f"not a GLB file: {path}")
        off = 12
        gltf = None
        while off < len(data):
            clen, ctype = struct.unpack_from("<II", data, off)
            chunk = data[off + 8:off + 8 + clen]
            if ctype == 0x4E4F534A:
                gltf = json.loads(chunk.decode("utf-8"))
            elif ctype == 0x004E4942:
                glb_bin = np.frombuffer(chunk, np.uint8)
            off += 8 + clen + (-clen) % 4
        if gltf is None:
            raise ValueError(f"GLB without JSON chunk: {path}")
    else:
        with open(path) as f:
            gltf = json.load(f)
    buffers = _load_buffers(gltf, dirname, glb_bin)

    scene = SceneData()

    # cameras (instantiated per node below)
    cameras = []
    for gcam in gltf.get("cameras", []):
        cam = CameraData()
        if gcam.get("type") == "orthographic":
            o = gcam["orthographic"]
            cam.aspect = o["xmag"] / o["ymag"]
            cam.lens = o["ymag"]
            cam.film = 0.036
        else:
            p = gcam["perspective"]
            cam.aspect = p.get("aspectRatio", 0.0) or 16.0 / 9.0
            cam.film = 0.036
            yfov = p["yfov"]
            if cam.aspect >= 1:
                cam.lens = (cam.film / cam.aspect) / (2 * np.tan(yfov / 2))
            else:
                cam.lens = cam.film / (2 * np.tan(yfov / 2))
            cam.focus = 1.0
        cameras.append(cam)

    # textures (one per image)
    image_paths = []
    for gimage in gltf.get("images", []):
        image_paths.append(gimage)
        scene.textures.append(TextureData())
        scene.texture_names.append(
            gimage.get("name") or f"texture{len(image_paths)}")

    # materials (yocto_sceneio.cpp:4527-4561 mapping)
    for gmat in gltf.get("materials", []):
        mat = MaterialData(type=MaterialType.gltfpbr)
        em = gmat.get("emissiveFactor", [0, 0, 0])
        strength = gmat.get("extensions", {}).get(
            "KHR_materials_emissive_strength", {}).get(
            "emissiveStrength", 1.0)
        mat.emission = np.asarray(em, np.float32) * strength
        mat.emission_tex = _tex_index(gltf, gmat.get("emissiveTexture"))
        mat.normal_tex = _tex_index(gltf, gmat.get("normalTexture"))
        pbr = gmat.get("pbrMetallicRoughness", {})
        base = pbr.get("baseColorFactor", [1, 1, 1, 1])
        mat.color = np.asarray(base[:3], np.float32)
        mat.opacity = float(base[3])
        mat.metallic = pbr.get("metallicFactor", 1.0)
        mat.roughness = pbr.get("roughnessFactor", 1.0)
        mat.color_tex = _tex_index(gltf, pbr.get("baseColorTexture"))
        mat.roughness_tex = _tex_index(
            gltf, pbr.get("metallicRoughnessTexture"))
        trans = gmat.get("extensions", {}).get(
            "KHR_materials_transmission", {})
        tfactor = trans.get("transmissionFactor", 0.0)
        if tfactor > 0:
            mat.type = MaterialType.transparent
            mat.color = np.full(3, tfactor, np.float32)
            mat.color_tex = _tex_index(gltf,
                                       trans.get("transmissionTexture"))
        scene.materials.append(mat)
        scene.material_names.append(gmat.get("name")
                                    or f"material{len(scene.materials)}")

    # meshes -> shapes, one instance template per primitive
    mesh_primitives = []
    for gmesh in gltf.get("meshes", []):
        primitives = []
        for gprim in gmesh.get("primitives", []):
            shape = ShapeData()
            attrs = gprim.get("attributes", {})
            for name, acc_idx in attrs.items():
                data = _read_accessor(gltf, buffers, acc_idx)
                data = data.astype(np.float32)
                if name == "POSITION":
                    shape.positions = data[:, :3]
                elif name == "NORMAL":
                    shape.normals = data[:, :3]
                elif name in ("TEXCOORD", "TEXCOORD_0"):
                    shape.texcoords = data[:, :2]
                elif name in ("COLOR", "COLOR_0"):
                    if data.shape[1] == 3:
                        data = np.concatenate(
                            [data, np.ones((len(data), 1), np.float32)], 1)
                    shape.colors = data[:, :4]
                elif name == "TANGENT":
                    data[:, 3] = -data[:, 3]
                    shape.tangents = data[:, :4]
                elif name == "RADIUS":
                    shape.radius = data[:, 0]
            mode = gprim.get("mode", 4)
            if "indices" in gprim:
                idx = _read_accessor(
                    gltf, buffers, gprim["indices"]).astype(
                    np.int32).reshape(-1)
            else:
                idx = np.arange(len(shape.positions), dtype=np.int32)
            n = len(idx)
            if mode == 4:    # TRIANGLES
                shape.triangles = idx[:n - n % 3].reshape(-1, 3)
            elif mode == 6:  # TRIANGLE_FAN
                shape.triangles = np.stack(
                    [np.full(n - 2, idx[0], np.int32), idx[1:-1], idx[2:]],
                    axis=1)
            elif mode == 5:  # TRIANGLE_STRIP
                shape.triangles = np.stack(
                    [idx[:-2], idx[1:-1], idx[2:]], axis=1)
            elif mode == 1:  # LINES
                shape.lines = idx[:n - n % 2].reshape(-1, 2)
            elif mode == 2:  # LINE_LOOP
                shape.lines = np.stack(
                    [idx, np.roll(idx, -1)], axis=1)
            elif mode == 3:  # LINE_STRIP
                shape.lines = np.stack([idx[:-1], idx[1:]], axis=1)
            else:
                raise ValueError(f"unsupported primitive mode {mode}")
            scene.shapes.append(shape)
            scene.shape_names.append(
                gmesh.get("name") or f"shape{len(scene.shapes)}")
            primitives.append(InstanceData(
                shape=len(scene.shapes) - 1,
                material=gprim.get("material", INVALID)))
        mesh_primitives.append(primitives)

    # nodes -> flattened instances + camera frames
    world = _node_world_matrices(gltf)
    for nidx, gnode in enumerate(gltf.get("nodes", [])):
        frame = _mat_to_frame(world[nidx])
        if "camera" in gnode:
            cam = cameras[gnode["camera"]]
            c = CameraData(frame=frame, lens=cam.lens, film=cam.film,
                           aspect=cam.aspect, focus=cam.focus,
                           aperture=cam.aperture,
                           orthographic=cam.orthographic)
            scene.cameras.append(c)
            scene.camera_names.append(
                gnode.get("name") or f"camera{len(scene.cameras)}")
        if "mesh" in gnode:
            for prim in mesh_primitives[gnode["mesh"]]:
                scene.instances.append(InstanceData(
                    frame=frame.copy(), shape=prim.shape,
                    material=prim.material))
                scene.instance_names.append(
                    gnode.get("name") or f"instance{len(scene.instances)}")

    # load texture images
    from .imageio import load_image_bytes
    for tidx, gimage in enumerate(image_paths):
        uri = gimage.get("uri")
        if uri and not uri.startswith("data:"):
            tex_path = os.path.join(dirname, uri.replace("%20", " "))
            from .sceneio import load_texture
            scene.textures[tidx] = load_texture(tex_path)
        else:
            if uri:  # data uri
                raw = base64.b64decode(uri.split(",", 1)[1])
            else:
                view = gltf["bufferViews"][gimage["bufferView"]]
                buf = buffers[view["buffer"]]
                off = view.get("byteOffset", 0)
                raw = buf[off:off + view["byteLength"]].tobytes()
            import io as _io
            from PIL import Image
            with Image.open(_io.BytesIO(raw)) as im:
                arr = np.asarray(im.convert("RGBA"), np.uint8)
            scene.textures[tidx] = TextureData(
                width=arr.shape[1], height=arr.shape[0], linear=False,
                pixelsb=arr)

    # fix scene like the reference (yocto_sceneio.cpp:4759-4763)
    from .sceneio import (add_missing_camera, add_missing_lights,
                          add_missing_material, add_missing_radius)
    add_missing_material(scene)
    add_missing_camera(scene)
    add_missing_radius(scene)
    add_missing_lights(scene)
    return scene


def save_gltf_scene(path: str, scene: SceneData) -> None:
    """glTF JSON + one .bin buffer, textures saved as PNGs next to it —
    or, for a `.glb` path, the single-file binary container with the
    buffer as the BIN chunk and textures embedded as PNG bufferViews."""
    dirname = os.path.dirname(path) or "."
    base = os.path.splitext(os.path.basename(path))[0]
    is_glb = path.lower().endswith(".glb")
    os.makedirs(dirname, exist_ok=True)

    bin_chunks = []
    bin_len = 0
    buffer_views = []
    accessors = []

    def add_data(arr, target=None):
        nonlocal bin_len
        raw = np.ascontiguousarray(arr).tobytes()
        pad = (-len(raw)) % 4
        view = {"buffer": 0, "byteOffset": bin_len, "byteLength": len(raw)}
        if target:
            view["target"] = target
        buffer_views.append(view)
        bin_chunks.append(raw + b"\x00" * pad)
        bin_len += len(raw) + pad
        return len(buffer_views) - 1

    def add_accessor(arr, ctype, typ, target=None, minmax=False):
        view = add_data(arr, target)
        acc = {"bufferView": view, "componentType": ctype,
               "count": int(len(arr)), "type": typ}
        if minmax:
            acc["min"] = np.asarray(arr).min(0).tolist()
            acc["max"] = np.asarray(arr).max(0).tolist()
        accessors.append(acc)
        return len(accessors) - 1

    gltf = {"asset": {"version": "2.0", "generator": "yocto-tpu"},
            "buffers": [], "bufferViews": buffer_views,
            "accessors": accessors}

    # textures as PNG files
    if scene.textures:
        from .imageio import save_image
        from ..ops import color as C
        import jax.numpy as jnp
        gltf["images"] = []
        gltf["textures"] = []
        gltf["samplers"] = [{}]
        for tidx, tex in enumerate(scene.textures):
            name = (scene.texture_names[tidx]
                    if tidx < len(scene.texture_names)
                    else f"texture{tidx}")
            uri = f"{base}_{name}.png"
            if tex.pixelsb is not None and tex.pixelsb.size:
                px = tex.pixelsb.astype(np.float32) / 255.0
            elif tex.pixelsf is not None and tex.pixelsf.size:
                px = np.asarray(C.rgb_to_srgb(jnp.asarray(tex.pixelsf)))
            else:
                px = np.zeros((1, 1, 4), np.float32)
            px = px.reshape(tex.height or 1, tex.width or 1, 4)
            if is_glb:
                import io as _io
                from PIL import Image as _Image
                buf = _io.BytesIO()
                _Image.fromarray(
                    np.clip(px * 255.0 + 0.5, 0, 255).astype(np.uint8)
                ).save(buf, format="PNG")
                view = add_data(np.frombuffer(buf.getvalue(), np.uint8))
                gltf["images"].append({"bufferView": view,
                                       "mimeType": "image/png"})
            else:
                save_image(os.path.join(dirname, uri), px, linear=False)
                gltf["images"].append({"uri": uri})
            gltf["textures"].append({"sampler": 0, "source": tidx})

    # materials
    def texref(t):
        return {"index": int(t)} if t != INVALID else None

    gltf["materials"] = []
    for midx, mat in enumerate(scene.materials):
        g = {"name": (scene.material_names[midx]
                      if midx < len(scene.material_names)
                      else f"material{midx}")}
        pbr = {"baseColorFactor": [float(c) for c in mat.color]
               + [float(mat.opacity)],
               "metallicFactor": float(mat.metallic),
               "roughnessFactor": float(mat.roughness)}
        if mat.color_tex != INVALID:
            pbr["baseColorTexture"] = texref(mat.color_tex)
        if mat.roughness_tex != INVALID:
            pbr["metallicRoughnessTexture"] = texref(mat.roughness_tex)
        g["pbrMetallicRoughness"] = pbr
        if np.any(np.asarray(mat.emission) != 0):
            g["emissiveFactor"] = [
                float(min(e, 1.0)) for e in mat.emission]
            strength = float(np.max(mat.emission))
            if strength > 1:
                g.setdefault("extensions", {})[
                    "KHR_materials_emissive_strength"] = {
                    "emissiveStrength": strength}
                g["emissiveFactor"] = [
                    float(e / strength) for e in mat.emission]
        if mat.emission_tex != INVALID:
            g["emissiveTexture"] = texref(mat.emission_tex)
        if mat.normal_tex != INVALID:
            g["normalTexture"] = texref(mat.normal_tex)
        gltf["materials"].append(g)

    # shapes -> meshes
    gltf["meshes"] = []
    for sidx, shape in enumerate(scene.shapes):
        attrs = {}
        pos = np.asarray(shape.positions, np.float32).reshape(-1, 3)
        attrs["POSITION"] = add_accessor(pos, 5126, "VEC3", 34962,
                                         minmax=True)
        if len(shape.normals) == len(pos) and len(pos):
            attrs["NORMAL"] = add_accessor(
                np.asarray(shape.normals, np.float32).reshape(-1, 3),
                5126, "VEC3", 34962)
        if len(shape.texcoords) == len(pos) and len(pos):
            attrs["TEXCOORD_0"] = add_accessor(
                np.asarray(shape.texcoords, np.float32).reshape(-1, 2),
                5126, "VEC2", 34962)
        if len(shape.colors) == len(pos) and len(pos):
            attrs["COLOR_0"] = add_accessor(
                np.asarray(shape.colors, np.float32).reshape(-1, 4),
                5126, "VEC4", 34962)
        prim = {"attributes": attrs}
        if len(shape.triangles):
            tris = np.asarray(shape.triangles, np.uint32)
            prim["indices"] = add_accessor(
                tris.reshape(-1, 1), 5125, "SCALAR", 34963)
            prim["mode"] = 4
        elif len(shape.quads):
            q = np.asarray(shape.quads, np.int64)
            tris = np.concatenate([q[:, [0, 1, 3]], q[:, [2, 3, 1]]], 0)
            tris = tris[~(tris[:, 1] == tris[:, 2])]
            prim["indices"] = add_accessor(
                tris.astype(np.uint32).reshape(-1, 1), 5125, "SCALAR",
                34963)
            prim["mode"] = 4
        elif len(shape.lines):
            prim["indices"] = add_accessor(
                np.asarray(shape.lines, np.uint32).reshape(-1, 1),
                5125, "SCALAR", 34963)
            prim["mode"] = 1
        gltf["meshes"].append({
            "name": (scene.shape_names[sidx]
                     if sidx < len(scene.shape_names) else f"shape{sidx}"),
            "primitives": [prim]})
        # material assigned per instance below (first instance wins)

    # instances/cameras -> nodes
    gltf["nodes"] = []
    roots = []

    def frame_to_matrix(frame):
        f = np.asarray(frame, np.float32)
        m = np.eye(4, dtype=np.float32)
        m[:3, 0] = f[0]
        m[:3, 1] = f[1]
        m[:3, 2] = f[2]
        m[:3, 3] = f[3]
        return [float(x) for x in m.T.reshape(-1)]  # column-major

    for iidx, inst in enumerate(scene.instances):
        if inst.material != INVALID and inst.shape < len(gltf["meshes"]):
            gltf["meshes"][inst.shape]["primitives"][0]["material"] = \
                int(inst.material)
        gltf["nodes"].append({
            "name": (scene.instance_names[iidx]
                     if iidx < len(scene.instance_names)
                     else f"instance{iidx}"),
            "mesh": int(inst.shape),
            "matrix": frame_to_matrix(inst.frame)})
        roots.append(len(gltf["nodes"]) - 1)
    if scene.cameras:
        gltf["cameras"] = []
        for cidx, cam in enumerate(scene.cameras):
            aspect = cam.aspect if cam.aspect else 16.0 / 9.0
            film_y = cam.film / aspect if aspect >= 1 else cam.film
            yfov = 2 * float(np.arctan(film_y / (2 * cam.lens)))
            gltf["cameras"].append({
                "type": "perspective",
                "perspective": {"aspectRatio": float(aspect),
                                "yfov": yfov, "znear": 0.001}})
            gltf["nodes"].append({
                "name": (scene.camera_names[cidx]
                         if cidx < len(scene.camera_names)
                         else f"camera{cidx}"),
                "camera": cidx,
                "matrix": frame_to_matrix(cam.frame)})
            roots.append(len(gltf["nodes"]) - 1)
    gltf["scenes"] = [{"nodes": roots}]
    gltf["scene"] = 0

    if is_glb:
        gltf["buffers"].append({"byteLength": bin_len})
        js = json.dumps(gltf, separators=(",", ":")).encode()
        js += b" " * ((-len(js)) % 4)          # JSON chunks pad with 0x20
        bin_blob = b"".join(bin_chunks)
        bin_blob += b"\x00" * ((-len(bin_blob)) % 4)
        total = 12 + 8 + len(js) + 8 + len(bin_blob)
        with open(path, "wb") as f:
            f.write(struct.pack("<III", 0x46546C67, 2, total))
            f.write(struct.pack("<II", len(js), 0x4E4F534A))   # 'JSON'
            f.write(js)
            f.write(struct.pack("<II", len(bin_blob), 0x004E4942))  # 'BIN'
            f.write(bin_blob)
        return
    bin_uri = base + ".bin"
    gltf["buffers"].append({"uri": bin_uri, "byteLength": bin_len})
    with open(os.path.join(dirname, bin_uri), "wb") as f:
        f.write(b"".join(bin_chunks))
    with open(path, "w") as f:
        json.dump(gltf, f, indent=1)
