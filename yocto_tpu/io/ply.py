"""PLY model IO.

Native-equivalent of the reference's PLY layer (yocto_modelio.h:102-213):
a generic `PlyModel` holding typed per-element properties (ascii and
binary little/big endian), typed accessors (positions/normals/texcoords/
colors/radius/faces/lines/points), and a writer. Bulk data paths are
vectorized NumPy; mixed-size face lists fall back to an offset walk.

Caveat discovered against the reference: the reference's own PLY writer
has an upstream bug for MIXED-size face lists (degenerate quads written
as triangles) — add_lists(sizes, values) passes the index count as the
face element count (yocto_modelio.h:951-957), producing files whose
header claims ~4x the real face count followed by garbage bytes; the
reference cannot read those files back either. Uniform-size files (all
triangles or all true quads, and all third-party assets) are unaffected.
This repo's bundled Suzanne asset/oracle were regenerated from the
reference's in-memory arrays instead.

Conventions preserved: `get_faces` returns quads if any face has 4
vertices (triangles become degenerate quads w==z), otherwise triangles
with fan splitting; texcoords flip v when requested (the scene loader
passes flip_texcoord=True, yocto_sceneio.cpp:1024).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

_PLY_TYPES = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "long": "i8", "int64": "i8",
    "ulong": "u8", "uint64": "u8",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}
_INV_TYPES = {"i1": "char", "u1": "uchar", "i2": "short", "u2": "ushort",
              "i4": "int", "u4": "uint", "i8": "long", "u8": "ulong",
              "f4": "float", "f8": "double"}


@dataclass
class PlyProperty:
    name: str
    dtype: str                  # numpy dtype code, e.g. "f4"
    is_list: bool = False
    count_dtype: str = "u1"
    data: np.ndarray = None     # values; flat for lists
    sizes: np.ndarray = None    # list sizes (u8) when is_list


@dataclass
class PlyElement:
    name: str
    count: int = 0
    properties: list = field(default_factory=list)


@dataclass
class PlyModel:
    format: str = "binary_little_endian"  # ascii | binary_(little|big)_endian
    comments: list = field(default_factory=list)
    elements: list = field(default_factory=list)


def load_ply(path: str) -> PlyModel:
    with open(path, "rb") as f:
        data = f.read()
    if not data.startswith(b"ply"):
        raise ValueError(f"{path}: not a ply file")
    # header
    end = data.index(b"end_header")
    end = data.index(b"\n", end) + 1
    header = data[:end].decode("ascii", "replace").splitlines()
    ply = PlyModel()
    cur = None
    for line in header[1:]:
        toks = line.split()
        if not toks:
            continue
        if toks[0] == "format":
            ply.format = toks[1]
        elif toks[0] == "comment":
            ply.comments.append(line[len("comment "):])
        elif toks[0] == "element":
            cur = PlyElement(name=toks[1], count=int(toks[2]))
            ply.elements.append(cur)
        elif toks[0] == "property":
            if toks[1] == "list":
                cur.properties.append(PlyProperty(
                    name=toks[4], dtype=_PLY_TYPES[toks[3]], is_list=True,
                    count_dtype=_PLY_TYPES[toks[2]]))
            else:
                cur.properties.append(PlyProperty(
                    name=toks[2], dtype=_PLY_TYPES[toks[1]]))
    body = data[end:]
    if ply.format == "ascii":
        _parse_ascii(ply, body)
    else:
        bo = "<" if ply.format == "binary_little_endian" else ">"
        _parse_binary(ply, body, bo)
    return ply


def _parse_ascii(ply: PlyModel, body: bytes) -> None:
    toks = body.split()
    pos = 0
    for elem in ply.elements:
        has_list = any(p.is_list for p in elem.properties)
        if not has_list:
            n = len(elem.properties)
            block = np.array(toks[pos:pos + elem.count * n], dtype=np.float64
                             ).reshape(elem.count, n)
            pos += elem.count * n
            for i, prop in enumerate(elem.properties):
                prop.data = block[:, i].astype(prop.dtype)
        else:
            vals = {p.name: [] for p in elem.properties}
            sizes = {p.name: [] for p in elem.properties}
            for _ in range(elem.count):
                for prop in elem.properties:
                    if prop.is_list:
                        cnt = int(toks[pos]); pos += 1
                        vals[prop.name].extend(toks[pos:pos + cnt])
                        sizes[prop.name].append(cnt)
                        pos += cnt
                    else:
                        vals[prop.name].append(toks[pos]); pos += 1
            for prop in elem.properties:
                prop.data = np.array(vals[prop.name], np.float64).astype(
                    prop.dtype)
                if prop.is_list:
                    prop.sizes = np.array(sizes[prop.name], np.uint8)


def _parse_binary(ply: PlyModel, body: bytes, bo: str) -> None:
    offset = 0
    buf = np.frombuffer(body, np.uint8)
    for elem in ply.elements:
        has_list = any(p.is_list for p in elem.properties)
        if not has_list:
            dt = np.dtype([(p.name, bo + p.dtype) for p in elem.properties])
            block = np.frombuffer(body, dt, count=elem.count, offset=offset)
            offset += dt.itemsize * elem.count
            for prop in elem.properties:
                prop.data = np.ascontiguousarray(block[prop.name])
        elif len(elem.properties) == 1:
            prop = elem.properties[0]
            csize = np.dtype(prop.count_dtype).itemsize
            vsize = np.dtype(prop.dtype).itemsize
            # fast path: uniform list size
            c0 = int(np.frombuffer(body, bo + prop.count_dtype, 1,
                                   offset)[0])
            stride = csize + vsize * c0
            uniform = False
            if elem.count * stride <= len(body) - offset:
                rec = np.frombuffer(
                    body, np.uint8, elem.count * stride, offset
                ).reshape(elem.count, stride)
                counts = rec[:, :csize].copy().view(
                    bo + prop.count_dtype)[:, 0]
                uniform = bool((counts == c0).all())
            if uniform:
                prop.sizes = np.full(elem.count, c0, np.uint8)
                prop.data = rec[:, csize:].copy().view(
                    bo + prop.dtype).reshape(-1)
                offset += elem.count * stride
            else:
                sizes = np.empty(elem.count, np.int64)
                starts = np.empty(elem.count, np.int64)
                pos = offset
                for i in range(elem.count):
                    cnt = int(np.frombuffer(body, bo + prop.count_dtype, 1,
                                            pos)[0])
                    sizes[i] = cnt
                    starts[i] = pos + csize
                    pos = pos + csize + cnt * vsize
                total = int(sizes.sum())
                out = np.empty(total * vsize, np.uint8)
                w = 0
                for i in range(elem.count):
                    n = int(sizes[i]) * vsize
                    out[w:w + n] = buf[starts[i]:starts[i] + n]
                    w += n
                prop.data = out.view(bo + prop.dtype)
                prop.sizes = sizes.astype(np.uint8)
                offset = pos
        else:
            raise ValueError(
                "mixed list/value properties in one element not supported")


def save_ply(path: str, ply: PlyModel) -> None:
    lines = ["ply", f"format {ply.format} 1.0"]
    for comment in ply.comments:
        lines.append(f"comment {comment}")
    for elem in ply.elements:
        lines.append(f"element {elem.name} {elem.count}")
        for prop in elem.properties:
            if prop.is_list:
                lines.append(
                    f"property list {_INV_TYPES[prop.count_dtype]} "
                    f"{_INV_TYPES[prop.dtype]} {prop.name}")
            else:
                lines.append(f"property {_INV_TYPES[prop.dtype]} {prop.name}")
    lines.append("end_header")
    header = ("\n".join(lines) + "\n").encode()
    with open(path, "wb") as f:
        f.write(header)
        if ply.format == "ascii":
            for elem in ply.elements:
                cursor = {p.name: 0 for p in elem.properties}
                for i in range(elem.count):
                    parts = []
                    for prop in elem.properties:
                        if prop.is_list:
                            n = int(prop.sizes[i])
                            c = cursor[prop.name]
                            parts.append(str(n))
                            parts.extend(str(v) for v in
                                         prop.data[c:c + n])
                            cursor[prop.name] = c + n
                        else:
                            parts.append(str(prop.data[i]))
                    f.write((" ".join(parts) + "\n").encode())
        else:
            bo = "<" if ply.format == "binary_little_endian" else ">"
            for elem in ply.elements:
                has_list = any(p.is_list for p in elem.properties)
                if not has_list:
                    dt = np.dtype([(p.name, bo + p.dtype)
                                   for p in elem.properties])
                    block = np.empty(elem.count, dt)
                    for prop in elem.properties:
                        block[prop.name] = prop.data
                    f.write(block.tobytes())
                else:
                    prop = elem.properties[0]
                    if (prop.sizes == prop.sizes[0]).all():
                        n = int(prop.sizes[0])
                        counts = prop.sizes.astype(
                            bo + prop.count_dtype)
                        vals = prop.data.astype(bo + prop.dtype).reshape(
                            elem.count, n)
                        rec = np.empty(
                            elem.count,
                            np.dtype([("c", bo + prop.count_dtype),
                                      ("v", bo + prop.dtype, (n,))]))
                        rec["c"] = counts
                        rec["v"] = vals
                        f.write(rec.tobytes())
                    else:
                        c = 0
                        for i in range(elem.count):
                            n = int(prop.sizes[i])
                            f.write(np.asarray(
                                [n], bo + prop.count_dtype).tobytes())
                            f.write(prop.data[c:c + n].astype(
                                bo + prop.dtype).tobytes())
                            c += n


# ----------------------------------------------------------------------------
# Typed accessors (yocto_modelio.h:115-213 equivalents)
# ----------------------------------------------------------------------------

def _get_props(ply: PlyModel, element: str, names):
    for elem in ply.elements:
        if elem.name != element:
            continue
        cols = []
        for name in names:
            prop = next((p for p in elem.properties if p.name == name), None)
            if prop is None or prop.is_list:
                return None
            cols.append(prop.data.astype(np.float32))
        return np.stack(cols, axis=-1)
    return None


def get_positions(ply: PlyModel):
    return _get_props(ply, "vertex", ["x", "y", "z"])


def get_normals(ply: PlyModel):
    return _get_props(ply, "vertex", ["nx", "ny", "nz"])


def get_texcoords(ply: PlyModel, flipv: bool = False):
    out = _get_props(ply, "vertex", ["u", "v"])
    if out is None:
        out = _get_props(ply, "vertex", ["s", "t"])
    if out is not None and flipv:
        out = np.stack([out[:, 0], 1.0 - out[:, 1]], axis=-1)
    return out


def get_colors(ply: PlyModel):
    rgba = _get_props(ply, "vertex", ["red", "green", "blue", "alpha"])
    scale = 1.0
    for elem in ply.elements:
        if elem.name == "vertex":
            prop = next((p for p in elem.properties if p.name == "red"), None)
            if prop is not None and prop.dtype == "u1":
                scale = 1.0 / 255.0
    if rgba is not None:
        return rgba * scale
    rgb = _get_props(ply, "vertex", ["red", "green", "blue"])
    if rgb is None:
        return None
    return np.concatenate(
        [rgb * scale, np.ones((len(rgb), 1), np.float32)], axis=1)


def get_radius(ply: PlyModel):
    out = _get_props(ply, "vertex", ["radius"])
    return out[:, 0] if out is not None else None


def _get_list(ply: PlyModel, element: str, name: str):
    for elem in ply.elements:
        if elem.name != element:
            continue
        prop = next((p for p in elem.properties if p.name == name), None)
        if prop is None or not prop.is_list:
            return None, None
        return prop.data.astype(np.int64), prop.sizes.astype(np.int64)
    return None, None


def get_faces(ply: PlyModel):
    """-> (triangles [T,3], quads [Q,4]); one of the two is empty,
    matching get_faces (yocto_modelio.h:700-708)."""
    data, sizes = _get_list(ply, "face", "vertex_indices")
    if data is None:
        data, sizes = _get_list(ply, "face", "vertex_index")
    tris = np.zeros((0, 3), np.int32)
    quads = np.zeros((0, 4), np.int32)
    if data is None or len(sizes) == 0:
        return tris, quads
    has_quads = bool((sizes == 4).any())
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    if has_quads:
        out = []
        if (sizes <= 4).all() and len(np.unique(sizes)) <= 2:
            # vectorized common case: only 3s and 4s
            quad_rows = sizes == 4
            if quad_rows.any():
                qoff = offsets[:-1][quad_rows]
                q = np.stack([data[qoff], data[qoff + 1], data[qoff + 2],
                              data[qoff + 3]], axis=1)
            else:
                q = np.zeros((0, 4), np.int64)
            tri_rows = sizes == 3
            if tri_rows.any():
                toff = offsets[:-1][tri_rows]
                t = np.stack([data[toff], data[toff + 1], data[toff + 2],
                              data[toff + 2]], axis=1)
            else:
                t = np.zeros((0, 4), np.int64)
            # preserve original face order
            order = np.argsort(np.concatenate(
                [np.where(quad_rows)[0], np.where(tri_rows)[0]]),
                kind="stable")
            quads = np.concatenate([q, t])[order].astype(np.int32)
        else:
            for i, size in enumerate(sizes):
                o = offsets[i]
                if size == 4:
                    out.append(data[o:o + 4])
                elif size == 3:
                    out.append([data[o], data[o + 1], data[o + 2],
                                data[o + 2]])
                else:
                    for c in range(2, size):
                        out.append([data[o], data[o + c - 1], data[o + c],
                                    data[o + c]])
            quads = np.asarray(out, np.int32)
    else:
        if (sizes == 3).all():
            tris = data.reshape(-1, 3).astype(np.int32)
        else:
            out = []
            for i, size in enumerate(sizes):
                o = offsets[i]
                for c in range(2, size):
                    out.append([data[o], data[o + c - 1], data[o + c]])
            tris = np.asarray(out, np.int32)
    return tris, quads


def get_lines(ply: PlyModel):
    data, sizes = _get_list(ply, "line", "vertex_indices")
    if data is None:
        return np.zeros((0, 2), np.int32)
    out = []
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    for i, size in enumerate(sizes):
        o = offsets[i]
        for c in range(1, size):
            out.append([data[o + c - 1], data[o + c]])
    return np.asarray(out, np.int32) if out else np.zeros((0, 2), np.int32)


def get_points(ply: PlyModel):
    data, sizes = _get_list(ply, "point", "vertex_indices")
    if data is None:
        return np.zeros((0,), np.int32)
    return data.astype(np.int32)


# ----------------------------------------------------------------------------
# Shape-level load/save (load_shape semantics, yocto_sceneio.cpp:1009-1070)
# ----------------------------------------------------------------------------

def load_shape_ply(path: str, flip_texcoord: bool = True):
    from ..models.shape import ShapeData

    ply = load_ply(path)
    shape = ShapeData()
    pos = get_positions(ply)
    if pos is not None:
        shape.positions = pos
    nrm = get_normals(ply)
    if nrm is not None:
        shape.normals = nrm
    tc = get_texcoords(ply, flip_texcoord)
    if tc is not None:
        shape.texcoords = tc
    col = get_colors(ply)
    if col is not None:
        shape.colors = col
    rad = get_radius(ply)
    if rad is not None:
        shape.radius = rad
    tris, quads = get_faces(ply)
    shape.triangles = tris
    shape.quads = quads
    shape.lines = get_lines(ply)
    shape.points = get_points(ply)
    return shape


def save_shape_ply(path: str, shape, flip_texcoord: bool = True,
                   ascii_fmt: bool = False) -> None:
    ply = PlyModel(format="ascii" if ascii_fmt else "binary_little_endian")
    ply.comments = ["Written by yocto-tpu"]
    n = len(shape.positions)
    vert = PlyElement(name="vertex", count=n)
    vert.properties.append(PlyProperty(
        "x", "f4", data=shape.positions[:, 0].astype(np.float32)))
    vert.properties.append(PlyProperty(
        "y", "f4", data=shape.positions[:, 1].astype(np.float32)))
    vert.properties.append(PlyProperty(
        "z", "f4", data=shape.positions[:, 2].astype(np.float32)))
    if len(shape.normals) == n:
        for i, nme in enumerate(["nx", "ny", "nz"]):
            vert.properties.append(PlyProperty(
                nme, "f4", data=shape.normals[:, i].astype(np.float32)))
    if len(shape.texcoords) == n:
        tc = shape.texcoords
        if flip_texcoord:
            tc = np.stack([tc[:, 0], 1.0 - tc[:, 1]], axis=-1)
        vert.properties.append(PlyProperty(
            "u", "f4", data=tc[:, 0].astype(np.float32)))
        vert.properties.append(PlyProperty(
            "v", "f4", data=tc[:, 1].astype(np.float32)))
    if len(shape.colors) == n:
        for i, nme in enumerate(["red", "green", "blue", "alpha"]):
            vert.properties.append(PlyProperty(
                nme, "f4", data=shape.colors[:, i].astype(np.float32)))
    if len(shape.radius) == n:
        vert.properties.append(PlyProperty(
            "radius", "f4", data=shape.radius.astype(np.float32)))
    ply.elements.append(vert)
    if len(shape.triangles) or len(shape.quads):
        if len(shape.quads):
            idx = shape.quads
            sizes = np.where(idx[:, 2] == idx[:, 3], 3, 4).astype(np.uint8)
            flat = []
            for row, s in zip(idx, sizes):
                flat.extend(row[:s])
            data = np.asarray(flat, np.int32)
        else:
            idx = shape.triangles
            sizes = np.full(len(idx), 3, np.uint8)
            data = idx.reshape(-1).astype(np.int32)
        face = PlyElement(name="face", count=len(idx))
        face.properties.append(PlyProperty(
            "vertex_indices", "i4", is_list=True, data=data, sizes=sizes))
        ply.elements.append(face)
    if len(shape.lines):
        data = shape.lines.reshape(-1).astype(np.int32)
        sizes = np.full(len(shape.lines), 2, np.uint8)
        elem = PlyElement(name="line", count=len(shape.lines))
        elem.properties.append(PlyProperty(
            "vertex_indices", "i4", is_list=True, data=data, sizes=sizes))
        ply.elements.append(elem)
    if len(shape.points):
        elem = PlyElement(name="point", count=len(shape.points))
        elem.properties.append(PlyProperty(
            "vertex_indices", "i4", is_list=True,
            data=shape.points.astype(np.int32),
            sizes=np.ones(len(shape.points), np.uint8)))
        ply.elements.append(elem)
    save_ply(path, ply)
