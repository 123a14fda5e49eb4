"""STL model IO (binary + ascii), equivalent of the reference STL layer
(yocto_modelio.h:428-434). Binary STLs carry per-facet normals and three
positions per triangle; loading optionally merges duplicate vertices the
way the reference does (load_stl(..., unique_vertices=true))."""

from __future__ import annotations

import struct

import numpy as np

from ..models.shape import ShapeData


def load_stl(path: str, unique_vertices: bool = True):
    with open(path, "rb") as f:
        data = f.read()
    is_ascii = data[:5] == b"solid" and b"facet" in data[:500]
    if is_ascii:
        tris_pos = []
        fnormals = []
        cur = []
        for line in data.decode("ascii", "replace").splitlines():
            toks = line.split()
            if not toks:
                continue
            if toks[0] == "facet" and len(toks) >= 5:
                fnormals.append([float(v) for v in toks[2:5]])
            elif toks[0] == "vertex":
                cur.append([float(v) for v in toks[1:4]])
            elif toks[0] == "endfacet":
                if len(cur) == 3:
                    tris_pos.append(cur)
                cur = []
        pos = np.asarray(tris_pos, np.float32).reshape(-1, 3)
        fnorm = np.asarray(fnormals, np.float32).reshape(-1, 3)
    else:
        ntris = struct.unpack_from("<I", data, 80)[0]
        rec = np.frombuffer(data, np.uint8, ntris * 50, 84).reshape(ntris, 50)
        vals = rec[:, :48].copy().view("<f4").reshape(ntris, 4, 3)
        fnorm = vals[:, 0]
        pos = vals[:, 1:].reshape(-1, 3)
    tris = np.arange(len(pos), dtype=np.int32).reshape(-1, 3)
    if unique_vertices and len(pos):
        uniq, inverse = np.unique(pos, axis=0, return_inverse=True)
        pos = uniq.astype(np.float32)
        tris = inverse[tris].astype(np.int32)
    return pos, tris, fnorm


def load_shape_stl(path: str) -> ShapeData:
    pos, tris, _ = load_stl(path, unique_vertices=True)
    return ShapeData(positions=pos, triangles=tris)


def save_stl(path: str, positions: np.ndarray, triangles: np.ndarray,
             ascii_fmt: bool = False) -> None:
    p0 = positions[triangles[:, 0]]
    p1 = positions[triangles[:, 1]]
    p2 = positions[triangles[:, 2]]
    n = np.cross(p1 - p0, p2 - p0)
    ln = np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    n = (n / ln).astype(np.float32)
    if ascii_fmt:
        with open(path, "w") as f:
            f.write("solid yocto-tpu\n")
            for i in range(len(triangles)):
                f.write(f"facet normal {n[i,0]} {n[i,1]} {n[i,2]}\n")
                f.write("  outer loop\n")
                for p in (p0[i], p1[i], p2[i]):
                    f.write(f"    vertex {p[0]} {p[1]} {p[2]}\n")
                f.write("  endloop\nendfacet\n")
            f.write("endsolid yocto-tpu\n")
        return
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(triangles)))
        rec = np.zeros((len(triangles), 50), np.uint8)
        vals = np.concatenate(
            [n[:, None, :], p0[:, None, :], p1[:, None, :], p2[:, None, :]],
            axis=1).astype("<f4")
        rec[:, :48] = vals.reshape(len(triangles), 12).view(np.uint8)
        f.write(rec.tobytes())


def save_shape_stl(path: str, shape: ShapeData,
                   ascii_fmt: bool = False) -> None:
    tris = shape.triangles
    if not len(tris) and len(shape.quads):
        from ..models.shape import quads_to_triangles
        tris = quads_to_triangles(shape.quads)
    save_stl(path, shape.positions, tris, ascii_fmt)
