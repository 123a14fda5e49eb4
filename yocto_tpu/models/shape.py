"""Shape model + host-side geometry processing (NumPy).

Mirrors the shape layer of the reference (yocto_shape.h:74-158 and the
vertex-property routines of yocto_shape.cpp): indexed meshes with
points/lines/triangles/quads elements, per-vertex properties, smooth normal
computation, element CDFs for uniform area sampling, and conversions.
These run at scene-build time on the host; the tracer consumes the flat
device arrays produced by `yocto_tpu.trace.compile_scene`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


def _empty(shape, dtype=np.float32):
    return np.zeros(shape, dtype)


@dataclass
class ShapeData:
    """Indexed shape (yocto_shape.h:74-88)."""

    points: np.ndarray = field(default_factory=lambda: _empty((0,), np.int32))
    lines: np.ndarray = field(default_factory=lambda: _empty((0, 2), np.int32))
    triangles: np.ndarray = field(
        default_factory=lambda: _empty((0, 3), np.int32))
    quads: np.ndarray = field(default_factory=lambda: _empty((0, 4), np.int32))
    positions: np.ndarray = field(default_factory=lambda: _empty((0, 3)))
    normals: np.ndarray = field(default_factory=lambda: _empty((0, 3)))
    texcoords: np.ndarray = field(default_factory=lambda: _empty((0, 2)))
    colors: np.ndarray = field(default_factory=lambda: _empty((0, 4)))
    radius: np.ndarray = field(default_factory=lambda: _empty((0,)))
    tangents: np.ndarray = field(default_factory=lambda: _empty((0, 4)))


@dataclass
class FvShapeData:
    """Face-varying shape (yocto_shape.h:138-152)."""

    quadspos: np.ndarray = field(
        default_factory=lambda: _empty((0, 4), np.int32))
    quadsnorm: np.ndarray = field(
        default_factory=lambda: _empty((0, 4), np.int32))
    quadstexcoord: np.ndarray = field(
        default_factory=lambda: _empty((0, 4), np.int32))
    positions: np.ndarray = field(default_factory=lambda: _empty((0, 3)))
    normals: np.ndarray = field(default_factory=lambda: _empty((0, 3)))
    texcoords: np.ndarray = field(default_factory=lambda: _empty((0, 2)))


def shape_kind(shape: ShapeData) -> str:
    if len(shape.triangles):
        return "triangles"
    if len(shape.quads):
        return "quads"
    if len(shape.lines):
        return "lines"
    if len(shape.points):
        return "points"
    return "empty"


# ----------------------------------------------------------------------------
# Vertex properties (yocto_shape.cpp:1463-1511 semantics, vectorized)
# ----------------------------------------------------------------------------

def _normalize_rows(v):
    n = np.linalg.norm(v, axis=-1, keepdims=True)
    return np.where(n > 0, v / np.where(n == 0, 1, n), v)


def lines_tangents(lines, positions):
    t = positions[lines[:, 1]] - positions[lines[:, 0]]
    length = np.linalg.norm(t, axis=-1, keepdims=True)
    weighted = np.where(length > 0, t / np.where(length == 0, 1, length), t) \
        * length
    out = np.zeros_like(positions)
    np.add.at(out, lines[:, 0], weighted)
    np.add.at(out, lines[:, 1], weighted)
    return _normalize_rows(out).astype(np.float32)


def triangles_normals(triangles, positions):
    p0 = positions[triangles[:, 0]]
    p1 = positions[triangles[:, 1]]
    p2 = positions[triangles[:, 2]]
    cr = np.cross(p1 - p0, p2 - p0)  # = normal * 2*area
    out = np.zeros_like(positions)
    for k in range(3):
        np.add.at(out, triangles[:, k], cr)
    return _normalize_rows(out).astype(np.float32)


def quads_normals(quads, positions):
    p0 = positions[quads[:, 0]]
    p1 = positions[quads[:, 1]]
    p2 = positions[quads[:, 2]]
    p3 = positions[quads[:, 3]]
    n_a = np.cross(p1 - p0, p3 - p0)  # tri(p0,p1,p3) normal*2area
    n_b = np.cross(p3 - p2, p1 - p2)  # tri(p2,p3,p1) normal*2area
    area = (np.linalg.norm(n_a, axis=-1) + np.linalg.norm(n_b, axis=-1)) / 2
    normal = _normalize_rows(_normalize_rows(n_a) + _normalize_rows(n_b))
    weighted = normal * area[:, None]
    out = np.zeros_like(positions)
    for k in range(3):
        np.add.at(out, quads[:, k], weighted)
    notdeg = quads[:, 2] != quads[:, 3]
    np.add.at(out, quads[notdeg, 3], weighted[notdeg])
    return _normalize_rows(out).astype(np.float32)


def compute_normals(shape: ShapeData) -> np.ndarray:
    """Smooth vertex normals/tangents (yocto_shape.h:102 semantics)."""
    if len(shape.triangles):
        return triangles_normals(shape.triangles, shape.positions)
    if len(shape.quads):
        return quads_normals(shape.quads, shape.positions)
    if len(shape.lines):
        return lines_tangents(shape.lines, shape.positions)
    return np.tile(np.array([0, 0, 1], np.float32), (len(shape.positions), 1))


def triangles_tangent_spaces(triangles, positions, normals, texcoords):
    """Per-vertex tangent-space vec4 (xyz tangent, w handedness sign)."""
    p0, p1, p2 = (positions[triangles[:, k]] for k in range(3))
    uv0, uv1, uv2 = (texcoords[triangles[:, k]] for k in range(3))
    p = p1 - p0
    q = p2 - p0
    s = np.stack([uv1[:, 0] - uv0[:, 0], uv2[:, 0] - uv0[:, 0]], -1)
    t = np.stack([uv1[:, 1] - uv0[:, 1], uv2[:, 1] - uv0[:, 1]], -1)
    div = s[:, 0] * t[:, 1] - s[:, 1] * t[:, 0]
    safe = np.where(div == 0, 1, div)[:, None]
    tu = np.where((div != 0)[:, None],
                  (t[:, 1:2] * p - t[:, 0:1] * q) / safe,
                  np.array([1, 0, 0], np.float32))
    tv = np.where((div != 0)[:, None],
                  (s[:, 0:1] * q - s[:, 1:2] * p) / safe,
                  np.array([0, 1, 0], np.float32))
    tangu = np.zeros_like(positions)
    tangv = np.zeros_like(positions)
    for k in range(3):
        np.add.at(tangu, triangles[:, k], tu)
        np.add.at(tangv, triangles[:, k], tv)
    tangu = _normalize_rows(tangu)
    tangv = _normalize_rows(tangv)
    tangents = np.zeros((len(positions), 4), np.float32)
    proj = tangu - normals * np.sum(normals * tangu, -1, keepdims=True)
    tangents[:, :3] = _normalize_rows(proj)
    sign = np.where(
        np.sum(np.cross(normals, tangu) * tangv, -1) < 0, -1.0, 1.0)
    tangents[:, 3] = sign
    return tangents


# ----------------------------------------------------------------------------
# Sampling CDFs (yocto_shape.cpp:224-280 semantics, vectorized)
# ----------------------------------------------------------------------------

def sample_points_cdf(npoints: int) -> np.ndarray:
    return np.cumsum(np.ones(npoints, np.float32)).astype(np.float32)


def sample_lines_cdf(lines, positions) -> np.ndarray:
    ln = np.linalg.norm(
        positions[lines[:, 1]] - positions[lines[:, 0]], axis=-1)
    return np.cumsum(ln.astype(np.float32)).astype(np.float32)


def sample_triangles_cdf(triangles, positions) -> np.ndarray:
    p0 = positions[triangles[:, 0]]
    p1 = positions[triangles[:, 1]]
    p2 = positions[triangles[:, 2]]
    area = np.linalg.norm(np.cross(p1 - p0, p2 - p0), axis=-1) / 2
    return np.cumsum(area.astype(np.float32)).astype(np.float32)


def sample_quads_cdf(quads, positions) -> np.ndarray:
    p0 = positions[quads[:, 0]]
    p1 = positions[quads[:, 1]]
    p2 = positions[quads[:, 2]]
    p3 = positions[quads[:, 3]]
    area = (np.linalg.norm(np.cross(p1 - p0, p3 - p0), axis=-1) / 2
            + np.linalg.norm(np.cross(p3 - p2, p1 - p2), axis=-1) / 2)
    return np.cumsum(area.astype(np.float32)).astype(np.float32)


def shape_stats(shape: ShapeData) -> list:
    lo = shape.positions.min(0) if len(shape.positions) else np.zeros(3)
    hi = shape.positions.max(0) if len(shape.positions) else np.zeros(3)
    return [
        f"points:       {len(shape.points)}",
        f"lines:        {len(shape.lines)}",
        f"triangles:    {len(shape.triangles)}",
        f"quads:        {len(shape.quads)}",
        f"positions:    {len(shape.positions)}",
        f"normals:      {len(shape.normals)}",
        f"texcoords:    {len(shape.texcoords)}",
        f"colors:       {len(shape.colors)}",
        f"radius:       {len(shape.radius)}",
        f"center:       {((lo + hi) / 2).tolist()}",
        f"size:         {(hi - lo).tolist()}",
    ]


# ----------------------------------------------------------------------------
# Element conversions (yocto_shape.h:289-296 equivalents)
# ----------------------------------------------------------------------------

def quads_to_triangles(quads: np.ndarray) -> np.ndarray:
    """Split quads into triangles, skipping the degenerate second triangle."""
    tri_a = quads[:, [0, 1, 3]]
    notdeg = quads[:, 2] != quads[:, 3]
    tri_b = quads[notdeg][:, [2, 3, 1]]
    return np.concatenate([tri_a, tri_b], 0).astype(np.int32)


def triangles_to_quads(triangles: np.ndarray) -> np.ndarray:
    return np.concatenate(
        [triangles, triangles[:, 2:3]], axis=1).astype(np.int32)


# ----------------------------------------------------------------------------
# Skinning (yocto_shape.h:333-349)
# ----------------------------------------------------------------------------

def skin_vertices(positions, normals, weights, joints, xforms):
    """Frame-based linear-blend skinning (yocto_shape.cpp:1597-1618):
    blends TRANSFORMED points/directions by weight. `xforms`: [J,4,3]
    frames (rows X,Y,Z,O)."""
    positions = np.asarray(positions, np.float32)
    normals = np.asarray(normals, np.float32)
    weights = np.asarray(weights, np.float32)
    joints = np.asarray(joints, np.int64)
    xforms = np.asarray(xforms, np.float32)

    def tp(frame, p):  # transform_point, batched
        return p @ frame[:3] + frame[3]

    def td(frame, d):
        return _normalize_rows(d @ frame[:3])

    sp = np.zeros_like(positions)
    sn = np.zeros_like(normals)
    for k in range(4):
        fr = xforms[joints[:, k]]              # [N,4,3]
        w = weights[:, k:k + 1]
        sp += (np.einsum("nij,nj->ni", fr[:, :3].transpose(0, 2, 1),
                         positions) + fr[:, 3]) * w
        sn += _normalize_rows(np.einsum(
            "nij,nj->ni", fr[:, :3].transpose(0, 2, 1), normals)) * w
    return sp, _normalize_rows(sn)


def skin_matrices(positions, normals, weights, joints, xforms):
    """glTF matrix skinning (yocto_shape.cpp:1620-1634): blends the
    MATRICES, then transforms. `xforms`: [J,4,4] row-major matrices."""
    positions = np.asarray(positions, np.float32)
    normals = np.asarray(normals, np.float32)
    weights = np.asarray(weights, np.float32)
    joints = np.asarray(joints, np.int64)
    xforms = np.asarray(xforms, np.float32)
    blend = np.einsum("nk,nkij->nij",
                      weights, xforms[joints])   # [N,4,4]
    sp = np.einsum("nij,nj->ni", blend[:, :3, :3], positions) \
        + blend[:, :3, 3]
    sn = _normalize_rows(
        np.einsum("nij,nj->ni", blend[:, :3, :3], normals))
    return sp, sn


# ----------------------------------------------------------------------------
# Hash grid KNN (yocto_shape.h:570-586)
# ----------------------------------------------------------------------------

class HashGrid:
    """Spatial hash over cells of `cell_size` (yocto_shape.h:570-575)."""

    def __init__(self, cell_size: float):
        self.cell_size = float(cell_size)
        self.cell_inv_size = 1.0 / float(cell_size)
        self.positions = []
        self.cells = {}

    def _cell(self, position):
        p = np.floor(np.asarray(position, np.float64)
                     * self.cell_inv_size).astype(np.int64)
        return (int(p[0]), int(p[1]), int(p[2]))


def make_hash_grid(positions=None, cell_size: float = 0.01) -> HashGrid:
    grid = HashGrid(cell_size)
    if positions is not None:
        for p in np.asarray(positions, np.float32):
            insert_vertex(grid, p)
    return grid


def insert_vertex(grid: HashGrid, position) -> int:
    vid = len(grid.positions)
    grid.positions.append(np.asarray(position, np.float32))
    grid.cells.setdefault(grid._cell(position), []).append(vid)
    return vid


def find_neighbors(grid: HashGrid, position, max_radius: float,
                   skip_id: int = -1) -> list:
    """Vertex ids within `max_radius`, scanning the 3^3 cell neighborhood
    (yocto_shape.cpp find_neighbors semantics; insertion order)."""
    cx, cy, cz = grid._cell(position)
    reach = int(np.ceil(max_radius * grid.cell_inv_size))
    pos = np.asarray(position, np.float32)
    out = []
    r2 = max_radius * max_radius
    for dx in range(-reach, reach + 1):
        for dy in range(-reach, reach + 1):
            for dz in range(-reach, reach + 1):
                for vid in grid.cells.get((cx + dx, cy + dy, cz + dz), ()):
                    if vid == skip_id:
                        continue
                    d = grid.positions[vid] - pos
                    if float(d @ d) <= r2:
                        out.append(vid)
    return sorted(out)


# ----------------------------------------------------------------------------
# Vertex welding (yocto_shape.h:612-618)
# ----------------------------------------------------------------------------

def weld_vertices(positions, threshold: float):
    """-> (welded_positions, index_map); first-inserted neighbor wins
    (yocto_shape.cpp:2619-2637)."""
    positions = np.asarray(positions, np.float32)
    grid = make_hash_grid(cell_size=threshold)
    welded = []
    indices = np.zeros(len(positions), np.int32)
    for v, p in enumerate(positions):
        neigh = find_neighbors(grid, p, threshold)
        if not neigh:
            welded.append(p)
            indices[v] = len(welded) - 1
            insert_vertex(grid, p)
        else:
            indices[v] = neigh[0]
    return (np.asarray(welded, np.float32).reshape(-1, 3),
            indices)


def weld_triangles(triangles, positions, threshold: float):
    wpos, idx = weld_vertices(positions, threshold)
    return idx[np.asarray(triangles, np.int64)].astype(np.int32), wpos


def weld_quads(quads, positions, threshold: float):
    wpos, idx = weld_vertices(positions, threshold)
    return idx[np.asarray(quads, np.int64)].astype(np.int32), wpos
