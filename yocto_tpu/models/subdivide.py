"""Subdivision surfaces + edge topology (host NumPy, vectorized).

Equivalents of the reference subdivision code (yocto_shape.cpp
subdivide_{lines,triangles,quads,beziers,catmullclark}_impl and the edge
map, yocto_shape.cpp:1752-1821): linear subdivision of all element types
and Catmull-Clark with boundary creases. Edge indexing preserves the
reference's insertion order (per-element edge order) so vertex layouts
match exactly.

Note: the reference's `subdivide_shape` (yocto_shape.cpp:299) dispatches on
its (empty) output object — a latent upstream bug that makes it return
empty shapes; this implementation dispatches on the INPUT shape, which is
the evident intent.
"""

from __future__ import annotations

import numpy as np

from .shape import ShapeData


def _edge_map(elem_edges: np.ndarray):
    """elem_edges: [K,2] int in insertion order (duplicates allowed).

    Returns (edges [E,2] first-occurrence order, edge_id [K] for each input,
    nfaces [E]).
    """
    if len(elem_edges) == 0:
        return (np.zeros((0, 2), np.int32), np.zeros(0, np.int32),
                np.zeros(0, np.int32))
    lo = elem_edges.min(1).astype(np.int64)
    hi = elem_edges.max(1).astype(np.int64)
    keys = lo * np.int64(1 << 32) + hi
    uniq, first_idx, inverse, counts = np.unique(
        keys, return_index=True, return_inverse=True, return_counts=True)
    order = np.argsort(first_idx, kind="stable")
    rank = np.empty(len(uniq), np.int64)
    rank[order] = np.arange(len(uniq))
    edge_id = rank[inverse].astype(np.int32)
    edges = elem_edges[np.sort(first_idx)]
    # store sorted (min,max) pairs like insert_edge does
    edges = np.stack([edges.min(1), edges.max(1)], axis=1).astype(np.int32)
    nfaces = counts[order]  # counts in first-occurrence order
    return edges, edge_id, nfaces.astype(np.int32)


def make_edge_map_triangles(triangles: np.ndarray):
    ee = np.concatenate([triangles[:, [0, 1]], triangles[:, [1, 2]],
                         triangles[:, [2, 0]]], axis=0)
    # interleave per-element: reference inserts per triangle
    ee = np.stack([triangles[:, [0, 1]], triangles[:, [1, 2]],
                   triangles[:, [2, 0]]], axis=1).reshape(-1, 2)
    return _edge_map(ee)


def make_edge_map_quads(quads: np.ndarray):
    parts = []
    for i in range(len(quads)):
        q = quads[i]
        parts.append((q[0], q[1]))
        parts.append((q[1], q[2]))
        if q[2] != q[3]:
            parts.append((q[2], q[3]))
        parts.append((q[3], q[0]))
    ee = np.asarray(parts, np.int32).reshape(-1, 2)
    return _edge_map(ee)


def _quad_edges_vectorized(quads: np.ndarray):
    """Edge list + per-slot edge ids for quads (slot order xy,yz,zw,wx with
    zw skipped on degenerate quads), vectorized."""
    n = len(quads)
    deg = quads[:, 2] == quads[:, 3]
    slots = np.stack([quads[:, [0, 1]], quads[:, [1, 2]],
                      quads[:, [2, 3]], quads[:, [3, 0]]], axis=1)  # [n,4,2]
    keep = np.ones((n, 4), bool)
    keep[:, 2] = ~deg
    flat = slots.reshape(-1, 2)[keep.reshape(-1)]
    edges, edge_id_flat, nfaces = _edge_map(flat)
    # map back to [n,4] slots (degenerate zw slot -> id of (z,w)== lookup of
    # z==w edge is unused; fill with -1)
    slot_ids = np.full((n, 4), -1, np.int32)
    slot_ids[keep] = edge_id_flat
    return edges, slot_ids, nfaces


def get_boundary(edges: np.ndarray, nfaces: np.ndarray) -> np.ndarray:
    return edges[nfaces < 2]


# ----------------------------------------------------------------------------
# Linear subdivision
# ----------------------------------------------------------------------------

def subdivide_lines(lines, vertices, steps=1):
    for _ in range(steps):
        if len(lines) == 0 or len(vertices) == 0:
            return lines, vertices
        mid = (vertices[lines[:, 0]] + vertices[lines[:, 1]]) / 2
        tvertices = np.concatenate([vertices, mid])
        nv = len(vertices)
        lid = np.arange(len(lines), dtype=np.int32) + nv
        tlines = np.empty((len(lines) * 2, 2), np.int32)
        tlines[0::2, 0] = lines[:, 0]
        tlines[0::2, 1] = lid
        tlines[1::2, 0] = lid
        tlines[1::2, 1] = lines[:, 1]
        lines, vertices = tlines, tvertices.astype(vertices.dtype)
    return lines, vertices


def subdivide_triangles(triangles, vertices, steps=1):
    for _ in range(steps):
        if len(triangles) == 0 or len(vertices) == 0:
            return triangles, vertices
        edges, edge_id, _ = make_edge_map_triangles(triangles)
        mid = (vertices[edges[:, 0]] + vertices[edges[:, 1]]) / 2
        tvertices = np.concatenate([vertices, mid]).astype(vertices.dtype)
        nv = len(vertices)
        n = len(triangles)
        exy = edge_id[0::3] + nv
        eyz = edge_id[1::3] + nv
        ezx = edge_id[2::3] + nv
        tt = np.empty((n * 4, 3), np.int32)
        tt[0::4] = np.stack([triangles[:, 0], exy, ezx], 1)
        tt[1::4] = np.stack([triangles[:, 1], eyz, exy], 1)
        tt[2::4] = np.stack([triangles[:, 2], ezx, eyz], 1)
        tt[3::4] = np.stack([exy, eyz, ezx], 1)
        triangles, vertices = tt, tvertices
    return triangles, vertices


def _split_quads(quads, vertices):
    """One level of the quad split shared by linear and Catmull-Clark."""
    edges, slot_ids, nfaces = _quad_edges_vectorized(quads)
    emid = (vertices[edges[:, 0]] + vertices[edges[:, 1]]) / 2
    deg = quads[:, 2] == quads[:, 3]
    qc4 = (vertices[quads[:, 0]] + vertices[quads[:, 1]]
           + vertices[quads[:, 2]] + vertices[quads[:, 3]]) / 4
    qc3 = (vertices[quads[:, 0]] + vertices[quads[:, 1]]
           + vertices[quads[:, 2]]) / 3
    qc = np.where(deg.reshape(-1, *([1] * (vertices.ndim - 1))), qc3, qc4)
    tvertices = np.concatenate([vertices, emid, qc]).astype(vertices.dtype)
    nv = len(vertices)
    ne = len(edges)
    n = len(quads)
    exy = slot_ids[:, 0] + nv
    eyz = slot_ids[:, 1] + nv
    ezw = slot_ids[:, 2] + nv  # -1+nv for degenerate (unused)
    ewx = slot_ids[:, 3] + nv
    qv = np.arange(n, dtype=np.int32) + nv + ne

    out = []
    # non-degenerate: 4 quads; degenerate: 3 quads.
    # reference emits per-quad in order; build with a mask + interleave.
    quads4 = np.stack([
        np.stack([quads[:, 0], exy, qv, ewx], 1),
        np.stack([quads[:, 1], eyz, qv, exy], 1),
        np.stack([quads[:, 2], ezw, qv, eyz], 1),
        np.stack([quads[:, 3], ewx, qv, ezw], 1)], axis=1)  # [n,4,4]
    # degenerate triangle-as-quad: uses edge (z,x) in slot 3 (wx with w==z)
    quads3 = np.stack([
        np.stack([quads[:, 0], exy, qv, ewx], 1),
        np.stack([quads[:, 1], eyz, qv, exy], 1),
        np.stack([quads[:, 2], ewx, qv, eyz], 1)], axis=1)  # [n,3,4]
    counts = np.where(deg, 3, 4)
    total = counts.sum()
    tquads = np.empty((total, 4), np.int32)
    w = 0
    # vectorized scatter by offsets
    offs = np.concatenate([[0], np.cumsum(counts)])
    idx4 = np.where(~deg)[0]
    idx3 = np.where(deg)[0]
    for k in range(4):
        rows = offs[idx4] + k
        tquads[rows] = quads4[idx4, k]
    for k in range(3):
        rows = offs[idx3] + k
        tquads[rows] = quads3[idx3, k]
    return tquads, tvertices, edges, nfaces, slot_ids


def subdivide_quads(quads, vertices, steps=1):
    for _ in range(steps):
        if len(quads) == 0 or len(vertices) == 0:
            return quads, vertices
        quads, vertices, _, _, _ = _split_quads(quads, vertices)
    return quads, vertices


def subdivide_beziers(beziers, vertices, steps=1):
    for _ in range(steps):
        if len(beziers) == 0 or len(vertices) == 0:
            return beziers, vertices
        vmap = {}
        tvertices = []
        tbeziers = []
        for bez in beziers:
            x, y, z, w = (int(v) for v in bez)
            if x not in vmap:
                vmap[x] = len(tvertices)
                tvertices.append(vertices[x])
            if w not in vmap:
                vmap[w] = len(tvertices)
                tvertices.append(vertices[w])
            bo = len(tvertices)
            tbeziers.append([vmap[x], bo + 0, bo + 1, bo + 2])
            tbeziers.append([bo + 2, bo + 3, bo + 4, vmap[w]])
            tvertices.append(vertices[x] / 2 + vertices[y] / 2)
            tvertices.append(vertices[x] / 4 + vertices[y] / 2
                             + vertices[z] / 4)
            tvertices.append(vertices[x] / 8 + vertices[y] * (3 / 8)
                             + vertices[z] * (3 / 8) + vertices[w] / 8)
            tvertices.append(vertices[y] / 4 + vertices[z] / 2
                             + vertices[w] / 4)
            tvertices.append(vertices[z] / 2 + vertices[w] / 2)
        beziers = np.asarray(tbeziers, np.int32)
        vertices = np.asarray(tvertices, vertices.dtype)
    return beziers, vertices


# ----------------------------------------------------------------------------
# Catmull-Clark (yocto_shape.cpp subdivide_catmullclark_impl)
# ----------------------------------------------------------------------------

def subdivide_catmullclark(quads, vertices, steps=1, lock_boundary=False):
    for _ in range(steps):
        if len(quads) == 0 or len(vertices) == 0:
            return quads, vertices
        tquads, tvertices, edges, nfaces, slot_ids = _split_quads(
            quads, vertices)
        nv = len(vertices)
        boundary = get_boundary(edges, nfaces)
        # split boundary: each boundary edge -> two half edges via its mid
        bmid = np.array([], np.int32)
        if len(boundary):
            # boundary edge index in `edges` (first-occurrence order)
            bsel = np.where(nfaces < 2)[0]
            bmid = bsel + nv
            tboundary = np.empty((len(boundary) * 2, 2), np.int32)
            tboundary[0::2, 0] = boundary[:, 0]
            tboundary[0::2, 1] = bmid
            tboundary[1::2, 0] = bmid
            tboundary[1::2, 1] = boundary[:, 1]
        else:
            tboundary = np.zeros((0, 2), np.int32)

        # valences: 2 interior, 1 boundary (0 if locked)
        tvert_val = np.full(len(tvertices), 2, np.int32)
        bval = 0 if lock_boundary else 1
        tvert_val[tboundary.reshape(-1)] = bval

        acc_shape = (len(tvertices),) + tvertices.shape[1:]
        avert = np.zeros(acc_shape, np.float64)
        acount = np.zeros(len(tvertices), np.int64)

        if lock_boundary:
            crease_verts = tboundary.reshape(-1)
            sel = tvert_val[crease_verts] == 0
            cv = crease_verts[sel]
            np.add.at(avert, cv, tvertices[cv])
            np.add.at(acount, cv, 1)
        else:
            ce = tboundary
            centroid = (tvertices[ce[:, 0]] + tvertices[ce[:, 1]]) / 2
            for k in range(2):
                vid = ce[:, k]
                sel = tvert_val[vid] == 1
                np.add.at(avert, vid[sel], centroid[sel])
                np.add.at(acount, vid[sel], 1)

        qcent = (tvertices[tquads[:, 0]] + tvertices[tquads[:, 1]]
                 + tvertices[tquads[:, 2]] + tvertices[tquads[:, 3]]) / 4
        for k in range(4):
            vid = tquads[:, k]
            sel = tvert_val[vid] == 2
            np.add.at(avert, vid[sel], qcent[sel])
            np.add.at(acount, vid[sel], 1)

        safe = np.maximum(acount, 1).astype(np.float64)
        if tvertices.ndim > 1:
            avert = avert / safe[:, None]
        else:
            avert = avert / safe
        # correction: interior verts relax toward average with 4/valence
        corr = tvertices.astype(np.float64) + (
            avert - tvertices) * (4.0 / safe)[
                (slice(None),) + (None,) * (tvertices.ndim - 1)]
        out = np.where((tvert_val == 2)[
            (slice(None),) + (None,) * (tvertices.ndim - 1)], corr, avert)
        quads, vertices = tquads, out.astype(vertices.dtype)
    return quads, vertices


# ----------------------------------------------------------------------------
# Shape-level wrapper (intent of yocto_shape.cpp:299)
# ----------------------------------------------------------------------------

def subdivide_shape(shape: ShapeData, subdivisions: int,
                    catmullclark: bool = False,
                    smooth: bool = False) -> ShapeData:
    if subdivisions == 0:
        return shape
    out = ShapeData()
    if len(shape.points):
        return shape
    if len(shape.lines):
        if len(shape.normals):
            _, out.normals = subdivide_lines(shape.lines, shape.normals,
                                             subdivisions)
        if len(shape.texcoords):
            _, out.texcoords = subdivide_lines(shape.lines, shape.texcoords,
                                               subdivisions)
        if len(shape.colors):
            _, out.colors = subdivide_lines(shape.lines, shape.colors,
                                            subdivisions)
        if len(shape.radius):
            _, out.radius = subdivide_lines(shape.lines, shape.radius,
                                            subdivisions)
        out.lines, out.positions = subdivide_lines(
            shape.lines, shape.positions, subdivisions)
    elif len(shape.triangles):
        if len(shape.normals):
            _, out.normals = subdivide_triangles(
                shape.triangles, shape.normals, subdivisions)
        if len(shape.texcoords):
            _, out.texcoords = subdivide_triangles(
                shape.triangles, shape.texcoords, subdivisions)
        if len(shape.colors):
            _, out.colors = subdivide_triangles(
                shape.triangles, shape.colors, subdivisions)
        if len(shape.radius):
            _, out.radius = subdivide_triangles(
                shape.triangles, shape.radius, subdivisions)
        out.triangles, out.positions = subdivide_triangles(
            shape.triangles, shape.positions, subdivisions)
    elif len(shape.quads) and not catmullclark:
        if len(shape.normals):
            _, out.normals = subdivide_quads(shape.quads, shape.normals,
                                             subdivisions)
        if len(shape.texcoords):
            _, out.texcoords = subdivide_quads(
                shape.quads, shape.texcoords, subdivisions)
        if len(shape.colors):
            _, out.colors = subdivide_quads(shape.quads, shape.colors,
                                            subdivisions)
        if len(shape.radius):
            _, out.radius = subdivide_quads(shape.quads, shape.radius,
                                            subdivisions)
        out.quads, out.positions = subdivide_quads(
            shape.quads, shape.positions, subdivisions)
    elif len(shape.quads) and catmullclark:
        if len(shape.normals):
            _, out.normals = subdivide_catmullclark(
                shape.quads, shape.normals, subdivisions)
        if len(shape.texcoords):
            _, out.texcoords = subdivide_catmullclark(
                shape.quads, shape.texcoords, subdivisions)
        if len(shape.colors):
            _, out.colors = subdivide_catmullclark(
                shape.quads, shape.colors, subdivisions)
        if len(shape.radius):
            _, out.radius = subdivide_catmullclark(
                shape.quads, shape.radius, subdivisions)
        out.quads, out.positions = subdivide_catmullclark(
            shape.quads, shape.positions, subdivisions)
    if smooth:
        from .shape import compute_normals
        out.normals = compute_normals(out)
    return out
