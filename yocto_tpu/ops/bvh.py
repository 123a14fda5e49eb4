"""Host-side BVH construction (NumPy).

Replicates the reference build semantics (yocto_bvh.cpp:108-302): binary
BVH, middle split by largest centroid axis (default) or 16-bin SAH
(highquality), <= 4 primitives per leaf, children allocated contiguously
(`start`, `start+1`), iterative stack build. The result is flattened into
SoA int32/float32 arrays ready for device upload.

A scene BVH is two-level (yocto_bvh.cpp:364-396): per-shape BVHs over
elements plus one BVH over instances whose bboxes are the transformed shape
root bboxes. The instance BVH here uses 1 primitive per leaf, which
simplifies the TPU traversal's instance switching; hit results are
identical (closest-hit is order-independent).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BVH_MAX_PRIMS = 4


@dataclass
class BvhArrays:
    """Flat BVH: node SoA + primitive permutation."""

    bbox_min: np.ndarray  # [N,3] f32
    bbox_max: np.ndarray  # [N,3] f32
    start: np.ndarray     # [N] i32 (child index or primitive start)
    num: np.ndarray       # [N] i16-sized i32 (2 for internal, prim count)
    axis: np.ndarray      # [N] i8-sized i32
    internal: np.ndarray  # [N] bool
    primitives: np.ndarray  # [P] i32


def _sah_split(prims, bboxes, centers, start, end):
    idx = prims[start:end]
    c = centers[idx]
    cmin = c.min(0)
    cmax = c.max(0)
    csize = cmax - cmin
    if not csize.any():
        return (start + end) // 2, 0
    nbins = 16

    def area(bmin, bmax):
        s = bmax - bmin
        return 1e-12 + 2 * (s[..., 0] * s[..., 1] + s[..., 0] * s[..., 2]
                            + s[..., 1] * s[..., 2])

    cb_area = area(bboxes[idx, 0].min(0), bboxes[idx, 1].max(0))
    best = (np.inf, 0, 0.0)
    for saxis in range(3):
        if csize[saxis] == 0:
            continue
        for b in range(1, nbins):
            bsplit = cmin[saxis] + b * csize[saxis] / nbins
            left = c[:, saxis] < bsplit
            nl = int(left.sum())
            nr = len(idx) - nl
            if nl == 0:
                la = 1e-12
            else:
                la = area(bboxes[idx[left], 0].min(0),
                          bboxes[idx[left], 1].max(0))
            if nr == 0:
                ra = 1e-12
            else:
                ra = area(bboxes[idx[~left], 0].min(0),
                          bboxes[idx[~left], 1].max(0))
            cost = 1 + nl * la / cb_area + nr * ra / cb_area
            if cost < best[0]:
                best = (cost, saxis, bsplit)
    _, axis, split = best
    left_mask = c[:, axis] < split
    order = np.concatenate([idx[left_mask], idx[~left_mask]])
    prims[start:end] = order
    middle = start + int(left_mask.sum())
    if middle == start or middle == end:
        return (start + end) // 2, axis
    return middle, axis


def _middle_split(prims, bboxes, centers, start, end):
    idx = prims[start:end]
    c = centers[idx]
    cmin = c.min(0)
    cmax = c.max(0)
    csize = cmax - cmin
    if not csize.any():
        return (start + end) // 2, 0
    # largest axis, later axes win ties (matches the reference's if-chain)
    axis = 0
    if csize[0] >= csize[1] and csize[0] >= csize[2]:
        axis = 0
    if csize[1] >= csize[0] and csize[1] >= csize[2]:
        axis = 1
    if csize[2] >= csize[0] and csize[2] >= csize[1]:
        axis = 2
    split = (cmin[axis] + cmax[axis]) / 2
    left_mask = c[:, axis] < split
    order = np.concatenate([idx[left_mask], idx[~left_mask]])
    prims[start:end] = order
    middle = start + int(left_mask.sum())
    if middle == start or middle == end:
        return (start + end) // 2, axis
    return middle, axis


def make_bvh(bboxes: np.ndarray, highquality: bool = False,
             max_prims: int = BVH_MAX_PRIMS) -> BvhArrays:
    """Build from [P,2,3] primitive bboxes (min,max)."""
    n = len(bboxes)
    if n == 0:
        return BvhArrays(
            bbox_min=np.full((1, 3), np.inf, np.float32),
            bbox_max=np.full((1, 3), -np.inf, np.float32),
            start=np.zeros(1, np.int32), num=np.zeros(1, np.int32),
            axis=np.zeros(1, np.int32), internal=np.zeros(1, bool),
            primitives=np.zeros(0, np.int32))
    bboxes = np.asarray(bboxes, np.float32)
    prims = np.arange(n, dtype=np.int32)
    centers = (bboxes[:, 0] + bboxes[:, 1]) / 2

    nodes_bmin, nodes_bmax = [], []
    nodes_start, nodes_num, nodes_axis, nodes_internal = [], [], [], []

    def new_node():
        nodes_bmin.append(np.zeros(3, np.float32))
        nodes_bmax.append(np.zeros(3, np.float32))
        nodes_start.append(0)
        nodes_num.append(0)
        nodes_axis.append(0)
        nodes_internal.append(False)
        return len(nodes_start) - 1

    new_node()
    stack = [(0, 0, n)]
    split_fn = _sah_split if highquality else _middle_split
    while stack:
        nodeid, start, end = stack.pop()
        idx = prims[start:end]
        nodes_bmin[nodeid] = bboxes[idx, 0].min(0)
        nodes_bmax[nodeid] = bboxes[idx, 1].max(0)
        if end - start > max_prims:
            mid, axis = split_fn(prims, bboxes, centers, start, end)
            child = new_node()
            new_node()
            nodes_internal[nodeid] = True
            nodes_axis[nodeid] = axis
            nodes_num[nodeid] = 2
            nodes_start[nodeid] = child
            stack.append((child, start, mid))
            stack.append((child + 1, mid, end))
        else:
            nodes_internal[nodeid] = False
            nodes_num[nodeid] = end - start
            nodes_start[nodeid] = start
    return BvhArrays(
        bbox_min=np.asarray(nodes_bmin, np.float32),
        bbox_max=np.asarray(nodes_bmax, np.float32),
        start=np.asarray(nodes_start, np.int32),
        num=np.asarray(nodes_num, np.int32),
        axis=np.asarray(nodes_axis, np.int32),
        internal=np.asarray(nodes_internal, bool),
        primitives=prims)


def refit_bvh(bvh: BvhArrays, bboxes: np.ndarray) -> None:
    """Refit node bounds bottom-up (yocto_bvh.cpp:305-319)."""
    for nodeid in range(len(bvh.start) - 1, -1, -1):
        if bvh.internal[nodeid]:
            c = bvh.start[nodeid]
            bvh.bbox_min[nodeid] = np.minimum(bvh.bbox_min[c],
                                              bvh.bbox_min[c + 1])
            bvh.bbox_max[nodeid] = np.maximum(bvh.bbox_max[c],
                                              bvh.bbox_max[c + 1])
        else:
            idx = bvh.primitives[
                bvh.start[nodeid]:bvh.start[nodeid] + bvh.num[nodeid]]
            if len(idx):
                bvh.bbox_min[nodeid] = bboxes[idx, 0].min(0)
                bvh.bbox_max[nodeid] = bboxes[idx, 1].max(0)


# ----------------------------------------------------------------------------
# Primitive bounds (yocto_geometry.h:169-180)
# ----------------------------------------------------------------------------

def point_bounds(p, r):
    return np.stack([p - r[..., None], p + r[..., None]], axis=-2)


def line_bounds(p0, p1, r0, r1):
    lo = np.minimum(p0 - r0[..., None], p1 - r1[..., None])
    hi = np.maximum(p0 + r0[..., None], p1 + r1[..., None])
    return np.stack([lo, hi], axis=-2)


def triangle_bounds(p0, p1, p2):
    lo = np.minimum(np.minimum(p0, p1), p2)
    hi = np.maximum(np.maximum(p0, p1), p2)
    return np.stack([lo, hi], axis=-2)


def quad_bounds(p0, p1, p2, p3):
    lo = np.minimum(np.minimum(p0, p1), np.minimum(p2, p3))
    hi = np.maximum(np.maximum(p0, p1), np.maximum(p2, p3))
    return np.stack([lo, hi], axis=-2)


def shape_element_bounds(shape) -> np.ndarray:
    """[E,2,3] bboxes for a shape's elements, in shape element order."""
    pos = shape.positions
    rad = shape.radius if len(shape.radius) == len(pos) \
        else np.zeros(len(pos), np.float32)
    if len(shape.points):
        p = shape.points
        return point_bounds(pos[p], rad[p])
    if len(shape.lines):
        l = shape.lines
        return line_bounds(pos[l[:, 0]], pos[l[:, 1]], rad[l[:, 0]],
                           rad[l[:, 1]])
    if len(shape.triangles):
        t = shape.triangles
        return triangle_bounds(pos[t[:, 0]], pos[t[:, 1]], pos[t[:, 2]])
    if len(shape.quads):
        q = shape.quads
        return quad_bounds(pos[q[:, 0]], pos[q[:, 1]], pos[q[:, 2]],
                           pos[q[:, 3]])
    return np.zeros((0, 2, 3), np.float32)


def transform_bbox(frame: np.ndarray, bmin, bmax):
    """Transform an AABB by an affine frame (corners method)."""
    corners = np.array([[x, y, z] for x in (bmin[0], bmax[0])
                        for y in (bmin[1], bmax[1])
                        for z in (bmin[2], bmax[2])], np.float32)
    world = corners @ frame[:3] + frame[3]
    return world.min(0), world.max(0)
