"""Host-side shape sampling, evaluation, and hair growth.

Equivalents of the reference's shape-level eval/sampling
(yocto_shape.cpp:63-281) and the hair growers make_hair/make_hair2
(yocto_shape.cpp:1264-1372), using the same PCG32 streams so sampled point
sets match the reference bit-for-bit.
"""

from __future__ import annotations

import numpy as np

from ..ops.rng import np_advance, np_make_rng
from .shape import (ShapeData, lines_tangents, sample_lines_cdf,
                    sample_points_cdf, sample_quads_cdf,
                    sample_triangles_cdf, shape_kind)


class _HostRng:
    """Sequential PCG32 mirror for host sampling."""

    def __init__(self, seed, seq=1):
        self.state, self.inc = np_make_rng(seed, seq)

    def rand1f(self) -> float:
        bits, self.state = np_advance(self.state, self.inc)
        return float(
            np.array([(int(bits) >> 9) | 0x3F800000],
                     np.uint32).view(np.float32)[0] - 1.0)

    def rand2f(self):
        x = self.rand1f()
        y = self.rand1f()
        return np.array([x, y], np.float32)

    def rand3f(self):
        x = self.rand1f()
        y = self.rand1f()
        z = self.rand1f()
        return np.array([x, y, z], np.float32)


def sample_shape_cdf(shape: ShapeData) -> np.ndarray:
    kind = shape_kind(shape)
    if kind == "points":
        return sample_points_cdf(len(shape.points))
    if kind == "lines":
        return sample_lines_cdf(shape.lines, shape.positions)
    if kind == "triangles":
        return sample_triangles_cdf(shape.triangles, shape.positions)
    if kind == "quads":
        return sample_quads_cdf(shape.quads, shape.positions)
    return sample_points_cdf(len(shape.positions))


def _sample_discrete(cdf: np.ndarray, r: float) -> int:
    r = min(max(r * cdf[-1], 0.0), cdf[-1] - 0.00001)
    return int(np.clip(np.searchsorted(cdf, r, side="right"), 0,
                       len(cdf) - 1))


def sample_shape(shape: ShapeData, num_samples: int, seed: int = 98729387):
    """-> list of (element, uv) pairs (yocto_shape.cpp:272-281)."""
    cdf = sample_shape_cdf(shape)
    rng = _HostRng(seed)
    kind = shape_kind(shape)
    points = []
    for _ in range(num_samples):
        rn = rng.rand1f()
        ruv = rng.rand2f()
        element = _sample_discrete(cdf, rn)
        if kind == "points":
            uv = np.zeros(2, np.float32)
        elif kind == "lines":
            uv = np.array([ruv[0], 0], np.float32)
        elif kind == "triangles":
            s = np.sqrt(ruv[0])
            uv = np.array([1 - s, ruv[1] * s], np.float32)
        else:
            uv = ruv
        points.append((element, uv))
    return points


def eval_position(shape: ShapeData, element: int, uv) -> np.ndarray:
    kind = shape_kind(shape)
    p = shape.positions
    if kind == "points":
        return p[shape.points[element]]
    if kind == "lines":
        l = shape.lines[element]
        return p[l[0]] * (1 - uv[0]) + p[l[1]] * uv[0]
    if kind == "triangles":
        t = shape.triangles[element]
        return (p[t[0]] * (1 - uv[0] - uv[1]) + p[t[1]] * uv[0]
                + p[t[2]] * uv[1])
    q = shape.quads[element]
    if uv[0] + uv[1] <= 1:
        return (p[q[0]] * (1 - uv[0] - uv[1]) + p[q[1]] * uv[0]
                + p[q[3]] * uv[1])
    iu, iv = 1 - uv[0], 1 - uv[1]
    return p[q[2]] * (1 - iu - iv) + p[q[3]] * iu + p[q[1]] * iv


def _eval_attr(shape: ShapeData, attr: np.ndarray, element: int, uv):
    kind = shape_kind(shape)
    if kind == "points":
        return attr[shape.points[element]]
    if kind == "lines":
        l = shape.lines[element]
        return attr[l[0]] * (1 - uv[0]) + attr[l[1]] * uv[0]
    if kind == "triangles":
        t = shape.triangles[element]
        return (attr[t[0]] * (1 - uv[0] - uv[1]) + attr[t[1]] * uv[0]
                + attr[t[2]] * uv[1])
    q = shape.quads[element]
    if uv[0] + uv[1] <= 1:
        return (attr[q[0]] * (1 - uv[0] - uv[1]) + attr[q[1]] * uv[0]
                + attr[q[3]] * uv[1])
    iu, iv = 1 - uv[0], 1 - uv[1]
    return attr[q[2]] * (1 - iu - iv) + attr[q[3]] * iu + attr[q[1]] * iv


def eval_element_normal(shape: ShapeData, element: int) -> np.ndarray:
    kind = shape_kind(shape)
    p = shape.positions

    def norm(v):
        n = np.linalg.norm(v)
        return v / n if n else v

    if kind == "triangles":
        t = shape.triangles[element]
        return norm(np.cross(p[t[1]] - p[t[0]], p[t[2]] - p[t[0]]))
    if kind == "quads":
        q = shape.quads[element]
        na = norm(np.cross(p[q[1]] - p[q[0]], p[q[3]] - p[q[0]]))
        nb = norm(np.cross(p[q[3]] - p[q[2]], p[q[1]] - p[q[2]]))
        return norm(na + nb)
    if kind == "lines":
        l = shape.lines[element]
        return norm(p[l[1]] - p[l[0]])
    return np.array([0, 0, 1], np.float32)


def eval_normal(shape: ShapeData, element: int, uv) -> np.ndarray:
    if not len(shape.normals):
        return eval_element_normal(shape, element)
    n = _eval_attr(shape, shape.normals, element, uv)
    ln = np.linalg.norm(n)
    return n / ln if ln else n


def eval_texcoord(shape: ShapeData, element: int, uv):
    if not len(shape.texcoords):
        return np.asarray(uv, np.float32)
    return _eval_attr(shape, shape.texcoords, element, uv)


# ----------------------------------------------------------------------------
# Hair growth (yocto_shape.cpp:1264-1372)
# ----------------------------------------------------------------------------

def make_hair(base: ShapeData, steps=(8, 65536), length=(0.1, 0.1),
              rad=(0.001, 0.001), noise=(0.0, 10.0), clump=(0.0, 128.0),
              rotation=(0.0, 0.0), seed=7):
    from ..ops.noise import perlin_noise
    from .procedural import make_lines
    import jax.numpy as jnp

    points = sample_shape(base, steps[1], seed)
    bpos = np.stack([eval_position(base, e, uv) for e, uv in points])
    bnorm = np.stack([eval_normal(base, e, uv) for e, uv in points])

    rng = _HostRng(seed, 3)
    blen = np.array([length[0] + (length[1] - length[0]) * rng.rand1f()
                     for _ in range(len(bpos))], np.float32)

    cidx = np.zeros(len(bpos), np.int64)
    if clump[0] > 0:
        nc = int(clump[1])
        d = np.linalg.norm(bpos[:, None, :] - bpos[None, :nc, :], axis=2)
        cidx = d.argmin(axis=1)

    shape = make_lines(steps, (1, 1), (1, 1), (1, 1))
    u = shape.texcoords[:, 0]
    bidx = np.arange(len(shape.positions)) // (steps[0] + 1)
    shape.positions = (bpos[bidx] + bnorm[bidx] * (u * blen[bidx])[:, None]
                       ).astype(np.float32)
    shape.normals = bnorm[bidx].astype(np.float32)
    shape.radius = (rad[0] + (rad[1] - rad[0]) * u).astype(np.float32)
    if clump[0] > 0:
        target = shape.positions[
            (np.arange(len(shape.positions))
             + (cidx[bidx] - bidx) * (steps[0] + 1)).astype(np.int64)]
        shape.positions += ((target - shape.positions)
                            * (u * clump[0])[:, None]).astype(np.float32)
    if noise[0] > 0:
        p = jnp.asarray(shape.positions * noise[1])
        nx = (np.asarray(perlin_noise(p)) * 2 - 1) * noise[0]
        ny = (np.asarray(perlin_noise(p + jnp.asarray([3.0, 7, 11])))
              * 2 - 1) * noise[0]
        nz = (np.asarray(perlin_noise(p + jnp.asarray([13.0, 17, 19])))
              * 2 - 1) * noise[0]
        shape.positions = (shape.positions
                           + np.stack([nx, ny, nz], -1)).astype(np.float32)
    if clump[0] > 0 or noise[0] > 0 or rotation[0] > 0:
        shape.normals = lines_tangents(shape.lines, shape.positions)
    return shape


def make_hair2(base: ShapeData, steps=(8, 65536), length=(0.1, 0.1),
               rad=(0.001, 0.001), noise=0.0, gravity=0.001, seed=7):
    from .procedural import make_lines

    points = sample_shape(base, steps[1], seed)
    bpos = np.stack([eval_position(base, e, uv) for e, uv in points])
    bnorm = np.stack([eval_normal(base, e, uv) for e, uv in points])

    shape = make_lines(steps, (1, 1), (1, 1), rad)
    rng = _HostRng(seed)
    for idx in range(steps[1]):
        offset = idx * (steps[0] + 1)
        position = bpos[idx].copy()
        direction = bnorm[idx].copy()
        ln = rng.rand1f() * (length[1] - length[0]) + length[0]
        shape.positions[offset] = position
        for iidx in range(1, steps[0] + 1):
            p = position + direction * ln / steps[0]
            p = p + (2 * rng.rand3f() - 1) * noise
            p = p + np.array([0, -gravity, 0], np.float32)
            shape.positions[offset + iidx] = p
            d = p - position
            nd = np.linalg.norm(d)
            direction = d / nd if nd else d
            position = p
    shape.normals = lines_tangents(shape.lines, shape.positions)
    return shape
