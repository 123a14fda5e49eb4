"""Batched ray/primitive geometry kernels.

TPU-native equivalents of the reference geometry layer (yocto_geometry.h in
xelatihy/yocto-gl): bounding boxes, interpolation, primitive properties, and
the ray-primitive intersectors that form the inner loop of the tracer
(yocto_geometry.h:697-852). All functions are elementwise over leading axes
so one call intersects a megabatch of rays; misses are encoded as
``hit=False, dist=flt_max`` so min-reductions compose.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .mathops import (cross, dot, flt_max, length, normalize, pif, vec)

RAY_EPS = 1e-4  # default ray tmin (yocto_geometry.h:125)


class PrimHit(NamedTuple):
    hit: jax.Array   # bool [...]
    uv: jax.Array    # f32 [..., 2]
    dist: jax.Array  # f32 [...]; flt_max on miss


def _miss_like(t):
    return jnp.full_like(t, flt_max)


# ----------------------------------------------------------------------------
# Interpolation (yocto_geometry.h:220-259)
# ----------------------------------------------------------------------------

def interpolate_line(p0, p1, u):
    u = jnp.asarray(u, jnp.float32)[..., None]
    return p0 * (1.0 - u) + p1 * u


def interpolate_triangle(p0, p1, p2, uv):
    u = uv[..., 0:1]
    v = uv[..., 1:2]
    return p0 * (1.0 - u - v) + p1 * u + p2 * v


def interpolate_quad(p0, p1, p2, p3, uv):
    """Quad bilinear via the two-triangle split (yocto_geometry.h:549-556)."""
    lower = (uv[..., 0] + uv[..., 1]) <= 1.0
    tri_a = interpolate_triangle(p0, p1, p3, uv)
    tri_b = interpolate_triangle(p2, p3, p1, 1.0 - uv)
    return jnp.where(lower[..., None], tri_a, tri_b)


def interpolate_bezier(p0, p1, p2, p3, u):
    u = jnp.asarray(u, jnp.float32)[..., None]
    return (p0 * (1 - u) ** 3 + 3 * p1 * u * (1 - u) ** 2
            + 3 * p2 * u * u * (1 - u) + p3 * u ** 3)


def interpolate_bezier_derivative(p0, p1, p2, p3, u):
    u = jnp.asarray(u, jnp.float32)[..., None]
    return ((p1 - p0) * 3 * (1 - u) ** 2 + (p2 - p1) * 6 * u * (1 - u)
            + (p3 - p2) * 3 * u ** 2)


# ----------------------------------------------------------------------------
# Primitive properties (yocto_geometry.h:508-654)
# ----------------------------------------------------------------------------

def line_tangent(p0, p1):
    return normalize(p1 - p0)


def line_length(p0, p1):
    return length(p1 - p0)


def triangle_normal(p0, p1, p2):
    return normalize(cross(p1 - p0, p2 - p0))


def triangle_area(p0, p1, p2):
    return length(cross(p1 - p0, p2 - p0)) / 2.0


def quad_normal(p0, p1, p2, p3):
    return normalize(triangle_normal(p0, p1, p3) + triangle_normal(p2, p3, p1))


def quad_area(p0, p1, p2, p3):
    return triangle_area(p0, p1, p3) + triangle_area(p2, p3, p1)


def triangle_tangents_fromuv(p0, p1, p2, uv0, uv1, uv2):
    """Tangent/bitangent from texcoords (yocto_geometry.h:623-643)."""
    p = p1 - p0
    q = p2 - p0
    sx = uv1[..., 0] - uv0[..., 0]
    sy = uv2[..., 0] - uv0[..., 0]
    tx = uv1[..., 1] - uv0[..., 1]
    ty = uv2[..., 1] - uv0[..., 1]
    div = sx * ty - sy * tx
    safe = jnp.where(div == 0.0, 1.0, div)[..., None]
    tu = (ty[..., None] * p - tx[..., None] * q) / safe
    tv = (sx[..., None] * q - sy[..., None] * p) / safe
    fallback_u = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0], jnp.float32), tu.shape)
    fallback_v = jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0], jnp.float32), tv.shape)
    bad = (div == 0.0)[..., None]
    return jnp.where(bad, fallback_u, tu), jnp.where(bad, fallback_v, tv)


# ----------------------------------------------------------------------------
# Ray-primitive intersection (yocto_geometry.h:697-852)
# ----------------------------------------------------------------------------

def intersect_point(ro, rd, tmin, tmax, p, r) -> PrimHit:
    """Approximate ray-point intersection (yocto_geometry.h:697-714)."""
    w = p - ro
    t = dot(w, rd) / dot(rd, rd)
    in_range = (t >= tmin) & (t <= tmax)
    rp = ro + rd * t[..., None]
    prp = p - rp
    hit = in_range & (dot(prp, prp) <= r * r)
    uv = jnp.zeros(t.shape + (2,), jnp.float32)
    return PrimHit(hit, uv, jnp.where(hit, t, _miss_like(t)))


def intersect_line(ro, rd, tmin, tmax, p0, p1, r0, r1) -> PrimHit:
    """Ray-line (capsule-ish) intersection (yocto_geometry.h:716-763)."""
    u = rd
    v = p1 - p0
    w = ro - p0
    a = dot(u, u)
    b = dot(u, v)
    c = dot(v, v)
    d = dot(u, w)
    e = dot(v, w)
    det = a * c - b * b
    safe_det = jnp.where(det == 0.0, 1.0, det)
    t = (b * e - c * d) / safe_det
    s = (a * e - b * d) / safe_det
    ok = (det != 0.0) & (t >= tmin) & (t <= tmax)
    s = jnp.clip(s, 0.0, 1.0)
    pr = ro + rd * t[..., None]
    pl = p0 + (p1 - p0) * s[..., None]
    prl = pr - pl
    d2 = dot(prl, prl)
    r = r0 * (1.0 - s) + r1 * s
    hit = ok & (d2 <= r * r)
    uv = jnp.stack(
        [s, jnp.sqrt(d2) / jnp.where(r == 0.0, 1.0, r)], axis=-1)
    return PrimHit(hit, jnp.where(hit[..., None], uv, 0.0),
                   jnp.where(hit, t, _miss_like(t)))


def intersect_sphere(ro, rd, tmin, tmax, p, r) -> PrimHit:
    """Ray-sphere (yocto_geometry.h:766-792): returns the *far* root if the
    near root is out of range, matching the reference's two-step check."""
    a = dot(rd, rd)
    b = 2.0 * dot(ro - p, rd)
    c = dot(ro - p, ro - p) - r * r
    dis = b * b - 4.0 * a * c
    has = dis >= 0.0
    sq = jnp.sqrt(jnp.maximum(dis, 0.0))
    t_near = (-b - sq) / (2.0 * a)
    t_far = (-b + sq) / (2.0 * a)
    # the reference requires BOTH roots in range and shades the far one
    near_ok = (t_near >= tmin) & (t_near <= tmax)
    far_ok = (t_far >= tmin) & (t_far <= tmax)
    t = t_far
    hit = has & near_ok & far_ok
    plocal = ((ro + rd * t[..., None]) - p) / jnp.asarray(r)[..., None]
    u = jnp.arctan2(plocal[..., 1], plocal[..., 0]) / (2.0 * pif)
    u = jnp.where(u < 0.0, u + 1.0, u)
    v = jnp.arccos(jnp.clip(plocal[..., 2], -1.0, 1.0)) / pif
    uv = jnp.stack([u, v], axis=-1)
    return PrimHit(hit, jnp.where(hit[..., None], uv, 0.0),
                   jnp.where(hit, t, _miss_like(t)))


def intersect_triangle(ro, rd, tmin, tmax, p0, p1, p2) -> PrimHit:
    """Moller-Trumbore with yocto's exact guards (yocto_geometry.h:794-826)."""
    edge1 = p1 - p0
    edge2 = p2 - p0
    pvec = cross(rd, edge2)
    det = dot(edge1, pvec)
    safe_det = jnp.where(det == 0.0, 1.0, det)
    inv_det = 1.0 / safe_det
    tvec = ro - p0
    u = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, edge1)
    v = dot(rd, qvec) * inv_det
    t = dot(edge2, qvec) * inv_det
    hit = ((det != 0.0) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
           & (u + v <= 1.0) & (t >= tmin) & (t <= tmax))
    uv = jnp.stack([u, v], axis=-1)
    return PrimHit(hit, jnp.where(hit[..., None], uv, 0.0),
                   jnp.where(hit, t, _miss_like(t)))


def intersect_quad(ro, rd, tmin, tmax, p0, p1, p2, p3) -> PrimHit:
    """Quad as two triangles with uv remap (yocto_geometry.h:828-836).

    Triangles stored as quads with p2 == p3 degrade to a single triangle
    automatically (the second triangle has a zero determinant).
    """
    isec1 = intersect_triangle(ro, rd, tmin, tmax, p0, p1, p3)
    isec2 = intersect_triangle(ro, rd, tmin, tmax, p2, p3, p1)
    isec2 = PrimHit(isec2.hit,
                    jnp.where(isec2.hit[..., None], 1.0 - isec2.uv, 0.0),
                    isec2.dist)
    take1 = isec1.dist < isec2.dist
    return PrimHit(jnp.where(take1, isec1.hit, isec2.hit),
                   jnp.where(take1[..., None], isec1.uv, isec2.uv),
                   jnp.minimum(isec1.dist, isec2.dist))


def intersect_bbox(ro, rd_inv, tmin, tmax, bbox_min, bbox_max):
    """Slab test with precomputed 1/d (yocto_geometry.h:841-852)."""
    it_min = (bbox_min - ro) * rd_inv
    it_max = (bbox_max - ro) * rd_inv
    lo = jnp.minimum(it_min, it_max)
    hi = jnp.maximum(it_min, it_max)
    t0 = jnp.maximum(
        jnp.maximum(jnp.maximum(lo[..., 0], lo[..., 1]), lo[..., 2]), tmin)
    t1 = jnp.minimum(
        jnp.minimum(jnp.minimum(hi[..., 0], hi[..., 1]), hi[..., 2]), tmax)
    return t0 <= t1 * 1.00000024


# ----------------------------------------------------------------------------
# Point-primitive distance queries (overlap; yocto_geometry.h:321-351)
# ----------------------------------------------------------------------------

def point_bbox_distance_check(pos, dist_max, bbox_min, bbox_max):
    closest = jnp.clip(pos, bbox_min, bbox_max)
    d2 = dot(closest - pos, closest - pos)
    return d2 <= dist_max * dist_max


class PrimOverlap(NamedTuple):
    """Point-primitive overlap result (prim_intersection analogue)."""

    hit: jnp.ndarray
    uv: jnp.ndarray
    distance: jnp.ndarray


def overlap_point(pos, dist_max, p, r):
    """yocto_geometry.h:874-880."""
    d2 = dot(pos - p, pos - p)
    hit = d2 <= (dist_max + r) * (dist_max + r)
    uv = jnp.zeros(pos.shape[:-1] + (2,), jnp.float32)
    return PrimOverlap(hit, uv, jnp.sqrt(d2))


def closestuv_line(pos, p0, p1):
    """yocto_geometry.h:883-892."""
    ab = p1 - p0
    d = dot(ab, ab)
    u = dot(pos - p0, ab) / jnp.where(d == 0.0, 1.0, d)
    return jnp.clip(u, 0.0, 1.0)


def overlap_line(pos, dist_max, p0, p1, r0, r1):
    """yocto_geometry.h:895-906."""
    u = closestuv_line(pos, p0, p1)
    p = p0 + (p1 - p0) * u[..., None]
    r = r0 + (r1 - r0) * u
    d2 = dot(pos - p, pos - p)
    hit = d2 <= (dist_max + r) * (dist_max + r)
    uv = jnp.stack([u, jnp.zeros_like(u)], axis=-1)
    return PrimOverlap(hit, uv, jnp.sqrt(d2))


def closestuv_triangle(pos, p0, p1, p2):
    """Closest point on a triangle in barycentric uv, with the
    reference's exact case cascade (yocto_geometry.h:908-950).
    Vectorized: later `where`s are applied first so the reference's
    earlier early-returns take precedence."""
    ab = p1 - p0
    ac = p2 - p0
    ap = pos - p0
    d1 = dot(ab, ap)
    d2 = dot(ac, ap)
    bp = pos - p1
    d3 = dot(ab, bp)
    d4 = dot(ac, bp)
    cp = pos - p2
    d5 = dot(ab, cp)
    d6 = dot(ac, cp)
    vc = d1 * d4 - d3 * d2
    vb = d5 * d2 - d1 * d6
    va = d3 * d6 - d5 * d4

    def safe(x):
        return jnp.where(x == 0.0, 1.0, x)

    zero = jnp.zeros_like(d1)
    one = jnp.ones_like(d1)
    denom = safe(va + vb + vc)
    u = vb / denom
    v = vc / denom
    w6 = (d4 - d3) / safe((d4 - d3) + (d5 - d6))
    cases = [
        ((d1 <= 0) & (d2 <= 0), zero, zero),
        ((d3 >= 0) & (d4 <= d3), one, zero),
        ((vc <= 0) & (d1 >= 0) & (d3 <= 0), d1 / safe(d1 - d3), zero),
        ((d6 >= 0) & (d5 <= d6), zero, one),
        ((vb <= 0) & (d2 >= 0) & (d6 <= 0), zero, d2 / safe(d2 - d6)),
        ((va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0), 1 - w6, w6),
    ]
    for cond, cu, cv in reversed(cases):
        u = jnp.where(cond, cu, u)
        v = jnp.where(cond, cv, v)
    return jnp.stack([u, v], axis=-1)


def overlap_triangle(pos, dist_max, p0, p1, p2, r0, r1, r2):
    """yocto_geometry.h:953-962."""
    cuv = closestuv_triangle(pos, p0, p1, p2)
    cu, cv = cuv[..., 0], cuv[..., 1]
    p = (p0 * (1 - cu - cv)[..., None] + p1 * cu[..., None]
         + p2 * cv[..., None])
    r = r0 * (1 - cu - cv) + r1 * cu + r2 * cv
    dd = dot(p - pos, p - pos)
    hit = dd <= (dist_max + r) * (dist_max + r)
    return PrimOverlap(hit, cuv, jnp.sqrt(dd))


def overlap_quad(pos, dist_max, p0, p1, p2, p3, r0, r1, r2, r3):
    """Split-quad overlap with degenerate fallback
    (yocto_geometry.h:965-975)."""
    isec1 = overlap_triangle(pos, dist_max, p0, p1, p3, r0, r1, r2)
    isec2 = overlap_triangle(pos, dist_max, p2, p3, p1, r2, r3, r1)
    degenerate = jnp.all(p2 == p3, axis=-1)
    d1 = jnp.where(isec1.hit, isec1.distance, flt_max)
    d2 = jnp.where(isec2.hit, isec2.distance, flt_max)
    take1 = degenerate | (d1 < d2)
    return PrimOverlap(
        hit=jnp.where(take1, isec1.hit, isec2.hit),
        uv=jnp.where(take1[..., None], isec1.uv, 1.0 - isec2.uv),
        distance=jnp.where(take1, isec1.distance, isec2.distance))
