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
