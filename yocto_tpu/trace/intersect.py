"""Batched scene intersection (brute-force reference path).

The correctness-path intersector: every ray is tested against every
(instance, element) candidate pair in one vectorized sweep — the TPU
equivalent of looping the reference's primitive intersectors
(yocto_geometry.h:697-836) over the scene, with the BVH replaced by full
vectorization. This is the oracle used to validate the BVH traversal and is
fast enough for Cornell-box-class scenes (R x C elementwise work on the
VPU). `yocto_tpu.trace.bvh` provides the accelerated path.

Instance transforms may include scale: rays are transformed into instance
space WITHOUT renormalizing the direction, so the hit parameter t stays a
world-space distance (same convention as intersect_scene_bvh,
yocto_bvh.cpp:602).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import geometry as G
from ..ops import mathops as M
from .compile import FlatScene, KIND_LINES, KIND_POINTS

RAY_EPS = jnp.float32(1e-4)


class SceneIntersection(NamedTuple):
    hit: jax.Array       # [R] bool
    instance: jax.Array  # [R] i32
    element: jax.Array   # [R] i32 (shape-local element index)
    uv: jax.Array        # [R,2]
    distance: jax.Array  # [R] f32 (flt_max on miss)


def _intersect_element(local_o, local_d, tmin, tmax, p, rads, kind,
                       kinds=None):
    """Intersect one unified element per lane; p: [...,4,3], rads: [...,4].

    kind selects quad (tris stored as degenerate quads), line, or point.
    `kinds` (static tuple of KIND_* present in the scene) drops the
    intersectors no candidate can need — bit-identical specialization.
    """
    p0, p1, p2, p3 = p[..., 0, :], p[..., 1, :], p[..., 2, :], p[..., 3, :]
    if kinds is None:
        kinds = (KIND_POINTS, KIND_LINES, 2, 3)
    has_surface = (2 in kinds) or (3 in kinds)  # triangles or quads
    has_line = KIND_LINES in kinds
    has_pt = KIND_POINTS in kinds

    hit = uv = dist = None
    if has_surface:
        isec = G.intersect_quad(local_o, local_d, tmin, tmax, p0, p1, p2, p3)
        hit, uv, dist = isec.hit, isec.uv, isec.dist
    if has_line:
        isec_line = G.intersect_line(local_o, local_d, tmin, tmax, p0, p1,
                                     rads[..., 0], rads[..., 1])
        if hit is None:
            hit, uv, dist = isec_line.hit, isec_line.uv, isec_line.dist
        else:
            is_line = kind == KIND_LINES
            hit = jnp.where(is_line, isec_line.hit, hit)
            uv = jnp.where(is_line[..., None], isec_line.uv, uv)
            dist = jnp.where(is_line, isec_line.dist, dist)
    if has_pt:
        isec_pt = G.intersect_point(local_o, local_d, tmin, tmax, p0,
                                    rads[..., 0])
        if hit is None:
            hit, uv, dist = isec_pt.hit, isec_pt.uv, isec_pt.dist
        else:
            is_pt = kind == KIND_POINTS
            hit = jnp.where(is_pt, isec_pt.hit, hit)
            uv = jnp.where(is_pt[..., None], isec_pt.uv, uv)
            dist = jnp.where(is_pt, isec_pt.dist, dist)
    return hit, uv, dist


def intersect_scene_bruteforce(scene: FlatScene, ro, rd,
                               tmin=RAY_EPS, tmax=M.flt_max,
                               kinds=None) -> SceneIntersection:
    """Closest hit over all candidates; ro/rd: [R,3]."""
    inv = scene.inst_inv_frame[scene.cand_inst]     # [C,4,3]
    verts = scene.elements[scene.cand_elem]         # [C,4]
    p = scene.positions[verts]                      # [C,4,3]
    rads = scene.radius[verts]                      # [C,4]
    shape = scene.inst_shape[scene.cand_inst]
    kind = scene.shape_kind[shape]                  # [C]

    local_o = (ro[:, None, 0:1] * inv[None, :, 0, :]
               + ro[:, None, 1:2] * inv[None, :, 1, :]
               + ro[:, None, 2:3] * inv[None, :, 2, :]
               + inv[None, :, 3, :])                            # [R,C,3]
    local_d = (rd[:, None, 0:1] * inv[None, :, 0, :]
               + rd[:, None, 1:2] * inv[None, :, 1, :]
               + rd[:, None, 2:3] * inv[None, :, 2, :])
    def per_ray(v):
        v = jnp.asarray(v, jnp.float32)
        if v.ndim == 1:  # per-lane bound -> broadcast over candidates
            v = v[:, None]
        return jnp.broadcast_to(v, local_o.shape[:-1])

    tmin_b = per_ray(tmin)
    tmax_b = per_ray(tmax)

    hit, uv, dist = _intersect_element(
        local_o, local_d, tmin_b, tmax_b, p[None], rads[None], kind[None],
        kinds=kinds)

    best = jnp.argmin(dist, axis=-1)                # [R]
    best_hit = jnp.take_along_axis(hit, best[:, None], axis=1)[:, 0]
    best_uv = jnp.take_along_axis(
        uv, best[:, None, None], axis=1)[:, 0]
    best_dist = jnp.take_along_axis(dist, best[:, None], axis=1)[:, 0]
    inst = scene.cand_inst[best]
    gelem = scene.cand_elem[best]
    # convert to shape-local element index (reference reports local ids)
    elem_local = gelem - scene.shape_elem_start[scene.inst_shape[inst]]
    return SceneIntersection(
        hit=best_hit,
        instance=jnp.where(best_hit, inst, -1),
        element=jnp.where(best_hit, elem_local, -1),
        uv=jnp.where(best_hit[..., None], best_uv, 0.0),
        distance=jnp.where(best_hit, best_dist, M.flt_max))


def intersect_instance_elements(scene: FlatScene, instance, ro, rd,
                                max_elems: int, tmin=RAY_EPS,
                                tmax=M.flt_max) -> SceneIntersection:
    """Closest hit against a single instance per lane.

    `instance`: [R] i32 (may differ per lane); `max_elems` is a static upper
    bound on the instance's element count (host-computed). Used by the
    light-pdf walk (yocto_trace.cpp:400-415 equivalent).
    """
    shape = scene.inst_shape[instance]
    start = scene.shape_elem_start[shape]           # [R]
    count = scene.shape_elem_count[shape]           # [R]
    kind = scene.shape_kind[shape]                  # [R]
    inv = scene.inst_inv_frame[instance]            # [R,4,3]
    local_o = (ro[..., 0:1] * inv[..., 0, :]
               + ro[..., 1:2] * inv[..., 1, :]
               + ro[..., 2:3] * inv[..., 2, :] + inv[..., 3, :])
    local_d = (rd[..., 0:1] * inv[..., 0, :]
               + rd[..., 1:2] * inv[..., 1, :]
               + rd[..., 2:3] * inv[..., 2, :])

    ks = jnp.arange(max_elems, dtype=jnp.int32)     # [K]
    gelem = start[:, None] + jnp.minimum(ks[None, :], count[:, None] - 1)
    valid = ks[None, :] < count[:, None]            # [R,K]
    verts = scene.elements[gelem]                   # [R,K,4]
    p = scene.positions[verts]                      # [R,K,4,3]
    rads = scene.radius[verts]
    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), gelem.shape)
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), gelem.shape)
    hit, uv, dist = _intersect_element(
        local_o[:, None], local_d[:, None], tmin_b, tmax_b, p, rads,
        kind[:, None])
    hit = hit & valid
    dist = jnp.where(hit, dist, M.flt_max)
    best = jnp.argmin(dist, axis=-1)
    best_hit = jnp.take_along_axis(hit, best[:, None], axis=1)[:, 0]
    best_uv = jnp.take_along_axis(uv, best[:, None, None], axis=1)[:, 0]
    best_dist = jnp.take_along_axis(dist, best[:, None], axis=1)[:, 0]
    return SceneIntersection(
        hit=best_hit,
        instance=jnp.where(best_hit, instance, -1),
        element=jnp.where(best_hit, best, -1),
        uv=jnp.where(best_hit[..., None], best_uv, 0.0),
        distance=jnp.where(best_hit, best_dist, M.flt_max))


def overlap_scene_bruteforce(scene: FlatScene, pos, dist_max,
                             kinds=None) -> SceneIntersection:
    """Closest-primitive point-overlap query over all candidates
    (overlap_scene_bvh semantics, yocto_bvh.cpp:638-781: the query point
    is transformed into each instance's frame with the non-rigid inverse
    and distances compare in local space, like the reference).
    pos: [R,3]; dist_max: scalar or [R]."""
    inv = scene.inst_inv_frame[scene.cand_inst]     # [C,4,3]
    verts = scene.elements[scene.cand_elem]         # [C,4]
    p = scene.positions[verts]                      # [C,4,3]
    rads = scene.radius[verts]                      # [C,4]
    shape = scene.inst_shape[scene.cand_inst]
    kind = scene.shape_kind[shape]                  # [C]
    if kinds is None:
        kinds = (KIND_POINTS, KIND_LINES, 2, 3)

    local_p = (pos[:, None, 0:1] * inv[None, :, 0, :]
               + pos[:, None, 1:2] * inv[None, :, 1, :]
               + pos[:, None, 2:3] * inv[None, :, 2, :]
               + inv[None, :, 3, :])                            # [R,C,3]
    dmax = jnp.broadcast_to(jnp.asarray(dist_max, jnp.float32),
                            (pos.shape[0],))[:, None]           # [R,1]
    p0, p1, p2, p3 = (p[None, :, k, :] for k in range(4))
    r0, r1, r2, r3 = (rads[None, :, k] for k in range(4))

    hit = uv = dist = None
    if (2 in kinds) or (3 in kinds):
        o = G.overlap_quad(local_p, dmax, p0, p1, p2, p3, r0, r1, r2, r3)
        hit, uv, dist = o.hit, o.uv, o.distance
    if KIND_LINES in kinds:
        ol = G.overlap_line(local_p, dmax, p0, p1, r0, r1)
        if hit is None:
            hit, uv, dist = ol.hit, ol.uv, ol.distance
        else:
            is_line = (kind == KIND_LINES)[None, :]
            hit = jnp.where(is_line, ol.hit, hit)
            uv = jnp.where(is_line[..., None], ol.uv, uv)
            dist = jnp.where(is_line, ol.distance, dist)
    if KIND_POINTS in kinds:
        op = G.overlap_point(local_p, dmax, p0, r0)
        if hit is None:
            hit, uv, dist = op.hit, op.uv, op.distance
        else:
            is_pt = (kind == KIND_POINTS)[None, :]
            hit = jnp.where(is_pt, op.hit, hit)
            uv = jnp.where(is_pt[..., None], op.uv, uv)
            dist = jnp.where(is_pt, op.distance, dist)

    dist = jnp.where(hit, dist, M.flt_max)
    best = jnp.argmin(dist, axis=-1)
    take = lambda a: jnp.take_along_axis(a, best[:, None], axis=1)[:, 0]
    bhit = take(hit)
    bdist = take(dist)
    buv = jnp.take_along_axis(uv, best[:, None, None], axis=1)[:, 0]
    binst = scene.cand_inst[best]
    gelem = scene.cand_elem[best]
    elem_local = gelem - scene.shape_elem_start[
        scene.inst_shape[binst]]
    return SceneIntersection(
        hit=bhit,
        instance=jnp.where(bhit, binst, -1),
        element=jnp.where(bhit, elem_local, -1),
        uv=jnp.where(bhit[:, None], buv, 0.0),
        distance=jnp.where(bhit, bdist, M.flt_max))
