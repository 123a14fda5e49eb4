"""Procedural shape generators (host NumPy).

Equivalents of the reference's ~40 shape makers (yocto_shape.cpp:545-1460):
rects/boxes/spheres/disks/cylinders (plus bulged/rounded/capped/bent
variants), floors, uv-parameterized solids, geodesic spheres, Suzanne
(from a bundled asset), line/point sets, face-varying primitives, and the
hair grower. Defaults mirror the reference signatures.
"""

from __future__ import annotations

import os

import numpy as np

from ..ops.rng import np_advance, np_make_rng
from .shape import FvShapeData, ShapeData, compute_normals
from .subdivide import subdivide_quads, subdivide_triangles

PIF = float(np.pi)


def merge_shape(shape: ShapeData, other: ShapeData) -> None:
    """In-place merge (yocto_shape.cpp:575-600)."""
    off = len(shape.positions)

    def cat(a, b):
        return np.concatenate([a, b]) if len(a) or len(b) else a

    if len(other.points):
        shape.points = cat(shape.points, other.points + off)
    if len(other.lines):
        shape.lines = cat(shape.lines, other.lines + off)
    if len(other.triangles):
        shape.triangles = cat(shape.triangles, other.triangles + off)
    if len(other.quads):
        shape.quads = cat(shape.quads, other.quads + off)
    shape.positions = cat(shape.positions, other.positions)
    shape.normals = cat(shape.normals, other.normals)
    shape.texcoords = cat(shape.texcoords, other.texcoords)
    shape.colors = cat(shape.colors, other.colors)
    shape.radius = cat(shape.radius, other.radius)
    shape.tangents = cat(shape.tangents, other.tangents)


def _grid_uv(steps):
    sx, sy = steps
    j, i = np.meshgrid(np.arange(sy + 1), np.arange(sx + 1), indexing="ij")
    return (i / sx).astype(np.float32), (j / sy).astype(np.float32)


def make_rect(steps=(1, 1), scale=(1.0, 1.0), uvscale=(1.0, 1.0)):
    """Quad grid in the xy plane (make_quads, yocto_shape.cpp:545-573)."""
    sx, sy = steps
    u, v = _grid_uv(steps)
    pos = np.stack([(2 * u - 1) * scale[0], (2 * v - 1) * scale[1],
                    np.zeros_like(u)], -1).reshape(-1, 3)
    nrm = np.tile(np.array([0, 0, 1], np.float32), (len(pos), 1))
    tc = np.stack([u * uvscale[0], (1 - v) * uvscale[1]], -1).reshape(-1, 2)
    j, i = np.meshgrid(np.arange(sy), np.arange(sx), indexing="ij")
    q0 = j * (sx + 1) + i
    quads = np.stack([q0, q0 + 1, q0 + sx + 2, q0 + sx + 1],
                     -1).reshape(-1, 4)
    return ShapeData(positions=pos.astype(np.float32), normals=nrm,
                     texcoords=tc.astype(np.float32),
                     quads=quads.astype(np.int32))


def make_bulged_rect(steps=(1, 1), scale=(1.0, 1.0), uvscale=(1.0, 1.0),
                     height=0.3):
    shape = make_rect(steps, scale, uvscale)
    if height != 0:
        height = min(height, min(scale))
        radius = (1 + height * height) / (2 * height)
        center = np.array([0, 0, -radius + height], np.float32)
        pn = shape.positions - center
        pn /= np.linalg.norm(pn, axis=1, keepdims=True)
        shape.positions = center + pn * radius
        shape.normals = pn.astype(np.float32)
    return shape


def _to_y(shape: ShapeData) -> ShapeData:
    p = shape.positions
    shape.positions = np.stack([p[:, 0], p[:, 2], -p[:, 1]], -1)
    n = shape.normals
    shape.normals = np.stack([n[:, 0], n[:, 2], n[:, 1]], -1)
    return shape


def make_recty(steps=(1, 1), scale=(1.0, 1.0), uvscale=(1.0, 1.0)):
    return _to_y(make_rect(steps, scale, uvscale))


def make_bulged_recty(steps=(1, 1), scale=(1.0, 1.0), uvscale=(1.0, 1.0),
                      height=0.3):
    return _to_y(make_bulged_rect(steps, scale, uvscale, height))


def make_box(steps=(1, 1, 1), scale=(1.0, 1.0, 1.0),
             uvscale=(1.0, 1.0, 1.0)):
    """Box from six rects (yocto_shape.cpp:640-686)."""
    shape = ShapeData()
    sx, sy, sz = steps
    cx, cy, cz = scale
    ux, uy, uz = uvscale
    # +z
    q = make_rect((sx, sy), (cx, cy), (ux, uy))
    q.positions[:, 2] = cz
    q.normals[:] = [0, 0, 1]
    merge_shape(shape, q)
    # -z
    q = make_rect((sx, sy), (cx, cy), (ux, uy))
    q.positions = np.stack([-q.positions[:, 0], q.positions[:, 1],
                            np.full(len(q.positions), -cz, np.float32)], -1)
    q.normals[:] = [0, 0, -1]
    merge_shape(shape, q)
    # +x
    q = make_rect((sz, sy), (cz, cy), (uz, uy))
    q.positions = np.stack([np.full(len(q.positions), cx, np.float32),
                            q.positions[:, 1], -q.positions[:, 0]], -1)
    q.normals[:] = [1, 0, 0]
    merge_shape(shape, q)
    # -x
    q = make_rect((sz, sy), (cz, cy), (uz, uy))
    q.positions = np.stack([np.full(len(q.positions), -cx, np.float32),
                            q.positions[:, 1], q.positions[:, 0]], -1)
    q.normals[:] = [-1, 0, 0]
    merge_shape(shape, q)
    # +y
    q = make_rect((sx, sz), (cx, cz), (ux, uz))
    q.positions = np.stack([q.positions[:, 0],
                            np.full(len(q.positions), cy, np.float32),
                            -q.positions[:, 1]], -1)
    q.normals[:] = [0, 1, 0]
    merge_shape(shape, q)
    # -y
    q = make_rect((sx, sz), (cx, cz), (ux, uz))
    q.positions = np.stack([q.positions[:, 0],
                            np.full(len(q.positions), -cy, np.float32),
                            q.positions[:, 1]], -1)
    q.normals[:] = [0, -1, 0]
    merge_shape(shape, q)
    return shape


def make_rounded_box(steps=(1, 1, 1), scale=(1.0, 1.0, 1.0),
                     uvscale=(1.0, 1.0, 1.0), radius=0.3):
    shape = make_box(steps, scale, uvscale)
    if radius != 0:
        radius = min(radius, min(scale))
        c = np.asarray(scale, np.float32) - radius
        pc = np.abs(shape.positions)
        ps = np.where(shape.positions < 0, -1.0, 1.0).astype(np.float32)
        for i in range(len(shape.positions)):
            if (pc[i] >= c).all():
                pn = pc[i] - c
                pn /= np.linalg.norm(pn)
                shape.positions[i] = c + radius * pn
                shape.normals[i] = pn
            elif pc[i][0] >= c[0] and pc[i][1] >= c[1]:
                pn = (pc[i] - c) * [1, 1, 0]
                pn /= np.linalg.norm(pn)
                shape.positions[i] = [c[0] + radius * pn[0],
                                      c[1] + radius * pn[1], pc[i][2]]
                shape.normals[i] = pn
            elif pc[i][0] >= c[0] and pc[i][2] >= c[2]:
                pn = (pc[i] - c) * [1, 0, 1]
                pn /= np.linalg.norm(pn)
                shape.positions[i] = [c[0] + radius * pn[0], pc[i][1],
                                      c[2] + radius * pn[2]]
                shape.normals[i] = pn
            elif pc[i][1] >= c[1] and pc[i][2] >= c[2]:
                pn = (pc[i] - c) * [0, 1, 1]
                pn /= np.linalg.norm(pn)
                shape.positions[i] = [pc[i][0], c[1] + radius * pn[1],
                                      c[2] + radius * pn[2]]
                shape.normals[i] = pn
            else:
                continue
            shape.positions[i] *= ps[i]
            shape.normals[i] *= ps[i]
    return shape


def make_rect_stack(steps=(1, 1, 1), scale=(1.0, 1.0, 1.0),
                    uvscale=(1.0, 1.0)):
    shape = ShapeData()
    for i in range(steps[2] + 1):
        q = make_rect(steps[:2], scale[:2], uvscale)
        q.positions[:, 2] = (-1 + 2 * i / steps[2]) * scale[2]
        merge_shape(shape, q)
    return shape


def make_floor(steps=(1, 1), scale=(10.0, 10.0), uvscale=(10.0, 10.0)):
    shape = make_rect(steps, scale, uvscale)
    p = shape.positions
    shape.positions = np.stack([p[:, 0], p[:, 2], -p[:, 1]], -1)
    n = shape.normals
    shape.normals = np.stack([n[:, 0], n[:, 2], n[:, 1]], -1)
    return shape


def make_bent_floor(steps=(1, 1), scale=(10.0, 10.0), uvscale=(10.0, 10.0),
                    radius=0.5):
    shape = make_floor(steps, scale, uvscale)
    if radius != 0:
        radius = min(radius, scale[1])
        start = (scale[1] - radius) / 2
        end = start + radius
        p = shape.positions
        z = p[:, 2]
        # z < -end: wall
        wall = z < -end
        bend = (z < -start) & ~wall
        phi = (PIF / 2) * (-z - start) / radius
        shape.positions = np.where(
            wall[:, None],
            np.stack([p[:, 0], -z - end + radius,
                      np.full_like(z, -end)], -1),
            np.where(bend[:, None],
                     np.stack([p[:, 0], -np.cos(phi) * radius + radius,
                               -np.sin(phi) * radius - start], -1), p))
        shape.normals = np.where(
            wall[:, None], np.array([0, 0, 1], np.float32),
            np.where(bend[:, None],
                     np.stack([np.zeros_like(phi), np.cos(phi),
                               np.sin(phi)], -1).astype(np.float32),
                     shape.normals))
    return shape


def make_sphere(steps=32, scale=1.0, uvscale=1.0):
    """Cube-to-sphere projection (yocto_shape.cpp:770-779)."""
    shape = make_box((steps, steps, steps), (scale,) * 3, (uvscale,) * 3)
    p = shape.positions / np.linalg.norm(shape.positions, axis=1,
                                         keepdims=True)
    shape.positions = (p * scale).astype(np.float32)
    shape.normals = p.astype(np.float32)
    return shape


def make_uvsphere(steps=(64, 32), scale=1.0, uvscale=(1.0, 1.0)):
    shape = make_rect(steps, (1, 1))
    uv = shape.texcoords.copy()
    # undo the rect's v-flip: rect texcoords store (u, 1-v)
    a = np.stack([2 * PIF * uv[:, 0], PIF * (1 - uv[:, 1])], -1)
    shape.positions = (np.stack(
        [np.cos(a[:, 0]) * np.sin(a[:, 1]),
         np.sin(a[:, 0]) * np.sin(a[:, 1]),
         np.cos(a[:, 1])], -1) * scale).astype(np.float32)
    shape.normals = shape.positions / np.linalg.norm(
        shape.positions, axis=1, keepdims=True)
    shape.texcoords = (uv * np.asarray(uvscale, np.float32)).astype(
        np.float32)
    return shape


def _swap_yz(shape: ShapeData) -> ShapeData:
    p = shape.positions
    shape.positions = np.stack([p[:, 0], p[:, 2], p[:, 1]], -1)
    n = shape.normals
    shape.normals = np.stack([n[:, 0], n[:, 2], n[:, 1]], -1)
    tc = shape.texcoords
    shape.texcoords = np.stack([tc[:, 0], 1 - tc[:, 1]], -1)
    q = shape.quads
    shape.quads = np.stack([q[:, 0], q[:, 3], q[:, 2], q[:, 1]], -1)
    return shape


def make_uvspherey(steps=(64, 32), scale=1.0, uvscale=(1.0, 1.0)):
    return _swap_yz(make_uvsphere(steps, scale, uvscale))


def make_capped_uvsphere(steps=(64, 32), scale=1.0, uvscale=(1.0, 1.0),
                         cap=0.3):
    shape = make_uvsphere(steps, scale, uvscale)
    if cap != 0:
        cap = min(cap, scale / 2)
        zflip = scale - cap
        p = shape.positions
        n = shape.normals
        hi = p[:, 2] > zflip
        lo = p[:, 2] < -zflip
        p[:, 2] = np.where(hi, 2 * zflip - p[:, 2], p[:, 2])
        p[:, 2] = np.where(lo, -2 * zflip - p[:, 2], p[:, 2])
        flip = hi | lo
        n[:, 0] = np.where(flip, -n[:, 0], n[:, 0])
        n[:, 1] = np.where(flip, -n[:, 1], n[:, 1])
    return shape


def make_capped_uvspherey(steps=(64, 32), scale=1.0, uvscale=(1.0, 1.0),
                          cap=0.3):
    return _swap_yz(make_capped_uvsphere(steps, scale, uvscale, cap))


def make_disk(steps=32, scale=1.0, uvscale=1.0):
    shape = make_rect((steps, steps), (1, 1), (uvscale, uvscale))
    xy = shape.positions[:, :2]
    uv = np.stack([xy[:, 0] * np.sqrt(1 - xy[:, 1] ** 2 / 2),
                   xy[:, 1] * np.sqrt(1 - xy[:, 0] ** 2 / 2)], -1)
    shape.positions = np.concatenate(
        [uv * scale, np.zeros((len(uv), 1), np.float32)],
        axis=1).astype(np.float32)
    return shape


def make_bulged_disk(steps=32, scale=1.0, uvscale=1.0, height=0.3):
    shape = make_disk(steps, scale, uvscale)
    if height != 0:
        height = min(height, scale)
        radius = (1 + height * height) / (2 * height)
        center = np.array([0, 0, -radius + height], np.float32)
        pn = shape.positions - center
        pn /= np.linalg.norm(pn, axis=1, keepdims=True)
        shape.positions = (center + pn * radius).astype(np.float32)
        shape.normals = pn.astype(np.float32)
    return shape


def make_uvdisk(steps=(32, 16), scale=1.0, uvscale=(1.0, 1.0)):
    shape = make_rect(steps, (1, 1), (1, 1))
    uv = shape.texcoords.copy()
    phi = 2 * PIF * uv[:, 0]
    shape.positions = (np.stack(
        [np.cos(phi) * uv[:, 1], np.sin(phi) * uv[:, 1],
         np.zeros_like(phi)], -1) * scale).astype(np.float32)
    shape.normals = np.tile(np.array([0, 0, 1], np.float32),
                            (len(uv), 1))
    shape.texcoords = (uv * np.asarray(uvscale, np.float32)).astype(
        np.float32)
    return shape


def make_uvcylinder(steps=(64, 32, 16), scale=(1.0, 1.0),
                    uvscale=(1.0, 1.0, 1.0)):
    shape = ShapeData()
    # side
    q = make_rect((steps[0], steps[1]), (1, 1), (1, 1))
    uv = q.texcoords.copy()
    phi = 2 * PIF * uv[:, 0]
    q.positions = np.stack([np.cos(phi) * scale[0], np.sin(phi) * scale[0],
                            (2 * uv[:, 1] - 1) * scale[1]], -1).astype(
                                np.float32)
    q.normals = np.stack([np.cos(phi), np.sin(phi),
                          np.zeros_like(phi)], -1).astype(np.float32)
    q.texcoords = (uv * [uvscale[0], uvscale[1]]).astype(np.float32)
    q.quads = q.quads[:, [0, 3, 2, 1]]
    merge_shape(shape, q)
    # top
    q = make_rect((steps[0], steps[2]), (1, 1), (1, 1))
    uv = q.texcoords.copy()
    phi = 2 * PIF * uv[:, 0]
    q.positions = np.stack([np.cos(phi) * uv[:, 1] * scale[0],
                            np.sin(phi) * uv[:, 1] * scale[0],
                            np.full_like(phi, scale[1])], -1).astype(
                                np.float32)
    q.normals = np.tile(np.array([0, 0, 1], np.float32), (len(uv), 1))
    q.texcoords = (uv * [uvscale[0], uvscale[2]]).astype(np.float32)
    merge_shape(shape, q)
    # bottom
    q = make_rect((steps[0], steps[2]), (1, 1), (1, 1))
    uv = q.texcoords.copy()
    phi = 2 * PIF * uv[:, 0]
    q.positions = np.stack([np.cos(phi) * uv[:, 1] * scale[0],
                            np.sin(phi) * uv[:, 1] * scale[0],
                            np.full_like(phi, -scale[1])], -1).astype(
                                np.float32)
    q.normals = np.tile(np.array([0, 0, -1], np.float32), (len(uv), 1))
    q.texcoords = (uv * [uvscale[0], uvscale[2]]).astype(np.float32)
    q.quads = q.quads[:, [2, 1, 0, 3]]
    merge_shape(shape, q)
    return shape


def make_rounded_uvcylinder(steps=(64, 32, 16), scale=(1.0, 1.0),
                            uvscale=(1.0, 1.0, 1.0), radius=0.3):
    shape = make_uvcylinder(steps, scale, uvscale)
    if radius != 0:
        radius = min(radius, min(scale))
        c = np.asarray(scale, np.float32) - radius
        p = shape.positions
        phi = np.arctan2(p[:, 1], p[:, 0])
        r = np.linalg.norm(p[:, :2], axis=1)
        z = p[:, 2]
        pc = np.stack([r, np.abs(z)], -1)
        ps = np.where(z < 0, -1.0, 1.0)
        sel = (pc[:, 0] >= c[0]) & (pc[:, 1] >= c[1])
        pn = pc - c
        pn = pn / np.maximum(np.linalg.norm(pn, axis=1, keepdims=True),
                             1e-20)
        newp = np.stack([np.cos(phi) * (c[0] + radius * pn[:, 0]),
                         np.sin(phi) * (c[0] + radius * pn[:, 0]),
                         ps * (c[1] + radius * pn[:, 1])], -1)
        newn = np.stack([np.cos(phi) * pn[:, 0], np.sin(phi) * pn[:, 0],
                         ps * pn[:, 1]], -1)
        shape.positions = np.where(sel[:, None], newp, p).astype(np.float32)
        shape.normals = np.where(sel[:, None], newn,
                                 shape.normals).astype(np.float32)
    return shape


def make_uvcapsule(steps=(64, 32, 16), scale=(1.0, 1.0),
                   uvscale=(1.0, 1.0, 1.0)):
    """Capsule: cylinder with hemispherical caps."""
    shape = ShapeData()
    q = make_rect((steps[0], steps[1]), (1, 1), (1, 1))
    uv = q.texcoords.copy()
    phi = 2 * PIF * uv[:, 0]
    q.positions = np.stack([np.cos(phi) * scale[0], np.sin(phi) * scale[0],
                            (2 * uv[:, 1] - 1) * scale[1]], -1).astype(
                                np.float32)
    q.normals = np.stack([np.cos(phi), np.sin(phi),
                          np.zeros_like(phi)], -1).astype(np.float32)
    q.texcoords = (uv * [uvscale[0], uvscale[1]]).astype(np.float32)
    q.quads = q.quads[:, [0, 3, 2, 1]]
    merge_shape(shape, q)
    for sign in (1.0, -1.0):
        q = make_rect((steps[0], steps[2]), (1, 1), (1, 1))
        uv = q.texcoords.copy()
        phi = 2 * PIF * uv[:, 0]
        theta = (PIF / 2) * uv[:, 1]
        q.positions = np.stack(
            [np.cos(phi) * np.cos(theta) * scale[0],
             np.sin(phi) * np.cos(theta) * scale[0],
             sign * (np.sin(theta) * scale[0] + scale[1])], -1).astype(
                 np.float32)
        q.normals = np.stack(
            [np.cos(phi) * np.cos(theta), np.sin(phi) * np.cos(theta),
             sign * np.sin(theta)], -1).astype(np.float32)
        q.texcoords = (uv * [uvscale[0], uvscale[2]]).astype(np.float32)
        if sign < 0:
            q.quads = q.quads[:, [0, 3, 2, 1]]
        merge_shape(shape, q)
    return shape


make_capsule = make_uvcapsule


def make_uvcone(steps=(64, 32, 16), scale=(1.0, 1.0),
                uvscale=(1.0, 1.0, 1.0)):
    shape = ShapeData()
    q = make_rect((steps[0], steps[1]), (1, 1), (1, 1))
    uv = q.texcoords.copy()
    phi = 2 * PIF * uv[:, 0]
    r = 1 - uv[:, 1]
    q.positions = np.stack([np.cos(phi) * r * scale[0],
                            np.sin(phi) * r * scale[0],
                            (2 * uv[:, 1] - 1) * scale[1]], -1).astype(
                                np.float32)
    nl = np.sqrt(scale[0] ** 2 + scale[1] ** 2)
    q.normals = np.stack(
        [np.cos(phi) * scale[1] / nl, np.sin(phi) * scale[1] / nl,
         np.full_like(phi, scale[0] / nl)], -1).astype(np.float32)
    q.quads = q.quads[:, [0, 3, 2, 1]]
    merge_shape(shape, q)
    # bottom cap
    q = make_rect((steps[0], steps[2]), (1, 1), (1, 1))
    uv = q.texcoords.copy()
    phi = 2 * PIF * uv[:, 0]
    q.positions = np.stack([np.cos(phi) * uv[:, 1] * scale[0],
                            np.sin(phi) * uv[:, 1] * scale[0],
                            np.full_like(phi, -scale[1])], -1).astype(
                                np.float32)
    q.normals = np.tile(np.array([0, 0, -1], np.float32), (len(uv), 1))
    q.quads = q.quads[:, [2, 1, 0, 3]]
    merge_shape(shape, q)
    return shape


make_cone = make_uvcone


def make_lines(steps=(4, 65536), scale=(1.0, 1.0), uvscale=(1.0, 1.0),
               rad=(0.001, 0.001)):
    """Line set along a quad (yocto_shape.cpp:950-998)."""
    sx, sy = steps
    npts = (sx + 1) * sy
    shape = ShapeData()
    if sy > 1:
        j, i = np.meshgrid(np.arange(sy), np.arange(sx + 1), indexing="ij")
        u = (i / sx).astype(np.float32)
        v = (j / (sy - 1)).astype(np.float32)
    else:
        i = np.arange(sx + 1)
        u = (i / sx).astype(np.float32)
        v = np.zeros_like(u)
    u = u.reshape(-1)
    v = v.reshape(-1)
    shape.positions = np.stack(
        [(u - 0.5) * scale[0], (v - 0.5) * scale[1] if sy > 1
         else np.zeros_like(u), np.zeros_like(u)], -1).astype(np.float32)
    shape.normals = np.tile(np.array([1, 0, 0], np.float32), (npts, 1))
    shape.texcoords = np.stack([u * uvscale[0], v * uvscale[1]],
                               -1).astype(np.float32)
    shape.radius = (rad[0] * (1 - u) + rad[1] * u).astype(np.float32)
    j, i = np.meshgrid(np.arange(sy), np.arange(sx), indexing="ij")
    l0 = j * (sx + 1) + i
    shape.lines = np.stack([l0, l0 + 1], -1).reshape(-1, 2).astype(np.int32)
    return shape


def make_point(radius=0.001):
    return ShapeData(
        points=np.array([0], np.int32),
        positions=np.zeros((1, 3), np.float32),
        normals=np.array([[0, 0, 1]], np.float32),
        texcoords=np.zeros((1, 2), np.float32),
        radius=np.array([radius], np.float32))


def make_points(num=65536, uvscale=1.0, radius=0.001):
    shape = ShapeData()
    shape.points = np.arange(num, dtype=np.int32)
    shape.positions = np.zeros((num, 3), np.float32)
    shape.normals = np.tile(np.array([0, 0, 1], np.float32), (num, 1))
    shape.texcoords = np.stack(
        [np.arange(num, dtype=np.float32) / num, np.zeros(num)],
        -1).astype(np.float32)
    shape.radius = np.full(num, radius, np.float32)
    return shape


def make_random_points(num=65536, size=(1.0, 1.0, 1.0), uvscale=1.0,
                       radius=0.001, seed=17):
    shape = make_points(num, uvscale, radius)
    state, inc = np_make_rng(seed)
    vals = np.empty(num * 5, np.float32)
    for k in range(num * 5):
        bits, state = np_advance(state, inc)
        vals[k] = ((int(bits) >> 9) | 0x3F800000)
    vals = vals.astype(np.uint32).view(np.float32) - 1.0
    shape.positions = ((2 * vals[:num * 3].reshape(num, 3) - 1)
                       * np.asarray(size, np.float32)).astype(np.float32)
    shape.texcoords = vals[num * 3:].reshape(num, 2).astype(np.float32)
    return shape


def make_fvrect(steps=(1, 1), scale=(1.0, 1.0), uvscale=(1.0, 1.0)):
    rect = make_rect(steps, scale, uvscale)
    return FvShapeData(
        positions=rect.positions, normals=rect.normals,
        texcoords=rect.texcoords, quadspos=rect.quads,
        quadsnorm=rect.quads, quadstexcoord=rect.quads)


def make_fvbox(steps=(1, 1, 1), scale=(1.0, 1.0, 1.0),
               uvscale=(1.0, 1.0, 1.0)):
    box = make_box(steps, scale, uvscale)
    # weld positions for the position topology
    uniq, inverse = np.unique(box.positions.round(5), axis=0,
                              return_inverse=True)
    fv = FvShapeData(
        positions=uniq.astype(np.float32), normals=box.normals,
        texcoords=box.texcoords,
        quadspos=inverse[box.quads].astype(np.int32),
        quadsnorm=box.quads, quadstexcoord=box.quads)
    return fv


def make_fvsphere(steps=32, scale=1.0, uvscale=1.0):
    fv = make_fvbox((steps,) * 3, (scale,) * 3, (uvscale,) * 3)
    p = fv.positions / np.linalg.norm(fv.positions, axis=1, keepdims=True)
    fv.positions = (p * scale).astype(np.float32)
    fv.normals = p.astype(np.float32)
    fv.quadsnorm = fv.quadspos
    return fv


def make_quad(scale=1.0, subdivisions=0):
    pos = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                   np.float32)
    nrm = np.tile(np.array([0, 0, 1], np.float32), (4, 1))
    tc = np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32)
    quads = np.array([[0, 1, 2, 3]], np.int32)
    shape = ShapeData(positions=pos, normals=nrm, texcoords=tc, quads=quads)
    if subdivisions:
        _, shape.normals = subdivide_quads(quads, nrm, subdivisions)
        _, shape.texcoords = subdivide_quads(quads, tc, subdivisions)
        shape.quads, shape.positions = subdivide_quads(
            quads, pos, subdivisions)
    if scale != 1:
        shape.positions = shape.positions * scale
    return shape


def make_quady(scale=1.0, subdivisions=0):
    pos = np.array([[-1, 0, -1], [-1, 0, 1], [1, 0, 1], [1, 0, -1]],
                   np.float32)
    nrm = np.tile(np.array([0, 1, 0], np.float32), (4, 1))
    tc = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    quads = np.array([[0, 1, 2, 3]], np.int32)
    shape = ShapeData(positions=pos, normals=nrm, texcoords=tc, quads=quads)
    if subdivisions:
        _, shape.normals = subdivide_quads(quads, nrm, subdivisions)
        _, shape.texcoords = subdivide_quads(quads, tc, subdivisions)
        shape.quads, shape.positions = subdivide_quads(
            quads, pos, subdivisions)
    if scale != 1:
        shape.positions = shape.positions * scale
    return shape


def make_cube(scale=1.0, subdivisions=0):
    shape = make_box((1, 1, 1), (1, 1, 1), (1, 1, 1))
    if subdivisions:
        from .subdivide import subdivide_quads as sq
        _, shape.normals = sq(shape.quads, shape.normals, subdivisions)
        _, shape.texcoords = sq(shape.quads, shape.texcoords, subdivisions)
        shape.quads, shape.positions = sq(shape.quads, shape.positions,
                                          subdivisions)
    if scale != 1:
        shape.positions = shape.positions * scale
    return shape


def make_geosphere(scale=1.0, subdivisions=0):
    X = 0.525731112119133606
    Z = 0.850650808352039932
    pos = np.array(
        [[-X, 0, Z], [X, 0, Z], [-X, 0, -Z], [X, 0, -Z], [0, Z, X],
         [0, Z, -X], [0, -Z, X], [0, -Z, -X], [Z, X, 0], [-Z, X, 0],
         [Z, -X, 0], [-Z, -X, 0]], np.float32)
    tris = np.array(
        [[0, 1, 4], [0, 4, 9], [9, 4, 5], [4, 8, 5], [4, 1, 8], [8, 1, 10],
         [8, 10, 3], [5, 8, 3], [5, 3, 2], [2, 3, 7], [7, 3, 10], [7, 10, 6],
         [7, 6, 11], [11, 6, 0], [0, 6, 1], [6, 10, 1], [9, 11, 0],
         [9, 2, 11], [9, 5, 2], [7, 11, 2]], np.int32)
    shape = ShapeData()
    if subdivisions == 0:
        shape.triangles = tris
        shape.positions = pos
        shape.normals = pos.copy()
    else:
        shape.triangles, shape.positions = subdivide_triangles(
            tris, pos, subdivisions)
        shape.positions /= np.linalg.norm(shape.positions, axis=1,
                                          keepdims=True)
        shape.normals = shape.positions.copy()
    if scale != 1:
        shape.positions = (shape.positions * scale).astype(np.float32)
    return shape


def make_monkey(scale=1.0, subdivisions=0):
    """Suzanne (bundled asset generated with the reference library)."""
    from ..io.ply import load_shape_ply

    path = os.path.join(os.path.dirname(__file__), "..", "assets",
                        "monkey.ply")
    shape = load_shape_ply(path, flip_texcoord=False)
    if subdivisions:
        shape.quads, shape.positions = subdivide_quads(
            shape.quads, shape.positions, subdivisions)
        shape.normals = np.zeros((0, 3), np.float32)
    if scale != 1:
        shape.positions = shape.positions * scale
    return shape


def make_heightfield(size, height: np.ndarray):
    """Heightfield from a grayscale image (yocto_shape.h:299)."""
    shape = make_recty((size[0] - 1, size[1] - 1),
                       (size[0] / size[1], 1.0),
                       (size[0] / size[1], 1.0))
    shape.positions[:, 1] = height.reshape(-1)
    shape.normals = compute_normals(shape)
    return shape


def points_to_spheres(vertices: np.ndarray, steps=2, scale=0.01):
    shape = ShapeData()
    for v in vertices:
        sph = make_sphere(steps, scale, 1.0)
        sph.positions = sph.positions + v
        merge_shape(shape, sph)
    return shape


def polyline_to_cylinders(vertices: np.ndarray, steps=4, scale=0.01):
    shape = ShapeData()
    for i in range(len(vertices) - 1)  :
        a, b = vertices[i], vertices[i + 1]
        h = np.linalg.norm(b - a)
        if h == 0:
            continue
        cyl = make_uvcylinder((steps, 1, 1), (scale, h / 2), (1, 1, 1))
        z = (b - a) / h
        x = np.cross([0, 1, 0], z)
        if np.linalg.norm(x) < 1e-6:
            x = np.cross([1, 0, 0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        frame = np.stack([x, y, z], 0).astype(np.float32)
        cyl.positions = cyl.positions @ frame + (a + b) / 2
        cyl.normals = (cyl.normals @ frame).astype(np.float32)
        merge_shape(shape, cyl)
    return shape


def lines_to_cylinders(lines, positions, steps=4, scale=0.01):
    shape = ShapeData()
    for l in lines:
        seg = np.stack([positions[l[0]], positions[l[1]]])
        merge_shape(shape, polyline_to_cylinders(seg, steps, scale))
    return shape
