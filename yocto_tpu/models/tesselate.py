"""Subdiv tesselation: face-varying Catmull-Clark + displacement.

Equivalent of tesselate_subdiv/tesselate_subdivs (yocto_scene.cpp:739-813)
and split_facevarying (yocto_shape.cpp:2567): each subdiv's three
topologies are subdivided independently (texcoords/normals with locked
boundaries), optional displacement moves positions along smooth normals by
a texture lookup, and the face-varying result splits into an indexed shape
by uniquifying (pos, norm, uv) corner triples.
"""

from __future__ import annotations

import numpy as np

from .scene import INVALID, SceneData, SubdivData
from .shape import ShapeData, quads_normals
from .subdivide import subdivide_catmullclark, subdivide_quads


def _eval_texture_host(texture, uv):
    """Host bilinear texture eval matching eval_texture defaults
    (as_linear=False) for displacement lookups."""
    if texture.pixelsf is not None and texture.pixelsf.size:
        px = np.asarray(texture.pixelsf, np.float32)
        is_byte = False
    else:
        px = np.asarray(texture.pixelsb, np.float32) / 255.0
        is_byte = True
    h, w = px.shape[:2]
    s = np.mod(uv[:, 0], 1.0) * w
    s = np.where(s < 0, s + w, s)
    t = np.mod(uv[:, 1], 1.0) * h
    t = np.where(t < 0, t + h, t)
    i = np.clip(s.astype(np.int64), 0, w - 1)
    j = np.clip(t.astype(np.int64), 0, h - 1)
    ii = (i + 1) % w
    jj = (j + 1) % h
    u = s - i
    v = t - j
    val = (px[j, i] * ((1 - u) * (1 - v))[:, None]
           + px[jj, i] * ((1 - u) * v)[:, None]
           + px[j, ii] * (u * (1 - v))[:, None]
           + px[jj, ii] * (u * v)[:, None])
    return val, is_byte


def split_facevarying(quadspos, quadsnorm, quadstexcoord, positions,
                      normals, texcoords):
    """Face-varying -> indexed shape (yocto_shape.cpp:2567-2620)."""
    nfaces = len(quadspos)
    has_n = len(quadsnorm) > 0
    has_t = len(quadstexcoord) > 0
    corners = np.stack([
        quadspos.reshape(-1),
        quadsnorm.reshape(-1) if has_n else np.full(nfaces * 4, -1),
        quadstexcoord.reshape(-1) if has_t else np.full(nfaces * 4, -1),
    ], axis=1)
    uniq, first_idx, inverse = np.unique(
        corners, axis=0, return_index=True, return_inverse=True)
    # preserve first-occurrence order like the reference's insertion map
    order = np.argsort(first_idx, kind="stable")
    rank = np.empty(len(uniq), np.int64)
    rank[order] = np.arange(len(uniq))
    split_quads = rank[inverse].reshape(nfaces, 4).astype(np.int32)
    uniq_in_order = uniq[order]
    split_positions = positions[uniq_in_order[:, 0]].astype(np.float32)
    split_normals = (normals[uniq_in_order[:, 1]].astype(np.float32)
                     if has_n else np.zeros((0, 3), np.float32))
    split_texcoords = (texcoords[uniq_in_order[:, 2]].astype(np.float32)
                       if has_t else np.zeros((0, 2), np.float32))
    return split_quads, split_positions, split_normals, split_texcoords


def tesselate_subdiv(scene: SceneData, subdiv: SubdivData) -> ShapeData:
    sub_qp = np.asarray(subdiv.quadspos, np.int32)
    sub_qn = np.asarray(subdiv.quadsnorm, np.int32)
    sub_qt = np.asarray(subdiv.quadstexcoord, np.int32)
    pos = np.asarray(subdiv.positions, np.float32)
    nrm = np.asarray(subdiv.normals, np.float32)
    tc = np.asarray(subdiv.texcoords, np.float32)

    if subdiv.subdivisions > 0:
        # the normal topology is never subdivided: the reference discards
        # it after subdivision either way (smooth -> recomputed from the
        # subdivided positions, else cleared, yocto_scene.cpp:764-770) —
        # and the reference's own shipped subdiv OBJs carry malformed
        # quadsnorm indices that only "work" because the result is unused
        for _ in range(subdiv.subdivisions):
            if subdiv.catmullclark:
                if len(sub_qt):
                    sub_qt, tc = subdivide_catmullclark(
                        sub_qt, tc, 1, lock_boundary=True)
                sub_qp, pos = subdivide_catmullclark(sub_qp, pos, 1)
            else:
                if len(sub_qt):
                    sub_qt, tc = subdivide_quads(sub_qt, tc, 1)
                sub_qp, pos = subdivide_quads(sub_qp, pos, 1)
        if subdiv.smooth:
            nrm = quads_normals(sub_qp, pos)
            sub_qn = sub_qp.copy()
        else:
            nrm = np.zeros((0, 3), np.float32)
            sub_qn = np.zeros((0, 4), np.int32)

    if subdiv.displacement != 0 and subdiv.displacement_tex != INVALID:
        if not len(tc):
            raise RuntimeError("missing texture coordinates")
        texture = scene.textures[subdiv.displacement_tex]
        # per-corner displacement averaged onto position vertices
        qpos = sub_qp.reshape(-1)
        qtxt = sub_qt.reshape(-1)
        val, is_byte = _eval_texture_host(texture, tc[qtxt])
        disp = val.mean(axis=1)
        if is_byte:
            disp = disp - 0.5
        offset = np.zeros(len(pos), np.float64)
        count = np.zeros(len(pos), np.int64)
        np.add.at(offset, qpos, subdiv.displacement * disp)
        np.add.at(count, qpos, 1)
        normals = quads_normals(sub_qp, pos)
        pos = (pos + normals * (offset / np.maximum(count, 1))[:, None]
               ).astype(np.float32)
        if subdiv.smooth or len(nrm):
            sub_qn = sub_qp.copy()
            nrm = quads_normals(sub_qp, pos)

    quads, positions, normals, texcoords = split_facevarying(
        sub_qp, sub_qn, sub_qt, pos, nrm, tc)
    return ShapeData(quads=quads, positions=positions, normals=normals,
                     texcoords=texcoords)


def tesselate_subdivs(scene: SceneData) -> None:
    for subdiv in scene.subdivs:
        scene.shapes[subdiv.shape] = tesselate_subdiv(scene, subdiv)
