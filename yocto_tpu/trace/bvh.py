"""Device BVH traversal: stackless threaded (skip-link) two-level walk.

TPU redesign of the reference's stack traversal (intersect_scene_bvh /
intersect_shape_bvh, yocto_bvh.cpp:460-636). Per-lane stacks need scattered
writes, which are slow on TPU; instead the host re-orders each BVH into DFS
(preorder) layout and precomputes a skip link per node (the classic
"threaded BVH"): traversal state is just the current node index —

    next = node + 1            if bbox hit and internal (first child)
    next = skip[node]          otherwise

On TPU the cost of a `lax.while_loop` body is dominated by the NUMBER of
fusion-breaking ops (each dynamic gather is one), not by lanes or bytes, so
everything one iteration needs is packed into exactly THREE gathers:

  1. node row      [Nodes, 8]  — instance-level and shape-level nodes live
                                 in ONE table addressed by one cursor:
                                 bmin(3), bmax(3), skip bits, meta bits
  2. leaf block    [Leaves,64] — the up-to-4 primitives of a shape leaf,
                                 pre-flattened: 4 x (p0 p1 p2 p3, r0, r1,
                                 elem-id bits, pad)
  3. instance row  [I, 16]     — non-rigid inverse frame (12), shape DFS
                                 root bits, shape kind bits (only used on
                                 instance entry)

The two levels are linked by an instance register: descending into an
instance-BVH leaf (1 instance per leaf) swaps in the shape's DFS root and
the instance-space ray; when the shape walk runs off its subtree
(skip == -1) the outer walk resumes at the saved outer skip. Closest-hit
semantics equal the reference (same primitive tests, tmax shrinking across
levels, non-rigid inverses, world-unit t); only the node visit ORDER
differs, which cannot change the closest hit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.scene import SceneData
from ..ops import bvh as HB
from ..ops import geometry as G
from ..ops import mathops as M
from .compile import (FlatScene, KIND_LINES, KIND_POINTS, KIND_QUADS,
                      KIND_TRIANGLES)
from .intersect import RAY_EPS, SceneIntersection


class FlatBvh(NamedTuple):
    nodes: jax.Array       # [N,8] f32 (outer nodes first, then all shapes)
    leaves: jax.Array      # [L,64] f32: 4 packed primitive slots
    inst_rows: jax.Array   # [I,16] f32: inv frame(12), root bits, kind bits


def _make_bvh(bboxes, highquality, max_prims=HB.BVH_MAX_PRIMS):
    """Native C++ builder when available, NumPy fallback."""
    from ..native import build_bvh_native

    built = build_bvh_native(bboxes, highquality, max_prims)
    if built is not None:
        return built
    return HB.make_bvh(bboxes, highquality, max_prims)


def thread_bvh(b: HB.BvhArrays):
    """Reorder into DFS preorder with skip links.

    Returns (bmin, bmax, skip, leaf_start, leaf_num); skip == -1 marks the
    end of this tree, leaf_start == -1 marks internal nodes.
    """
    n = len(b.start)
    preorder = np.empty(n, np.int32)
    stack = [0]
    k = 0
    while stack:
        node = stack.pop()
        preorder[k] = node
        k += 1
        if b.internal[node]:
            stack.append(b.start[node] + 1)
            stack.append(b.start[node])
    assert k == n
    size = np.ones(n, np.int64)
    new_of_old = np.empty(n, np.int64)
    new_of_old[preorder] = np.arange(n)
    for i in range(n - 1, -1, -1):
        old = preorder[i]
        if b.internal[old]:
            c = b.start[old]
            size[new_of_old[old]] = (1 + size[new_of_old[c]]
                                     + size[new_of_old[c + 1]])
    skip = np.arange(n, dtype=np.int64) + size
    skip = np.where(skip >= n, -1, skip).astype(np.int32)
    bmin = b.bbox_min[preorder]
    bmax = b.bbox_max[preorder]
    leaf_start = np.where(b.internal[preorder], -1,
                          b.start[preorder]).astype(np.int32)
    leaf_num = np.where(b.internal[preorder], 0,
                        b.num[preorder]).astype(np.int32)
    return bmin, bmax, skip, leaf_start, leaf_num


def _pack_nodes(bmin, bmax, skip, meta):
    n = len(skip)
    out = np.zeros((n, 8), np.float32)
    out[:, 0:3] = bmin
    out[:, 3:6] = bmax
    out[:, 6] = skip.astype(np.int32).view(np.float32)
    out[:, 7] = meta.astype(np.int32).view(np.float32)
    return out


def _shape_kind_int(shape) -> int:
    if len(shape.triangles):
        return KIND_TRIANGLES
    if len(shape.quads):
        return KIND_QUADS
    if len(shape.lines):
        return KIND_LINES
    if len(shape.points):
        return KIND_POINTS
    return KIND_TRIANGLES


def _prim_row(pos, rad, v, order, elem_off):
    rows = np.zeros((len(order), 16), np.float32)
    rows[:, 0:3] = pos[v[:, 0]]
    rows[:, 3:6] = pos[v[:, 1]]
    rows[:, 6:9] = pos[v[:, 2]]
    rows[:, 9:12] = pos[v[:, 3]]
    rows[:, 12] = rad[v[:, 0]]
    rows[:, 13] = rad[v[:, 1]]
    rows[:, 14] = (order.astype(np.int32) + elem_off).view(np.float32)
    rows[:, 15] = rad[v[:, 2]]  # r2: overlap queries interpolate radii
    return rows


def build_scene_bvh(scene: SceneData, highquality: bool = False) -> FlatBvh:
    """Host build of the threaded two-level BVH -> packed device arrays."""
    shape_bvhs = []
    for shape in scene.shapes:
        bboxes = HB.shape_element_bounds(shape)
        shape_bvhs.append(_make_bvh(bboxes, highquality))

    ninst = len(scene.instances)
    inst_bboxes = np.zeros((max(ninst, 1), 2, 3), np.float32)
    for idx, inst in enumerate(scene.instances):
        sb = shape_bvhs[inst.shape]
        lo, hi = HB.transform_bbox(np.asarray(inst.frame, np.float32),
                                   sb.bbox_min[0], sb.bbox_max[0])
        inst_bboxes[idx, 0] = lo
        inst_bboxes[idx, 1] = hi
    obvh = _make_bvh(inst_bboxes[:ninst] if ninst else inst_bboxes,
                     highquality, max_prims=1)
    o_bmin, o_bmax, o_skip, o_leaf_start, _ = thread_bvh(obvh)
    o_inst = np.where(o_leaf_start >= 0,
                      obvh.primitives[np.maximum(o_leaf_start, 0)],
                      -1).astype(np.int32)
    n_outer = len(o_skip)
    outer_nodes = _pack_nodes(o_bmin, o_bmax, o_skip, o_inst)

    # shape node pools: thread each, concatenate after the outer nodes;
    # leaves become rows of a [L, 64] block table
    node_blocks = [outer_nodes]
    leaf_blocks = []
    roots = np.zeros(max(len(scene.shapes), 1), np.int32)
    noff = n_outer
    leaf_off = 0
    elem_off = 0
    for sidx, (shape, sb) in enumerate(zip(scene.shapes, shape_bvhs)):
        bmin, bmax, skip, leaf_start, leaf_num = thread_bvh(sb)
        roots[sidx] = noff
        gskip = np.where(skip >= 0, skip + noff, -1).astype(np.int32)

        nelems = max(len(shape.points), len(shape.lines),
                     len(shape.triangles), len(shape.quads))
        if nelems:
            pos = np.asarray(shape.positions, np.float32)
            rad = (np.asarray(shape.radius, np.float32)
                   if len(shape.radius) == len(pos)
                   else np.zeros(len(pos), np.float32))
            if len(shape.triangles):
                tris = np.asarray(shape.triangles, np.int64)
                verts = np.concatenate([tris, tris[:, 2:3]], 1)
            elif len(shape.quads):
                verts = np.asarray(shape.quads, np.int64)
            elif len(shape.lines):
                lines = np.asarray(shape.lines, np.int64)
                verts = np.concatenate(
                    [lines, lines[:, 1:2], lines[:, 1:2]], 1)
            else:
                pts = np.asarray(shape.points, np.int64).reshape(-1, 1)
                verts = np.repeat(pts, 4, 1)
            prim_rows = _prim_row(pos, rad, verts[sb.primitives],
                                  sb.primitives, elem_off)
        else:
            prim_rows = np.zeros((0, 16), np.float32)

        # leaves: each inner leaf gets one 64-float block of its <=4 prims
        leaf_sel = np.where(leaf_start >= 0)[0]
        nleaves = len(leaf_sel)
        blocks = np.zeros((nleaves, 4, 16), np.float32)
        # degenerate fill: unused slots keep zeros (intersectors miss them
        # because p0=p1=p2=p3=0 makes a zero-det triangle and r=0 points)
        for bi, nidx in enumerate(leaf_sel):
            s = leaf_start[nidx]
            c = leaf_num[nidx]
            blocks[bi, :c] = prim_rows[s:s + c]
        meta = np.full(len(skip), -1, np.int32)
        meta[leaf_sel] = ((np.arange(nleaves, dtype=np.int32) + leaf_off) * 8
                          + leaf_num[leaf_sel])
        node_blocks.append(_pack_nodes(bmin, bmax, gskip, meta))
        leaf_blocks.append(blocks.reshape(nleaves, 64))
        noff += len(skip)
        leaf_off += nleaves
        elem_off += nelems

    # packed per-instance rows: inverse frame + shape root + kind
    inst_rows = np.zeros((max(ninst, 1), 16), np.float32)
    for idx, inst in enumerate(scene.instances):
        frame = np.asarray(inst.frame, np.float32)
        inv_rot = np.linalg.inv(frame[:3].astype(np.float64)).astype(
            np.float32)
        inv_o = -(frame[3] @ inv_rot)
        inst_rows[idx, 0:9] = inv_rot.reshape(-1)
        inst_rows[idx, 9:12] = inv_o
        inst_rows[idx, 12] = np.int32(roots[inst.shape]).view(np.float32)
        inst_rows[idx, 13] = np.int32(
            _shape_kind_int(scene.shapes[inst.shape])).view(np.float32)

    j = jnp.asarray
    return FlatBvh(
        nodes=j(np.concatenate(node_blocks)),
        leaves=j(np.concatenate(leaf_blocks) if leaf_blocks
                 else np.zeros((1, 64), np.float32)),
        inst_rows=j(inst_rows),
    )


class _TravState(NamedTuple):
    cur: jax.Array        # [R] i32 current node (combined table); -1 = done
    o_resume: jax.Array   # [R] i32 outer node to resume after the instance
    cur_inst: jax.Array   # [R] i32; -1 = world space
    kind: jax.Array       # [R] i32 current shape kind
    lo: jax.Array         # [R,3] active-space ray origin
    ld: jax.Array
    ldinv: jax.Array
    tmax: jax.Array
    hit: jax.Array
    inst: jax.Array
    elem: jax.Array       # global element id
    uv: jax.Array
    wro: jax.Array        # [R,3] world ray (carried so the state is
    wrd: jax.Array        #        self-contained under lane compaction)
    it: jax.Array


def _safe_inv(d):
    return 1.0 / jnp.where(d == 0.0, 1e-38, d)


def _i32(f):
    return jax.lax.bitcast_convert_type(f, jnp.int32)


def _prim_hit(lo, ld, tmin, tmax, row, kind, kinds=None):
    """Intersect one packed primitive slot per lane (row: [..., 16]).

    `kinds` (static) drops intersectors for element types absent from the
    scene — bit-identical specialization."""
    p0 = row[..., 0:3]
    p1 = row[..., 3:6]
    p2 = row[..., 6:9]
    p3 = row[..., 9:12]
    r0 = row[..., 12]
    r1 = row[..., 13]
    if kinds is None:
        kinds = (KIND_POINTS, KIND_LINES, KIND_TRIANGLES, KIND_QUADS)
    has_surface = (KIND_TRIANGLES in kinds) or (KIND_QUADS in kinds)
    hit = uv = dist = None
    if has_surface:
        isec = G.intersect_quad(lo, ld, tmin, tmax, p0, p1, p2, p3)
        hit, uv, dist = isec.hit, isec.uv, isec.dist
    if KIND_LINES in kinds:
        isec_line = G.intersect_line(lo, ld, tmin, tmax, p0, p1, r0, r1)
        if hit is None:
            hit, uv, dist = isec_line.hit, isec_line.uv, isec_line.dist
        else:
            is_line = kind == KIND_LINES
            hit = jnp.where(is_line, isec_line.hit, hit)
            uv = jnp.where(is_line[..., None], isec_line.uv, uv)
            dist = jnp.where(is_line, isec_line.dist, dist)
    if KIND_POINTS in kinds:
        isec_pt = G.intersect_point(lo, ld, tmin, tmax, p0, r0)
        if hit is None:
            hit, uv, dist = isec_pt.hit, isec_pt.uv, isec_pt.dist
        else:
            is_pt = kind == KIND_POINTS
            hit = jnp.where(is_pt, isec_pt.hit, hit)
            uv = jnp.where(is_pt[..., None], isec_pt.uv, uv)
            dist = jnp.where(is_pt, isec_pt.dist, dist)
    return hit, uv, dist


def trav_init(ro, rd, tmax=M.flt_max) -> _TravState:
    """Fresh traversal state for a batch of world rays. (tmin is fixed at
    the reference's ray epsilon, baked into make_trav_step.)"""
    R = ro.shape[0]
    return _TravState(
        cur=jnp.zeros(R, jnp.int32),
        o_resume=jnp.full(R, -1, jnp.int32),
        cur_inst=jnp.full(R, -1, jnp.int32),
        kind=jnp.zeros(R, jnp.int32),
        lo=ro, ld=rd, ldinv=_safe_inv(rd),
        tmax=jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (R,)),
        hit=jnp.zeros(R, bool),
        inst=jnp.full(R, -1, jnp.int32),
        elem=jnp.full(R, -1, jnp.int32),
        uv=jnp.zeros((R, 2), jnp.float32),
        wro=ro, wrd=rd,
        it=jnp.zeros((), jnp.int32))


def trav_results(st: _TravState, scene: FlatScene) -> SceneIntersection:
    shape = scene.inst_shape[jnp.maximum(st.inst, 0)]
    elem_local = st.elem - scene.shape_elem_start[shape]
    return SceneIntersection(
        hit=st.hit,
        instance=jnp.where(st.hit, st.inst, -1),
        element=jnp.where(st.hit, elem_local, -1),
        uv=jnp.where(st.hit[:, None], st.uv, 0.0),
        distance=jnp.where(st.hit, st.tmax, M.flt_max))


def make_trav_step(bvh: FlatBvh, kinds=None, tmin=RAY_EPS):
    """One node-step of the threaded two-level walk, shared by the
    lockstep intersector and the wavefront (compacted-rounds) driver."""

    def step(st: _TravState) -> _TravState:
        ro, rd = st.wro, st.wrd
        wdinv = _safe_inv(rd)
        tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32),
                                  st.cur.shape)
        inner = st.cur_inst >= 0
        live = st.cur >= 0

        # ---- gather 1: current node (either level)
        row = bvh.nodes[jnp.maximum(st.cur, 0)]
        skip = _i32(row[..., 6])
        meta = _i32(row[..., 7])
        it_min = (row[..., 0:3] - st.lo) * st.ldinv
        it_max = (row[..., 3:6] - st.lo) * st.ldinv
        lo3 = jnp.minimum(it_min, it_max)
        hi3 = jnp.maximum(it_min, it_max)
        t0 = jnp.maximum(jnp.maximum(
            jnp.maximum(lo3[..., 0], lo3[..., 1]), lo3[..., 2]), tmin_b)
        t1 = jnp.minimum(jnp.minimum(
            jnp.minimum(hi3[..., 0], hi3[..., 1]), hi3[..., 2]),
            st.tmax)
        bhit = live & (t0 <= t1 * 1.00000024)
        is_leaf = meta >= 0

        # ---- gather 2: leaf primitive block (inner leaves only)
        s_at_leaf = bhit & is_leaf & inner
        leaf_id = meta >> 3
        leaf_num = meta & 7
        block = bvh.leaves[jnp.clip(leaf_id, 0,
                                    bvh.leaves.shape[0] - 1)]
        hit, inst_b, elem_b, uv_b, tmax_r = (
            st.hit, st.inst, st.elem, st.uv, st.tmax)
        for k in range(HB.BVH_MAX_PRIMS):
            prow = block[..., 16 * k:16 * (k + 1)]
            in_leaf = s_at_leaf & (k < leaf_num)
            ehit, euv, edist = _prim_hit(st.lo, st.ld, tmin_b, tmax_r,
                                         prow, st.kind, kinds=kinds)
            take = in_leaf & ehit
            hit = hit | take
            inst_b = jnp.where(take, st.cur_inst, inst_b)
            elem_b = jnp.where(take, _i32(prow[..., 14]), elem_b)
            uv_b = jnp.where(take[:, None], euv, uv_b)
            tmax_r = jnp.where(take, edist, tmax_r)

        # ---- gather 3: instance row (outer leaves only)
        enter = bhit & is_leaf & ~inner
        new_inst = jnp.where(enter, meta, st.cur_inst)
        irow = bvh.inst_rows[jnp.clip(
            jnp.where(enter, meta, 0), 0,
            bvh.inst_rows.shape[0] - 1)]
        nlo = (ro[..., 0:1] * irow[..., 0:3]
               + ro[..., 1:2] * irow[..., 3:6]
               + ro[..., 2:3] * irow[..., 6:9] + irow[..., 9:12])
        nld = (rd[..., 0:1] * irow[..., 0:3]
               + rd[..., 1:2] * irow[..., 3:6]
               + rd[..., 2:3] * irow[..., 6:9])
        lo = jnp.where(enter[:, None], nlo, st.lo)
        ld = jnp.where(enter[:, None], nld, st.ld)
        ldinv = jnp.where(enter[:, None], _safe_inv(nld), st.ldinv)
        kind = jnp.where(enter, _i32(irow[..., 13]), st.kind)
        root = _i32(irow[..., 12])

        # ---- cursor update
        descend = bhit & ~is_leaf
        nxt = jnp.where(descend, jnp.maximum(st.cur, 0) + 1, skip)
        nxt = jnp.where(enter, root, nxt)
        nxt = jnp.where(s_at_leaf, skip, nxt)
        # inner subtree exhausted -> resume outer walk
        inner_exit = inner & (nxt < 0)
        nxt = jnp.where(inner_exit, st.o_resume, nxt)
        cur_inst = jnp.where(inner_exit, -1, new_inst)
        # restore world ray on exit
        lo = jnp.where(inner_exit[:, None], ro, lo)
        ld = jnp.where(inner_exit[:, None], rd, ld)
        ldinv = jnp.where(inner_exit[:, None], wdinv, ldinv)
        o_resume = jnp.where(enter, skip, st.o_resume)
        nxt = jnp.where(live, nxt, st.cur)

        return _TravState(
            cur=nxt, o_resume=o_resume, cur_inst=cur_inst, kind=kind,
            lo=lo, ld=ld, ldinv=ldinv, tmax=tmax_r, hit=hit,
            inst=inst_b, elem=elem_b, uv=uv_b, wro=ro, wrd=rd,
            it=st.it + 1)

    return step


def make_bvh_intersector(bvh: FlatBvh, find_any: bool = False,
                         debug_iters: bool = False, unroll: int = 4,
                         kinds=None):
    """Lockstep intersect(scene, ro, rd, tmin, tmax) -> SceneIntersection.

    `unroll` node-steps run per while iteration: the while carry costs a
    buffer copy per carried array per iteration on TPU, so stepping several
    nodes between carries amortizes that fixed cost. The wavefront renderer
    instead drives make_trav_step through compacted rounds."""
    step = make_trav_step(bvh, kinds=kinds)

    def intersect(scene: FlatScene, ro, rd, tmin=RAY_EPS, tmax=M.flt_max):
        del tmin  # the step bakes the reference ray epsilon
        st = trav_init(ro, rd, tmax=tmax)

        def body(st: _TravState) -> _TravState:
            for _ in range(unroll):
                st = step(st)
            return st

        def cond(st: _TravState):
            live = st.cur >= 0
            if find_any:
                live = live & ~st.hit
            return jnp.any(live)

        st = jax.lax.while_loop(cond, body, st)
        result = trav_results(st, scene)
        if debug_iters:
            return result, st.it
        return result

    return intersect


# ----------------------------------------------------------------------------
# Point-overlap queries (yocto_bvh.cpp:638-781)
# ----------------------------------------------------------------------------

class _OverlapState(NamedTuple):
    cur: jax.Array        # [R] i32 current node (combined table); -1 = done
    o_resume: jax.Array   # [R] i32 outer node to resume after the instance
    cur_inst: jax.Array   # [R] i32; -1 = world space
    kind: jax.Array       # [R] i32 current shape kind
    lp: jax.Array         # [R,3] active-space query point
    dmax: jax.Array       # [R] shrinking closest-mode search radius
    hit: jax.Array
    inst: jax.Array
    elem: jax.Array       # global element id
    uv: jax.Array
    dist: jax.Array       # [R] closest distance found
    wp: jax.Array         # [R,3] world point (self-contained state)
    it: jax.Array


def _prim_overlap(lp, dmax, row, kind, kinds=None):
    """Point-overlap of one packed primitive slot per lane (row: [...,16]).

    Matches overlap_scene_bruteforce's element dispatch (reference
    overlap_point/line/quad, yocto_geometry.h:874-1010). Quads reuse r2
    for the fourth corner radius (the packed row has no free slot);
    radius-bearing true quads do not occur in practice — triangles pack
    v3 == v2, so their r3 == r2 is exact."""
    p0 = row[..., 0:3]
    p1 = row[..., 3:6]
    p2 = row[..., 6:9]
    p3 = row[..., 9:12]
    r0 = row[..., 12]
    r1 = row[..., 13]
    r2 = row[..., 15]
    if kinds is None:
        kinds = (KIND_POINTS, KIND_LINES, KIND_TRIANGLES, KIND_QUADS)
    has_surface = (KIND_TRIANGLES in kinds) or (KIND_QUADS in kinds)
    hit = uv = dist = None
    if has_surface:
        o = G.overlap_quad(lp, dmax, p0, p1, p2, p3, r0, r1, r2, r2)
        hit, uv, dist = o.hit, o.uv, o.distance
    if KIND_LINES in kinds:
        ol = G.overlap_line(lp, dmax, p0, p1, r0, r1)
        if hit is None:
            hit, uv, dist = ol.hit, ol.uv, ol.distance
        else:
            is_line = kind == KIND_LINES
            hit = jnp.where(is_line, ol.hit, hit)
            uv = jnp.where(is_line[..., None], ol.uv, uv)
            dist = jnp.where(is_line, ol.distance, dist)
    if KIND_POINTS in kinds:
        op = G.overlap_point(lp, dmax, p0, r0)
        if hit is None:
            hit, uv, dist = op.hit, op.uv, op.distance
        else:
            is_pt = kind == KIND_POINTS
            hit = jnp.where(is_pt, op.hit, hit)
            uv = jnp.where(is_pt[..., None], op.uv, uv)
            dist = jnp.where(is_pt, op.distance, dist)
    return hit, uv, dist


def overlap_init(pos, dist_max) -> _OverlapState:
    R = pos.shape[0]
    return _OverlapState(
        cur=jnp.zeros(R, jnp.int32),
        o_resume=jnp.full(R, -1, jnp.int32),
        cur_inst=jnp.full(R, -1, jnp.int32),
        kind=jnp.zeros(R, jnp.int32),
        lp=pos,
        dmax=jnp.broadcast_to(jnp.asarray(dist_max, jnp.float32), (R,)),
        hit=jnp.zeros(R, bool),
        inst=jnp.full(R, -1, jnp.int32),
        elem=jnp.full(R, -1, jnp.int32),
        uv=jnp.zeros((R, 2), jnp.float32),
        dist=jnp.full(R, M.flt_max, jnp.float32),
        wp=pos,
        it=jnp.zeros((), jnp.int32))


def make_overlap_step(bvh: FlatBvh, kinds=None):
    """One node-step of the threaded two-level point-overlap walk
    (overlap_scene_bvh, yocto_bvh.cpp:638-781): nodes are culled when the
    query point is farther than the shrinking search radius from the node
    bbox; instance leaves transform the point with the non-rigid inverse
    and distances compare in local space, exactly like the reference (and
    overlap_scene_bruteforce)."""

    def step(st: _OverlapState) -> _OverlapState:
        wp = st.wp
        inner = st.cur_inst >= 0
        live = st.cur >= 0

        # ---- gather 1: current node; cull by point-to-bbox distance
        row = bvh.nodes[jnp.maximum(st.cur, 0)]
        skip = _i32(row[..., 6])
        meta = _i32(row[..., 7])
        cl = jnp.clip(st.lp, row[..., 0:3], row[..., 3:6])
        d2 = M.dot(st.lp - cl, st.lp - cl)
        bhit = live & (d2 <= st.dmax * st.dmax)
        is_leaf = meta >= 0

        # ---- gather 2: leaf primitive block (inner leaves only)
        s_at_leaf = bhit & is_leaf & inner
        leaf_id = meta >> 3
        leaf_num = meta & 7
        block = bvh.leaves[jnp.clip(leaf_id, 0, bvh.leaves.shape[0] - 1)]
        hit, inst_b, elem_b, uv_b = st.hit, st.inst, st.elem, st.uv
        dmax_r, dist_r = st.dmax, st.dist
        for k in range(HB.BVH_MAX_PRIMS):
            prow = block[..., 16 * k:16 * (k + 1)]
            in_leaf = s_at_leaf & (k < leaf_num)
            ohit, ouv, odist = _prim_overlap(st.lp, dmax_r, prow,
                                             st.kind, kinds=kinds)
            take = in_leaf & ohit
            hit = hit | take
            inst_b = jnp.where(take, st.cur_inst, inst_b)
            elem_b = jnp.where(take, _i32(prow[..., 14]), elem_b)
            uv_b = jnp.where(take[:, None], ouv, uv_b)
            dist_r = jnp.where(take, odist, dist_r)
            # closest mode: shrink the search radius to each found hit
            # (yocto_bvh.cpp:724-728)
            dmax_r = jnp.where(take, odist, dmax_r)

        # ---- gather 3: instance row (outer leaves only)
        enter = bhit & is_leaf & ~inner
        new_inst = jnp.where(enter, meta, st.cur_inst)
        irow = bvh.inst_rows[jnp.clip(
            jnp.where(enter, meta, 0), 0, bvh.inst_rows.shape[0] - 1)]
        nlp = (wp[..., 0:1] * irow[..., 0:3]
               + wp[..., 1:2] * irow[..., 3:6]
               + wp[..., 2:3] * irow[..., 6:9] + irow[..., 9:12])
        lp = jnp.where(enter[:, None], nlp, st.lp)
        kind = jnp.where(enter, _i32(irow[..., 13]), st.kind)
        root = _i32(irow[..., 12])

        # ---- cursor update
        descend = bhit & ~is_leaf
        nxt = jnp.where(descend, jnp.maximum(st.cur, 0) + 1, skip)
        nxt = jnp.where(enter, root, nxt)
        nxt = jnp.where(s_at_leaf, skip, nxt)
        inner_exit = inner & (nxt < 0)
        nxt = jnp.where(inner_exit, st.o_resume, nxt)
        cur_inst = jnp.where(inner_exit, -1, new_inst)
        lp = jnp.where(inner_exit[:, None], wp, lp)
        o_resume = jnp.where(enter, skip, st.o_resume)
        nxt = jnp.where(live, nxt, st.cur)

        return _OverlapState(
            cur=nxt, o_resume=o_resume, cur_inst=cur_inst, kind=kind,
            lp=lp, dmax=dmax_r, hit=hit, inst=inst_b, elem=elem_b,
            uv=uv_b, dist=dist_r, wp=wp, it=st.it + 1)

    return step


def make_bvh_overlap(bvh: FlatBvh, unroll: int = 4, kinds=None):
    """Batched closest-point overlap(scene, pos, dist_max) ->
    SceneIntersection with BVH node culling (the accelerated equivalent
    of overlap_scene_bruteforce; overlap_scene_bvh semantics,
    yocto_bvh.cpp:638-781)."""
    step = make_overlap_step(bvh, kinds=kinds)

    def overlap(scene: FlatScene, pos, dist_max):
        st = overlap_init(pos, dist_max)

        def body(st: _OverlapState) -> _OverlapState:
            for _ in range(unroll):
                st = step(st)
            return st

        st = jax.lax.while_loop(lambda s: jnp.any(s.cur >= 0), body, st)
        shape = scene.inst_shape[jnp.maximum(st.inst, 0)]
        elem_local = st.elem - scene.shape_elem_start[shape]
        return SceneIntersection(
            hit=st.hit,
            instance=jnp.where(st.hit, st.inst, -1),
            element=jnp.where(st.hit, elem_local, -1),
            uv=jnp.where(st.hit[:, None], st.uv, 0.0),
            distance=jnp.where(st.hit, st.dist, M.flt_max))

    return overlap
