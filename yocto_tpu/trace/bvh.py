"""Device BVH traversal: batched two-level closest-hit walk.

The TPU counterpart of the reference's stack traversal
(intersect_scene_bvh / intersect_shape_bvh, yocto_bvh.cpp:460-636): all
rays advance together through a masked `lax.while_loop`, each lane holding
its own traversal stack in a [R, STACK] register array. The two levels are
unified into ONE stack: instance-BVH leaves (built with 1 instance/leaf)
push a sentinel plus the shape-BVH root tagged with a high bit; popping the
sentinel restores world-space traversal. Closest-hit `tmax` shrinks across
both levels; rays are transformed into instance space with the full
(non-rigid) frame inverse without renormalizing the direction, so `t`
remains a world-space distance — exactly the reference convention
(yocto_bvh.cpp:602, `inverse(frame, true)`).

Build happens on the host (ops.bvh); this module flattens the node pools
for device upload and runs the traversal inside jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.scene import SceneData
from ..ops import bvh as HB
from ..ops import mathops as M
from .compile import FlatScene
from .intersect import RAY_EPS, SceneIntersection, _intersect_element

STACK_SIZE = 80
SHAPE_BIT = jnp.int32(1 << 30)
SENTINEL = jnp.int32(-2)


class FlatBvh(NamedTuple):
    # instance-level nodes
    o_bmin: jax.Array
    o_bmax: jax.Array
    o_start: jax.Array
    o_num: jax.Array
    o_axis: jax.Array
    o_internal: jax.Array
    o_prims: jax.Array        # [I] instance ids
    # shape-level nodes (all shapes concatenated)
    s_bmin: jax.Array
    s_bmax: jax.Array
    s_start: jax.Array        # child idx (local) or prim start (local)
    s_num: jax.Array
    s_axis: jax.Array
    s_internal: jax.Array
    s_prims: jax.Array        # GLOBAL element ids
    shape_node_offset: jax.Array  # [S]
    shape_prim_offset: jax.Array  # [S] offset into s_prims


def _make_bvh(bboxes, highquality, max_prims=HB.BVH_MAX_PRIMS):
    """Native C++ builder when available, NumPy fallback."""
    from ..native import build_bvh_native

    built = build_bvh_native(bboxes, highquality, max_prims)
    if built is not None:
        return built
    return HB.make_bvh(bboxes, highquality, max_prims)


def build_scene_bvh(scene: SceneData, highquality: bool = False) -> FlatBvh:
    """Host build of the two-level BVH -> flat device arrays."""
    shape_bvhs = []
    for shape in scene.shapes:
        bboxes = HB.shape_element_bounds(shape)
        shape_bvhs.append(_make_bvh(bboxes, highquality))

    # instance bboxes from transformed shape roots (yocto_bvh.cpp:380-396)
    inst_bboxes = np.zeros((len(scene.instances), 2, 3), np.float32)
    for idx, inst in enumerate(scene.instances):
        sb = shape_bvhs[inst.shape]
        lo, hi = HB.transform_bbox(np.asarray(inst.frame, np.float32),
                                   sb.bbox_min[0], sb.bbox_max[0])
        inst_bboxes[idx, 0] = lo
        inst_bboxes[idx, 1] = hi
    obvh = _make_bvh(inst_bboxes, highquality, max_prims=1)

    # concatenate shape node pools; element prim ids become global
    node_off, prim_off = [], []
    noff = poff = 0
    elem_off = 0
    s_bmin, s_bmax, s_start, s_num, s_axis, s_int, s_prims = \
        [], [], [], [], [], [], []
    for shape, sb in zip(scene.shapes, shape_bvhs):
        node_off.append(noff)
        prim_off.append(poff)
        s_bmin.append(sb.bbox_min)
        s_bmax.append(sb.bbox_max)
        # keep starts local; traversal adds the per-shape offsets
        s_start.append(sb.start)
        s_num.append(sb.num)
        s_axis.append(sb.axis)
        s_int.append(sb.internal)
        s_prims.append(sb.primitives + elem_off)
        noff += len(sb.start)
        poff += len(sb.primitives)
        nelems = max(len(shape.points), len(shape.lines),
                     len(shape.triangles), len(shape.quads))
        elem_off += nelems

    j = jnp.asarray
    cat = lambda xs, dt: j(np.concatenate(xs).astype(dt)) if xs else \
        j(np.zeros(0, dt))
    return FlatBvh(
        o_bmin=j(obvh.bbox_min), o_bmax=j(obvh.bbox_max),
        o_start=j(obvh.start), o_num=j(obvh.num), o_axis=j(obvh.axis),
        o_internal=j(obvh.internal),
        o_prims=j(obvh.primitives if len(obvh.primitives)
                  else np.zeros(1, np.int32)),
        s_bmin=cat(s_bmin, np.float32).reshape(-1, 3),
        s_bmax=cat(s_bmax, np.float32).reshape(-1, 3),
        s_start=cat(s_start, np.int32), s_num=cat(s_num, np.int32),
        s_axis=cat(s_axis, np.int32), s_internal=cat(s_int, bool),
        s_prims=cat(s_prims, np.int32) if s_prims else j(
            np.zeros(1, np.int32)),
        shape_node_offset=j(np.asarray(node_off, np.int32)
                            if node_off else np.zeros(1, np.int32)),
        shape_prim_offset=j(np.asarray(prim_off, np.int32)
                            if prim_off else np.zeros(1, np.int32)),
    )


class _TravState(NamedTuple):
    stack: jax.Array      # [R,S] i32
    sp: jax.Array         # [R] i32
    cur_inst: jax.Array   # [R] i32 (-1 = world space)
    lo: jax.Array         # [R,3] local ray origin
    ld: jax.Array         # [R,3] local ray dir
    ldinv: jax.Array      # [R,3]
    tmax: jax.Array       # [R]
    hit: jax.Array
    inst: jax.Array
    elem: jax.Array       # global element id
    uv: jax.Array
    done: jax.Array
    it: jax.Array


def _safe_inv(d):
    return 1.0 / jnp.where(d == 0.0, 1e-38, d)


def _bbox_test(o, dinv, tmin, tmax, bmin, bmax):
    it_min = (bmin - o) * dinv
    it_max = (bmax - o) * dinv
    lo = jnp.minimum(it_min, it_max)
    hi = jnp.maximum(it_min, it_max)
    t0 = jnp.maximum(jnp.max(lo, axis=-1), tmin)
    t1 = jnp.minimum(jnp.min(hi, axis=-1), tmax)
    return t0 <= t1 * 1.00000024


def make_bvh_intersector(bvh: FlatBvh, find_any: bool = False,
                         stack_size: int = STACK_SIZE):
    """Returns intersect(scene, ro, rd, tmin, tmax) -> SceneIntersection."""

    def intersect(scene: FlatScene, ro, rd, tmin=RAY_EPS, tmax=M.flt_max):
        R = ro.shape[0]
        tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (R,))
        wdinv = _safe_inv(rd)

        stack = jnp.zeros((R, stack_size), jnp.int32)
        # push instance-bvh root (node 0, world space)
        stack = stack.at[:, 0].set(0)
        st = _TravState(
            stack=stack, sp=jnp.ones(R, jnp.int32),
            cur_inst=jnp.full(R, -1, jnp.int32),
            lo=ro, ld=rd, ldinv=wdinv,
            tmax=jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (R,)),
            hit=jnp.zeros(R, bool),
            inst=jnp.full(R, -1, jnp.int32),
            elem=jnp.full(R, -1, jnp.int32),
            uv=jnp.zeros((R, 2), jnp.float32),
            done=jnp.zeros(R, bool),
            it=jnp.zeros((), jnp.int32))

        lanes = jnp.arange(R)

        def body(st: _TravState) -> _TravState:
            # pop one entry per active lane
            empty = st.sp == 0
            done = st.done | empty
            sp = jnp.where(done, st.sp, st.sp - 1)
            entry = st.stack[lanes, jnp.maximum(sp, 0)]
            act = ~done

            is_sent = act & (entry == SENTINEL)
            is_shape = act & ~is_sent & ((entry & SHAPE_BIT) != 0)
            is_world = act & ~is_sent & ~is_shape

            # --- sentinel: back to world space
            cur_inst = jnp.where(is_sent, -1, st.cur_inst)

            # === world-space (instance bvh) node ===
            onode = jnp.clip(entry, 0, bvh.o_start.shape[0] - 1)
            o_hit = is_world & _bbox_test(
                st.lo, st.ldinv, tmin_b, st.tmax,
                bvh.o_bmin[onode], bvh.o_bmax[onode])
            o_internal = bvh.o_internal[onode]
            o_start = bvh.o_start[onode]
            o_axis = bvh.o_axis[onode]

            # === shape-space node ===
            snode = jnp.clip(entry & ~SHAPE_BIT, 0,
                             bvh.s_start.shape[0] - 1)
            s_hit = is_shape & _bbox_test(
                st.lo, st.ldinv, tmin_b, st.tmax,
                bvh.s_bmin[snode], bvh.s_bmax[snode])
            s_internal = bvh.s_internal[snode]
            inst_c = jnp.maximum(cur_inst, 0)
            cshape = scene.inst_shape[inst_c]
            cnode_off = bvh.shape_node_offset[cshape]
            cprim_off = bvh.shape_prim_offset[cshape]
            s_start = bvh.s_start[snode]
            s_num = bvh.s_num[snode]
            s_axis = bvh.s_axis[snode]

            stack_ = st.stack
            sp_ = sp

            # --- push children for internal nodes (ordered by ray sign)
            push_int = (o_hit & o_internal) | (s_hit & s_internal)
            axis = jnp.where(is_world, o_axis, s_axis)
            sign = jnp.take_along_axis(
                st.ldinv, axis[:, None], axis=1)[:, 0] < 0.0
            childA = jnp.where(
                is_world, o_start,
                (cnode_off + s_start) | SHAPE_BIT)
            childB = jnp.where(
                is_world, o_start + 1,
                (cnode_off + s_start + 1) | SHAPE_BIT)
            first = jnp.where(sign, childA, childB)   # popped later
            second = jnp.where(sign, childB, childA)  # popped first
            stack_ = stack_.at[lanes, jnp.minimum(sp_, stack_size - 1)].set(
                jnp.where(push_int, first, stack_[
                    lanes, jnp.minimum(sp_, stack_size - 1)]))
            sp1 = jnp.where(push_int, sp_ + 1, sp_)
            stack_ = stack_.at[lanes, jnp.minimum(sp1, stack_size - 1)].set(
                jnp.where(push_int, second, stack_[
                    lanes, jnp.minimum(sp1, stack_size - 1)]))
            sp_ = jnp.where(push_int, sp1 + 1, sp1)

            # --- world leaf: switch into the instance (1 prim per leaf)
            o_leaf = o_hit & ~o_internal
            new_inst = bvh.o_prims[jnp.clip(o_start, 0,
                                            bvh.o_prims.shape[0] - 1)]
            cur_inst = jnp.where(o_leaf, new_inst, cur_inst)
            ninst_c = jnp.maximum(cur_inst, 0)
            inv = scene.inst_inv_frame[ninst_c]
            nlo = (jnp.einsum("...i,...ij->...j", st.lo, inv[..., :3, :])
                   + inv[..., 3, :])
            nld = jnp.einsum("...i,...ij->...j", st.ld, inv[..., :3, :])
            # world ray registers hold the ORIGINAL ray for world nodes;
            # switching to a shape swaps in the local ray, and the sentinel
            # swaps the world ray back
            lo = jnp.where(o_leaf[:, None], nlo, st.lo)
            ld = jnp.where(o_leaf[:, None], nld, st.ld)
            ldinv = jnp.where(o_leaf[:, None], _safe_inv(nld), st.ldinv)
            # restore world ray on sentinel
            lo = jnp.where(is_sent[:, None], ro, lo)
            ld = jnp.where(is_sent[:, None], rd, ld)
            ldinv = jnp.where(is_sent[:, None], wdinv, ldinv)
            # push sentinel + shape root
            root = (bvh.shape_node_offset[scene.inst_shape[ninst_c]]
                    ) | SHAPE_BIT
            stack_ = stack_.at[lanes, jnp.minimum(sp_, stack_size - 1)].set(
                jnp.where(o_leaf, SENTINEL, stack_[
                    lanes, jnp.minimum(sp_, stack_size - 1)]))
            spA = jnp.where(o_leaf, sp_ + 1, sp_)
            stack_ = stack_.at[lanes, jnp.minimum(spA, stack_size - 1)].set(
                jnp.where(o_leaf, root, stack_[
                    lanes, jnp.minimum(spA, stack_size - 1)]))
            sp_ = jnp.where(o_leaf, spA + 1, spA)

            # --- shape leaf: intersect up to 4 elements
            s_leaf = s_hit & ~s_internal
            hit, inst_b, elem_b, uv_b, tmax = (
                st.hit, st.inst, st.elem, st.uv, st.tmax)
            kind = scene.shape_kind[cshape]
            for k in range(HB.BVH_MAX_PRIMS):
                in_leaf = s_leaf & (k < s_num)
                pidx = jnp.clip(cprim_off + s_start + k, 0,
                                bvh.s_prims.shape[0] - 1)
                gelem = bvh.s_prims[pidx]
                verts = scene.elements[jnp.clip(
                    gelem, 0, scene.elements.shape[0] - 1)]
                p = scene.positions[verts]
                rads = scene.radius[verts]
                ehit, euv, edist = _intersect_element(
                    st.lo, st.ld, tmin_b, tmax, p, rads, kind)
                take = in_leaf & ehit
                hit = hit | take
                inst_b = jnp.where(take, cur_inst, inst_b)
                elem_b = jnp.where(take, gelem, elem_b)
                uv_b = jnp.where(take[:, None], euv, uv_b)
                tmax = jnp.where(take, edist, tmax)

            return _TravState(
                stack=stack_, sp=sp_, cur_inst=cur_inst,
                lo=lo, ld=ld, ldinv=ldinv, tmax=tmax,
                hit=hit, inst=inst_b, elem=elem_b, uv=uv_b,
                done=done, it=st.it + 1)

        def cond(st: _TravState):
            keep = jnp.any(~st.done)
            if find_any:
                keep = keep & ~jnp.all(st.hit | st.done)
            return keep

        st = jax.lax.while_loop(cond, body, st)

        # convert global element id to shape-local (reference convention)
        shape = scene.inst_shape[jnp.maximum(st.inst, 0)]
        elem_local = st.elem - scene.shape_elem_start[shape]
        return SceneIntersection(
            hit=st.hit,
            instance=jnp.where(st.hit, st.inst, -1),
            element=jnp.where(st.hit, elem_local, -1),
            uv=jnp.where(st.hit[:, None], st.uv, 0.0),
            distance=jnp.where(st.hit, st.tmax, M.flt_max))

    return intersect
