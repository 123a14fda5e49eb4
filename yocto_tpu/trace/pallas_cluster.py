"""Tile-binned cluster intersector: the TPU "Embree fast path".

The reference offers two intersector tiers: its own BVH and, when
available, Embree as the tuned fast path (yocto_bvh.cpp:855-1110). On TPU
the analogous duality is the threaded-BVH gather walk (trace/bvh.py, the
correctness path) vs THIS module, which replaces per-lane pointer chasing
— one slow gather per node per lane — with dense tile sweeps:

1. **Cluster build (host).** Each shape's BVH is cut into maximal
   treelets of <= CLUSTER primitives; a treelet's primitives are a
   contiguous range of the builder's permutation and its node bbox is
   their tight bound (yocto_bvh.cpp:238-302 semantics). Candidates are
   packed like pallas_intersect.pack_candidates ([32, C] SoA planes),
   one fixed-width column block per cluster.

2. **Sort + cull (device, XLA).** Rays are sorted by an adaptive morton
   key (direction fan + origin cell) so consecutive rays trace coherent
   frusta, then slab-tested against every cluster bbox (dense [R, C]
   elementwise sweep, a few % of a full primitive sweep). For each tile
   of RAY_TILE sorted rays this yields the tile's cluster list sorted by
   nearest bbox entry, plus each lane's LAST possible entry (for the
   per-lane done test). One tiny [T, C] sort — no pair expansion, no
   scatters, no ray gathers (those dominated a per-ray binning variant:
   ~65 ns/pair of scatter/gather overhead measured on v5e).

3. **Sweep (device, Pallas).** One program per tile: a while-loop walks
   the entry-sorted slots, double-buffer-DMAs each cluster's [32,
   CLUSTER] block from HBM into VMEM scratch, and folds it into the
   closest-hit state held in the output block. The loop stops once no
   lane can improve — a lane can improve only while slots remain with
   entry <= its own last entry and < its current best (the tile-granular
   analogue of ordered stack traversal with tmax shrink,
   yocto_bvh.cpp:460-552). Each cluster is homogeneous in primitive kind
   and statically dispatched (pl.when) to a specialized sweep variant:
   triangles/quads are baked WORLD-SPACE with precomputed Moller-Trumbore
   edges (no per-test ray transform), lines/points stay instance-local
   (yocto_geometry.h:697-836 semantics).

Closest-hit equals brute force up to candidate-order tie-breaks at exactly
equal t. Tiles hitting more than `max_slots` clusters drop the farthest
overflow (diagnosed by tile_stats; default sized generously for the
corpus — raise `max_slots` for pathological incoherence).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.scene import SceneData
from ..ops import bvh as HB
from ..ops import mathops as M
from .compile import KIND_LINES, KIND_POINTS, KIND_QUADS
from .intersect import RAY_EPS, SceneIntersection
from .pallas_intersect import _i32

CLUSTER = 512        # candidates per cluster (= sweep block width):
                     # round-3 sweep on features1 (444k cands) measured
                     # camera isect 111 -> 63 ms and bounce 247 -> 208 ms
                     # vs 256 (fewer slot visits + half the cull/sort)
RAY_TILE = 64        # rays per tile (= sweep block height)
CLUSTER_CHUNK = 128  # clusters per stage-2 XLA chunk (bounds temporaries)
BBOX_EPS = 1.00000024  # reference slab-test epsilon (yocto_geometry.h)


def _shape_order_and_kind(shape):
    """Element vertex table + BVH primitive order for one shape."""
    nv = len(shape.positions)
    pos = np.asarray(shape.positions, np.float32).reshape(-1, 3)
    rad = (np.asarray(shape.radius, np.float32).reshape(-1)
           if len(shape.radius) == nv else np.zeros(nv, np.float32))
    if len(shape.triangles):
        tris = np.asarray(shape.triangles, np.int64)
        verts = np.concatenate([tris, tris[:, 2:3]], 1)
        kind = 2
    elif len(shape.quads):
        verts = np.asarray(shape.quads, np.int64)
        kind = 3
    elif len(shape.lines):
        lines = np.asarray(shape.lines, np.int64)
        verts = np.concatenate([lines, lines[:, 1:2], lines[:, 1:2]], 1)
        kind = KIND_LINES
    elif len(shape.points):
        pts = np.asarray(shape.points, np.int64).reshape(-1, 1)
        verts = np.repeat(pts, 4, 1)
        kind = KIND_POINTS
    else:
        return None
    return pos, rad, verts, kind


def _bvh_treelets(sb, cluster, merge_area_ratio=None):
    """Maximal BVH subtrees with <= cluster primitives.

    The builder partitions the primitive permutation recursively, so every
    subtree owns a CONTIGUOUS primitive range and its node bbox is the
    tight bound of exactly those primitives. Returns [(start, count,
    bbox_lo, bbox_hi), ...] in DFS order.
    """
    n = len(sb.start)
    # per-node contiguous primitive range (post-order accumulation)
    lo = np.empty(n, np.int64)
    hi = np.empty(n, np.int64)
    order = []
    stack = [0]
    while stack:
        node = stack.pop()
        order.append(node)
        if sb.internal[node]:
            stack.append(sb.start[node])
            stack.append(sb.start[node] + 1)
    for node in reversed(order):
        if sb.internal[node]:
            c = sb.start[node]
            lo[node] = min(lo[c], lo[c + 1])
            hi[node] = max(hi[c], hi[c + 1])
        else:
            lo[node] = sb.start[node]
            hi[node] = sb.start[node] + sb.num[node]

    out = []
    stack = [0]
    while stack:
        node = stack.pop()
        count = hi[node] - lo[node]
        if count <= cluster or not sb.internal[node]:
            out.append((int(lo[node]), int(count),
                        sb.bbox_min[node].copy(), sb.bbox_max[node].copy()))
        else:
            stack.append(sb.start[node] + 1)
            stack.append(sb.start[node])

    # greedy packing: maximal treelets average ~2/3 fill (a subtree one
    # prim over `cluster` splits into two half-full children), and the
    # sweep pays per SLOT — 512 tests whether the block is full or not.
    # Adjacent DFS treelets cover contiguous primitive ranges, so merging
    # neighbors while the sum fits keeps ranges contiguous; the union
    # bbox is looser, but fewer/fuller blocks won on features1 (1289 ->
    # ~870 clusters, same total tests per full block).
    def _half_area(lo, hi):
        d = np.maximum(hi - lo, 0.0)
        return d[0] * d[1] + d[1] * d[2] + d[2] * d[0]

    packed = []
    for tl in out:
        if (packed and packed[-1][1] + tl[1] <= cluster
                and tl[0] == packed[-1][0] + packed[-1][1]):
            s, c, blo, bhi = packed[-1]
            ulo = np.minimum(blo, tl[2])
            uhi = np.maximum(bhi, tl[3])
            # SAH-flavored merge gate (merge_area_ratio): refuse merges
            # whose union bbox is much bigger than the parts — a loose
            # union makes every tile's cull hit the cluster, trading
            # fill for wasted sweep slots. None = always merge (the
            # round-2 greedy packing).
            if (merge_area_ratio is not None
                    and _half_area(ulo, uhi) > merge_area_ratio
                    * (_half_area(blo, bhi) + _half_area(tl[2], tl[3]))):
                packed.append(list(tl))
            else:
                packed[-1] = (s, c + tl[1], ulo, uhi)
        else:
            packed.append(list(tl))
    return [tuple(p) for p in packed]


# per-cluster sweep variants (static dispatch inside the kernel)
VAR_TRI = 0    # world-space triangles, precomputed edges, 1 test/slot
VAR_QUAD = 1   # world-space split-quads, precomputed edges, 2 tests/slot
VAR_LINE = 2   # instance-local lines (ray transform; radius semantics)
VAR_POINT = 3  # instance-local points


def build_cluster_tables(scene: SceneData, cluster: int = CLUSTER,
                         highquality: bool = False,
                         merge_area_ratio=None):
    """Host build -> (prims [32, C*cluster], cbmin [C,3], cbmax [C,3],
    ckind [C]).

    Clusters are maximal BVH treelets (tight node bboxes, contiguous
    primitive ranges), one column-block of `cluster` slots each; unused
    slots are all-zero verts (guaranteed miss, ids -1).

    Surface clusters (triangles/quads) bake WORLD-SPACE vertices with
    precomputed Moller-Trumbore edges — the per-test ray transform
    (36 VPU flops) and edge subtractions (6) vanish from the sweep,
    which is VPU-bound (BASELINE.md round-2 notes). Instancing still
    works because every instance owns its own column blocks. Layout:
      rows 0-2  p0.xyz (world)      rows 9-11  p2.xyz (world)
      rows 3-5  e1 = p1-p0          rows 12-14 e1b = p3-p2
      rows 6-8  e2 = p3-p0          rows 15-17 e2b = p1-p2
      rows 26-28 instance id, element id, kind (int32 bit patterns)
    Line/point clusters keep the instance-local layout of
    pallas_intersect.pack_candidates (rows 0-11 verts, 12-23 inverse
    frame, 24-25 radii) — radii are defined in instance space and the
    reference intersects them through the transformed ray
    (yocto_bvh.cpp:602).
    """
    shape_cache = {}
    col_blocks = []
    cb_lo, cb_hi, c_kind = [], [], []
    for iidx, inst in enumerate(scene.instances):
        got = _shape_order_and_kind(scene.shapes[inst.shape])
        if got is None:
            continue
        pos, rad, verts, kind = got
        if inst.shape not in shape_cache:
            eb = HB.shape_element_bounds(scene.shapes[inst.shape])
            sb = HB.make_bvh(eb, highquality)
            shape_cache[inst.shape] = (
                sb.primitives.astype(np.int64),
                _bvh_treelets(sb, cluster, merge_area_ratio))
        order, treelets = shape_cache[inst.shape]
        n = len(order)
        frame = np.asarray(inst.frame, np.float32)
        surface = kind in (2, 3)

        v = verts[order]
        block = np.zeros((32, n), np.float32)
        if surface:
            pos_w = pos @ frame[:3] + frame[3]
            p = [pos_w[v[:, k]].T for k in range(4)]  # 4 x [3, n]
            block[0:3] = p[0]
            block[3:6] = p[1] - p[0]
            block[6:9] = p[3] - p[0]
            block[9:12] = p[2]
            block[12:15] = p[3] - p[2]
            block[15:18] = p[1] - p[2]
            variant = VAR_QUAD if kind == KIND_QUADS else VAR_TRI
        else:
            inv_rot = np.linalg.inv(frame[:3].astype(np.float64)).astype(
                np.float32)
            inv_o = -(frame[3] @ inv_rot)
            for k in range(4):
                block[3 * k:3 * k + 3] = pos[v[:, k]].T
            block[12:21] = np.repeat(inv_rot.reshape(9, 1), n, axis=1)
            block[21:24] = np.repeat(inv_o.reshape(3, 1), n, axis=1)
            block[24] = rad[v[:, 0]]
            block[25] = rad[v[:, 1]]
            variant = VAR_LINE if kind == KIND_LINES else VAR_POINT
        block[26] = np.full(n, iidx, np.int32).view(np.float32)
        block[27] = order.astype(np.int32).view(np.float32)
        block[28] = np.full(n, kind, np.int32).view(np.float32)

        corners8 = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
                    (1, 1, 0), (1, 0, 1), (0, 1, 1), (1, 1, 1)]
        for start, count, tlo, thi in treelets:
            c_kind.append(variant)
            padded = np.zeros((32, cluster), np.float32)
            padded[:, :count] = block[:, start:start + count]
            padded[26, count:] = np.full(
                cluster - count, -1, np.int32).view(np.float32)
            padded[27, count:] = np.full(
                cluster - count, -1, np.int32).view(np.float32)
            padded[28, count:] = np.full(
                cluster - count, 2, np.int32).view(np.float32)
            col_blocks.append(padded)
            wc = np.stack([np.where(np.array(m, bool), thi, tlo)
                           for m in corners8]) @ frame[:3] + frame[3]
            cb_lo.append(wc.min(0))
            cb_hi.append(wc.max(0))

    if not col_blocks:
        return None
    prims = np.concatenate(col_blocks, axis=1)
    return (prims, np.asarray(cb_lo, np.float32),
            np.asarray(cb_hi, np.float32),
            np.asarray(c_kind, np.int32))


def _tri_isect_pre(rox, roy, roz, rdx, rdy, rdz, tmin, tmax,
                   ax, ay, az, e1x, e1y, e1z, e2x, e2y, e2z):
    """Moller-Trumbore with PRECOMPUTED edges (yocto_geometry.h:794-826
    semantics; the edge subtractions are baked into the cluster tables at
    build time, so the sweep's per-test cost drops from ~94 to ~59 VPU
    ops)."""
    pvx = rdy * e2z - rdz * e2y
    pvy = rdz * e2x - rdx * e2z
    pvz = rdx * e2y - rdy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    inv_det = 1.0 / jnp.where(det == 0.0, 1.0, det)
    tvx, tvy, tvz = rox - ax, roy - ay, roz - az
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (rdx * qvx + rdy * qvy + rdz * qvz) * inv_det
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
    hit = ((det != 0.0) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
           & (u + v <= 1.0) & (t >= tmin) & (t <= tmax))
    return hit, u, v, t


def _subtile_acc(rays_ref, prims_ref, outf_ref, outi_ref, *, cpad, variant,
                 anyhit=False):
    """Candidate sweep for one (ray tile, cluster) block; improves the
    best-hit state in outf/outi in place (cross-slot VMEM accumulation;
    strict-< keeps the earlier slot on exact ties). First-closest
    semantics identical to pallas_intersect._subtile.

    `anyhit`: shadow-ray mode (yocto_bvh.cpp:540-552 find_any): a lane is
    done the moment ANY candidate hits in (tmin, tmax) — best_t is pinned
    to 0 so the slot loop's ordered early-out retires it immediately, and
    the closest-hit pick/select epilogue is skipped entirely.

    `variant` statically selects the cluster layout + primitive test:
      VAR_TRI / VAR_QUAD  world-space vertices with precomputed
                          Moller-Trumbore edges — no per-test ray
                          transform, no edge subtractions;
      VAR_LINE / VAR_POINT  instance-local candidates behind an inverse
                          frame (radius semantics match the reference's
                          transformed-ray intersection, yocto_bvh.cpp:602).
    """
    rox = rays_ref[:, 0:1]
    roy = rays_ref[:, 1:2]
    roz = rays_ref[:, 2:3]
    rdx = rays_ref[:, 3:4]
    rdy = rays_ref[:, 4:5]
    rdz = rays_ref[:, 5:6]
    tmin = rays_ref[:, 6:7]
    tr = rox.shape[0]

    prev_hit = outf_ref[:, 0:1]
    best_t = jnp.where(prev_hit > 0.0, outf_ref[:, 1:2],
                       jnp.full((tr, 1), M.flt_max, jnp.float32))
    best_hit = prev_hit
    tmax = jnp.minimum(rays_ref[:, 7:8], best_t)
    best_u = outf_ref[:, 2:3]
    best_v = outf_ref[:, 3:4]
    best_inst = outi_ref[:, 0:1]
    best_elem = outi_ref[:, 1:2]

    from .pallas_intersect import LANE

    for c0 in range(0, cpad, LANE):
        sub = prims_ref[:, c0:c0 + LANE]
        r = lambda k: sub[k:k + 1, :]

        if variant in (VAR_TRI, VAR_QUAD):
            # world-space candidates: test directly against the world ray
            h1, u1, v1, t1 = _tri_isect_pre(
                rox, roy, roz, rdx, rdy, rdz, tmin, tmax,
                r(0), r(1), r(2), r(3), r(4), r(5), r(6), r(7), r(8))
            if variant == VAR_QUAD:
                h2, u2, v2, t2 = _tri_isect_pre(
                    rox, roy, roz, rdx, rdy, rdz, tmin, tmax,
                    r(9), r(10), r(11), r(12), r(13), r(14),
                    r(15), r(16), r(17))
                t1m = jnp.where(h1, t1, M.flt_max)
                t2m = jnp.where(h2, t2, M.flt_max)
                take1 = t1m < t2m
                hit = (take1 & h1) | (~take1 & h2)
                u = jnp.where(take1, jnp.where(h1, u1, 0.0),
                              jnp.where(h2, 1.0 - u2, 0.0))
                v = jnp.where(take1, jnp.where(h1, v1, 0.0),
                              jnp.where(h2, 1.0 - v2, 0.0))
                t = jnp.minimum(t1m, t2m)
            else:
                hit = h1
                u = jnp.where(h1, u1, 0.0)
                v = jnp.where(h1, v1, 0.0)
                t = jnp.where(h1, t1, M.flt_max)
        else:
            # instance-local candidates: transform the ray per slot
            lox = rox * r(12) + roy * r(15) + roz * r(18) + r(21)
            loy = rox * r(13) + roy * r(16) + roz * r(19) + r(22)
            loz = rox * r(14) + roy * r(17) + roz * r(20) + r(23)
            ldx = rdx * r(12) + rdy * r(15) + rdz * r(18)
            ldy = rdx * r(13) + rdy * r(16) + rdz * r(19)
            ldz = rdx * r(14) + rdy * r(17) + rdz * r(20)
            p0x, p0y, p0z = r(0), r(1), r(2)
            p1x, p1y, p1z = r(3), r(4), r(5)
            # zero-padded slots would otherwise intersect as a degenerate
            # radius-0 primitive at the local origin
            valid = _i32(r(26)) >= 0
            if variant == VAR_LINE:
                r0 = r(24)
                r1 = r(25)
                vx, vy, vz = p1x - p0x, p1y - p0y, p1z - p0z
                wx, wy, wz = lox - p0x, loy - p0y, loz - p0z
                a = ldx * ldx + ldy * ldy + ldz * ldz
                b = ldx * vx + ldy * vy + ldz * vz
                cc = vx * vx + vy * vy + vz * vz
                d = ldx * wx + ldy * wy + ldz * wz
                e = vx * wx + vy * wy + vz * wz
                det = a * cc - b * b
                sdet = jnp.where(det == 0.0, 1.0, det)
                tl = (b * e - cc * d) / sdet
                sl = (a * e - b * d) / sdet
                ok = valid & (det != 0.0) & (tl >= tmin) & (tl <= tmax)
                sl = jnp.clip(sl, 0.0, 1.0)
                dpx = (lox + ldx * tl) - (p0x + vx * sl)
                dpy = (loy + ldy * tl) - (p0y + vy * sl)
                dpz = (loz + ldz * tl) - (p0z + vz * sl)
                d2 = dpx * dpx + dpy * dpy + dpz * dpz
                rr = r0 * (1.0 - sl) + r1 * sl
                hit = ok & (d2 <= rr * rr)
                u = jnp.where(hit, sl, 0.0)
                v = jnp.where(
                    hit, jnp.sqrt(d2) / jnp.where(rr == 0.0, 1.0, rr), 0.0)
                t = jnp.where(hit, tl, M.flt_max)
            else:  # VAR_POINT
                r0 = r(24)
                wx, wy, wz = p0x - lox, p0y - loy, p0z - loz
                dd = ldx * ldx + ldy * ldy + ldz * ldz
                tp = (wx * ldx + wy * ldy + wz * ldz) / dd
                in_range = valid & (tp >= tmin) & (tp <= tmax)
                prx = p0x - (lox + ldx * tp)
                pry = p0y - (loy + ldy * tp)
                prz = p0z - (loz + ldz * tp)
                hit = in_range & (prx * prx + pry * pry + prz * prz
                                  <= r0 * r0)
                u = jnp.zeros_like(tp)
                v = jnp.zeros_like(tp)
                t = jnp.where(hit, tp, M.flt_max)

        if anyhit:
            got = jnp.max(jnp.where(hit, 1.0, 0.0), axis=1, keepdims=True)
            best_hit = jnp.maximum(best_hit, got)
            # pin best_t to 0 for hit lanes: can_improve's ce < bt test
            # retires them, and tmax <= 0 fails every later candidate
            best_t = jnp.where(best_hit > 0.0, 0.0, best_t)
            tmax = jnp.minimum(tmax, best_t)
            continue

        dist = jnp.where(hit, t, M.flt_max)
        dmin = jnp.min(dist, axis=1, keepdims=True)
        lanes = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
        pick_lane = jnp.min(
            jnp.where(dist == dmin, lanes, LANE), axis=1, keepdims=True)
        pick = lanes == pick_lane
        sel = lambda x: jnp.sum(jnp.where(pick, x, 0.0), axis=1,
                                keepdims=True)
        seli = lambda x: jnp.max(jnp.where(pick, x, jnp.int32(-(2**31))),
                                 axis=1, keepdims=True)
        better = dmin < best_t
        best_u = jnp.where(better, sel(u), best_u)
        best_v = jnp.where(better, sel(v), best_v)
        best_hit = jnp.where(better, sel(jnp.where(hit, 1.0, 0.0)),
                             best_hit)
        best_inst = jnp.where(better, seli(_i32(r(26))), best_inst)
        best_elem = jnp.where(better, seli(_i32(r(27))), best_elem)
        best_t = jnp.where(better, dmin, best_t)
        tmax = jnp.minimum(tmax, best_t)

    outf_ref[:, 0:1] = best_hit
    outf_ref[:, 1:2] = best_t
    outf_ref[:, 2:3] = best_u
    outf_ref[:, 3:4] = best_v
    outf_ref[:, 4:8] = jnp.zeros((tr, 4), jnp.float32)
    outi_ref[:, 0:1] = best_inst
    outi_ref[:, 1:2] = best_elem
    outi_ref[:, 2:8] = jnp.zeros((tr, 6), jnp.int32)


def _sweep_kernel(rays_ref, clist_ref, centry_ref, ckind_ref, prims_ref,
                  outf_ref, outi_ref, buf_ref, sem_ref, *, cluster,
                  variants, anyhit=False):
    """One program per ray tile: dynamic while-loop over the tile's
    entry-sorted cluster slots with ordered-traversal early-out.

    Each iteration DMAs one [32, cluster] candidate block from HBM into
    VMEM scratch and folds it into the closest-hit state held in the
    output blocks. Once EVERY live lane's closest hit is nearer than the
    next slot's bbox entry, the loop stops — the tile-granular analogue
    of the reference's ordered stack traversal with tmax shrink
    (yocto_bvh.cpp:460-552). Empty slots cost nothing.
    """
    max_slots = clist_ref.shape[2]
    outf_ref[...] = jnp.zeros_like(outf_ref)
    outi_ref[...] = jnp.full(outi_ref.shape, -1, jnp.int32)
    # per-lane last possible cluster entry (max over the lane's own culled
    # clusters; -inf for dead lanes), packed as ray column 8
    maxent = rays_ref[:, 8:9]

    def fetch(slot, cid):
        return pltpu.make_async_copy(
            prims_ref.at[:, pl.ds(cid * cluster, cluster)],
            buf_ref.at[slot % 2], sem_ref.at[slot % 2])

    def can_improve(slot):
        """Any lane that could still find a nearer hit at this slot?

        Slots are sorted by tile-min entry `ce`. A lane can improve iff
        some of ITS OWN clusters remain (ce <= its max entry — every
        remaining cluster has tile-entry >= ce, and the lane's entry for
        a cluster is >= the tile entry) AND a nearer hit is possible
        (ce < its current best)."""
        idx = jnp.minimum(slot, max_slots - 1)
        cid = clist_ref[0, 0, idx]
        ce = centry_ref[0, 0, idx]
        bt = jnp.where(outf_ref[:, 0:1] > 0.0, outf_ref[:, 1:2],
                       M.flt_max)
        can = (ce <= maxent) & (ce < bt)
        return (slot < max_slots) & (cid >= 0) & jnp.any(can)

    run0 = can_improve(jnp.int32(0))

    @pl.when(run0)
    def _():
        fetch(jnp.int32(0), clist_ref[0, 0, 0]).start()

    def body(carry):
        slot, _ = carry
        # prefetch the next valid slot unconditionally (scalar check only;
        # the post-sweep early-out may discard it below)
        nidx = jnp.minimum(slot + 1, max_slots - 1)
        nxt_pre = (slot + 1 < max_slots) & (clist_ref[0, 0, nidx] >= 0)

        @pl.when(nxt_pre)
        def _():
            fetch(slot + 1, clist_ref[0, 0, nidx]).start()

        fetch(slot, clist_ref[0, 0, slot]).wait()
        if len(variants) == 1:
            _subtile_acc(rays_ref, buf_ref.at[slot % 2], outf_ref,
                         outi_ref, cpad=cluster, variant=variants[0],
                         anyhit=anyhit)
        else:
            ck = ckind_ref[0, 0, slot]
            for vr in variants:
                @pl.when(ck == vr)
                def _(vr=vr):
                    _subtile_acc(rays_ref, buf_ref.at[slot % 2], outf_ref,
                                 outi_ref, cpad=cluster, variant=vr,
                                 anyhit=anyhit)
        cont = nxt_pre & can_improve(slot + 1)

        # a prefetch that post-sweep early-out discards must still be
        # consumed, or the DMA semaphore leaks past kernel exit
        @pl.when(nxt_pre & ~cont)
        def _():
            fetch(slot + 1,
                  clist_ref[0, 0, jnp.minimum(slot + 1,
                                              max_slots - 1)]).wait()

        return slot + 1, cont

    jax.lax.while_loop(lambda c: c[1], body, (jnp.int32(0), run0))


@functools.partial(
    jax.jit, static_argnames=("cluster", "variants", "interpret",
                              "ray_tile", "anyhit"))
def _run_sweep(rays, prims, clist, centry, ckind, cluster, variants,
               interpret, ray_tile=RAY_TILE, anyhit=False):
    rpad = rays.shape[0]
    ntiles = rpad // ray_tile
    max_slots = clist.shape[1]
    clist = clist[:, None, :]
    centry = centry[:, None, :]
    ckind = ckind[:, None, :]
    return pl.pallas_call(
        functools.partial(_sweep_kernel, cluster=cluster,
                          variants=variants, anyhit=anyhit),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((ray_tile, 16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, max_slots), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, max_slots), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, max_slots), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec((ray_tile, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_tile, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rpad, 8), jnp.float32),
            jax.ShapeDtypeStruct((rpad, 8), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 32, cluster), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(rays, clist, centry, ckind, prims)


def _cluster_mask(ro, rinv, tmin, tmax, lo, hi):
    """Slab test of every ray against a chunk of cluster bboxes.

    ro/rinv: [R,3]; lo/hi: [cc,3] -> (hit bool [R,cc], entry t [R,cc]).
    Same arithmetic as the node test in trace/bvh.py (reference
    intersect_bbox semantics).
    """
    t0 = jnp.broadcast_to(tmin[:, None], (ro.shape[0], lo.shape[0]))
    t1 = jnp.broadcast_to(tmax[:, None], (ro.shape[0], lo.shape[0]))
    # per-component accumulation keeps temporaries 2-D ([R, cc]); a
    # single broadcast over the trailing axis materializes [R, cc, 3]
    # slabs, which OOMs at large ray counts
    for a in range(3):
        t_a = (lo[None, :, a] - ro[:, a, None]) * rinv[:, a, None]
        t_b = (hi[None, :, a] - ro[:, a, None]) * rinv[:, a, None]
        t0 = jnp.maximum(t0, jnp.minimum(t_a, t_b))
        t1 = jnp.minimum(t1, jnp.maximum(t_a, t_b))
    return t0 <= t1 * BBOX_EPS, t0


def ray_sort_keys(ro, rd, bits=6):
    """Coherence keys: 5-D interleaved morton of (origin xyz, dir theta/
    phi), each coordinate quantized to the BATCH's own range.

    Interleaving (rather than origin-bits-then-direction-bits) matters:
    at realistic batch sizes a sort only resolves the top ~20 key bits,
    and a concatenated key spends all of them on origin — bounce-ray
    tiles then share a surface patch but span every direction, and their
    culled-cluster unions stay huge. Interleaved bits split tiles by
    position AND direction at matched scales. Camera batches (shared
    origin) collapse the origin bits and sort by direction alone, i.e.
    2-D image-morton blocks. Returns int32 keys (non-negative).
    """
    theta = jnp.arccos(jnp.clip(rd[:, 1], -1.0, 1.0))
    phi = jnp.arctan2(rd[:, 2], rd[:, 0])

    def quant(v):
        lo = jnp.min(v)
        hi = jnp.max(v)
        scale = (2.0 ** bits - 1.0) / jnp.maximum(hi - lo, 1e-20)
        return jnp.clip((v - lo) * scale, 0.0,
                        2.0 ** bits - 1.0).astype(jnp.int32)

    coords = [quant(ro[:, 0]), quant(ro[:, 1]), quant(ro[:, 2]),
              quant(theta), quant(phi)]
    key = jnp.zeros(ro.shape[0], jnp.int32)
    for b in range(bits):
        for c, q in enumerate(coords):
            key = key | (((q >> b) & 1) << (5 * b + c))
    return key


class ClusterIntersector:
    """Callable intersect(scene, ro, rd, tmin, tmax) -> SceneIntersection."""

    def __init__(self, scene_host: SceneData, kinds=None, interpret=None,
                 cluster: int = CLUSTER, max_slots: int = 192,
                 highquality: bool = False, sort_rays: bool = True,
                 ray_tile: int = RAY_TILE, merge_area_ratio=None,
                 use_topk: bool = False):
        self.sort_rays = sort_rays
        self.ray_tile = ray_tile
        self.use_topk = use_topk
        built = build_cluster_tables(scene_host, cluster, highquality,
                                     merge_area_ratio)
        if built is None:
            raise ValueError("scene has no candidates")
        prims, cb_lo, cb_hi, c_kind = built
        self.prims = jnp.asarray(prims)
        self.cb_lo = jnp.asarray(cb_lo)
        self.cb_hi = jnp.asarray(cb_hi)
        self.c_kind = jnp.asarray(c_kind)
        # static sweep variants present in THIS scene's tables; the kernel
        # emits one pl.when branch per variant (kinds param kept for API
        # compatibility — the tables themselves are authoritative)
        self.variants = tuple(sorted(int(v) for v in set(c_kind.tolist())))
        self.n_clusters = cb_lo.shape[0]
        self.cluster = cluster
        self.max_slots = min(max_slots, self.n_clusters)
        if kinds is None:
            kinds = (KIND_POINTS, KIND_LINES, 2, 3)
        self.kinds = tuple(kinds)
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        self.interpret = interpret

    def _tile_clusters(self, ro, rd, tmin_b, tmax_b, ntiles):
        """Per-tile cluster lists sorted by nearest bbox entry.

        Returns (clist [T, max_slots] i32, -1 = empty; centry [T,
        max_slots] f32 tile-min entry t per slot; counts [T])."""
        C = self.n_clusters
        rinv = 1.0 / jnp.where(rd == 0.0, 1e-38, rd)
        entries = []
        maxent = jnp.full(ro.shape[0], -M.flt_max, jnp.float32)
        for c0 in range(0, C, CLUSTER_CHUNK):
            m, t0 = _cluster_mask(ro, rinv, tmin_b, tmax_b,
                                  self.cb_lo[c0:c0 + CLUSTER_CHUNK],
                                  self.cb_hi[c0:c0 + CLUSTER_CHUNK])
            te = jnp.where(m, t0, M.flt_max)
            entries.append(te.reshape(ntiles, self.ray_tile, -1).min(1))
            maxent = jnp.maximum(
                maxent, jnp.where(m, t0, -M.flt_max).max(1))
        tile_entry = jnp.concatenate(entries, axis=1)       # [T, C]
        k = min(self.max_slots, C)
        if self.use_topk:
            # only the nearest max_slots clusters matter; top_k beats a
            # full [T, C] sort once C >> max_slots
            neg, cid_s = jax.lax.top_k(-tile_entry, k)
            entry_s = -neg
        else:
            # sort hit clusters by entry t; misses (flt_max) sort last
            cid = jax.lax.broadcasted_iota(jnp.int32, (ntiles, C), 1)
            entry_s, cid_s = jax.lax.sort(
                (tile_entry, cid), dimension=1, num_keys=1)
            entry_s = entry_s[:, :k]
            cid_s = cid_s[:, :k]
        clist = jnp.where(entry_s < M.flt_max, cid_s, -1).astype(jnp.int32)
        counts = (tile_entry < M.flt_max).sum(1)
        return clist, entry_s, maxent, counts

    def __call__(self, scene, ro, rd, tmin=RAY_EPS, tmax=M.flt_max):
        del scene  # candidate tables are baked at build time
        R = ro.shape[0]
        rpad = ((R + self.ray_tile - 1) // self.ray_tile) * self.ray_tile
        ntiles = rpad // self.ray_tile
        tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (R,))
        tmax_b = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (R,))

        if self.sort_rays:
            order = jnp.argsort(ray_sort_keys(ro, rd))
            ro, rd = ro[order], rd[order]
            tmin_b, tmax_b = tmin_b[order], tmax_b[order]

        def pad(x, fill=0.0):
            if rpad == R:
                return x
            width = ((0, rpad - R),) + ((0, 0),) * (x.ndim - 1)
            return jnp.pad(x, width, constant_values=fill)

        ro_p, rd_p = pad(ro), pad(rd)
        tmin_p = pad(tmin_b, 1.0)
        tmax_p = pad(tmax_b, 0.0)  # padding rays: tmin > tmax -> dead
        clist, centry, maxent, _ = self._tile_clusters(
            ro_p, rd_p, tmin_p, tmax_p, ntiles)
        rays = jnp.concatenate(
            [ro_p, rd_p, tmin_p[:, None], tmax_p[:, None],
             maxent[:, None],
             jnp.zeros((rpad, 7), jnp.float32)], axis=1)
        ckind = jnp.where(clist >= 0,
                          self.c_kind[jnp.maximum(clist, 0)], 0)
        outf, outi = _run_sweep(rays, self.prims, clist, centry, ckind,
                                self.cluster, self.variants,
                                self.interpret, ray_tile=self.ray_tile)
        outf, outi = outf[:R], outi[:R]
        if self.sort_rays:
            inv = jnp.zeros(R, jnp.int32).at[order].set(
                jnp.arange(R, dtype=jnp.int32))
            outf, outi = outf[inv], outi[inv]
        hit = outf[:, 0] > 0.0
        return SceneIntersection(
            hit=hit,
            instance=jnp.where(hit, outi[:, 0], -1),
            element=jnp.where(hit, outi[:, 1], -1),
            uv=jnp.where(hit[:, None], outf[:, 2:4], 0.0),
            distance=jnp.where(hit, outf[:, 1], M.flt_max))

    def any_hit(self, ro, rd, tmin=RAY_EPS, tmax=M.flt_max):
        """Shadow-ray query: True where ANY candidate lies in (tmin,
        tmax) (yocto_bvh.cpp:540-552 find_any semantics). Same cull +
        sort pipeline as closest-hit, but each lane retires at its first
        hit and the select epilogue is skipped; with tmax = distance to
        the light, the cull also drops every cluster beyond it."""
        R = ro.shape[0]
        rpad = ((R + self.ray_tile - 1) // self.ray_tile) * self.ray_tile
        ntiles = rpad // self.ray_tile
        tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (R,))
        tmax_b = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (R,))

        if self.sort_rays:
            order = jnp.argsort(ray_sort_keys(ro, rd))
            ro, rd = ro[order], rd[order]
            tmin_b, tmax_b = tmin_b[order], tmax_b[order]

        def pad(x, fill=0.0):
            if rpad == R:
                return x
            width = ((0, rpad - R),) + ((0, 0),) * (x.ndim - 1)
            return jnp.pad(x, width, constant_values=fill)

        ro_p, rd_p = pad(ro), pad(rd)
        tmin_p = pad(tmin_b, 1.0)
        tmax_p = pad(tmax_b, 0.0)
        clist, centry, maxent, _ = self._tile_clusters(
            ro_p, rd_p, tmin_p, tmax_p, ntiles)
        rays = jnp.concatenate(
            [ro_p, rd_p, tmin_p[:, None], tmax_p[:, None],
             maxent[:, None],
             jnp.zeros((rpad, 7), jnp.float32)], axis=1)
        ckind = jnp.where(clist >= 0,
                          self.c_kind[jnp.maximum(clist, 0)], 0)
        outf, _ = _run_sweep(rays, self.prims, clist, centry, ckind,
                             self.cluster, self.variants,
                             self.interpret, ray_tile=self.ray_tile,
                             anyhit=True)
        hit = outf[:R, 0] > 0.0
        if self.sort_rays:
            inv = jnp.zeros(R, jnp.int32).at[order].set(
                jnp.arange(R, dtype=jnp.int32))
            hit = hit[inv]
        return hit

    def tile_stats(self, ro, rd, tmin=RAY_EPS, tmax=M.flt_max):
        """Diagnostics: (mean clusters/tile, max clusters/tile, overflow
        tile count) for a ray batch (after the coherence sort)."""
        R = ro.shape[0]
        if self.sort_rays:
            order = np.asarray(jnp.argsort(ray_sort_keys(ro, rd)))
            ro, rd = ro[order], rd[order]
        rpad = ((R + self.ray_tile - 1) // self.ray_tile) * self.ray_tile
        ntiles = rpad // self.ray_tile
        tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (rpad,))
        tmax_b = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (R,)),
             jnp.zeros(rpad - R, jnp.float32)])
        ro_p = jnp.pad(ro, ((0, rpad - R), (0, 0)))
        rd_p = jnp.pad(rd, ((0, rpad - R), (0, 0)))
        _, _, _, counts = self._tile_clusters(ro_p, rd_p, tmin_b, tmax_b,
                                           ntiles)
        counts = np.asarray(counts)
        return (float(counts.mean()), int(counts.max()),
                int((counts > self.max_slots).sum()))


def make_cluster_intersector(scene_host: SceneData, kinds=None,
                             interpret=None, cluster: int = CLUSTER,
                             max_slots: int = 192,
                             highquality: bool = False,
                             sort_rays: bool = True,
                             ray_tile: int = RAY_TILE,
                             merge_area_ratio=None,
                             use_topk: bool = False):
    """Factory mirroring make_pallas_bruteforce_intersector's signature.
    Returns None for scenes small enough that the dense sweep wins."""
    ncands = 0
    for inst in scene_host.instances:
        s = scene_host.shapes[inst.shape]
        ncands += max(len(s.points), len(s.lines), len(s.triangles),
                      len(s.quads))
    if ncands <= 2 * cluster:
        return None
    try:
        return ClusterIntersector(scene_host, kinds=kinds,
                                  interpret=interpret, cluster=cluster,
                                  max_slots=max_slots,
                                  highquality=highquality,
                                  sort_rays=sort_rays, ray_tile=ray_tile,
                                  merge_area_ratio=merge_area_ratio,
                                  use_topk=use_topk)
    except ValueError:
        return None
