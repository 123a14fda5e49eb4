"""Instance-sharded rendering: geometry distributed across the mesh with
ppermute ray migration.

Tile sharding (parallel.mesh) replicates the scene; for scenes exceeding
per-chip HBM (bistro-class, BASELINE.json config 5) the GEOMETRY itself is
partitioned: each device owns a subset of instances (with the shapes they
reference), materials/textures/lights stay replicated (they are small next
to 10^6-triangle geometry pools). This is the renderer's model-parallel
("TP") axis from SURVEY.md §2.3.

The distributed intersection is a ring algorithm over the ICI:

    every device: best = miss
    repeat D times:
        best = merge(best, intersect_local_shard(rays))
        (rays, best) = ppermute -> next device on the ring
    # after D hops each ray has been tested against every shard and is
    # back on its home device carrying the global closest hit

Because shading needs attributes of the WINNING hit — whose geometry lives
only on the owning shard — the local intersect eagerly evaluates a
**deferred hit record** (position, geometric + shading normal, texcoord,
vertex color, material id) so any device can shade it against the
replicated material/texture tables. Merging two deferred records is an
elementwise closest-t select, so the ring is associative and
order-independent.

Each device's shard is one slice of a leading device axis on stacked,
padded scene arrays — inside shard_map a device sees only its own [1,...]
slice, so per-device HBM holds 1/D of the geometry (plus padding to the
largest shard).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.scene import SceneData
from ..ops import mathops as M
from ..trace.compile import FlatScene, compile_scene
from ..trace.intersect import RAY_EPS, _intersect_element


class DeferredHit(NamedTuple):
    """Closest hit + everything shading needs, carried with the ray."""

    dist: jax.Array      # [R] f32 (flt_max = miss)
    inst: jax.Array      # [R] i32 GLOBAL instance id (-1 = miss)
    material: jax.Array  # [R] i32
    position: jax.Array  # [R,3] world space
    gnormal: jax.Array   # [R,3] geometric normal
    snormal: jax.Array   # [R,3] interpolated shading normal
    texcoord: jax.Array  # [R,2]
    color: jax.Array     # [R,4] vertex color


def _miss_hit(n):
    return DeferredHit(
        dist=jnp.full(n, M.flt_max, jnp.float32),
        inst=jnp.full(n, -1, jnp.int32),
        material=jnp.zeros(n, jnp.int32),
        position=jnp.zeros((n, 3), jnp.float32),
        gnormal=jnp.zeros((n, 3), jnp.float32),
        snormal=jnp.zeros((n, 3), jnp.float32),
        texcoord=jnp.zeros((n, 2), jnp.float32),
        color=jnp.ones((n, 4), jnp.float32))


def _merge(a: DeferredHit, b: DeferredHit) -> DeferredHit:
    take_b = b.dist < a.dist
    sel = lambda x, y: jnp.where(
        take_b.reshape(take_b.shape + (1,) * (x.ndim - 1)), y, x)
    return DeferredHit(*[sel(x, y) for x, y in zip(a, b)])


def shard_scene(scene: SceneData, ndev: int):
    """Partition instances over `ndev` shards (greedy largest-first by
    element count) -> stacked+padded FlatScene pytree with a leading
    device axis, plus per-shard global-instance-id tables."""
    sizes = []
    for inst in scene.instances:
        s = scene.shapes[inst.shape]
        sizes.append(max(len(s.triangles), len(s.quads), len(s.lines),
                         len(s.points), 1))
    order = np.argsort(sizes)[::-1]
    buckets = [[] for _ in range(ndev)]
    loads = np.zeros(ndev, np.int64)
    for gi in order:
        d = int(np.argmin(loads))
        buckets[d].append(int(gi))
        loads[d] += sizes[gi]

    shard_flats, shard_gids = [], []
    for d in range(ndev):
        sub = SceneData()
        sub.cameras = scene.cameras
        sub.materials = scene.materials  # keep material ids aligned
        shape_map = {}
        for gi in buckets[d]:
            inst = scene.instances[gi]
            if inst.shape not in shape_map:
                shape_map[inst.shape] = len(sub.shapes)
                sub.shapes.append(scene.shapes[inst.shape])
            from ..models.scene import InstanceData
            sub.instances.append(InstanceData(
                frame=np.asarray(inst.frame, np.float32),
                shape=shape_map[inst.shape], material=inst.material))
        # strip the gather-join caches: the ring intersector reads the raw
        # SoA fields only, and empty shards build no cand_attrs at all
        # (None), which would break the cross-shard stacking below
        shard_flats.append(compile_scene(sub)._replace(
            cand_attrs=None, tex_quad=None, inst_cand_start=None))
        shard_gids.append(np.asarray(buckets[d], np.int64)
                          if buckets[d] else np.zeros(1, np.int64))

    # pad every array to the max size across shards and stack [D, ...]
    def stack(field_arrays):
        mx = tuple(np.max([a.shape[i] for a in field_arrays])
                   for i in range(field_arrays[0].ndim))
        out = []
        for a in field_arrays:
            pads = [(0, m - s) for s, m in zip(a.shape, mx)]
            out.append(np.pad(np.asarray(a), pads))
        return jnp.asarray(np.stack(out))

    stacked = jax.tree.map(lambda *xs: stack([np.asarray(x) for x in xs]),
                           *shard_flats)
    gids = stack(shard_gids).astype(jnp.int32)
    # true (pre-padding) candidate counts per shard: padded rows are zeros
    # and would alias (instance 0, element 0) without the validity mask
    ncand = jnp.asarray([[int(f.cand_inst.shape[0])]
                         for f in shard_flats], jnp.int32)

    # world bbox per shard for ring early-exit culling (empty shard ->
    # inverted box that fails every slab test)
    bboxes = np.empty((ndev, 2, 3), np.float32)
    bboxes[:, 0] = M.flt_max
    bboxes[:, 1] = -M.flt_max
    for d in range(ndev):
        for gi in buckets[d]:
            inst = scene.instances[gi]
            shp = scene.shapes[inst.shape]
            pos = np.asarray(shp.positions, np.float32).reshape(-1, 3)
            if not len(pos):
                continue
            frame = np.asarray(inst.frame, np.float32)
            pw = pos @ frame[:3] + frame[3]
            rad = np.asarray(shp.radius, np.float32)
            pad = float(rad.max()) if len(rad) else 0.0
            bboxes[d, 0] = np.minimum(bboxes[d, 0], pw.min(0) - pad)
            bboxes[d, 1] = np.maximum(bboxes[d, 1], pw.max(0) + pad)
    return stacked, gids, ncand, jnp.asarray(bboxes)


def _local_deferred_intersect(flat: FlatScene, gids, ncand, ro, rd,
                              kinds=None):
    """Brute-force closest hit against THIS shard's candidates, eagerly
    evaluated into a DeferredHit (all in the shard's local index space,
    reported with global instance ids)."""
    from ..trace.sceneval import (eval_color, eval_element_normal,
                                  eval_normal, eval_position, eval_texcoord)
    n = ro.shape[0]
    inv = flat.inst_inv_frame[flat.cand_inst]
    verts = flat.elements[flat.cand_elem]
    p = flat.positions[verts]
    rads = flat.radius[verts]
    shape = flat.inst_shape[flat.cand_inst]
    kind = flat.shape_kind[shape]
    ncands = flat.cand_inst.shape[0]
    valid = jnp.arange(ncands, dtype=jnp.int32) < ncand[0]

    local_o = (ro[:, None, 0:1] * inv[None, :, 0, :]
               + ro[:, None, 1:2] * inv[None, :, 1, :]
               + ro[:, None, 2:3] * inv[None, :, 2, :]
               + inv[None, :, 3, :])
    local_d = (rd[:, None, 0:1] * inv[None, :, 0, :]
               + rd[:, None, 1:2] * inv[None, :, 1, :]
               + rd[:, None, 2:3] * inv[None, :, 2, :])
    tmin_b = jnp.broadcast_to(RAY_EPS, local_o.shape[:-1])
    tmax_b = jnp.broadcast_to(M.flt_max, local_o.shape[:-1])
    hit, uv, dist = _intersect_element(
        local_o, local_d, tmin_b, tmax_b, p[None], rads[None], kind[None],
        kinds=kinds)
    hit = hit & valid[None, :]
    dist = jnp.where(hit, dist, M.flt_max)
    best = jnp.argmin(dist, axis=-1)
    bhit = jnp.take_along_axis(hit, best[:, None], axis=1)[:, 0]
    buv = jnp.take_along_axis(uv, best[:, None, None], axis=1)[:, 0]
    bdist = jnp.take_along_axis(dist, best[:, None], axis=1)[:, 0]
    inst_l = flat.cand_inst[best]
    gelem = flat.cand_elem[best]

    position = eval_position(flat, inst_l, gelem, buv)
    gnormal = eval_element_normal(flat, inst_l, gelem)
    snormal = eval_normal(flat, inst_l, gelem, buv)
    texcoord = eval_texcoord(flat, inst_l, gelem, buv)
    color = eval_color(flat, inst_l, gelem, buv)
    mat = flat.inst_material[inst_l]
    gid = gids[jnp.clip(inst_l, 0, gids.shape[0] - 1)]
    return DeferredHit(
        dist=jnp.where(bhit, bdist, M.flt_max),
        inst=jnp.where(bhit, gid, -1),
        material=jnp.where(bhit, mat, 0),
        position=jnp.where(bhit[:, None], position, 0.0),
        gnormal=jnp.where(bhit[:, None], gnormal, 0.0),
        snormal=jnp.where(bhit[:, None], snormal, 0.0),
        texcoord=jnp.where(bhit[:, None], texcoord, 0.0),
        color=jnp.where(bhit[:, None], color, 1.0))


def make_sharded_intersector(mesh: Mesh, stacked_flat, gids, ncand,
                             bboxes=None, kinds=None, axis: str = "tiles"):
    """Returns intersect(ro, rd) -> DeferredHit over the mesh.

    `ro`/`rd` are [R,3] with R divisible by the mesh size; rays and their
    running best hit ride the ring via ppermute while the geometry stays
    put. The result lands back on each ray's home device.

    With per-shard world `bboxes` [D, 2, 3] (from shard_scene) the ring
    EARLY-EXITS: after each hop every device slab-tests its current rays
    against the bboxes of the shards those rays have yet to visit; once no
    lane anywhere could still find a nearer hit (psum'd across the mesh,
    so the trip count stays uniform), the intersect rounds stop and only
    cheap ppermute hops carry the best records back to their home devices.
    This is the live-lane analogue of ordered BVH traversal with tmax
    shrink (yocto_bvh.cpp:460-552) lifted to the ring: spatially separated
    shards drop whole rounds of intersection work. The round count of the
    last call is exposed as `intersect.last_rounds`.
    """
    ndev = mesh.devices.size
    perm = [(i, (i + 1) % ndev) for i in range(ndev)]
    if bboxes is None:
        # unknown extents: everything always improvable -> full D rounds
        box_tab = jnp.broadcast_to(
            jnp.asarray([[-M.flt_max] * 3, [M.flt_max] * 3], jnp.float32),
            (ndev, 2, 3))
    else:
        box_tab = jnp.asarray(bboxes, jnp.float32)

    def local(flat_slice, gids_slice, ncand_slice, ro, rd):
        return _local_deferred_intersect(flat_slice, gids_slice,
                                         ncand_slice, ro, rd, kinds=kinds)

    def _pp(x):
        return jax.lax.ppermute(x, axis, perm)

    def ring(flat_slice, gids_slice, ncand_slice, ro, rd):
        # shard_map slices carry a leading [1, ...] device axis
        flat_slice = jax.tree.map(lambda a: a[0], flat_slice)
        gids_slice = gids_slice[0]
        ncand_slice = ncand_slice[0]
        best = _miss_hit(ro.shape[0])
        if ndev == 1:
            best = _merge(best, local(flat_slice, gids_slice, ncand_slice,
                                      ro, rd))
            return best, jnp.ones((1,), jnp.int32)

        me = jax.lax.axis_index(axis)

        def can_improve(ro, rd, best, k):
            """Any lane on this device that could still find a nearer hit
            in one of its D-k unvisited shards (ring order me, me+1, ...)."""
            rinv = 1.0 / jnp.where(rd == 0.0, 1e-38, rd)
            n = ro.shape[0]
            any_can = jnp.zeros(n, bool)
            for j in range(ndev):  # static unroll, masked by j < D-k
                sb = box_tab[(me + j) % ndev]
                t0 = jnp.full(n, RAY_EPS, jnp.float32)
                t1 = best.dist
                for a in range(3):
                    ta = (sb[0, a] - ro[:, a]) * rinv[:, a]
                    tb = (sb[1, a] - ro[:, a]) * rinv[:, a]
                    t0 = jnp.maximum(t0, jnp.minimum(ta, tb))
                    t1 = jnp.minimum(t1, jnp.maximum(ta, tb))
                ok = ((t0 <= t1 * 1.00000024) & (t0 < best.dist)
                      & (j < ndev - k))
                any_can = any_can | ok
            return any_can

        def cond(carry):
            ro, rd, best, k = carry
            can = can_improve(ro, rd, best, k)
            total = jax.lax.psum(jnp.sum(can.astype(jnp.int32)), axis)
            return (k < ndev) & (total > 0)

        def body(carry):
            ro, rd, best, k = carry
            mine = local(flat_slice, gids_slice, ncand_slice, ro, rd)
            best = _merge(best, mine)
            ro, rd = _pp(ro), _pp(rd)
            best = jax.tree.map(_pp, best)
            return ro, rd, best, k + 1

        ro, rd, best, k = jax.lax.while_loop(
            cond, body, (ro, rd, best, jnp.int32(0)))

        # early exit leaves best k-rotated; finish the rotation with
        # communication-only hops so records land on their home devices
        def home(carry):
            best, j = carry
            return jax.tree.map(_pp, best), j + 1

        best, _ = jax.lax.while_loop(lambda c: c[1] < ndev, home, (best, k))
        return best, jnp.broadcast_to(k, (1,))

    sharded = P(axis)
    rep_scene = jax.tree.map(lambda _: P(axis), stacked_flat)

    fn = jax.jit(shard_map(
        ring, mesh=mesh,
        in_specs=(rep_scene, P(axis), P(axis), sharded, sharded),
        out_specs=(jax.tree.map(lambda _: sharded, _miss_hit(1)),
                   P(axis)),
        check_rep=False))

    def intersect(ro, rd):
        best, rounds = fn(stacked_flat, gids, ncand, ro, rd)
        intersect.last_rounds = rounds  # [ndev] i32, identical entries
        return best

    intersect.last_rounds = None
    return intersect


class ShardedRenderer:
    """End-to-end instance-sharded rendering: DP (pixel tiles) x TP
    (geometry shards) composed on one mesh axis.

    Camera rays are generated tile-sharded; every bounce's intersection
    runs the ppermute ring over the geometry shards; shading consumes the
    deferred hit records against the replicated material/texture tables.
    v1 ships the eyelight estimator (emission + pi * bsdf(outgoing,
    outgoing), single bounce — exact for non-delta scenes); the full
    wavefront path estimator composes with the same intersector.

    Note: for the bistro-class deployment the shading tables would be a
    stripped FlatScene (materials/textures only); here the full compile is
    reused since the demo scenes are small.
    """

    def __init__(self, scene: SceneData, params, mesh: Mesh = None):
        from ..trace.compile import scene_features
        from ..trace.lights import make_trace_lights
        from ..trace.renderer import render_size

        self.mesh = mesh if mesh is not None else _default_mesh()
        self.params = params
        self.scene_host = scene
        ndev = self.mesh.devices.size
        self.features = scene_features(scene)
        stacked, gids, ncand, bboxes = shard_scene(scene, ndev)
        self.intersect = make_sharded_intersector(
            self.mesh, stacked, gids, ncand, bboxes=bboxes,
            kinds=self.features.kinds)
        self.shade_flat = compile_scene(scene)
        self.width, self.height = render_size(scene, params)
        n = self.width * self.height
        if n % ndev != 0:
            raise ValueError(f"pixel count {n} must divide the mesh "
                             f"size {ndev}")

    def render_path(self, nsamples: int = None, seed: int = None
                    ) -> np.ndarray:
        """Instance-sharded `trace_path` estimator -> [H,W,4] numpy.

        Every bounce's closest hit runs the ppermute ring over the
        geometry shards; shading consumes the deferred hit records
        against the replicated material/texture/light tables (one-sample
        50/50 BSDF/light MIS, delta lobes, Russian roulette — the
        yocto_trace.cpp:453-596 estimator minus volumes/opacity, which
        v1 documents as out of scope for the sharded path; statistical
        RNG streams like the wavefront)."""
        import jax
        from functools import partial
        from ..models.scene import MaterialType
        from ..ops import rng as R
        from ..trace import bsdf as B
        from ..trace.lights import (make_trace_lights, sample_lights,
                                    sample_lights_pdf)
        from ..trace.renderer import sample_camera_rays
        from ..trace.sceneval import (eval_environment,
                                      eval_material_deferred,
                                      is_delta_point)

        feats = self.features
        if feats.has_volumes or feats.has_opacity:
            raise NotImplementedError(
                "sharded path estimator v1 covers opaque surface scenes "
                "(no volumetric materials or opacity cutouts)")
        params = self.params
        nsamples = nsamples if nsamples is not None else params.samples
        width, height = self.width, self.height
        n = width * height
        flat = self.shade_flat
        lights, meta = make_trace_lights(self.scene_host)
        types = feats.mat_types
        has_delta = feats.has_delta
        has_env = int(np.asarray(flat.env_frame).shape[0]) > 0
        has_lights = meta.n_lights > 0
        envhidden = params.envhidden
        sharding = NamedSharding(self.mesh, P("tiles"))

        @partial(jax.jit, static_argnames=("bounce",))
        def shade(hit: DeferredHit, ro, rd, weight, radiance, alive, rng,
                  bounce):
            act = alive
            outgoing = -rd
            if has_env:
                miss = act & (hit.inst < 0)
                env_ok = miss & ((bounce > 0) | (not envhidden))
                env = eval_environment(flat, rd)
                radiance = jnp.where(env_ok[:, None],
                                     radiance + weight * env, radiance)
            alive = act & (hit.inst >= 0)

            mat = eval_material_deferred(flat, hit.material, hit.texcoord,
                                         hit.color, features=feats)
            normal = hit.snormal
            if int(MaterialType.refractive) in types:
                is_refr = (mat.type == int(MaterialType.refractive))
                flip = (M.dot(normal, outgoing) < 0.0) & ~is_refr
            else:
                flip = M.dot(normal, outgoing) < 0.0
            normal = jnp.where(flip[:, None], -normal, normal)

            # emission (eval_emission facing test on the flipped normal)
            facing = M.dot(normal, outgoing) >= 0.0
            radiance = jnp.where((alive & facing)[:, None],
                                 radiance + weight * mat.emission,
                                 radiance)

            delta = is_delta_point(mat) if has_delta else \
                jnp.zeros_like(alive)
            nd = alive & ~delta
            r_choice, rng = R.rand1f_if(rng, nd)
            use_bsdf = (r_choice < 0.5) | (not has_lights)
            rnl, rng = R.rand1f_if(rng, nd)
            rn2, rng = R.rand2f_if(rng, nd)
            inc_b = B.sample_bsdfcos(mat, normal, outgoing, rnl, rn2,
                                     types=types)
            if has_lights:
                rl, rng = R.rand1f_if(rng, nd)
                rel, rng = R.rand1f_if(rng, nd)
                ruv, rng = R.rand2f_if(rng, nd)
                inc_l = sample_lights(flat, lights, meta, hit.position,
                                      rl, rel, ruv, env_alias=True)
                incoming = jnp.where(use_bsdf[:, None], inc_b, inc_l)
            else:
                incoming = inc_b
            if has_delta:
                rdl, rng = R.rand1f_if(rng, alive & delta)
                inc_d = B.sample_delta(mat, normal, outgoing, rdl,
                                       types=types)
                incoming = jnp.where(delta[:, None], inc_d, incoming)

            zero_inc = M.dot(incoming, incoming) == 0.0
            alive = alive & ~zero_inc

            # weight update
            f_nd = B.eval_bsdfcos(mat, normal, outgoing, incoming,
                                  types=types)
            pdf_b = B.sample_bsdfcos_pdf(mat, normal, outgoing, incoming,
                                         types=types)
            if has_lights:
                pdf_l = sample_lights_pdf(flat, lights, meta,
                                          hit.position, incoming)
                pdf_nd = 0.5 * pdf_b + 0.5 * pdf_l
            else:
                pdf_nd = pdf_b
            new_w = weight * f_nd / jnp.where(pdf_nd == 0.0, 1.0,
                                              pdf_nd)[:, None]
            if has_delta:
                f_d = B.eval_delta(mat, normal, outgoing, incoming,
                                   types=types)
                pdf_d = B.sample_delta_pdf(mat, normal, outgoing,
                                           incoming, types=types)
                w_d = weight * f_d / jnp.where(pdf_d == 0.0, 1.0,
                                               pdf_d)[:, None]
                new_w = jnp.where(delta[:, None], w_d, new_w)
            weight = jnp.where(alive[:, None], new_w, weight)

            wzero = M.maxc(jnp.abs(weight)) == 0.0
            wfin = M.isfinite3(weight)
            alive = alive & ~wzero & wfin

            # russian roulette after bounce 3
            if bounce > 3:
                rr_prob = jnp.minimum(jnp.float32(0.99), M.maxc(weight))
                r_rr, rng = R.rand1f_if(rng, alive)
                die = alive & (r_rr >= rr_prob)
                alive = alive & ~die
                weight = jnp.where(alive[:, None],
                                   weight / jnp.where(rr_prob == 0.0, 1.0,
                                                      rr_prob)[:, None],
                                   weight)

            first_hit = (hit.inst >= 0) if bounce == 0 else None
            return (hit.position, incoming, weight, radiance, alive, rng,
                    first_hit)

        image = jnp.zeros((n, 4), jnp.float32)
        rngs = R.make_pixel_seeds(
            n, params.seed if seed is None else seed)
        rngs = jax.device_put(rngs, jax.tree.map(lambda _: sharding, rngs))
        for s in range(nsamples):
            ro, rd, rngs = sample_camera_rays(
                flat, params.camera, width, height, rngs,
                params.tentfilter)
            weight = jnp.ones((n, 3), jnp.float32)
            radiance = jnp.zeros((n, 3), jnp.float32)
            alive = jnp.ones(n, bool)
            ok = None
            for bounce in range(params.bounces):
                hit = self.intersect(ro, rd)
                ro, rd, weight, radiance, alive, rngs, first = shade(
                    hit, ro, rd, weight, radiance, alive, rngs,
                    bounce=bounce)
                if bounce == 0:
                    ok = first
                if not bool(jnp.any(alive)):
                    break
            finite = M.isfinite3(radiance)[:, None]
            radiance = jnp.where(finite, radiance, 0.0)
            mx = M.maxc(radiance)
            scale = jnp.where(mx > params.clamp,
                              params.clamp / jnp.maximum(mx, 1e-20), 1.0)
            radiance = radiance * scale[:, None]
            use = jnp.ones_like(ok) if (has_env and not envhidden) else ok
            sample_img = jnp.concatenate(
                [jnp.where(use[:, None], radiance, 0.0),
                 use[:, None].astype(jnp.float32)], axis=1)
            image = image + (sample_img - image) / (s + 1)
        return np.asarray(image).reshape(height, width, 4)

    def render_eyelight(self, nsamples: int = None) -> np.ndarray:
        """Tile+instance-sharded eyelight render -> [H,W,4] numpy."""
        import jax
        from ..ops import rng as R
        from ..ops import sampling as SMP
        from ..trace import bsdf as B
        from ..trace.renderer import sample_camera_rays
        from ..trace.sceneval import eval_material_deferred
        from ..models.scene import MaterialType

        params = self.params
        nsamples = nsamples if nsamples is not None else params.samples
        width, height = self.width, self.height
        n = width * height
        flat = self.shade_flat
        feats = self.features
        types = feats.mat_types
        sharding = NamedSharding(self.mesh, P("tiles"))

        @jax.jit
        def shade(hit: DeferredHit, rd, weight):
            outgoing = -rd
            mat = eval_material_deferred(flat, hit.material, hit.texcoord,
                                         hit.color, features=feats)
            normal = hit.snormal
            if int(MaterialType.refractive) in types:
                refr = hit.material >= 0  # refined below
                is_refr = (flat.mat_type[hit.material]
                           == int(MaterialType.refractive))
                flip = (M.dot(normal, outgoing) < 0.0) & ~is_refr
            else:
                flip = M.dot(normal, outgoing) < 0.0
            normal = jnp.where(flip[:, None], -normal, normal)
            ok = hit.inst >= 0
            emis = B.eval_emission(mat, normal, outgoing)
            fcos = B.eval_bsdfcos(mat, normal, outgoing, outgoing,
                                  types=types)
            radiance = jnp.where(ok[:, None],
                                 weight * (emis + M.pif * fcos), 0.0)
            return radiance, ok

        image = jnp.zeros((n, 4), jnp.float32)
        rngs = R.make_pixel_seeds(n, params.seed)
        rngs = jax.device_put(rngs, jax.tree.map(lambda _: sharding, rngs))
        for s in range(nsamples):
            ro, rd, rngs = sample_camera_rays(
                flat, params.camera, width, height, rngs,
                params.tentfilter)
            hit = self.intersect(ro, rd)
            radiance, ok = shade(hit, rd, jnp.ones((n, 3), jnp.float32))
            # per-sample clamp + NaN scrub (yocto_trace.cpp:1471-1475)
            finite = M.isfinite3(radiance)[:, None]
            radiance = jnp.where(finite, radiance, 0.0)
            mx = M.maxc(radiance)
            scale = jnp.where(mx > params.clamp,
                              params.clamp / jnp.maximum(mx, 1e-20), 1.0)
            radiance = radiance * scale[:, None]
            sample_img = jnp.concatenate(
                [radiance, ok[:, None].astype(jnp.float32)], axis=1)
            image = image + (sample_img - image) / (s + 1)
        return np.asarray(image).reshape(height, width, 4)


def _default_mesh() -> Mesh:
    import jax
    return Mesh(np.asarray(jax.devices()), axis_names=("tiles",))
