"""Wavefront path renderer: host-driven bounces over compacted ray queues.

This is the TPU-native production pipeline promised by SURVEY.md §7 step 6
— the replacement for the reference's CUDA megakernel
(__raygen__trace_pixel, yocto_cutrace.cu:2152), whose per-thread divergent
loops do not map to a vector machine. Two sources of lockstep waste are
removed:

1. **Bounce-level compaction.** The lockstep sampler's `lax.while_loop`
   runs every lane until the LAST lane dies; under Russian roulette the
   live population shrinks roughly geometrically, so late iterations do
   full-width work for a sliver of live lanes. Here each bounce is ONE
   fused device dispatch (intersect + shade + live count); dead lanes are
   scatter-added into the image in that same dispatch and the survivors
   are compacted in-device (stable partition) into the next power-of-two
   bucket. Straggler bounces at the minimum bucket run TAIL_STEPS at a
   time per dispatch (host round trips cost ~25 ms through the tunnel).

2. **Traversal-round compaction.** BVH walks have a long tail (on the
   corpus ~70% of rays finish within 128 node-steps but the worst lane
   needs ~1100; measured in-repo). The traversal `while_loop` exits early
   once the live fraction drops below 1/8, the finished lanes' hits are
   scattered out, and the stragglers are re-packed and resumed — total
   work approaches sum(per-ray steps) instead of rays x max(steps).

Per-lane PCG32 streams are seeded per (pixel, sample) like the fast
multi-spp mode (statistically independent, not draw-for-draw identical to
the reference; the lockstep renderer remains the bit-parity path).
Volume scenes are supported: the fixed-capacity per-lane volume stack
(Lanes.vol_*) is ordinary lane state and survives compaction like every
other per-lane array.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.scene import SceneData
from ..ops import mathops as M
from ..ops import rng as R
from ..ops import sampling as SMP
from . import bsdf as B
from .bvh import (build_scene_bvh, make_trav_step, trav_init, trav_results,
                  _TravState)
from .compile import FlatScene, compile_scene, scene_features
from .intersect import intersect_scene_bruteforce
from .lights import make_trace_lights, sample_lights, sample_lights_pdf
from .params import SamplerType, TraceParams
from .renderer import TraceState, make_trace_state, render_size
from .sceneval import (eval_camera, eval_environment, eval_material,
                       eval_shading_normal, eval_shading_position,
                       gather_surface_rows,
                       is_delta_point)

MIN_BUCKET = 4096
TRAV_EXIT_FRAC = 8       # exit the traversal loop below 1/8 live lanes
TRAV_UNROLL = 4
TAIL_STEPS = 4           # bounces fused per dispatch at the minimum bucket


VOLUME_STACK_CAP = 4  # matches the CUDA reference's fixed svector
# two-pass NEE pays an extra cull+sort pipeline per connection; below
# this cluster count a full ordered closest-hit is already as cheap as
# the any-hit query (config2's 21 clusters measured 192k -> 110k
# pathmis paths/s with it ON; big corpus scenes are where it wins)
NEE_TWO_PASS_MIN_CLUSTERS = 64


class Lanes(NamedTuple):
    """Per-path-lane state; pix < 0 marks a dead/padding lane. The volume
    stack is per-lane state and survives compaction untouched."""

    pix: jax.Array        # [B] i32 pixel index (-1 = dead)
    ro: jax.Array         # [B,3]
    rd: jax.Array
    weight: jax.Array     # [B,3]
    radiance: jax.Array   # [B,3]
    bounce: jax.Array     # [B] i32
    opbounce: jax.Array   # [B] i32
    rng: R.RngState
    vol_density: jax.Array = None     # [B,CAP,3] (None if no volumes)
    vol_scattering: jax.Array = None  # [B,CAP,3]
    vol_aniso: jax.Array = None       # [B,CAP]
    vol_depth: jax.Array = None       # [B] i32
    max_rough: jax.Array = None       # [B] f32 (None unless nocaustics)


def _next_bucket(n: int) -> int:
    """Power-of-TWO buckets (4096, 8192, 16384, ...). Each distinct size
    costs one XLA compile of the fused bounce step, amortized by the
    persistent compilation cache; the finer ladder halves the wasted
    full-width work on decaying queues vs the earlier power-of-four
    ladder (measured on features1: bounces 3-5 ran at 65536 lanes for
    31k/20k live)."""
    b = MIN_BUCKET
    while b < n:
        b *= 2
    return b


class WavefrontRenderer:
    """Renderer-compatible wavefront pipeline (path sampler)."""

    def __init__(self, scene: SceneData, params: TraceParams):
        if params.sampler not in (SamplerType.path, SamplerType.pathtest):
            raise ValueError("wavefront pipeline implements the path "
                             "sampler; use Renderer for others")
        self.scene_host = scene
        self.params = params
        self.flat = compile_scene(scene)
        self.features = scene_features(scene)
        self.lights, self.meta = make_trace_lights(scene)
        self.width, self.height = render_size(scene, params)
        self.spp_batch = max(1, params.spp_batch)
        n_cands = int(self.flat.cand_inst.shape[0])
        self.use_bvh = n_cands > 4096 and not params.bruteforce
        self._cluster = None
        on_tpu = jax.default_backend() != "cpu"
        if self.use_bvh and (params.intersector == "cluster"
                             or (params.intersector == "auto" and on_tpu)):
            # the tile-binned cluster pipeline replaces the threaded
            # traversal rounds: one dispatch per bounce instead of many
            from .pallas_cluster import make_cluster_intersector
            self._cluster = make_cluster_intersector(
                scene, kinds=self.features.kinds,
                highquality=params.highqualitybvh)
            if self._cluster is not None:
                self.use_bvh = False
        if self.use_bvh:
            self.bvh = build_scene_bvh(scene, params.highqualitybvh)
            self._trav_step = make_trav_step(self.bvh,
                                             kinds=self.features.kinds)
        else:
            self.bvh = None
        self._jits = {}
        # observability (SURVEY.md §5): per-sample wavefront occupancy
        # + per-stage ray throughput (rays/s over the last sample batch)
        self.stats = {"bounce_lanes": [], "trav_rounds": 0,
                      "samples": 0, "rays_per_sec": 0.0,
                      "rays_traced": 0}
        self._t_sample = None

    def _note_rays(self, bounce_lanes):
        """Per-sample rays/s: lanes summed over bounces / wall time."""
        import time as _time
        now = _time.perf_counter()
        rays = int(sum(bounce_lanes))
        self.stats["rays_traced"] += rays
        if self._t_sample is not None:
            dt = max(now - self._t_sample, 1e-9)
            self.stats["rays_per_sec"] = rays / dt
        self._t_sample = now

    # ------------------------------------------------------------------
    # jitted stages (cached per bucket size via shape polymorphism of jit)
    # ------------------------------------------------------------------

    def _raygen(self):
        key = "raygen"
        if key in self._jits:
            return self._jits[key]
        params, width, height = self.params, self.width, self.height
        has_volumes = self.features.has_volumes
        npix = width * height
        spp = self.spp_batch
        n = npix * spp
        seq_hi, seq_lo = R.make_pixel_seqs(npix)

        @jax.jit
        def raygen(flat, sample_idx):
            k_lane = (sample_idx
                      + jnp.repeat(jnp.arange(spp, dtype=jnp.int32), npix))
            rngs = R.make_rng_offset(params.seed, k_lane,
                                     jnp.tile(seq_hi, spp),
                                     jnp.tile(seq_lo, spp))
            jj, ii = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                                  jnp.arange(width, dtype=jnp.float32),
                                  indexing="ij")
            i = jnp.tile(ii.reshape(-1), spp)
            j = jnp.tile(jj.reshape(-1), spp)
            luv, rngs = R.rand2f(rngs)
            puv, rngs = R.rand2f(rngs)
            uv = jnp.stack([(i + puv[..., 0]) / width,
                            (j + puv[..., 1]) / height], axis=-1)
            ro, rd = eval_camera(flat, params.camera, uv,
                                 SMP.sample_disk(luv))
            vol = {}
            if has_volumes:
                cap = VOLUME_STACK_CAP
                vol = dict(
                    vol_density=jnp.zeros((n, cap, 3), jnp.float32),
                    vol_scattering=jnp.zeros((n, cap, 3), jnp.float32),
                    vol_aniso=jnp.zeros((n, cap), jnp.float32),
                    vol_depth=jnp.zeros(n, jnp.int32))
            if params.nocaustics:
                vol["max_rough"] = jnp.zeros(n, jnp.float32)
            return Lanes(
                pix=jnp.tile(jnp.arange(npix, dtype=jnp.int32), spp),
                ro=ro, rd=rd,
                weight=jnp.ones((n, 3), jnp.float32),
                radiance=jnp.zeros((n, 3), jnp.float32),
                bounce=jnp.zeros(n, jnp.int32),
                opbounce=jnp.zeros(n, jnp.int32), rng=rngs, **vol)

        self._jits[key] = raygen
        return raygen

    def _trav_round(self):
        key = "trav_round"
        if key in self._jits:
            return self._jits[key]
        step = self._trav_step

        @jax.jit
        def trav_round(st: _TravState, results, src):
            bucket = st.cur.shape[0]
            st = st._replace(it=jnp.zeros((), jnp.int32))

            def body(st):
                for _ in range(TRAV_UNROLL):
                    st = step(st)
                return st

            if bucket <= MIN_BUCKET:
                # no compaction possible below the minimum bucket: run the
                # stragglers to completion in one dispatch
                def cond(st):
                    return jnp.any(st.cur >= 0)
            else:
                def cond(st):
                    live = jnp.sum((st.cur >= 0).astype(jnp.int32))
                    return (live > 0) & ((live * TRAV_EXIT_FRAC > bucket)
                                         | (st.it < 16)) & (st.it < 4096)

            st = jax.lax.while_loop(cond, body, st)
            # scatter finished hits into the full-size result buffers in
            # the same dispatch (halves the per-round host round trips)
            hit, inst, elem, uv, dist = results
            ok = src >= 0
            si = jnp.where(ok, src, 0)
            upd = lambda dst, val: dst.at[si].set(
                jnp.where(ok.reshape(ok.shape + (1,) * (val.ndim - 1)),
                          val, dst[si]))
            results = (upd(hit, st.hit), upd(inst, st.inst),
                       upd(elem, st.elem), upd(uv, st.uv),
                       upd(dist, jnp.where(st.hit, st.tmax, M.flt_max)))
            return st, results

        self._jits[key] = trav_round
        return trav_round

    def _gather(self):
        key = "gather"
        if key in self._jits:
            return self._jits[key]

        @jax.jit
        def gather(tree, idx):
            return jax.tree.map(
                lambda a: a[idx] if getattr(a, "ndim", 1) else a, tree)

        self._jits[key] = gather
        return gather

    def _trav_scatter(self):
        key = "trav_scatter"
        if key in self._jits:
            return self._jits[key]

        @jax.jit
        def scatter(results, st: _TravState, src):
            hit, inst, elem, uv, dist = results
            ok = src >= 0
            s = jnp.where(ok, src, 0)
            upd = lambda dst, val: dst.at[s].set(
                jnp.where(ok.reshape(ok.shape + (1,) * (val.ndim - 1)),
                          val, dst[s]))
            return (upd(hit, st.hit), upd(inst, st.inst),
                    upd(elem, st.elem), upd(uv, st.uv),
                    upd(dist, jnp.where(st.hit, st.tmax, M.flt_max)))

        self._jits[key] = scatter
        return scatter

    def _intersect_dense(self):
        key = "isec_dense"
        if key in self._jits:
            return self._jits[key]
        fn = self._intersect_raw()
        isec_dense = jax.jit(fn)
        self._jits[key] = isec_dense
        return isec_dense

    def _intersect_raw(self):
        """Unjitted dense closest-hit callable(flat, ro, rd, tmax=...) —
        the building block both for the standalone jit and the fused
        bounce step. tmax may be a per-lane array (dead lanes pass 0 so
        every intersector skips them, CLAUDE.md dead-lane masking)."""
        key = "isec_raw"
        if key in self._jits:
            return self._jits[key]
        kinds = self.features.kinds
        if self._cluster is not None:
            isect = self._cluster
        elif jax.default_backend() != "cpu":
            from .pallas_intersect import (
                make_pallas_bruteforce_intersector,
                make_pallas_small_intersector)
            isect = make_pallas_small_intersector(self.scene_host)
            if isect is None:
                isect = make_pallas_bruteforce_intersector(
                    self.scene_host, kinds=kinds)
        else:
            isect = functools.partial(intersect_scene_bruteforce,
                                      kinds=kinds)

        def fn(flat, ro, rd, tmax=M.flt_max):
            return isect(flat, ro, rd, tmax=tmax)

        self._jits[key] = fn
        return fn

    def _shade(self):
        key = "shade"
        if key in self._jits:
            return self._jits[key]
        params, feat = self.params, self.features
        meta = self.meta
        has_lights = meta.n_lights > 0
        has_delta = feat.has_delta
        has_opacity = feat.has_opacity
        has_volumes = feat.has_volumes
        types = feat.mat_types
        envhidden = params.envhidden
        from ..ops import shading as SH
        from .sceneval import is_volumetric_type

        clamp = params.clamp

        @functools.partial(jax.jit, static_argnames=("first_bounce",))
        def shade(flat, lights, lanes: Lanes, hit, inst_g, elem_g, uv_g,
                  dist, img, albedo_img, normal_img, hits_img,
                  first_bounce):
            """One surface interaction for every lane, fused with the
            image/AOV scatters (single dispatch per bounce): returns the
            updated lanes (dead lanes keep pix=-1) + accumulators."""
            has_env = flat.env_frame.shape[0] > 0
            act = lanes.pix >= 0
            hit_l = act & hit
            radiance = lanes.radiance

            if has_env:
                miss = act & ~hit
                env_ok = miss & ((lanes.bounce > 0) | (not envhidden))
                env = eval_environment(flat, lanes.rd)
                radiance = jnp.where(env_ok[:, None],
                                     radiance + lanes.weight * env,
                                     radiance)
            alive = hit_l
            rng = lanes.rng
            weight0 = lanes.weight

            # --- volume transmittance (yocto_trace.cpp:479-488)
            if has_volumes:
                cap = VOLUME_STACK_CAP
                in_stack = hit_l & (lanes.vol_depth > 0)
                r_tr2, rng = R.rand1f_if(rng, in_stack)
                r_tr1, rng = R.rand1f_if(rng, in_stack)
                slot = jnp.maximum(lanes.vol_depth - 1, 0)
                take = lambda a: jnp.take_along_axis(
                    a, slot[:, None, None] if a.ndim == 3 else slot[:, None],
                    axis=1)[:, 0]
                top_density = take(lanes.vol_density)
                top_scat = take(lanes.vol_scattering)
                top_aniso = take(lanes.vol_aniso)
                tdist = SH.sample_transmittance(top_density, dist,
                                                r_tr1, r_tr2)
                trans = SH.eval_transmittance(top_density, tdist)
                tpdf = SH.sample_transmittance_pdf(top_density, tdist, dist)
                safe_tpdf = jnp.where(tpdf == 0.0, 1.0, tpdf)[:, None]
                weight0 = jnp.where(in_stack[:, None],
                                    weight0 * trans / safe_tpdf, weight0)
                in_volume = in_stack & (tdist < dist)
            else:
                in_volume = jnp.zeros_like(hit_l)

            inst = jnp.maximum(inst_g, 0)
            elem_l = jnp.maximum(elem_g, 0)
            rows = gather_surface_rows(flat, inst, elem_l)
            if rows is None:
                shape = flat.inst_shape[inst]
                gelem = flat.shape_elem_start[shape] + elem_l
            else:
                gelem = None  # every eval reads the packed rows
            outgoing = -lanes.rd
            position = eval_shading_position(flat, inst, gelem, uv_g,
                                             outgoing, rows=rows)
            normal = eval_shading_normal(flat, inst, gelem, uv_g, outgoing,
                                         features=feat, rows=rows)
            material = eval_material(flat, inst, gelem, uv_g, features=feat,
                                     rows=rows)
            surf = alive & ~in_volume if has_volumes else alive

            # nocaustics: clamp roughness to the per-lane path maximum
            # (yocto_trace.cpp:499-502); lane history updates on surface
            # interactions only, like the reference's max_roughness local
            if params.nocaustics:
                mr = jnp.maximum(material.roughness, lanes.max_rough)
                material = material._replace(
                    roughness=jnp.where(surf, mr, material.roughness))
                max_rough_out = jnp.where(surf, mr, lanes.max_rough)
            else:
                max_rough_out = lanes.max_rough

            if has_opacity:
                op_lt1 = surf & (material.opacity < 1.0)
                r_op, rng = R.rand1f_if(rng, op_lt1)
                op_skip = op_lt1 & (r_op >= material.opacity)
                op_die = op_skip & (lanes.opbounce > 128)
                opbounce = jnp.where(op_skip, lanes.opbounce + 1,
                                     lanes.opbounce)
                alive = alive & ~op_die
                shade_m = surf & ~op_skip & alive
            else:
                op_skip = jnp.zeros_like(alive)
                opbounce = lanes.opbounce
                shade_m = surf

            first = shade_m & (lanes.bounce == 0)
            albedo = jnp.where(first[:, None], material.color, 0.0)
            normal_aov = jnp.where(first[:, None], normal, 0.0)

            emis = B.eval_emission(material, normal, outgoing)
            radiance = jnp.where(shade_m[:, None],
                                 radiance + weight0 * emis, radiance)

            delta = is_delta_point(material) if has_delta \
                else jnp.zeros_like(shade_m)
            nd = shade_m & ~delta if has_delta else shade_m
            r_choice, rng = R.rand1f_if(rng, nd)
            use_bsdf = r_choice < 0.5
            rn2, rng = R.rand2f_if(rng, nd & use_bsdf)
            rnl, rng = R.rand1f_if(rng, nd & use_bsdf)
            inc_bsdf = B.sample_bsdfcos(material, normal, outgoing, rnl,
                                        rn2, types=types)
            if has_lights:
                ruv, rng = R.rand2f_if(rng, nd & ~use_bsdf)
                rel, rng = R.rand1f_if(rng, nd & ~use_bsdf)
                rl, rng = R.rand1f_if(rng, nd & ~use_bsdf)
                inc_light = sample_lights(flat, lights, meta, position,
                                          rl, rel, ruv, env_alias=True)
                incoming_nd = jnp.where(use_bsdf[:, None], inc_bsdf,
                                        inc_light)
            else:
                incoming_nd = inc_bsdf
            nd_zero = nd & M.is_zero3(incoming_nd)
            nd_ok = nd & ~nd_zero
            f_nd = B.eval_bsdfcos(material, normal, outgoing, incoming_nd,
                                  types=types)
            pdf_b = B.sample_bsdfcos_pdf(material, normal, outgoing,
                                         incoming_nd, types=types)
            if has_lights:
                pdf_l = sample_lights_pdf(flat, lights, meta, position,
                                          incoming_nd)
                pdf_nd = 0.5 * pdf_b + 0.5 * pdf_l
            else:
                pdf_nd = 0.5 * pdf_b
            safe_pdf = jnp.where(pdf_nd == 0.0, 1.0, pdf_nd)[:, None]
            weight = jnp.where(nd_ok[:, None],
                               weight0 * f_nd / safe_pdf, weight0)

            if has_delta:
                dl = shade_m & delta
                r_delta, rng = R.rand1f_if(rng, dl)
                inc_delta = B.sample_delta(material, normal, outgoing,
                                           r_delta, types=types)
                dl_zero = dl & M.is_zero3(inc_delta)
                dl_ok = dl & ~dl_zero
                f_dl = B.eval_delta(material, normal, outgoing, inc_delta,
                                    types=types)
                pdf_dl = B.sample_delta_pdf(material, normal, outgoing,
                                            inc_delta, types=types)
                safe_dl = jnp.where(pdf_dl == 0.0, 1.0, pdf_dl)[:, None]
                weight = jnp.where(dl_ok[:, None],
                                   weight * f_dl / safe_dl, weight)
                incoming = jnp.where(delta[:, None], inc_delta, incoming_nd)
                alive = alive & ~(nd_zero | dl_zero)
            else:
                incoming = incoming_nd
                alive = alive & ~nd_zero

            # --- volume stack update (yocto_trace.cpp:544-553)
            vol_kwargs = {}
            if has_volumes:
                crossed = (M.dot(normal, outgoing)
                           * M.dot(normal, incoming)) < 0.0
                vol_change = shade_m & alive & crossed \
                    & is_volumetric_type(material.type)
                push = vol_change & (lanes.vol_depth == 0)
                pop = vol_change & (lanes.vol_depth > 0)
                cap = VOLUME_STACK_CAP
                pslot = jnp.minimum(lanes.vol_depth, cap - 1)
                oh = (jax.nn.one_hot(pslot, cap, dtype=bool)
                      & push[:, None])
                vol_density = jnp.where(oh[..., None],
                                        material.density[:, None, :],
                                        lanes.vol_density)
                vol_scattering = jnp.where(oh[..., None],
                                           material.scattering[:, None, :],
                                           lanes.vol_scattering)
                vol_aniso = jnp.where(oh,
                                      material.scanisotropy[:, None],
                                      lanes.vol_aniso)
                vol_depth = jnp.where(
                    push, jnp.minimum(lanes.vol_depth + 1, cap),
                    jnp.where(pop, jnp.maximum(lanes.vol_depth - 1, 0),
                              lanes.vol_depth))

            ro = jnp.where(shade_m[:, None], position, lanes.ro)
            rd = jnp.where(shade_m[:, None], incoming, lanes.rd)
            if has_opacity:
                ro = jnp.where(op_skip[:, None],
                               position + lanes.rd * 1e-2, ro)

            # --- volume interaction branch (yocto_trace.cpp:556-583)
            if has_volumes:
                vol = hit_l & in_volume & alive
                position_v = lanes.ro + lanes.rd * tdist[:, None]
                outgoing_v = -lanes.rd
                r_cv, rng = R.rand1f_if(rng, vol)
                use_scat = r_cv < 0.5
                rn2_v, rng = R.rand2f_if(rng, vol & use_scat)
                rnl_v, rng = R.rand1f_if(rng, vol & use_scat)
                inc_scat = B.sample_scattering(top_aniso, outgoing_v, rn2_v)
                if has_lights:
                    ruv_v, rng = R.rand2f_if(rng, vol & ~use_scat)
                    rel_v, rng = R.rand1f_if(rng, vol & ~use_scat)
                    rl_v, rng = R.rand1f_if(rng, vol & ~use_scat)
                    inc_lv = sample_lights(flat, lights, meta, position_v,
                                           rl_v, rel_v, ruv_v,
                                           env_alias=True)
                    incoming_v = jnp.where(use_scat[:, None], inc_scat,
                                           inc_lv)
                else:
                    incoming_v = inc_scat
                v_zero = vol & M.is_zero3(incoming_v)
                v_ok = vol & ~v_zero
                f_v = B.eval_scattering(top_density, top_scat, top_aniso,
                                        outgoing_v, incoming_v)
                pdf_vs = B.sample_scattering_pdf(top_density, top_aniso,
                                                 outgoing_v, incoming_v)
                if has_lights:
                    pdf_vl = sample_lights_pdf(flat, lights, meta,
                                               position_v, incoming_v)
                    pdf_v = 0.5 * pdf_vs + 0.5 * pdf_vl
                else:
                    pdf_v = 0.5 * pdf_vs
                safe_pv = jnp.where(pdf_v == 0.0, 1.0, pdf_v)[:, None]
                weight = jnp.where(v_ok[:, None],
                                   weight0 * f_v / safe_pv, weight)
                alive = alive & ~v_zero
                ro = jnp.where(v_ok[:, None], position_v, ro)
                rd = jnp.where(v_ok[:, None], incoming_v, rd)
                processed = (shade_m | vol)
                vol_kwargs = dict(vol_density=vol_density,
                                  vol_scattering=vol_scattering,
                                  vol_aniso=vol_aniso,
                                  vol_depth=vol_depth)
            else:
                vol = jnp.zeros_like(shade_m)
                processed = shade_m

            wzero = M.is_zero3(weight)
            wbad = ~M.isfinite3(weight)
            alive = alive & ~(processed & (wzero | wbad))

            rr = processed & alive & (lanes.bounce > 3)
            rr_prob = jnp.minimum(jnp.float32(0.99), M.maxc(weight))
            r_rr, rng = R.rand1f_if(rng, rr)
            rr_die = rr & (r_rr >= rr_prob)
            safe_rr = jnp.where(rr_prob == 0.0, 1.0, rr_prob)
            weight = jnp.where((rr & ~rr_die)[:, None],
                               weight / safe_rr[:, None], weight)
            alive = alive & ~rr_die

            bounce = jnp.where(processed & alive, lanes.bounce + 1,
                               lanes.bounce)
            cont = alive & (op_skip | (bounce < params.bounces)) \
                & (processed | op_skip)
            pix = jnp.where(cont, lanes.pix, -1)
            # hit flag for the sample's alpha/hits accumulators
            hit_aov = shade_m & (lanes.bounce == 0)

            # --- fused scatters (previously separate dispatches)
            # lanes that died this bounce: per-lane clamp + NaN scrub
            # (yocto_trace.cpp:1471-1475), then add into the sample image
            dead = (lanes.pix >= 0) & (pix < 0)
            finite = M.isfinite3(radiance)[:, None]
            rad = jnp.where(finite, radiance, 0.0)
            mxr = M.maxc(rad)
            rscale = jnp.where(mxr > clamp,
                               clamp / jnp.maximum(mxr, 1e-20), 1.0)
            rad = rad * rscale[:, None]
            didx = jnp.where(dead, lanes.pix, 0)
            img = img.at[didx].add(jnp.where(dead[:, None], rad, 0.0))
            if first_bounce:
                okf = (lanes.pix >= 0) & hit_aov
                fidx = jnp.where(okf, lanes.pix, 0)
                albedo_img = albedo_img.at[fidx].add(
                    jnp.where(okf[:, None], albedo, 0.0))
                normal_img = normal_img.at[fidx].add(
                    jnp.where(okf[:, None], normal_aov, 0.0))
                hits_img = hits_img.at[fidx].add(okf.astype(jnp.int32))
            return (Lanes(pix=pix, ro=ro, rd=rd, weight=weight,
                          radiance=radiance, bounce=bounce,
                          opbounce=opbounce, rng=rng,
                          max_rough=max_rough_out, **vol_kwargs),
                    img, albedo_img, normal_img, hits_img)

        self._jits[key] = shade
        return shade

    def _bounce(self):
        """Fused per-bounce step: intersect + shade + live count in ONE
        dispatch (the split version cost 3 host round trips per bounce
        through the ~25 ms tunnel). Dead/padding lanes pass tmax=0 so the
        intersector sweeps skip them."""
        key = "bounce"
        if key in self._jits:
            return self._jits[key]
        isect = self._intersect_raw()
        shade = self._shade()

        @functools.partial(jax.jit, static_argnames=("first_bounce",))
        def bounce(flat, lights, lanes, img, albedo, normal, hits,
                   first_bounce):
            tmax = jnp.where(lanes.pix >= 0, M.flt_max, 0.0)
            isec = isect(flat, lanes.ro, lanes.rd, tmax=tmax)
            lanes, img, albedo, normal, hits = shade(
                flat, lights, lanes, isec.hit, isec.instance, isec.element,
                isec.uv, isec.distance, img, albedo, normal, hits,
                first_bounce=first_bounce)
            nlive = jnp.sum((lanes.pix >= 0).astype(jnp.int32))
            return lanes, img, albedo, normal, hits, nlive

        self._jits[key] = bounce
        return bounce

    def _bounce_tail(self, steps: int):
        """`steps` chained bounce iterations in ONE dispatch for the
        straggler tail: once the queue is at the minimum bucket no
        compaction is possible, so the per-bounce host round trips are
        pure latency. Dead lanes are masked (tmax=0), so the wasted
        sweep work is negligible."""
        key = f"bounce_tail_{steps}"
        if key in self._jits:
            return self._jits[key]
        isect = self._intersect_raw()
        shade = self._shade()

        @jax.jit
        def bounce_tail(flat, lights, lanes, img, albedo, normal, hits):
            for _ in range(steps):
                tmax = jnp.where(lanes.pix >= 0, M.flt_max, 0.0)
                isec = isect(flat, lanes.ro, lanes.rd, tmax=tmax)
                lanes, img, albedo, normal, hits = shade(
                    flat, lights, lanes, isec.hit, isec.instance,
                    isec.element, isec.uv, isec.distance, img, albedo,
                    normal, hits, first_bounce=False)
            nlive = jnp.sum((lanes.pix >= 0).astype(jnp.int32))
            return lanes, img, albedo, normal, hits, nlive

        self._jits[key] = bounce_tail
        return bounce_tail

    def _compact(self):
        """In-device queue compaction: stable-partition live lanes first
        and slice to the (static) bucket. Replaces the full live-mask
        host transfer + np.nonzero index build (one round trip + host
        work) with a single device dispatch. Live-lane ORDER is
        preserved; the tail of the bucket is real dead lanes (pix=-1),
        inert in shade exactly like the previous padding scheme."""
        key = "compact"
        if key in self._jits:
            return self._jits[key]

        @functools.partial(jax.jit, static_argnames=("bucket",))
        def compact(lanes, bucket):
            dead = (lanes.pix < 0).astype(jnp.int32)
            order = jnp.argsort(dead, stable=True).astype(jnp.int32)
            idx = order[:bucket]
            return jax.tree.map(
                lambda a: a[idx] if getattr(a, "ndim", 1) else a, lanes)

        self._jits[key] = compact
        return compact

    def _scatter_img(self):
        key = "scatter_img"
        if key in self._jits:
            return self._jits[key]

        clamp = self.params.clamp

        @jax.jit
        def scatter(img, pix_prev, radiance, pix_now):
            """Add radiance of lanes that died this bounce (pix_prev >= 0
            and pix_now < 0) into the flat [N,3] sample image. Each lane is
            one full per-pixel sample, so the reference's per-sample clamp
            and NaN scrub (yocto_trace.cpp:1471-1475) apply per lane."""
            dead = (pix_prev >= 0) & (pix_now < 0)
            finite = M.isfinite3(radiance)[:, None]
            rad = jnp.where(finite, radiance, 0.0)
            mx = M.maxc(rad)
            scale = jnp.where(mx > clamp,
                              clamp / jnp.maximum(mx, 1e-20), 1.0)
            rad = rad * scale[:, None]
            idx = jnp.where(dead, pix_prev, 0)
            return img.at[idx].add(jnp.where(dead[:, None], rad, 0.0))

        self._jits[key] = scatter
        return scatter

    def _scatter_aov(self):
        key = "scatter_aov"
        if key in self._jits:
            return self._jits[key]

        @jax.jit
        def scatter(albedo_img, normal_img, hits_img, pix, hit_aov,
                    albedo, normal_aov):
            ok = (pix >= 0) & hit_aov
            idx = jnp.where(ok, pix, 0)
            albedo_img = albedo_img.at[idx].add(
                jnp.where(ok[:, None], albedo, 0.0))
            normal_img = normal_img.at[idx].add(
                jnp.where(ok[:, None], normal_aov, 0.0))
            hits_img = hits_img.at[idx].add(ok.astype(jnp.int32))
            return albedo_img, normal_img, hits_img

        self._jits[key] = scatter
        return scatter

    # ------------------------------------------------------------------
    # host drivers
    # ------------------------------------------------------------------

    def _traverse(self, ro, rd):
        """Full-batch closest hit via compacted traversal rounds."""
        n = ro.shape[0]
        trav_round = self._trav_round()
        gather = self._gather()
        st = trav_init(ro, rd)
        src = jnp.arange(n, dtype=jnp.int32)
        results = (jnp.zeros(n, bool), jnp.full(n, -1, jnp.int32),
                   jnp.full(n, -1, jnp.int32),
                   jnp.zeros((n, 2), jnp.float32),
                   jnp.full(n, M.flt_max, jnp.float32))
        for _ in range(64):
            st, results = trav_round(st, results, src)
            self.stats["trav_rounds"] += 1
            live = np.asarray(st.cur >= 0)
            nlive = int(live.sum())
            if nlive == 0:
                break
            idx_np = np.nonzero(live)[0]
            bucket = _next_bucket(nlive)
            if bucket >= st.cur.shape[0]:
                continue  # no shrink possible yet
            # pad with a dead lane index (first dead lane keeps cur=-1)
            dead = np.nonzero(~live)[0]
            pad_val = int(dead[0]) if len(dead) else int(idx_np[0])
            idx_np = np.concatenate(
                [idx_np, np.full(bucket - nlive, pad_val, np.int64)])
            idx = jnp.asarray(idx_np, jnp.int32)
            st = gather(st, idx)
            src = gather(src, idx)
        hit, inst, elem, uv, dist = results
        return hit, inst, elem, uv, dist

    def render_sample(self, flat, lights, sample_idx: int):
        """One path-traced sample for every pixel -> flat [N,3] radiance
        (+ hit/albedo/normal AOV sums)."""
        npix = self.width * self.height
        lanes = self._raygen()(flat, sample_idx)
        scatter_img = self._scatter_img()

        img = jnp.zeros((npix, 3), jnp.float32)
        albedo = jnp.zeros((npix, 3), jnp.float32)
        normal = jnp.zeros((npix, 3), jnp.float32)
        hits = jnp.zeros(npix, jnp.int32)

        bounce_lanes = []
        max_iters = self.params.bounces + 32
        if self.use_bvh:
            lanes, img, albedo, normal, hits, exhausted = \
                self._render_sample_bvh(flat, lights, lanes, img, albedo,
                                        normal, hits, bounce_lanes,
                                        max_iters)
        else:
            lanes, img, albedo, normal, hits, exhausted = \
                self._render_sample_dense(flat, lights, lanes, img, albedo,
                                          normal, hits, bounce_lanes,
                                          max_iters)
        if exhausted:
            # lanes at the iteration cap still contribute their radiance
            img = scatter_img(img, lanes.pix, lanes.radiance,
                              jnp.full_like(lanes.pix, -1))
        self.stats["bounce_lanes"] = bounce_lanes
        self.stats["samples"] += 1
        self._note_rays(bounce_lanes)
        return img, albedo, normal, hits

    def _render_sample_dense(self, flat, lights, lanes, img, albedo,
                             normal, hits, bounce_lanes, max_iters):
        """Bounce loop over the dense/cluster intersector: ONE fused
        dispatch per bounce (intersect + shade + live count), in-device
        compaction, and tail fusion — straggler bounces at the minimum
        bucket run TAIL_STEPS-at-a-time in one dispatch (each host round
        trip costs ~25 ms through the tunnel, comparable to the entire
        device time of a 4096-lane bounce)."""
        bounce = self._bounce()
        compact = self._compact()
        # tail fusion trades one big compile for fewer host round trips —
        # a tunnel-latency optimization; on CPU (tests) the compile of the
        # chained graph costs minutes and saves nothing
        tail_steps = TAIL_STEPS if jax.default_backend() != "cpu" else 1
        it = 0
        while it < max_iters:
            B = int(lanes.pix.shape[0])
            first = it == 0
            if not first and B <= MIN_BUCKET and tail_steps > 1:
                steps = min(tail_steps, max_iters - it)
                lanes, img, albedo, normal, hits, nlive_a = \
                    self._bounce_tail(steps)(flat, lights, lanes, img,
                                             albedo, normal, hits)
                bounce_lanes.extend([B] * steps)
                it += steps
            else:
                lanes, img, albedo, normal, hits, nlive_a = bounce(
                    flat, lights, lanes, img, albedo, normal, hits,
                    first_bounce=first)
                bounce_lanes.append(B)
                it += 1
                if first:
                    # lanes rarely die before the first shade; skip the
                    # liveness read (it would serialize the host on the
                    # dispatch round-trip)
                    continue
            nlive = int(nlive_a)
            if nlive == 0:
                return lanes, img, albedo, normal, hits, False
            bucket = _next_bucket(nlive)
            if bucket < lanes.pix.shape[0]:
                lanes = compact(lanes, bucket=bucket)
        return lanes, img, albedo, normal, hits, True

    def _render_sample_bvh(self, flat, lights, lanes, img, albedo, normal,
                           hits, bounce_lanes, max_iters):
        """Bounce loop over the threaded-BVH traversal rounds (the
        correctness path; host-driven compacted rounds)."""
        shade = self._shade()
        gather = self._gather()
        for it in range(max_iters):
            bounce_lanes.append(int(lanes.pix.shape[0]))
            hit, inst_g, elem_g, uv_g, dist = self._traverse(
                lanes.ro, lanes.rd)
            # convert global->local element ids for shade
            shape = flat.inst_shape[jnp.maximum(inst_g, 0)]
            elem_l = elem_g - flat.shape_elem_start[shape]
            lanes, img, albedo, normal, hits = shade(
                flat, lights, lanes, hit, inst_g, elem_l, uv_g, dist,
                img, albedo, normal, hits, first_bounce=(it == 0))
            if it < 1:
                continue
            nlive = int(jnp.sum(lanes.pix >= 0))
            if nlive == 0:
                return lanes, img, albedo, normal, hits, False
            bucket = _next_bucket(nlive)
            if bucket < lanes.pix.shape[0]:
                live = np.asarray(lanes.pix >= 0)
                idx_np = np.nonzero(live)[0]
                dead = np.nonzero(~live)[0]
                pad_val = int(dead[0]) if len(dead) else int(idx_np[0])
                idx_np = np.concatenate(
                    [idx_np, np.full(bucket - nlive, pad_val, np.int64)])
                lanes = gather(lanes, jnp.asarray(idx_np, jnp.int32))
        return lanes, img, albedo, normal, hits, True

    # ------------------------------------------------------------------
    # Renderer-compatible API
    # ------------------------------------------------------------------

    def make_state(self) -> TraceState:
        return make_trace_state(self.scene_host, self.params)

    def sample(self, state: TraceState) -> TraceState:
        s = int(state.samples)
        spp = self.spp_batch
        img, albedo, normal, hits = self.render_sample(
            self.flat, self.lights, s)
        h, w = self.height, self.width
        img = img / spp  # per-lane clamp applied in the scatter
        albedo = albedo / spp
        normal = normal / spp
        has_env = self.flat.env_frame.shape[0] > 0
        if has_env and not self.params.envhidden:
            alpha = jnp.ones((h * w, 1), jnp.float32)
        else:
            alpha = (hits > 0).astype(jnp.float32)[:, None]
            img = img * alpha
        img4 = jnp.concatenate([img, alpha], axis=1).reshape(h, w, 4)
        wgt = spp / (state.samples.astype(jnp.float32) + spp)
        return TraceState(
            image=state.image + (img4 - state.image) * wgt,
            albedo=state.albedo + (albedo.reshape(h, w, 3)
                                   - state.albedo) * wgt,
            normal=state.normal + (normal.reshape(h, w, 3)
                                   - state.normal) * wgt,
            hits=state.hits + hits.reshape(h, w),
            rng=state.rng, samples=state.samples + spp)

    def render(self, nsamples: Optional[int] = None,
               callback=None) -> TraceState:
        state = self.make_state()
        total = self.params.samples if nsamples is None else nsamples
        while int(state.samples) < total:
            state = self.sample(state)
            if callback is not None:
                callback(state, int(state.samples) - 1)
        return state


class PathmisLanes(NamedTuple):
    """Lane state for the wavefront pathmis pipeline."""

    pix: jax.Array
    ro: jax.Array
    rd: jax.Array
    weight: jax.Array
    radiance: jax.Array
    bounce: jax.Array
    opbounce: jax.Array
    next_em: jax.Array   # bool: count emission on the next hit
    rng: R.RngState
    vol_density: jax.Array = None     # [B,CAP,3] (None if no volumes)
    vol_scattering: jax.Array = None
    vol_aniso: jax.Array = None
    vol_depth: jax.Array = None
    max_rough: jax.Array = None       # [B] f32 (None unless nocaustics)


class WavefrontPathmisRenderer(WavefrontRenderer):
    """`trace_pathmis` over compacted queues: full power-2 MIS with both
    strategies at every rough vertex (yocto_trace.cpp:770-950 estimator).

    Per bounce: main traversal -> shade_pre (miss/env + emission gated by
    next_emission + light-strategy direction) -> connection traversal ->
    shade_mid (light-strategy MIS contribution + BSDF-strategy direction)
    -> connection traversal -> shade_post (BSDF-strategy MIS contribution,
    continuation weight with the reference's 0/0->NaN lane-kill, delta
    branch, Russian roulette, compaction flags). Volume scenes fall back
    to the lockstep renderer (v1 limitation)."""

    def __init__(self, scene: SceneData, params: TraceParams):
        from .params import SamplerType as _ST
        import dataclasses
        base = dataclasses.replace(params, sampler=_ST.path)
        super().__init__(scene, base)
        self.params = params
        self._nee = self._build_nee_emissive()

    def _build_nee_emissive(self):
        """Two-pass NEE connection (yocto_bvh.cpp:540-552 find_any role):
        closest hit restricted to EMISSIVE instances (a tiny dense sweep)
        plus an any-hit shadow query with tmax at that hit — instead of a
        full closest-hit over the whole scene. Returns
        nee(flat, position, inc, tmax) -> SceneIntersection in the
        original instance id space, or None when inapplicable (no
        cluster intersector to serve any_hit, no/too-many emissive
        candidates, or non-surface emissive geometry)."""
        import copy

        if self._cluster is None:
            return None
        if self._cluster.n_clusters < NEE_TWO_PASS_MIN_CLUSTERS:
            return None
        scene = self.scene_host
        em_ids = []
        ncand = 0
        for i, inst in enumerate(scene.instances):
            mat = scene.materials[inst.material]
            if not np.any(np.asarray(mat.emission) != 0):
                continue
            shp = scene.shapes[inst.shape]
            if len(shp.lines) or len(shp.points):
                return None
            ne = max(len(shp.triangles), len(shp.quads))
            if ne == 0:
                continue
            em_ids.append(i)
            ncand += ne
        if not em_ids or ncand > 4096:
            return None
        sub = copy.copy(scene)
        sub.instances = [scene.instances[i] for i in em_ids]
        from .compile import compile_scene
        subflat = compile_scene(sub)
        kinds = tuple(k for k in self.features.kinds if k in (2, 3))
        if jax.default_backend() != "cpu":
            from .pallas_intersect import (
                make_pallas_bruteforce_intersector,
                make_pallas_small_intersector)
            sub_isect = make_pallas_small_intersector(sub)
            if sub_isect is None:
                sub_isect = make_pallas_bruteforce_intersector(
                    sub, kinds=kinds)
        else:
            sub_isect = functools.partial(intersect_scene_bruteforce,
                                          kinds=kinds)
        inst_map = jnp.asarray(np.asarray(em_ids, np.int32))

        def nee(flat, position, inc, tmax):
            del flat  # candidates baked from the emissive sub-scene
            s = sub_isect(subflat, position, inc, tmax=tmax)
            return s._replace(instance=jnp.where(
                s.hit, inst_map[jnp.maximum(s.instance, 0)], -1))

        return nee

    # -- shade stages ----------------------------------------------------

    def _mis_stages(self):
        key = "mis_stages"
        if key in self._jits:
            return self._jits[key]
        params, feat = self.params, self.features
        meta = self.meta
        has_lights = meta.n_lights > 0
        has_delta = feat.has_delta
        has_opacity = feat.has_opacity
        has_volumes = feat.has_volumes
        types = feat.mat_types
        envhidden = params.envhidden
        clamp = params.clamp
        from ..ops import shading as SH
        from .sceneval import is_volumetric_type

        def mis_heuristic(this_pdf, other_pdf):
            return (this_pdf * this_pdf) / (
                this_pdf * this_pdf + other_pdf * other_pdf)

        def surface(flat, lanes, hit, inst_g, elem_g, uv_g):
            inst = jnp.maximum(inst_g, 0)
            elem_l = jnp.maximum(elem_g, 0)
            rows = gather_surface_rows(flat, inst, elem_l)
            if rows is None:
                shape = flat.inst_shape[inst]
                gelem = flat.shape_elem_start[shape] + elem_l
            else:
                gelem = None
            outgoing = -lanes.rd
            position = eval_shading_position(flat, inst, gelem, uv_g,
                                             outgoing, rows=rows)
            normal = eval_shading_normal(flat, inst, gelem, uv_g, outgoing,
                                         features=feat, rows=rows)
            material = eval_material(flat, inst, gelem, uv_g, features=feat,
                                     rows=rows)
            if params.nocaustics:
                # clamp to the per-lane path max (yocto_trace.cpp:822-826);
                # unmasked is safe: values only matter where surf holds
                material = material._replace(roughness=jnp.maximum(
                    material.roughness, lanes.max_rough))
            return inst, position, normal, material, outgoing

        def emission_at(flat, direction, hit, inst_g, elem_g, uv_g):
            """Emission seen along a connection ray (pathtrace._nee_emission
            semantics: facing hit emission, env on miss)."""
            inst = jnp.maximum(inst_g, 0)
            elem_l = jnp.maximum(elem_g, 0)
            rows = gather_surface_rows(flat, inst, elem_l)
            if rows is None:
                shape = flat.inst_shape[inst]
                gelem = flat.shape_elem_start[shape] + elem_l
            else:
                gelem = None
            mat = eval_material(flat, inst, gelem, uv_g, features=feat,
                                rows=rows)
            nrm = eval_shading_normal(flat, inst, gelem, uv_g, -direction,
                                      features=feat, rows=rows)
            em = B.eval_emission(mat, nrm, -direction)
            if flat.env_frame.shape[0] > 0:
                env = eval_environment(flat, direction)
            else:
                env = jnp.zeros_like(em)
            return jnp.where(hit[:, None], em, env)

        @jax.jit
        def shade_pre(flat, lights, lanes: PathmisLanes, hit, inst_g,
                      elem_g, uv_g, dist):
            """Miss/env + transmittance + gated emission + opacity +
            light-strategy direction."""
            has_env = flat.env_frame.shape[0] > 0
            act = lanes.pix >= 0
            hit_l = act & hit
            radiance = lanes.radiance
            if has_env:
                miss = act & ~hit
                env_ok = miss & ((lanes.bounce > 0) | (not envhidden)) \
                    & lanes.next_em
                env = eval_environment(flat, lanes.rd)
                radiance = jnp.where(env_ok[:, None],
                                     radiance + lanes.weight * env,
                                     radiance)
            alive = hit_l
            rng = lanes.rng
            weight0 = lanes.weight

            # volume transmittance (yocto_trace.cpp:479-488)
            if has_volumes:
                cap = VOLUME_STACK_CAP
                in_stack = hit_l & (lanes.vol_depth > 0)
                r_tr2, rng = R.rand1f_if(rng, in_stack)
                r_tr1, rng = R.rand1f_if(rng, in_stack)
                slot = jnp.maximum(lanes.vol_depth - 1, 0)
                take = lambda a: jnp.take_along_axis(
                    a, slot[:, None, None] if a.ndim == 3
                    else slot[:, None], axis=1)[:, 0]
                top_density = take(lanes.vol_density)
                tdist = SH.sample_transmittance(top_density, dist,
                                                r_tr1, r_tr2)
                trans = SH.eval_transmittance(top_density, tdist)
                tpdf = SH.sample_transmittance_pdf(top_density, tdist,
                                                   dist)
                safe_tpdf = jnp.where(tpdf == 0.0, 1.0, tpdf)[:, None]
                weight0 = jnp.where(in_stack[:, None],
                                    weight0 * trans / safe_tpdf, weight0)
                in_volume = in_stack & (tdist < dist)
            else:
                in_volume = jnp.zeros_like(hit_l)
                tdist = dist
            lanes = lanes._replace(weight=weight0)

            inst, position, normal, material, outgoing = surface(
                flat, lanes, hit, inst_g, elem_g, uv_g)
            surf = alive & ~in_volume if has_volumes else alive

            if has_opacity:
                op_lt1 = surf & (material.opacity < 1.0)
                r_op, rng = R.rand1f_if(rng, op_lt1)
                op_skip = op_lt1 & (r_op >= material.opacity)
                op_die = op_skip & (lanes.opbounce > 128)
                opbounce = jnp.where(op_skip, lanes.opbounce + 1,
                                     lanes.opbounce)
                alive = alive & ~op_die
                shade_m = surf & ~op_skip & alive
            else:
                op_skip = jnp.zeros_like(alive)
                opbounce = lanes.opbounce
                shade_m = surf

            first = shade_m & (lanes.bounce == 0)
            albedo = jnp.where(first[:, None], material.color, 0.0)
            normal_aov = jnp.where(first[:, None], normal, 0.0)
            hit_aov = first

            emis = B.eval_emission(material, normal, outgoing)
            radiance = jnp.where((shade_m & lanes.next_em)[:, None],
                                 radiance + lanes.weight * emis, radiance)

            delta = is_delta_point(material) if has_delta \
                else jnp.zeros_like(shade_m)
            nd = shade_m & ~delta if has_delta else shade_m

            # light strategy direction (draws match lockstep pathmis)
            ruv_l, rng = R.rand2f_if(rng, nd)
            rel_l, rng = R.rand1f_if(rng, nd)
            rl_l, rng = R.rand1f_if(rng, nd)
            if has_lights:
                inc_l = sample_lights(flat, lights, meta, position,
                                      rl_l, rel_l, ruv_l, env_alias=True)
            else:
                inc_l = jnp.zeros_like(position)
            if params.nocaustics:
                # material.roughness is already max(own, history) here
                lanes = lanes._replace(max_rough=jnp.where(
                    surf, material.roughness, lanes.max_rough))
            lanes = lanes._replace(radiance=radiance, opbounce=opbounce,
                                   rng=rng)
            # mask tuple carried host-side between stages
            flags = jnp.stack([alive, shade_m, op_skip, delta, nd,
                               in_volume], axis=1).astype(jnp.int8)
            return lanes, flags, position, inc_l, albedo, normal_aov, \
                hit_aov, tdist

        @jax.jit
        def shade_mid(flat, lights, lanes: PathmisLanes, flags, position,
                      inc_l, hit_c, inst_c, elem_c, uv_c, inst_g, elem_g,
                      uv_g, hit, blocked):
            """Light-strategy MIS contribution + BSDF-strategy direction.

            `blocked` (two-pass NEE): lanes whose connection ray hits a
            non-emissive occluder before the emissive hit — their light
            contribution (surface OR environment) is zero. The one-pass
            path passes all-False (the closest hit already encodes it)."""
            alive, shade_m, op_skip, delta, nd, in_volume = [
                flags[:, i] != 0 for i in range(6)]
            inst, _, normal, material, outgoing = surface(
                flat, lanes, hit, inst_g, elem_g, uv_g)
            rng = lanes.rng
            radiance = lanes.radiance

            l_zero = nd & M.is_zero3(inc_l)
            l_live = nd & ~l_zero
            if has_lights:
                f_l = B.eval_bsdfcos(material, normal, outgoing, inc_l,
                                     types=types)
                lpdf_l = sample_lights_pdf(flat, lights, meta, position,
                                           inc_l)
                bpdf_l = B.sample_bsdfcos_pdf(material, normal, outgoing,
                                              inc_l, types=types)
                safe_lpdf = jnp.where(lpdf_l == 0.0, 1.0, lpdf_l)
                misw_l = mis_heuristic(lpdf_l, bpdf_l) / safe_lpdf
                misw_l = jnp.where(lpdf_l == 0.0, 0.0, misw_l)
                em_l = jnp.where(blocked[:, None], 0.0,
                                 emission_at(flat, inc_l, hit_c, inst_c,
                                             elem_c, uv_c))
                ok_l = l_live & ~M.is_zero3(f_l) & (misw_l != 0.0)
                radiance = jnp.where(
                    ok_l[:, None],
                    radiance + lanes.weight * f_l * em_l
                    * misw_l[:, None], radiance)

            # bsdf strategy direction (drawn only where light sample lived)
            rn2_b, rng = R.rand2f_if(rng, l_live)
            rnl_b, rng = R.rand1f_if(rng, l_live)
            inc_b = B.sample_bsdfcos(material, normal, outgoing, rnl_b,
                                     rn2_b, types=types)
            inc_b = jnp.where(l_live[:, None], inc_b,
                              jnp.zeros_like(inc_b))
            lanes = lanes._replace(radiance=radiance, rng=rng)
            return lanes, inc_b

        @functools.partial(jax.jit, static_argnames=("first_bounce",))
        def shade_post(flat, lights, lanes: PathmisLanes, flags, position,
                       inc_b, hit_b, inst_b, elem_b, uv_b, inst_g, elem_g,
                       uv_g, hit, tdist, img, albedo_img, normal_img,
                       hits_img, albedo, normal_aov, hit_aov,
                       first_bounce):
            """BSDF-strategy MIS + continuation + RR + fused scatters."""
            alive, shade_m, op_skip, delta, nd, in_volume = [
                flags[:, i] != 0 for i in range(6)]
            inst, _, normal, material, outgoing = surface(
                flat, lanes, hit, inst_g, elem_g, uv_g)
            rng = lanes.rng
            radiance = lanes.radiance
            weight = lanes.weight

            b_zero = nd & M.is_zero3(inc_b)
            b_live = nd & ~b_zero
            f_b = B.eval_bsdfcos(material, normal, outgoing, inc_b,
                                 types=types)
            bpdf_b = B.sample_bsdfcos_pdf(material, normal, outgoing,
                                          inc_b, types=types)
            if has_lights:
                lpdf_b = sample_lights_pdf(flat, lights, meta, position,
                                           inc_b)
                safe_bpdf = jnp.where(bpdf_b == 0.0, 1.0, bpdf_b)
                misw_b = mis_heuristic(bpdf_b, lpdf_b) / safe_bpdf
                misw_b = jnp.where(bpdf_b == 0.0, 0.0, misw_b)
                em_b = emission_at(flat, inc_b, hit_b, inst_b, elem_b,
                                   uv_b)
                ok_b = b_live & ~M.is_zero3(f_b) & (misw_b != 0.0)
                radiance = jnp.where(
                    ok_b[:, None],
                    radiance + weight * f_b * em_b * misw_b[:, None],
                    radiance)
            else:
                safe_bpdf = jnp.where(bpdf_b == 0.0, 1.0, bpdf_b)

            # continuation: bsdf-only pdf; 0/0 -> NaN kills the lane like
            # the reference (yocto_trace.cpp:905-915)
            w_nd = weight * f_b / safe_bpdf[:, None]
            w_nd = jnp.where((bpdf_b == 0.0)[:, None],
                             jnp.full_like(w_nd, jnp.nan), w_nd)
            weight = jnp.where(nd[:, None], w_nd, weight)
            incoming = inc_b

            if has_delta:
                dl = shade_m & delta
                r_delta, rng = R.rand1f_if(rng, dl)
                inc_delta = B.sample_delta(material, normal, outgoing,
                                           r_delta, types=types)
                f_dl = B.eval_delta(material, normal, outgoing, inc_delta,
                                    types=types)
                pdf_dl = B.sample_delta_pdf(material, normal, outgoing,
                                            inc_delta, types=types)
                safe_dl = jnp.where(pdf_dl == 0.0, 1.0, pdf_dl)[:, None]
                w_dl = weight * f_dl / safe_dl
                w_dl = jnp.where((pdf_dl == 0.0)[:, None],
                                 jnp.full_like(w_dl, jnp.nan), w_dl)
                weight = jnp.where(dl[:, None], w_dl, weight)
                incoming = jnp.where(delta[:, None], inc_delta, incoming)
            next_em = jnp.where(shade_m, delta, lanes.next_em) \
                if has_delta else jnp.where(shade_m, False, lanes.next_em)

            # volume stack update on transmission (yocto_trace.cpp:544-553)
            vol_kwargs = {}
            if has_volumes:
                crossed = (M.dot(normal, outgoing)
                           * M.dot(normal, incoming)) < 0.0
                vol_change = shade_m & alive & crossed \
                    & is_volumetric_type(material.type)
                push = vol_change & (lanes.vol_depth == 0)
                pop = vol_change & (lanes.vol_depth > 0)
                cap = VOLUME_STACK_CAP
                pslot = jnp.minimum(lanes.vol_depth, cap - 1)
                oh = (jax.nn.one_hot(pslot, cap, dtype=bool)
                      & push[:, None])
                vol_density = jnp.where(oh[..., None],
                                        material.density[:, None, :],
                                        lanes.vol_density)
                vol_scattering = jnp.where(
                    oh[..., None], material.scattering[:, None, :],
                    lanes.vol_scattering)
                vol_aniso = jnp.where(oh, material.scanisotropy[:, None],
                                      lanes.vol_aniso)
                vol_depth = jnp.where(
                    push, jnp.minimum(lanes.vol_depth + 1, cap),
                    jnp.where(pop, jnp.maximum(lanes.vol_depth - 1, 0),
                              lanes.vol_depth))
                vol_kwargs = dict(vol_density=vol_density,
                                  vol_scattering=vol_scattering,
                                  vol_aniso=vol_aniso,
                                  vol_depth=vol_depth)

            ro_s = jnp.where(shade_m[:, None], position, lanes.ro)
            rd_s = jnp.where(shade_m[:, None], incoming, lanes.rd)

            # volume interaction (lockstep pathmis volume branch)
            if has_volumes:
                vol = alive & in_volume
                slot = jnp.maximum(lanes.vol_depth - 1, 0)
                take = lambda a: jnp.take_along_axis(
                    a, slot[:, None, None] if a.ndim == 3
                    else slot[:, None], axis=1)[:, 0]
                top_density = take(lanes.vol_density)
                top_scat = take(lanes.vol_scattering)
                top_aniso = take(lanes.vol_aniso)
                position_v = lanes.ro + lanes.rd * tdist[:, None]
                outgoing_v = -lanes.rd
                r_cv, rng = R.rand1f_if(rng, vol)
                use_scat = r_cv < 0.5
                rn2_v, rng = R.rand2f_if(rng, vol & use_scat)
                rnl_v, rng = R.rand1f_if(rng, vol & use_scat)
                inc_scat = B.sample_scattering(top_aniso, outgoing_v,
                                               rn2_v)
                if has_lights:
                    ruv_v, rng = R.rand2f_if(rng, vol & ~use_scat)
                    rel_v, rng = R.rand1f_if(rng, vol & ~use_scat)
                    rl_v, rng = R.rand1f_if(rng, vol & ~use_scat)
                    inc_lv = sample_lights(flat, lights, meta, position_v,
                                           rl_v, rel_v, ruv_v,
                                           env_alias=True)
                    incoming_v = jnp.where(use_scat[:, None], inc_scat,
                                           inc_lv)
                else:
                    incoming_v = inc_scat
                f_v = B.eval_scattering(top_density, top_scat, top_aniso,
                                        outgoing_v, incoming_v)
                pdf_vs = B.sample_scattering_pdf(top_density, top_aniso,
                                                 outgoing_v, incoming_v)
                if has_lights:
                    pdf_vl = sample_lights_pdf(flat, lights, meta,
                                               position_v, incoming_v)
                    pdf_v = 0.5 * pdf_vs + 0.5 * pdf_vl
                else:
                    pdf_v = 0.5 * pdf_vs
                safe_pv = jnp.where(pdf_v == 0.0, 1.0, pdf_v)[:, None]
                w_v = lanes.weight * f_v / safe_pv
                w_v = jnp.where((pdf_v == 0.0)[:, None],
                                jnp.full_like(w_v, jnp.nan), w_v)
                weight = jnp.where(vol[:, None], w_v, weight)
                next_em = jnp.where(vol, True, next_em)
                ro_s = jnp.where(vol[:, None], position_v, ro_s)
                rd_s = jnp.where(vol[:, None], incoming_v, rd_s)
                processed = shade_m | vol
            else:
                vol = jnp.zeros_like(shade_m)
                processed = shade_m

            wzero = M.is_zero3(weight)
            wbad = ~M.isfinite3(weight)
            alive = alive & ~(processed & (wzero | wbad))

            rr = processed & alive & (lanes.bounce > 3)
            rr_prob = jnp.minimum(jnp.float32(0.99), M.maxc(weight))
            r_rr, rng = R.rand1f_if(rng, rr)
            rr_die = rr & (r_rr >= rr_prob)
            safe_rr = jnp.where(rr_prob == 0.0, 1.0, rr_prob)
            weight = jnp.where((rr & ~rr_die)[:, None],
                               weight / safe_rr[:, None], weight)
            alive = alive & ~rr_die

            ro = ro_s
            rd = rd_s
            if has_opacity:
                ro = jnp.where(op_skip[:, None],
                               position + lanes.rd * 1e-2, ro)

            bounce = jnp.where(processed & alive, lanes.bounce + 1,
                               lanes.bounce)
            cont = alive & (op_skip | (bounce < params.bounces)) \
                & (processed | op_skip)
            pix = jnp.where(cont, lanes.pix, -1)

            # fused scatters (per-lane clamp + NaN scrub)
            dead = (lanes.pix >= 0) & (pix < 0)
            finite = M.isfinite3(radiance)[:, None]
            rad = jnp.where(finite, radiance, 0.0)
            mxr = M.maxc(rad)
            rscale = jnp.where(mxr > clamp,
                               clamp / jnp.maximum(mxr, 1e-20), 1.0)
            rad = rad * rscale[:, None]
            didx = jnp.where(dead, lanes.pix, 0)
            img = img.at[didx].add(jnp.where(dead[:, None], rad, 0.0))
            if first_bounce:
                okf = (lanes.pix >= 0) & hit_aov
                fidx = jnp.where(okf, lanes.pix, 0)
                albedo_img = albedo_img.at[fidx].add(
                    jnp.where(okf[:, None], albedo, 0.0))
                normal_img = normal_img.at[fidx].add(
                    jnp.where(okf[:, None], normal_aov, 0.0))
                hits_img = hits_img.at[fidx].add(okf.astype(jnp.int32))
            return (PathmisLanes(pix=pix, ro=ro, rd=rd, weight=weight,
                                 radiance=radiance, bounce=bounce,
                                 opbounce=lanes.opbounce,
                                 next_em=next_em, rng=rng,
                                 max_rough=lanes.max_rough, **vol_kwargs),
                    img, albedo_img, normal_img, hits_img)

        stages = (shade_pre, shade_mid, shade_post)
        self._jits[key] = stages
        return stages

    def _direct_stages(self):
        """shade_post for the pathdirect estimator (see
        WavefrontPathdirectRenderer); built here so it shares `surface`/
        `emission_at` helpers' closure environment via _mis_stages'
        feature gating pattern."""
        key = "direct_stages"
        if key in self._jits:
            return self._jits[key]
        params, feat = self.params, self.features
        meta = self.meta
        has_lights = meta.n_lights > 0
        has_delta = feat.has_delta
        has_opacity = feat.has_opacity
        has_volumes = feat.has_volumes
        types = feat.mat_types
        clamp = params.clamp
        from ..ops import shading as SH
        from .sceneval import is_volumetric_type

        def surface(flat, lanes, hit, inst_g, elem_g, uv_g):
            inst = jnp.maximum(inst_g, 0)
            elem_l = jnp.maximum(elem_g, 0)
            rows = gather_surface_rows(flat, inst, elem_l)
            if rows is None:
                shape = flat.inst_shape[inst]
                gelem = flat.shape_elem_start[shape] + elem_l
            else:
                gelem = None
            outgoing = -lanes.rd
            position = eval_shading_position(flat, inst, gelem, uv_g,
                                             outgoing, rows=rows)
            normal = eval_shading_normal(flat, inst, gelem, uv_g, outgoing,
                                         features=feat, rows=rows)
            material = eval_material(flat, inst, gelem, uv_g, features=feat,
                                     rows=rows)
            if params.nocaustics:
                material = material._replace(roughness=jnp.maximum(
                    material.roughness, lanes.max_rough))
            return inst, position, normal, material, outgoing

        def emission_at(flat, direction, hit, inst_g, elem_g, uv_g):
            inst = jnp.maximum(inst_g, 0)
            elem_l = jnp.maximum(elem_g, 0)
            rows = gather_surface_rows(flat, inst, elem_l)
            if rows is None:
                shape = flat.inst_shape[inst]
                gelem = flat.shape_elem_start[shape] + elem_l
            else:
                gelem = None
            mat = eval_material(flat, inst, gelem, uv_g, features=feat,
                                rows=rows)
            nrm = eval_shading_normal(flat, inst, gelem, uv_g, -direction,
                                      features=feat, rows=rows)
            em = B.eval_emission(mat, nrm, -direction)
            if flat.env_frame.shape[0] > 0:
                env = eval_environment(flat, direction)
            else:
                env = jnp.zeros_like(em)
            return jnp.where(hit[:, None], em, env)

        @functools.partial(jax.jit, static_argnames=("first_bounce",))
        def shade_post(flat, lights, lanes: PathmisLanes, flags, position,
                       inc_d, hit_c, inst_c, elem_c, uv_c, inst_g, elem_g,
                       uv_g, hit, tdist, img, albedo_img, normal_img,
                       hits_img, albedo, normal_aov, hit_aov, blocked,
                       first_bounce):
            """NEE contribution (plain 1/pdf) + 50/50 light/BSDF
            continuation with the combined pdf (pathtrace.
            make_pathdirect_sampler body, after the main intersection).
            `blocked` as in pathmis shade_mid (two-pass NEE)."""
            alive, shade_m, op_skip, delta, nd, in_volume = [
                flags[:, i] != 0 for i in range(6)]
            inst, _, normal, material, outgoing = surface(
                flat, lanes, hit, inst_g, elem_g, uv_g)
            rng = lanes.rng
            radiance = lanes.radiance
            weight = lanes.weight

            # --- direct lighting: f * em / pdf_light, no MIS weight
            if has_lights:
                pdf_d = sample_lights_pdf(flat, lights, meta, position,
                                          inc_d)
                f_d = B.eval_bsdfcos(material, normal, outgoing, inc_d,
                                     types=types)
                ok_d = nd & ~M.is_zero3(f_d) & (pdf_d > 0.0)
                em_d = jnp.where(blocked[:, None], 0.0,
                                 emission_at(flat, inc_d, hit_c, inst_c,
                                             elem_c, uv_c))
                safe_pd = jnp.where(pdf_d == 0.0, 1.0, pdf_d)[:, None]
                radiance = jnp.where(
                    ok_d[:, None],
                    radiance + weight * f_d * em_d / safe_pd, radiance)
            next_em = jnp.where(shade_m, delta, lanes.next_em)

            # --- continuation: 50/50 light/BSDF, combined pdf
            r_choice, rng = R.rand1f_if(rng, nd)
            use_bsdf = r_choice < 0.5
            rn2, rng = R.rand2f_if(rng, nd & use_bsdf)
            rnl, rng = R.rand1f_if(rng, nd & use_bsdf)
            inc_bsdf = B.sample_bsdfcos(material, normal, outgoing, rnl,
                                        rn2, types=types)
            if has_lights:
                ruv, rng = R.rand2f_if(rng, nd & ~use_bsdf)
                rel, rng = R.rand1f_if(rng, nd & ~use_bsdf)
                rl, rng = R.rand1f_if(rng, nd & ~use_bsdf)
                inc_light = sample_lights(flat, lights, meta, position,
                                          rl, rel, ruv, env_alias=True)
                incoming_nd = jnp.where(use_bsdf[:, None], inc_bsdf,
                                        inc_light)
            else:
                incoming_nd = inc_bsdf
            nd_zero = nd & M.is_zero3(incoming_nd)
            nd_ok = nd & ~nd_zero
            f_nd = B.eval_bsdfcos(material, normal, outgoing, incoming_nd,
                                  types=types)
            pdf_b = B.sample_bsdfcos_pdf(material, normal, outgoing,
                                         incoming_nd, types=types)
            if has_lights:
                pdf_l = sample_lights_pdf(flat, lights, meta, position,
                                          incoming_nd)
                pdf_nd = 0.5 * pdf_b + 0.5 * pdf_l
            else:
                pdf_nd = 0.5 * pdf_b
            safe_pdf_nd = jnp.where(pdf_nd == 0.0, 1.0, pdf_nd)[:, None]
            weight = jnp.where(nd_ok[:, None],
                               weight * f_nd / safe_pdf_nd, weight)
            incoming = incoming_nd

            if has_delta:
                dl = shade_m & delta
                r_delta, rng = R.rand1f_if(rng, dl)
                inc_delta = B.sample_delta(material, normal, outgoing,
                                           r_delta, types=types)
                dl_zero = dl & M.is_zero3(inc_delta)
                f_dl = B.eval_delta(material, normal, outgoing, inc_delta,
                                    types=types)
                pdf_dl = B.sample_delta_pdf(material, normal, outgoing,
                                            inc_delta, types=types)
                safe_dl = jnp.where(pdf_dl == 0.0, 1.0, pdf_dl)[:, None]
                weight = jnp.where((dl & ~dl_zero)[:, None],
                                   weight * f_dl / safe_dl, weight)
                incoming = jnp.where(delta[:, None], inc_delta, incoming)
                alive = alive & ~(nd_zero | dl_zero)
            else:
                alive = alive & ~nd_zero

            # volume stack update on transmission
            vol_kwargs = {}
            if has_volumes:
                crossed = (M.dot(normal, outgoing)
                           * M.dot(normal, incoming)) < 0.0
                vol_change = shade_m & alive & crossed \
                    & is_volumetric_type(material.type)
                push = vol_change & (lanes.vol_depth == 0)
                pop = vol_change & (lanes.vol_depth > 0)
                cap = VOLUME_STACK_CAP
                pslot = jnp.minimum(lanes.vol_depth, cap - 1)
                oh = (jax.nn.one_hot(pslot, cap, dtype=bool)
                      & push[:, None])
                vol_density = jnp.where(oh[..., None],
                                        material.density[:, None, :],
                                        lanes.vol_density)
                vol_scattering = jnp.where(
                    oh[..., None], material.scattering[:, None, :],
                    lanes.vol_scattering)
                vol_aniso = jnp.where(oh, material.scanisotropy[:, None],
                                      lanes.vol_aniso)
                vol_depth = jnp.where(
                    push, jnp.minimum(lanes.vol_depth + 1, cap),
                    jnp.where(pop, jnp.maximum(lanes.vol_depth - 1, 0),
                              lanes.vol_depth))
                vol_kwargs = dict(vol_density=vol_density,
                                  vol_scattering=vol_scattering,
                                  vol_aniso=vol_aniso,
                                  vol_depth=vol_depth)

            ro_s = jnp.where(shade_m[:, None], position, lanes.ro)
            rd_s = jnp.where(shade_m[:, None], incoming, lanes.rd)

            # volume interaction (lockstep pathdirect volume branch)
            if has_volumes:
                vol = alive & in_volume
                slot = jnp.maximum(lanes.vol_depth - 1, 0)
                take = lambda a: jnp.take_along_axis(
                    a, slot[:, None, None] if a.ndim == 3
                    else slot[:, None], axis=1)[:, 0]
                top_density = take(lanes.vol_density)
                top_scat = take(lanes.vol_scattering)
                top_aniso = take(lanes.vol_aniso)
                position_v = lanes.ro + lanes.rd * tdist[:, None]
                outgoing_v = -lanes.rd
                r_cv, rng = R.rand1f_if(rng, vol)
                use_scat = r_cv < 0.5
                rn2_v, rng = R.rand2f_if(rng, vol & use_scat)
                rnl_v, rng = R.rand1f_if(rng, vol & use_scat)
                inc_scat = B.sample_scattering(top_aniso, outgoing_v,
                                               rn2_v)
                if has_lights:
                    ruv_v, rng = R.rand2f_if(rng, vol & ~use_scat)
                    rel_v, rng = R.rand1f_if(rng, vol & ~use_scat)
                    rl_v, rng = R.rand1f_if(rng, vol & ~use_scat)
                    inc_lv = sample_lights(flat, lights, meta, position_v,
                                           rl_v, rel_v, ruv_v,
                                           env_alias=True)
                    incoming_v = jnp.where(use_scat[:, None], inc_scat,
                                           inc_lv)
                else:
                    incoming_v = inc_scat
                v_zero = vol & M.is_zero3(incoming_v)
                v_ok = vol & ~v_zero
                f_v = B.eval_scattering(top_density, top_scat, top_aniso,
                                        outgoing_v, incoming_v)
                pdf_vs = B.sample_scattering_pdf(top_density, top_aniso,
                                                 outgoing_v, incoming_v)
                if has_lights:
                    pdf_vl = sample_lights_pdf(flat, lights, meta,
                                               position_v, incoming_v)
                    pdf_v = 0.5 * pdf_vs + 0.5 * pdf_vl
                else:
                    pdf_v = 0.5 * pdf_vs
                safe_pv = jnp.where(pdf_v == 0.0, 1.0, pdf_v)[:, None]
                weight = jnp.where(v_ok[:, None],
                                   weight * f_v / safe_pv, weight)
                alive = alive & ~v_zero
                ro_s = jnp.where(v_ok[:, None], position_v, ro_s)
                rd_s = jnp.where(v_ok[:, None], incoming_v, rd_s)
                processed = shade_m | vol
            else:
                vol = jnp.zeros_like(shade_m)
                processed = shade_m

            wzero = M.is_zero3(weight)
            wbad = ~M.isfinite3(weight)
            alive = alive & ~(processed & (wzero | wbad))

            rr = processed & alive & (lanes.bounce > 3)
            rr_prob = jnp.minimum(jnp.float32(0.99), M.maxc(weight))
            r_rr, rng = R.rand1f_if(rng, rr)
            rr_die = rr & (r_rr >= rr_prob)
            safe_rr = jnp.where(rr_prob == 0.0, 1.0, rr_prob)
            weight = jnp.where((rr & ~rr_die)[:, None],
                               weight / safe_rr[:, None], weight)
            alive = alive & ~rr_die

            ro = ro_s
            rd = rd_s
            if has_opacity:
                ro = jnp.where(op_skip[:, None],
                               position + lanes.rd * 1e-2, ro)

            bounce = jnp.where(processed & alive, lanes.bounce + 1,
                               lanes.bounce)
            cont = alive & (op_skip | (bounce < params.bounces)) \
                & (processed | op_skip)
            pix = jnp.where(cont, lanes.pix, -1)

            dead = (lanes.pix >= 0) & (pix < 0)
            finite = M.isfinite3(radiance)[:, None]
            rad = jnp.where(finite, radiance, 0.0)
            mxr = M.maxc(rad)
            rscale = jnp.where(mxr > clamp,
                               clamp / jnp.maximum(mxr, 1e-20), 1.0)
            rad = rad * rscale[:, None]
            didx = jnp.where(dead, lanes.pix, 0)
            img = img.at[didx].add(jnp.where(dead[:, None], rad, 0.0))
            if first_bounce:
                okf = (lanes.pix >= 0) & hit_aov
                fidx = jnp.where(okf, lanes.pix, 0)
                albedo_img = albedo_img.at[fidx].add(
                    jnp.where(okf[:, None], albedo, 0.0))
                normal_img = normal_img.at[fidx].add(
                    jnp.where(okf[:, None], normal_aov, 0.0))
                hits_img = hits_img.at[fidx].add(okf.astype(jnp.int32))
            return (PathmisLanes(pix=pix, ro=ro, rd=rd, weight=weight,
                                 radiance=radiance, bounce=bounce,
                                 opbounce=lanes.opbounce,
                                 next_em=next_em, rng=rng,
                                 max_rough=lanes.max_rough, **vol_kwargs),
                    img, albedo_img, normal_img, hits_img)

        self._jits[key] = shade_post
        return shade_post

    def _intersect_any(self, flat, ro, rd):
        """Closest hit via the scene-size-appropriate path."""
        if self.use_bvh:
            hit, inst_g, elem_g, uv_g, dist = self._traverse(ro, rd)
            shape = flat.inst_shape[jnp.maximum(inst_g, 0)]
            elem_l = elem_g - flat.shape_elem_start[shape]
            return hit, inst_g, elem_l, uv_g, dist
        isec = self._intersect_dense()(flat, ro, rd)
        return isec.hit, isec.instance, isec.element, isec.uv, \
            isec.distance

    def _bounce_mis(self):
        """Fused pathmis bounce: THREE traversals (main + light-strategy
        + BSDF-strategy connections) and three shade stages in ONE
        dispatch — the split version cost ~7 host round trips per
        bounce."""
        key = "bounce_mis"
        if key in self._jits:
            return self._jits[key]
        isect = self._intersect_raw()
        shade_pre, shade_mid, shade_post = self._mis_stages()
        nee = self._nee
        cluster = self._cluster

        @functools.partial(jax.jit, static_argnames=("first_bounce",))
        def bounce(flat, lights, lanes, img, albedo, normal, hits,
                   first_bounce):
            live = lanes.pix >= 0
            tmax = jnp.where(live, M.flt_max, 0.0)
            i0 = isect(flat, lanes.ro, lanes.rd, tmax=tmax)
            hit, inst_g, elem_l = i0.hit, i0.instance, i0.element
            uv_g, dist = i0.uv, i0.distance
            (lanes, flags, position, inc_l, alb, nrm, hit_aov,
             tdist) = shade_pre(flat, lights, lanes, hit, inst_g, elem_l,
                                uv_g, dist)
            if nee is None:
                ic = isect(flat, position, inc_l, tmax=tmax)
                hit_c, inst_c, elem_c, uv_c = (ic.hit, ic.instance,
                                               ic.element, ic.uv)
                blocked = jnp.zeros_like(hit_c)
            else:
                # two-pass NEE: tiny emissive-closest sweep + any-hit
                # shadow query bounded at the emissive hit (find_any,
                # yocto_bvh.cpp:540-552) replaces a full scene sweep
                em = nee(flat, position, inc_l, tmax=tmax)
                shadow_tmax = jnp.where(
                    em.hit, em.distance * (1.0 - 1e-3), tmax)
                blocked = cluster.any_hit(position, inc_l,
                                          tmax=shadow_tmax)
                hit_c = em.hit & ~blocked
                inst_c, elem_c, uv_c = em.instance, em.element, em.uv
            lanes, inc_b = shade_mid(
                flat, lights, lanes, flags, position, inc_l,
                hit_c, inst_c, elem_c, uv_c,
                inst_g, elem_l, uv_g, hit, blocked)
            ib = isect(flat, position, inc_b, tmax=tmax)
            lanes, img, albedo, normal, hits = shade_post(
                flat, lights, lanes, flags, position, inc_b,
                ib.hit, ib.instance, ib.element, ib.uv,
                inst_g, elem_l, uv_g, hit,
                tdist, img, albedo, normal, hits, alb, nrm, hit_aov,
                first_bounce=first_bounce)
            nlive = jnp.sum((lanes.pix >= 0).astype(jnp.int32))
            return lanes, img, albedo, normal, hits, nlive

        self._jits[key] = bounce
        return bounce

    def _make_mis_lanes(self, flat, sample_idx):
        lanes_p = self._raygen()(flat, sample_idx)
        vol = {}
        if self.features.has_volumes:
            vol = dict(vol_density=lanes_p.vol_density,
                       vol_scattering=lanes_p.vol_scattering,
                       vol_aniso=lanes_p.vol_aniso,
                       vol_depth=lanes_p.vol_depth)
        return PathmisLanes(
            pix=lanes_p.pix, ro=lanes_p.ro, rd=lanes_p.rd,
            weight=lanes_p.weight, radiance=lanes_p.radiance,
            bounce=lanes_p.bounce, opbounce=lanes_p.opbounce,
            next_em=jnp.ones_like(lanes_p.pix, bool), rng=lanes_p.rng,
            max_rough=lanes_p.max_rough, **vol)

    def _run_fused_loop(self, flat, lights, lanes, img, albedo, normal,
                        hits, bounce_fn, max_iters):
        """Shared dense-path bounce loop: one fused dispatch per bounce,
        in-device compaction on the power-of-four bucket ladder."""
        compact = self._compact()
        for it in range(max_iters):
            lanes, img, albedo, normal, hits, nlive_a = bounce_fn(
                flat, lights, lanes, img, albedo, normal, hits,
                first_bounce=(it == 0))
            if it < 1:
                continue  # no deaths expected before the first shade
            nlive = int(nlive_a)
            if nlive == 0:
                return lanes, img, albedo, normal, hits, False
            bucket = _next_bucket(nlive)
            if bucket < lanes.pix.shape[0]:
                lanes = compact(lanes, bucket=bucket)
        return lanes, img, albedo, normal, hits, True

    def render_sample(self, flat, lights, sample_idx: int):
        npix = self.width * self.height
        lanes = self._make_mis_lanes(flat, sample_idx)

        img = jnp.zeros((npix, 3), jnp.float32)
        albedo = jnp.zeros((npix, 3), jnp.float32)
        normal = jnp.zeros((npix, 3), jnp.float32)
        hits = jnp.zeros(npix, jnp.int32)

        max_iters = self.params.bounces + 32
        if not self.use_bvh:
            lanes, img, albedo, normal, hits, exhausted = \
                self._run_fused_loop(flat, lights, lanes, img, albedo,
                                     normal, hits, self._bounce_mis(),
                                     max_iters)
            if exhausted:
                img = self._scatter_img()(img, lanes.pix, lanes.radiance,
                                          jnp.full_like(lanes.pix, -1))
            return img, albedo, normal, hits

        shade_pre, shade_mid, shade_post = self._mis_stages()
        gather = self._gather()
        for it in range(max_iters):
            hit, inst_g, elem_l, uv_g, dist = self._intersect_any(
                flat, lanes.ro, lanes.rd)
            (lanes, flags, position, inc_l, alb, nrm, hit_aov,
             tdist) = shade_pre(flat, lights, lanes, hit, inst_g, elem_l,
                                uv_g, dist)
            hit_c, inst_c, elem_c, uv_c, _ = self._intersect_any(
                flat, position, inc_l)
            lanes, inc_b = shade_mid(
                flat, lights, lanes, flags, position, inc_l,
                hit_c, inst_c, elem_c, uv_c, inst_g, elem_l, uv_g, hit,
                jnp.zeros_like(hit_c))
            hit_b, inst_b, elem_b, uv_b, _ = self._intersect_any(
                flat, position, inc_b)
            lanes, img, albedo, normal, hits = shade_post(
                flat, lights, lanes, flags, position, inc_b,
                hit_b, inst_b, elem_b, uv_b, inst_g, elem_l, uv_g, hit,
                tdist, img, albedo, normal, hits, alb, nrm, hit_aov,
                first_bounce=(it == 0))
            if it < 1:
                continue  # no deaths expected before the first shade
            nlive = int(jnp.sum(lanes.pix >= 0))
            if nlive == 0:
                break
            bucket = _next_bucket(nlive)
            if bucket < lanes.pix.shape[0]:
                live = np.asarray(lanes.pix >= 0)
                idx_np = np.nonzero(live)[0]
                dead = np.nonzero(~live)[0]
                pad_val = int(dead[0]) if len(dead) else int(idx_np[0])
                idx_np = np.concatenate(
                    [idx_np, np.full(bucket - nlive, pad_val, np.int64)])
                lanes = gather(lanes, jnp.asarray(idx_np, jnp.int32))
        else:
            scatter_img = self._scatter_img()
            img = scatter_img(img, lanes.pix, lanes.radiance,
                              jnp.full_like(lanes.pix, -1))
        return img, albedo, normal, hits


class WavefrontPathdirectRenderer(WavefrontPathmisRenderer):
    """`trace_pathdirect` (yocto_trace.cpp:599-767) over compacted queues:
    NEE at every rough vertex with the plain 1/pdf_light weight, plus a
    50/50 light/BSDF continuation divided by the combined pdf.

    Reuses the pathmis shade_pre unchanged (identical RNG draw order up
    through the NEE direction: transmittance, opacity, then the light
    triple on non-delta lanes), then needs only ONE connection traversal
    per bounce — pathdirect has no BSDF-strategy connection — followed by
    a single fused shade_post."""

    def _bounce_direct(self):
        """Fused pathdirect bounce: main + NEE-connection traversals and
        both shade stages in ONE dispatch."""
        key = "bounce_direct"
        if key in self._jits:
            return self._jits[key]
        isect = self._intersect_raw()
        shade_pre = self._mis_stages()[0]
        shade_post = self._direct_stages()

        nee = self._nee
        cluster = self._cluster

        @functools.partial(jax.jit, static_argnames=("first_bounce",))
        def bounce(flat, lights, lanes, img, albedo, normal, hits,
                   first_bounce):
            tmax = jnp.where(lanes.pix >= 0, M.flt_max, 0.0)
            i0 = isect(flat, lanes.ro, lanes.rd, tmax=tmax)
            hit, inst_g, elem_l = i0.hit, i0.instance, i0.element
            uv_g, dist = i0.uv, i0.distance
            (lanes, flags, position, inc_d, alb, nrm, hit_aov,
             tdist) = shade_pre(flat, lights, lanes, hit, inst_g, elem_l,
                                uv_g, dist)
            if nee is None:
                ic = isect(flat, position, inc_d, tmax=tmax)
                hit_c, inst_c, elem_c, uv_c = (ic.hit, ic.instance,
                                               ic.element, ic.uv)
                blocked = jnp.zeros_like(hit_c)
            else:
                em = nee(flat, position, inc_d, tmax=tmax)
                shadow_tmax = jnp.where(
                    em.hit, em.distance * (1.0 - 1e-3), tmax)
                blocked = cluster.any_hit(position, inc_d,
                                          tmax=shadow_tmax)
                hit_c = em.hit & ~blocked
                inst_c, elem_c, uv_c = em.instance, em.element, em.uv
            lanes, img, albedo, normal, hits = shade_post(
                flat, lights, lanes, flags, position, inc_d,
                hit_c, inst_c, elem_c, uv_c,
                inst_g, elem_l, uv_g, hit,
                tdist, img, albedo, normal, hits, alb, nrm, hit_aov,
                blocked, first_bounce=first_bounce)
            nlive = jnp.sum((lanes.pix >= 0).astype(jnp.int32))
            return lanes, img, albedo, normal, hits, nlive

        self._jits[key] = bounce
        return bounce

    def render_sample(self, flat, lights, sample_idx: int):
        npix = self.width * self.height
        lanes = self._make_mis_lanes(flat, sample_idx)

        img = jnp.zeros((npix, 3), jnp.float32)
        albedo = jnp.zeros((npix, 3), jnp.float32)
        normal = jnp.zeros((npix, 3), jnp.float32)
        hits = jnp.zeros(npix, jnp.int32)

        max_iters = self.params.bounces + 32
        if not self.use_bvh:
            lanes, img, albedo, normal, hits, exhausted = \
                self._run_fused_loop(flat, lights, lanes, img, albedo,
                                     normal, hits, self._bounce_direct(),
                                     max_iters)
            if exhausted:
                img = self._scatter_img()(img, lanes.pix, lanes.radiance,
                                          jnp.full_like(lanes.pix, -1))
            return img, albedo, normal, hits

        shade_pre = self._mis_stages()[0]
        shade_post = self._direct_stages()
        gather = self._gather()
        for it in range(max_iters):
            hit, inst_g, elem_l, uv_g, dist = self._intersect_any(
                flat, lanes.ro, lanes.rd)
            (lanes, flags, position, inc_d, alb, nrm, hit_aov,
             tdist) = shade_pre(flat, lights, lanes, hit, inst_g, elem_l,
                                uv_g, dist)
            hit_c, inst_c, elem_c, uv_c, _ = self._intersect_any(
                flat, position, inc_d)
            lanes, img, albedo, normal, hits = shade_post(
                flat, lights, lanes, flags, position, inc_d,
                hit_c, inst_c, elem_c, uv_c, inst_g, elem_l, uv_g, hit,
                tdist, img, albedo, normal, hits, alb, nrm, hit_aov,
                jnp.zeros_like(hit_c), first_bounce=(it == 0))
            if it < 1:
                continue  # no deaths expected before the first shade
            nlive = int(jnp.sum(lanes.pix >= 0))
            if nlive == 0:
                break
            bucket = _next_bucket(nlive)
            if bucket < lanes.pix.shape[0]:
                live = np.asarray(lanes.pix >= 0)
                idx_np = np.nonzero(live)[0]
                dead = np.nonzero(~live)[0]
                pad_val = int(dead[0]) if len(dead) else int(idx_np[0])
                idx_np = np.concatenate(
                    [idx_np, np.full(bucket - nlive, pad_val, np.int64)])
                lanes = gather(lanes, jnp.asarray(idx_np, jnp.int32))
        else:
            scatter_img = self._scatter_img()
            img = scatter_img(img, lanes.pix, lanes.radiance,
                              jnp.full_like(lanes.pix, -1))
        return img, albedo, normal, hits
