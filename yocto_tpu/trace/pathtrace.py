"""Wavefront path-tracing samplers.

The TPU redesign of the reference's recursive per-pixel samplers
(yocto_trace.cpp:453-1419): instead of one thread per pixel running a
divergent loop (CPU) or a megakernel (CUDA), ALL rays advance together
through a masked `lax.while_loop` — each iteration intersects the whole
ray batch, shades it branch-free, and lanes die off under their own masks.
Random draws use `rand*_if` so every pixel consumes exactly the per-pixel
PCG32 stream the reference would (draw sites are guarded by the same
conditions as the reference's control flow), which keeps images comparable
at equal sample counts.

Samplers implemented here: path (MIS-lite 50/50 one-sample), naive
(BSDF only), eyelight, falsecolor AOVs, plus furnace. The `pathdirect` and
`pathmis` variants reuse the same scaffolding.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import mathops as M
from ..ops import rng as R
from ..ops import sampling as SMP
from ..ops import shading as SH
from . import bsdf as B
from .compile import FlatScene
from .intersect import intersect_scene_bruteforce
from .lights import (FlatLights, LightsMeta, sample_lights,
                     sample_lights_pdf)
from .params import FalsecolorType, SamplerType, TraceParams
from .sceneval import (MaterialPoint, eval_element_normal, eval_environment,
                       eval_material, eval_normal, eval_shading_normal,
                       eval_shading_position, eval_texcoord,
                       gather_surface_rows, is_delta_point,
                       is_volumetric_type)

VOLUME_STACK_CAP = 4  # the CUDA reference uses a fixed svector too


class PathState(NamedTuple):
    ro: jax.Array
    rd: jax.Array
    radiance: jax.Array
    weight: jax.Array
    alive: jax.Array
    bounce: jax.Array      # per-lane bounce counter (i32)
    opbounce: jax.Array
    rng: R.RngState
    vol_density: jax.Array     # [R,CAP,3]
    vol_scattering: jax.Array  # [R,CAP,3]
    vol_aniso: jax.Array       # [R,CAP]
    vol_depth: jax.Array       # [R] i32
    max_roughness: jax.Array
    hit: jax.Array
    hit_albedo: jax.Array
    hit_normal: jax.Array
    next_emission: jax.Array  # bool; used by pathdirect/pathmis
    it: jax.Array          # scalar iteration counter


def _init_state(ro, rd, rngs) -> PathState:
    Rn = ro.shape[0]
    z3 = jnp.zeros((Rn, 3), jnp.float32)
    return PathState(
        ro=ro, rd=rd, radiance=z3, weight=jnp.ones((Rn, 3), jnp.float32),
        alive=jnp.ones(Rn, bool),
        bounce=jnp.zeros(Rn, jnp.int32), opbounce=jnp.zeros(Rn, jnp.int32),
        rng=rngs,
        vol_density=jnp.zeros((Rn, VOLUME_STACK_CAP, 3), jnp.float32),
        vol_scattering=jnp.zeros((Rn, VOLUME_STACK_CAP, 3), jnp.float32),
        vol_aniso=jnp.zeros((Rn, VOLUME_STACK_CAP), jnp.float32),
        vol_depth=jnp.zeros(Rn, jnp.int32),
        max_roughness=jnp.zeros(Rn, jnp.float32),
        hit=jnp.zeros(Rn, bool), hit_albedo=z3, hit_normal=z3,
        next_emission=jnp.ones(Rn, bool),
        it=jnp.zeros((), jnp.int32))


def _where3(c, a, b):
    return jnp.where(c[..., None], a, b)


def _vol_top(st: PathState):
    idx = jnp.maximum(st.vol_depth - 1, 0)
    take = lambda a: jnp.take_along_axis(
        a, idx[:, None, None] if a.ndim == 3 else idx[:, None],
        axis=1)[:, 0]
    return take(st.vol_density), take(st.vol_scattering), take(st.vol_aniso)


def _vol_push(st: PathState, cond, density, scattering, aniso):
    slot = jnp.minimum(st.vol_depth, VOLUME_STACK_CAP - 1)
    oh = jax.nn.one_hot(slot, VOLUME_STACK_CAP, dtype=bool) & cond[:, None]
    vol_density = jnp.where(oh[..., None], density[:, None, :],
                            st.vol_density)
    vol_scattering = jnp.where(oh[..., None], scattering[:, None, :],
                               st.vol_scattering)
    vol_aniso = jnp.where(oh, aniso[:, None], st.vol_aniso)
    vol_depth = jnp.where(cond, jnp.minimum(
        st.vol_depth + 1, VOLUME_STACK_CAP), st.vol_depth)
    return st._replace(vol_density=vol_density,
                       vol_scattering=vol_scattering,
                       vol_aniso=vol_aniso, vol_depth=vol_depth)


def _vol_pop(st: PathState, cond):
    return st._replace(
        vol_depth=jnp.where(cond, jnp.maximum(st.vol_depth - 1, 0),
                            st.vol_depth))


def make_path_sampler(scene: FlatScene, lights: FlatLights,
                      meta: LightsMeta, params: TraceParams,
                      intersect_fn, features=None, force_matte=False):
    """Build the `trace_path` step (yocto_trace.cpp:453-596 semantics).

    `features` (SceneFeatures) statically disables machinery no material in
    the scene can trigger — volumes, opacity passthrough, delta lobes —
    which is bit-identical to running it behind all-false masks (all RNG
    draw sites are mask-guarded, so the per-pixel streams are unchanged).
    `force_matte` makes this `trace_pathtest` (yocto_trace.cpp:953-1030):
    materials are evaluated normally, then the lobe type is overwritten
    with matte — no volume, opacity, or delta machinery ever engages."""
    from .compile import ALL_FEATURES

    feat = features if features is not None else ALL_FEATURES
    envhidden = params.envhidden
    has_env = scene.env_frame.shape[0] > 0
    has_lights = meta.n_lights > 0
    has_volumes = feat.has_volumes and not force_matte
    has_opacity = feat.has_opacity and not force_matte
    has_delta = feat.has_delta and not force_matte
    types = (0,) if force_matte else feat.mat_types
    max_iters = params.bounces + 130

    def body(st: PathState) -> PathState:
        isec = intersect_fn(scene, st.ro, st.rd,
                            tmax=jnp.where(st.alive, M.flt_max, 0.0))
        act = st.alive
        hit_l = act & isec.hit
        Rn = st.ro.shape[0]
        false_ = jnp.zeros(Rn, bool)

        # --- miss: environment, then terminate
        miss = act & ~isec.hit
        if has_env:
            env_ok = miss & ((st.bounce > 0) | (not envhidden))
            env = eval_environment(scene, st.rd)
            radiance = _where3(env_ok, st.radiance + st.weight * env,
                               st.radiance)
        else:
            radiance = st.radiance
        alive = act & isec.hit
        st = st._replace(radiance=radiance, alive=alive)

        inst = jnp.maximum(isec.instance, 0)
        shape = scene.inst_shape[inst]
        gelem = scene.shape_elem_start[shape] + jnp.maximum(isec.element, 0)
        rows = gather_surface_rows(scene, inst, jnp.maximum(isec.element, 0))

        # --- volume transmittance (only lanes inside a volume)
        if has_volumes:
            in_stack = hit_l & (st.vol_depth > 0)
            # gcc evaluates sample_transmittance's args right-to-left: the
            # distance rand (rd) is drawn before the channel rand (rl)
            r_tr2, rng = R.rand1f_if(st.rng, in_stack)
            r_tr1, rng = R.rand1f_if(rng, in_stack)
            top_density, top_scat, top_aniso = _vol_top(st)
            tdist = SH.sample_transmittance(top_density, isec.distance,
                                            r_tr1, r_tr2)
            trans = SH.eval_transmittance(top_density, tdist)
            tpdf = SH.sample_transmittance_pdf(top_density, tdist,
                                               isec.distance)
            safe_tpdf = jnp.where(tpdf == 0.0, 1.0, tpdf)[..., None]
            weight = _where3(in_stack, st.weight * trans / safe_tpdf,
                             st.weight)
            in_volume = in_stack & (tdist < isec.distance)
            st = st._replace(weight=weight, rng=rng)
        else:
            in_volume = false_

        # ====================================================================
        # Surface branch
        # ====================================================================
        surf = hit_l & ~in_volume if has_volumes else hit_l
        outgoing = -st.rd
        position = eval_shading_position(scene, inst, gelem, isec.uv,
                                         outgoing, rows=rows)
        normal = eval_shading_normal(scene, inst, gelem, isec.uv, outgoing,
                                     features=features, rows=rows)
        material = eval_material(scene, inst, gelem, isec.uv,
                                 features=features, rows=rows)
        if force_matte:
            material = material._replace(
                type=jnp.zeros_like(material.type))

        if params.nocaustics:
            max_roughness = jnp.where(
                surf, jnp.maximum(material.roughness, st.max_roughness),
                st.max_roughness)
            material = material._replace(
                roughness=jnp.where(surf, max_roughness, material.roughness))
            st = st._replace(max_roughness=max_roughness)

        # --- opacity passthrough (yocto_trace.cpp:505-510)
        if has_opacity:
            op_lt1 = surf & (material.opacity < 1.0)
            r_op, rng = R.rand1f_if(st.rng, op_lt1)
            op_skip = op_lt1 & (r_op >= material.opacity)
            op_die = op_skip & (st.opbounce > 128)
            opbounce = jnp.where(op_skip, st.opbounce + 1, st.opbounce)
            alive = st.alive & ~op_die
            shade = surf & ~op_skip
            st = st._replace(rng=rng, opbounce=opbounce, alive=alive)
        else:
            op_skip = false_
            shade = surf

        # --- first-hit AOVs
        first = shade & (st.bounce == 0)
        st = st._replace(
            hit=st.hit | first,
            hit_albedo=_where3(first, material.color, st.hit_albedo),
            hit_normal=_where3(first, normal, st.hit_normal))

        # --- emission
        emis = B.eval_emission(material, normal, outgoing)
        st = st._replace(radiance=_where3(
            shade, st.radiance + st.weight * emis, st.radiance))

        # --- next direction
        delta = is_delta_point(material) if has_delta else false_
        nd = shade & ~delta if has_delta else shade
        r_choice, rng = R.rand1f_if(st.rng, nd)
        use_bsdf = r_choice < 0.5
        # right-to-left arg order: the 2d pair precedes the lobe rand
        rn2, rng = R.rand2f_if(rng, nd & use_bsdf)
        rnl, rng = R.rand1f_if(rng, nd & use_bsdf)
        inc_bsdf = B.sample_bsdfcos(material, normal, outgoing, rnl, rn2,
                                    types=types)
        if has_lights:
            # right-to-left arg order: ruv, then rel, then rl
            ruv, rng = R.rand2f_if(rng, nd & ~use_bsdf)
            rel, rng = R.rand1f_if(rng, nd & ~use_bsdf)
            rl, rng = R.rand1f_if(rng, nd & ~use_bsdf)
            inc_light = sample_lights(scene, lights, meta, position,
                                      rl, rel, ruv)
            incoming_nd = _where3(use_bsdf, inc_bsdf, inc_light)
        else:
            incoming_nd = inc_bsdf
        nd_zero = nd & M.is_zero3(incoming_nd)
        nd_ok = nd & ~nd_zero
        f_nd = B.eval_bsdfcos(material, normal, outgoing, incoming_nd,
                              types=types)
        pdf_b = B.sample_bsdfcos_pdf(material, normal, outgoing, incoming_nd,
                                     types=types)
        if has_lights:
            pdf_l = sample_lights_pdf(scene, lights, meta, position,
                                      incoming_nd)
            pdf_nd = 0.5 * pdf_b + 0.5 * pdf_l
        else:
            pdf_nd = 0.5 * pdf_b
        safe_pdf_nd = jnp.where(pdf_nd == 0.0, 1.0, pdf_nd)[..., None]
        weight = _where3(nd_ok, st.weight * f_nd / safe_pdf_nd, st.weight)

        # delta branch
        if has_delta:
            dl = shade & delta
            r_delta, rng = R.rand1f_if(rng, dl)
            inc_delta = B.sample_delta(material, normal, outgoing, r_delta,
                                       types=types)
            dl_zero = dl & M.is_zero3(inc_delta)
            dl_ok = dl & ~dl_zero
            f_dl = B.eval_delta(material, normal, outgoing, inc_delta,
                                types=types)
            pdf_dl = B.sample_delta_pdf(material, normal, outgoing,
                                        inc_delta, types=types)
            safe_pdf_dl = jnp.where(pdf_dl == 0.0, 1.0, pdf_dl)[..., None]
            weight = _where3(dl_ok, weight * f_dl / safe_pdf_dl, weight)
            incoming = _where3(delta, inc_delta, incoming_nd)
            alive = st.alive & ~(nd_zero | dl_zero)
        else:
            incoming = incoming_nd
            alive = st.alive & ~nd_zero
        st = st._replace(weight=weight, rng=rng, alive=alive)

        # --- volume stack update (yocto_trace.cpp:544-553)
        if has_volumes:
            crossed = (M.dot(normal, outgoing)
                       * M.dot(normal, incoming)) < 0.0
            vol_change = shade & alive & crossed \
                & is_volumetric_type(material.type)
            push = vol_change & (st.vol_depth == 0)
            pop = vol_change & (st.vol_depth > 0)
            st = _vol_push(st, push, material.density, material.scattering,
                           material.scanisotropy)
            st = _vol_pop(st, pop)

        # --- next ray (surface lanes)
        ro = _where3(shade, position, st.ro)
        rd = _where3(shade, incoming, st.rd)
        # opacity passthrough ray
        if has_opacity:
            ro = _where3(op_skip, position + st.rd * 1e-2, ro)
        st = st._replace(ro=ro, rd=rd)

        # ====================================================================
        # Volume interaction branch (yocto_trace.cpp:556-583)
        # ====================================================================
        if has_volumes:
            vol = hit_l & in_volume & st.alive
            position_v = st.ro + st.rd * tdist[..., None]
            outgoing_v = -st.rd
            r_choice_v, rng = R.rand1f_if(st.rng, vol)
            use_scat = r_choice_v < 0.5
            rn2_v, rng = R.rand2f_if(rng, vol & use_scat)
            rnl_v, rng = R.rand1f_if(rng, vol & use_scat)
            inc_scat = B.sample_scattering(top_aniso, outgoing_v, rn2_v)
            if has_lights:
                ruv_v, rng = R.rand2f_if(rng, vol & ~use_scat)
                rel_v, rng = R.rand1f_if(rng, vol & ~use_scat)
                rl_v, rng = R.rand1f_if(rng, vol & ~use_scat)
                inc_light_v = sample_lights(scene, lights, meta, position_v,
                                            rl_v, rel_v, ruv_v)
                incoming_v = _where3(use_scat, inc_scat, inc_light_v)
            else:
                incoming_v = inc_scat
            v_zero = vol & M.is_zero3(incoming_v)
            v_ok = vol & ~v_zero
            f_v = B.eval_scattering(top_density, top_scat, top_aniso,
                                    outgoing_v, incoming_v)
            pdf_vs = B.sample_scattering_pdf(top_density, top_aniso,
                                             outgoing_v, incoming_v)
            if has_lights:
                pdf_vl = sample_lights_pdf(scene, lights, meta, position_v,
                                           incoming_v)
                pdf_v = 0.5 * pdf_vs + 0.5 * pdf_vl
            else:
                pdf_v = 0.5 * pdf_vs
            safe_pdf_v = jnp.where(pdf_v == 0.0, 1.0, pdf_v)[..., None]
            weight = _where3(v_ok, st.weight * f_v / safe_pdf_v, st.weight)
            alive = st.alive & ~v_zero
            ro = _where3(v_ok, position_v, st.ro)
            rd = _where3(v_ok, incoming_v, st.rd)
            st = st._replace(weight=weight, alive=alive, ro=ro, rd=rd,
                             rng=rng)
        else:
            vol = false_

        # ====================================================================
        # Weight check + Russian roulette (applies to shaded/volume lanes)
        # ====================================================================
        processed = (shade | vol) & st.alive
        wzero = M.is_zero3(st.weight)
        wbad = ~M.isfinite3(st.weight)
        alive = st.alive & ~(processed & (wzero | wbad))
        st = st._replace(alive=alive)

        rr = processed & st.alive & (st.bounce > 3)
        rr_prob = jnp.minimum(jnp.float32(0.99), M.maxc(st.weight))
        r_rr, rng = R.rand1f_if(st.rng, rr)
        rr_die = rr & (r_rr >= rr_prob)
        safe_rr = jnp.where(rr_prob == 0.0, 1.0, rr_prob)
        weight = _where3(rr & ~rr_die, st.weight / safe_rr[..., None],
                         st.weight)
        alive = st.alive & ~rr_die
        st = st._replace(weight=weight, alive=alive, rng=rng)

        # --- bounce accounting: op_skip lanes do not consume a bounce
        consumed = (shade | vol) & st.alive
        bounce = jnp.where(consumed, st.bounce + 1, st.bounce)
        alive = st.alive & jnp.where(
            shade | vol | op_skip,
            jnp.where(op_skip, True, bounce < params.bounces),
            st.alive)
        st = st._replace(bounce=bounce, alive=alive,
                         it=st.it + 1)
        return st

    def cond(st: PathState):
        return jnp.any(st.alive) & (st.it < max_iters)

    def run(ro, rd, rngs):
        st = jax.lax.while_loop(cond, body, _init_state(ro, rd, rngs))
        radiance = st.radiance
        return (radiance, st.hit, st.hit_albedo, st.hit_normal, st.rng)

    return run


def make_naive_sampler(scene: FlatScene, lights: FlatLights,
                       meta: LightsMeta, params: TraceParams, intersect_fn,
                       features=None):
    """`trace_naive` (yocto_trace.cpp:1032-1108): BSDF sampling only."""
    from .compile import ALL_FEATURES

    feat = features if features is not None else ALL_FEATURES
    types = feat.mat_types
    has_opacity = feat.has_opacity
    has_delta = feat.has_delta
    envhidden = params.envhidden
    has_env = scene.env_frame.shape[0] > 0
    max_iters = params.bounces + 130

    def body(st: PathState) -> PathState:
        isec = intersect_fn(scene, st.ro, st.rd,
                            tmax=jnp.where(st.alive, M.flt_max, 0.0))
        act = st.alive
        miss = act & ~isec.hit
        if has_env:
            env_ok = miss & ((st.bounce > 0) | (not envhidden))
            env = eval_environment(scene, st.rd)
            st = st._replace(radiance=_where3(
                env_ok, st.radiance + st.weight * env, st.radiance))
        st = st._replace(alive=act & isec.hit)
        hit_l = act & isec.hit

        inst = jnp.maximum(isec.instance, 0)
        shape = scene.inst_shape[inst]
        gelem = scene.shape_elem_start[shape] + jnp.maximum(isec.element, 0)
        rows = gather_surface_rows(scene, inst, jnp.maximum(isec.element, 0))
        outgoing = -st.rd
        position = eval_shading_position(scene, inst, gelem, isec.uv,
                                         outgoing, rows=rows)
        normal = eval_shading_normal(scene, inst, gelem, isec.uv, outgoing,
                                     features=features, rows=rows)
        material = eval_material(scene, inst, gelem, isec.uv, features=features,
                                 rows=rows)

        if has_opacity:
            op_lt1 = hit_l & (material.opacity < 1.0)
            r_op, rng = R.rand1f_if(st.rng, op_lt1)
            op_skip = op_lt1 & (r_op >= material.opacity)
            op_die = op_skip & (st.opbounce > 128)
            opbounce = jnp.where(op_skip, st.opbounce + 1, st.opbounce)
            shade = hit_l & ~op_skip
            st = st._replace(rng=rng, opbounce=opbounce,
                             alive=st.alive & ~op_die)
        else:
            op_skip = jnp.zeros_like(hit_l)
            shade = hit_l

        first = shade & (st.bounce == 0)
        st = st._replace(
            hit=st.hit | first,
            hit_albedo=_where3(first, material.color, st.hit_albedo),
            hit_normal=_where3(first, normal, st.hit_normal))

        emis = B.eval_emission(material, normal, outgoing)
        st = st._replace(radiance=_where3(
            shade, st.radiance + st.weight * emis, st.radiance))

        rough = shade & (material.roughness != 0.0)
        rn2, rng = R.rand2f_if(st.rng, rough)
        rnl, rng = R.rand1f_if(rng, rough)
        inc_r = B.sample_bsdfcos(material, normal, outgoing, rnl, rn2,
                                 types=types)
        r_zero = rough & M.is_zero3(inc_r)
        f_r = B.eval_bsdfcos(material, normal, outgoing, inc_r,
                             types=types)
        pdf_r = B.sample_bsdfcos_pdf(material, normal, outgoing, inc_r,
                                     types=types)
        safe_r = jnp.where(pdf_r == 0.0, 1.0, pdf_r)[..., None]
        weight = _where3(rough & ~r_zero, st.weight * f_r / safe_r,
                         st.weight)

        if has_delta:
            dl = shade & (material.roughness == 0.0)
            r_d, rng = R.rand1f_if(rng, dl)
            inc_d = B.sample_delta(material, normal, outgoing, r_d,
                                   types=types)
            d_zero = dl & M.is_zero3(inc_d)
            f_d = B.eval_delta(material, normal, outgoing, inc_d,
                               types=types)
            pdf_d = B.sample_delta_pdf(material, normal, outgoing, inc_d,
                                       types=types)
            safe_d = jnp.where(pdf_d == 0.0, 1.0, pdf_d)[..., None]
            weight = _where3(dl & ~d_zero, weight * f_d / safe_d, weight)
            incoming = _where3(material.roughness != 0.0, inc_r, inc_d)
            alive = st.alive & ~(r_zero | d_zero)
        else:
            incoming = inc_r
            alive = st.alive & ~r_zero
        st = st._replace(weight=weight, alive=alive, rng=rng)

        processed = shade & st.alive
        wzero = M.is_zero3(st.weight)
        wbad = ~M.isfinite3(st.weight)
        st = st._replace(alive=st.alive & ~(processed & (wzero | wbad)))

        rr = processed & st.alive & (st.bounce > 3)
        rr_prob = jnp.minimum(jnp.float32(0.99), M.maxc(st.weight))
        r_rr, rng = R.rand1f_if(st.rng, rr)
        rr_die = rr & (r_rr >= rr_prob)
        safe_rr = jnp.where(rr_prob == 0.0, 1.0, rr_prob)
        st = st._replace(
            weight=_where3(rr & ~rr_die, st.weight / safe_rr[..., None],
                           st.weight),
            alive=st.alive & ~rr_die, rng=rng)

        ro = _where3(shade & st.alive, position, st.ro)
        rd = _where3(shade & st.alive, incoming, st.rd)
        if has_opacity:
            ro = _where3(op_skip, position + st.rd * 1e-2, ro)
        bounce = jnp.where(shade & st.alive, st.bounce + 1, st.bounce)
        alive = st.alive & (op_skip | (bounce < params.bounces)) \
            & (shade | op_skip)
        st = st._replace(ro=ro, rd=rd, bounce=bounce, alive=alive,
                         it=st.it + 1)
        return st

    def cond(st: PathState):
        return jnp.any(st.alive) & (st.it < max_iters)

    def run(ro, rd, rngs):
        st = jax.lax.while_loop(cond, body, _init_state(ro, rd, rngs))
        return (st.radiance, st.hit, st.hit_albedo, st.hit_normal, st.rng)

    return run


def make_eyelight_sampler(scene: FlatScene, lights: FlatLights,
                          meta: LightsMeta, params: TraceParams,
                          intersect_fn, features=None, diagram=False):
    """`trace_eyelight` (yocto_trace.cpp:1111-1176); with `diagram=True`
    this is `trace_diagram` (yocto_trace.cpp:1178-1244): misses shade
    flat white and count as hits."""
    from .compile import ALL_FEATURES

    feat = features if features is not None else ALL_FEATURES
    types = feat.mat_types
    has_opacity = feat.has_opacity
    has_delta = feat.has_delta
    envhidden = params.envhidden
    has_env = scene.env_frame.shape[0] > 0
    bounces = max(params.bounces, 4)
    max_iters = bounces + 130

    def body(st: PathState) -> PathState:
        isec = intersect_fn(scene, st.ro, st.rd,
                            tmax=jnp.where(st.alive, M.flt_max, 0.0))
        act = st.alive
        miss = act & ~isec.hit
        if diagram:
            # trace_diagram: misses are flat white and count as hits
            st = st._replace(
                radiance=_where3(miss, st.radiance + st.weight,
                                 st.radiance),
                hit=st.hit | miss)
        elif has_env:
            env_ok = miss & ((st.bounce > 0) | (not envhidden))
            env = eval_environment(scene, st.rd)
            st = st._replace(radiance=_where3(
                env_ok, st.radiance + st.weight * env, st.radiance))
        st = st._replace(alive=act & isec.hit)
        hit_l = act & isec.hit

        inst = jnp.maximum(isec.instance, 0)
        shape = scene.inst_shape[inst]
        gelem = scene.shape_elem_start[shape] + jnp.maximum(isec.element, 0)
        rows = gather_surface_rows(scene, inst, jnp.maximum(isec.element, 0))
        outgoing = -st.rd
        position = eval_shading_position(scene, inst, gelem, isec.uv,
                                         outgoing, rows=rows)
        normal = eval_shading_normal(scene, inst, gelem, isec.uv, outgoing,
                                     features=features, rows=rows)
        material = eval_material(scene, inst, gelem, isec.uv, features=features,
                                 rows=rows)

        if has_opacity:
            op_lt1 = hit_l & (material.opacity < 1.0)
            r_op, rng = R.rand1f_if(st.rng, op_lt1)
            op_skip = op_lt1 & (r_op >= material.opacity)
            op_die = op_skip & (st.opbounce > 128)
            opbounce = jnp.where(op_skip, st.opbounce + 1, st.opbounce)
            shade = hit_l & ~op_skip
            st = st._replace(rng=rng, opbounce=opbounce,
                             alive=st.alive & ~op_die)
        else:
            op_skip = jnp.zeros_like(hit_l)
            shade = hit_l

        first = shade & (st.bounce == 0)
        st = st._replace(
            hit=st.hit | first,
            hit_albedo=_where3(first, material.color, st.hit_albedo),
            hit_normal=_where3(first, normal, st.hit_normal))

        incoming = outgoing
        emis = B.eval_emission(material, normal, outgoing)
        fcos = B.eval_bsdfcos(material, normal, outgoing, incoming,
                              types=types)
        st = st._replace(radiance=_where3(
            shade, st.radiance + st.weight * (emis + M.pif * fcos),
            st.radiance))

        if has_delta:
            delta = is_delta_point(material)
            cont = shade & delta
            r_d, rng = R.rand1f_if(st.rng, cont)
            inc_d = B.sample_delta(material, normal, outgoing, r_d,
                                   types=types)
            d_zero = cont & M.is_zero3(inc_d)
            f_d = B.eval_delta(material, normal, outgoing, inc_d,
                               types=types)
            pdf_d = B.sample_delta_pdf(material, normal, outgoing, inc_d,
                                       types=types)
            safe_d = jnp.where(pdf_d == 0.0, 1.0, pdf_d)[..., None]
            weight = _where3(cont & ~d_zero, st.weight * f_d / safe_d,
                             st.weight)
            wzero = M.is_zero3(weight)
            wbad = ~M.isfinite3(weight)
            alive = st.alive & cont & ~d_zero & ~wzero & ~wbad
        else:
            cont = jnp.zeros_like(shade)
            inc_d = st.rd
            weight = st.weight
            rng = st.rng
            alive = jnp.zeros_like(st.alive)
        alive = alive | (st.alive & op_skip)
        st = st._replace(weight=weight, rng=rng)

        ro = _where3(cont, position, st.ro)
        rd = _where3(cont, inc_d, st.rd)
        if has_opacity:
            ro = _where3(op_skip, position + st.rd * 1e-2, ro)
        bounce = jnp.where(cont & ~op_skip, st.bounce + 1, st.bounce)
        alive = alive & (op_skip | (bounce < bounces))
        st = st._replace(ro=ro, rd=rd, bounce=bounce, alive=alive,
                         it=st.it + 1)
        return st

    def cond(st: PathState):
        return jnp.any(st.alive) & (st.it < max_iters)

    def run(ro, rd, rngs):
        st = jax.lax.while_loop(cond, body, _init_state(ro, rd, rngs))
        return (st.radiance, st.hit, st.hit_albedo, st.hit_normal, st.rng)

    return run


def make_falsecolor_sampler(scene: FlatScene, lights: FlatLights,
                            meta: LightsMeta, params: TraceParams,
                            intersect_fn, features=None):
    """`trace_falsecolor` AOVs (yocto_trace.cpp:1341-1419)."""
    from ..ops.color import colormap

    fc = params.falsecolor

    def hashed(ids):
        h = (ids.astype(jnp.uint32) * jnp.uint32(2654435761)) \
            & jnp.uint32(0xFFFFFFFF)
        # simple per-id colors via integer hash (visual only)
        x = (h & 0xFF).astype(jnp.float32) / 255.0
        y = ((h >> 8) & 0xFF).astype(jnp.float32) / 255.0
        z = ((h >> 16) & 0xFF).astype(jnp.float32) / 255.0
        return jnp.stack([0.2 + 0.8 * x, 0.2 + 0.8 * y, 0.2 + 0.8 * z], -1)

    def run(ro, rd, rngs):
        isec = intersect_fn(scene, ro, rd)
        hit = isec.hit
        inst = jnp.maximum(isec.instance, 0)
        shape = scene.inst_shape[inst]
        gelem = scene.shape_elem_start[shape] + jnp.maximum(isec.element, 0)
        rows = gather_surface_rows(scene, inst, jnp.maximum(isec.element, 0))
        outgoing = -rd
        position = eval_shading_position(scene, inst, gelem, isec.uv,
                                         outgoing, rows=rows)
        normal = eval_shading_normal(scene, inst, gelem, isec.uv, outgoing,
                                     features=features, rows=rows)
        gnormal = eval_element_normal(scene, inst, gelem, rows=rows)
        texcoord = eval_texcoord(scene, inst, gelem, isec.uv)
        material = eval_material(scene, inst, gelem, isec.uv, features=features,
                                 rows=rows)
        delta = is_delta_point(material)

        t = FalsecolorType
        if fc == t.position:
            out = position * 0.5 + 0.5
        elif fc == t.normal:
            out = normal * 0.5 + 0.5
        elif fc == t.frontfacing:
            ff = M.dot(normal, outgoing) > 0.0
            out = _where3(ff, jnp.asarray([0.0, 1.0, 0.0]),
                          jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]),
                                           position.shape))
        elif fc == t.gnormal:
            out = gnormal * 0.5 + 0.5
        elif fc == t.gfrontfacing:
            ff = M.dot(gnormal, outgoing) > 0.0
            out = _where3(ff, jnp.asarray([0.0, 1.0, 0.0]),
                          jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]),
                                           position.shape))
        elif fc == t.texcoord:
            out = jnp.stack([jnp.mod(texcoord[..., 0], 1.0),
                             jnp.mod(texcoord[..., 1], 1.0),
                             jnp.zeros_like(texcoord[..., 0])], -1)
        elif fc == t.mtype:
            out = hashed(material.type)
        elif fc == t.color:
            out = material.color
        elif fc == t.emission:
            out = material.emission
        elif fc == t.roughness:
            out = jnp.repeat(material.roughness[..., None], 3, -1)
        elif fc == t.opacity:
            out = jnp.repeat(material.opacity[..., None], 3, -1)
        elif fc == t.metallic:
            out = jnp.repeat(material.metallic[..., None], 3, -1)
        elif fc == t.delta:
            out = jnp.where(delta[..., None], 1.0, 0.0) \
                * jnp.ones_like(position)
        elif fc == t.element:
            out = hashed(isec.element)
        elif fc == t.instance:
            out = hashed(isec.instance)
        elif fc == t.shape:
            out = hashed(shape)
        elif fc == t.material:
            out = hashed(scene.inst_material[inst])
        elif fc == t.highlight:
            emission = material.emission
            zero_e = jnp.all(emission == 0.0, axis=-1)
            emission = _where3(zero_e, jnp.full_like(emission, 0.2),
                               emission)
            out = emission * jnp.abs(M.dot(-rd, normal))[..., None]
        else:
            out = material.color
        radiance = _where3(hit, out, jnp.zeros_like(out))
        return (radiance, hit, material.color,
                _where3(hit, normal, -rd), rngs)

    return run


def make_furnace_sampler(scene: FlatScene, lights: FlatLights,
                         meta: LightsMeta, params: TraceParams,
                         intersect_fn, features=None):
    """`trace_furnace` (yocto_trace.cpp:1247-1338): white-furnace test —
    energy-conserving BSDFs must render flat 1.0 under a constant
    environment."""
    from .compile import ALL_FEATURES

    feat = features if features is not None else ALL_FEATURES
    types = feat.mat_types
    has_opacity = feat.has_opacity
    has_delta = feat.has_delta
    envhidden = params.envhidden
    has_env = scene.env_frame.shape[0] > 0
    max_iters = params.bounces + 130

    def body(st: PathState) -> PathState:
        # early exit: after the first bounce, lanes not inside a volume
        # collect the environment and stop (yocto_trace.cpp:1262-1266);
        # vol_depth doubles as the reference's in_volume toggle
        exit_l = st.alive & (st.bounce > 0) & (st.vol_depth == 0)
        if has_env:
            env0 = eval_environment(scene, st.rd)
            st = st._replace(radiance=_where3(
                exit_l, st.radiance + st.weight * env0, st.radiance))
        st = st._replace(alive=st.alive & ~exit_l)

        isec = intersect_fn(scene, st.ro, st.rd,
                            tmax=jnp.where(st.alive, M.flt_max, 0.0))
        act = st.alive
        miss = act & ~isec.hit
        if has_env:
            env_ok = miss & ((st.bounce > 0) | (not envhidden))
            env = eval_environment(scene, st.rd)
            st = st._replace(radiance=_where3(
                env_ok, st.radiance + st.weight * env, st.radiance))
        st = st._replace(alive=act & isec.hit)
        hit_l = act & isec.hit

        inst = jnp.maximum(isec.instance, 0)
        shape = scene.inst_shape[inst]
        gelem = scene.shape_elem_start[shape] + jnp.maximum(isec.element, 0)
        rows = gather_surface_rows(scene, inst, jnp.maximum(isec.element, 0))
        outgoing = -st.rd
        position = eval_shading_position(scene, inst, gelem, isec.uv,
                                         outgoing, rows=rows)
        normal = eval_shading_normal(scene, inst, gelem, isec.uv, outgoing,
                                     features=features, rows=rows)
        material = eval_material(scene, inst, gelem, isec.uv, features=features,
                                 rows=rows)

        if has_opacity:
            op_lt1 = hit_l & (material.opacity < 1.0)
            r_op, rng = R.rand1f_if(st.rng, op_lt1)
            op_skip = op_lt1 & (r_op >= material.opacity)
            op_die = op_skip & (st.opbounce > 128)
            opbounce = jnp.where(op_skip, st.opbounce + 1, st.opbounce)
            shade = hit_l & ~op_skip
            st = st._replace(rng=rng, opbounce=opbounce,
                             alive=st.alive & ~op_die)
        else:
            op_skip = jnp.zeros_like(hit_l)
            shade = hit_l

        first = shade & (st.bounce == 0)
        st = st._replace(
            hit=st.hit | first,
            hit_albedo=_where3(first, material.color, st.hit_albedo),
            hit_normal=_where3(first, normal, st.hit_normal))

        emis = B.eval_emission(material, normal, outgoing)
        st = st._replace(radiance=_where3(
            shade, st.radiance + st.weight * emis, st.radiance))

        rough = shade & (material.roughness != 0.0)
        rn2, rng = R.rand2f_if(st.rng, rough)
        rnl, rng = R.rand1f_if(rng, rough)
        inc_r = B.sample_bsdfcos(material, normal, outgoing, rnl, rn2,
                                 types=types)
        r_zero = rough & M.is_zero3(inc_r)
        f_r = B.eval_bsdfcos(material, normal, outgoing, inc_r,
                             types=types)
        pdf_r = B.sample_bsdfcos_pdf(material, normal, outgoing, inc_r,
                                     types=types)
        safe_r = jnp.where(pdf_r == 0.0, 1.0, pdf_r)[..., None]
        weight = _where3(rough & ~r_zero, st.weight * f_r / safe_r,
                         st.weight)

        if has_delta:
            dl = shade & (material.roughness == 0.0)
            r_d, rng = R.rand1f_if(rng, dl)
            inc_d = B.sample_delta(material, normal, outgoing, r_d,
                                   types=types)
            d_zero = dl & M.is_zero3(inc_d)
            f_d = B.eval_delta(material, normal, outgoing, inc_d,
                               types=types)
            pdf_d = B.sample_delta_pdf(material, normal, outgoing, inc_d,
                                       types=types)
            safe_d = jnp.where(pdf_d == 0.0, 1.0, pdf_d)[..., None]
            weight = _where3(dl & ~d_zero, weight * f_d / safe_d, weight)
            incoming = _where3(material.roughness != 0.0, inc_r, inc_d)
            alive = st.alive & ~(r_zero | d_zero)
        else:
            incoming = inc_r
            alive = st.alive & ~r_zero
        st = st._replace(weight=weight, alive=alive, rng=rng)

        processed = shade & st.alive
        wzero = M.is_zero3(st.weight)
        wbad = ~M.isfinite3(st.weight)
        st = st._replace(alive=st.alive & ~(processed & (wzero | wbad)))

        rr = processed & st.alive & (st.bounce > 3)
        rr_prob = jnp.minimum(jnp.float32(0.99), M.maxc(st.weight))
        r_rr, rng = R.rand1f_if(st.rng, rr)
        rr_die = rr & (r_rr >= rr_prob)
        safe_rr = jnp.where(rr_prob == 0.0, 1.0, rr_prob)
        st = st._replace(
            weight=_where3(rr & ~rr_die, st.weight / safe_rr[..., None],
                           st.weight),
            alive=st.alive & ~rr_die, rng=rng)

        # in_volume toggle on transmission (yocto_trace.cpp:1331-1333)
        crossed = (M.dot(normal, outgoing) * M.dot(normal, incoming)) < 0.0
        togg = shade & st.alive & crossed
        st = st._replace(vol_depth=jnp.where(togg, 1 - st.vol_depth,
                                             st.vol_depth))

        ro = _where3(shade & st.alive, position, st.ro)
        rd = _where3(shade & st.alive, incoming, st.rd)
        if has_opacity:
            ro = _where3(op_skip, position + st.rd * 1e-2, ro)
        bounce = jnp.where(shade & st.alive, st.bounce + 1, st.bounce)
        alive = st.alive & (op_skip | (bounce < params.bounces)) \
            & (shade | op_skip)
        st = st._replace(ro=ro, rd=rd, bounce=bounce, alive=alive,
                         it=st.it + 1)
        return st

    def cond(st: PathState):
        return jnp.any(st.alive) & (st.it < max_iters)

    def run(ro, rd, rngs):
        st = jax.lax.while_loop(cond, body, _init_state(ro, rd, rngs))
        return (st.radiance, st.hit, st.hit_albedo, st.hit_normal, st.rng)

    return run



def _nee_emission(scene, intersect_fn, position, incoming, features=None):
    """Emission seen along (position, incoming): environment on miss, or the
    hit point's facing emission (shared by pathdirect/pathmis NEE)."""
    isec = intersect_fn(scene, position, incoming)
    inst = jnp.maximum(isec.instance, 0)
    shape = scene.inst_shape[inst]
    gelem = scene.shape_elem_start[shape] + jnp.maximum(isec.element, 0)
    rows = gather_surface_rows(scene, inst, jnp.maximum(isec.element, 0))
    mat = eval_material(scene, inst, gelem, isec.uv, features=features,
                                 rows=rows)
    nrm = eval_shading_normal(scene, inst, gelem, isec.uv, -incoming,
                              features=features, rows=rows)
    hit_em = B.eval_emission(mat, nrm, -incoming)
    if scene.env_frame.shape[0] > 0:
        env = eval_environment(scene, incoming)
    else:
        env = jnp.zeros_like(position)
    return _where3(isec.hit, hit_em, env), isec


def make_pathdirect_sampler(scene: FlatScene, lights: FlatLights,
                            meta: LightsMeta, params: TraceParams,
                            intersect_fn, features=None):
    """`trace_pathdirect` (yocto_trace.cpp:599-767): NEE at every rough
    vertex + 50/50 MIS continuation; emission gated by next_emission."""
    from .compile import ALL_FEATURES

    feat = features if features is not None else ALL_FEATURES
    types = feat.mat_types
    has_volumes = feat.has_volumes
    has_opacity = feat.has_opacity
    has_delta = feat.has_delta
    envhidden = params.envhidden
    has_env = scene.env_frame.shape[0] > 0
    has_lights = meta.n_lights > 0
    max_iters = params.bounces + 130

    def body(st: PathState) -> PathState:
        isec = intersect_fn(scene, st.ro, st.rd,
                            tmax=jnp.where(st.alive, M.flt_max, 0.0))
        act = st.alive
        hit_l = act & isec.hit
        false_ = jnp.zeros_like(hit_l)

        miss = act & ~isec.hit
        if has_env:
            env_ok = miss & ((st.bounce > 0) | (not envhidden)) \
                & st.next_emission
            env = eval_environment(scene, st.rd)
            st = st._replace(radiance=_where3(
                env_ok, st.radiance + st.weight * env, st.radiance))
        st = st._replace(alive=act & isec.hit)

        inst = jnp.maximum(isec.instance, 0)
        shape = scene.inst_shape[inst]
        gelem = scene.shape_elem_start[shape] + jnp.maximum(isec.element, 0)
        rows = gather_surface_rows(scene, inst, jnp.maximum(isec.element, 0))

        if has_volumes:
            in_stack = hit_l & (st.vol_depth > 0)
            r_tr2, rng = R.rand1f_if(st.rng, in_stack)
            r_tr1, rng = R.rand1f_if(rng, in_stack)
            top_density, top_scat, top_aniso = _vol_top(st)
            tdist = SH.sample_transmittance(top_density, isec.distance,
                                            r_tr1, r_tr2)
            trans = SH.eval_transmittance(top_density, tdist)
            tpdf = SH.sample_transmittance_pdf(top_density, tdist,
                                               isec.distance)
            safe_tpdf = jnp.where(tpdf == 0.0, 1.0, tpdf)[..., None]
            weight = _where3(in_stack, st.weight * trans / safe_tpdf,
                             st.weight)
            in_volume = in_stack & (tdist < isec.distance)
            st = st._replace(weight=weight, rng=rng)
            surf = hit_l & ~in_volume
        else:
            in_volume = false_
            surf = hit_l
        outgoing = -st.rd
        position = eval_shading_position(scene, inst, gelem, isec.uv,
                                         outgoing, rows=rows)
        normal = eval_shading_normal(scene, inst, gelem, isec.uv, outgoing,
                                     features=features, rows=rows)
        material = eval_material(scene, inst, gelem, isec.uv, features=features,
                                 rows=rows)

        if params.nocaustics:
            max_roughness = jnp.where(
                surf, jnp.maximum(material.roughness, st.max_roughness),
                st.max_roughness)
            material = material._replace(
                roughness=jnp.where(surf, max_roughness, material.roughness))
            st = st._replace(max_roughness=max_roughness)

        if has_opacity:
            op_lt1 = surf & (material.opacity < 1.0)
            r_op, rng = R.rand1f_if(st.rng, op_lt1)
            op_skip = op_lt1 & (r_op >= material.opacity)
            op_die = op_skip & (st.opbounce > 128)
            opbounce = jnp.where(op_skip, st.opbounce + 1, st.opbounce)
            alive = st.alive & ~op_die
            shade = surf & ~op_skip
            st = st._replace(rng=rng, opbounce=opbounce, alive=alive)
        else:
            op_skip = false_
            shade = surf

        first = shade & (st.bounce == 0)
        st = st._replace(
            hit=st.hit | first,
            hit_albedo=_where3(first, material.color, st.hit_albedo),
            hit_normal=_where3(first, normal, st.hit_normal))

        emis = B.eval_emission(material, normal, outgoing)
        st = st._replace(radiance=_where3(
            shade & st.next_emission, st.radiance + st.weight * emis,
            st.radiance))

        delta = is_delta_point(material) if has_delta else false_
        nd = shade & ~delta if has_delta else shade

        # --- direct lighting (NEE) on rough vertices
        if has_lights:
            ruv_d, rng = R.rand2f_if(st.rng, nd)
            rel_d, rng = R.rand1f_if(rng, nd)
            rl_d, rng = R.rand1f_if(rng, nd)
            inc_d = sample_lights(scene, lights, meta, position,
                                  rl_d, rel_d, ruv_d)
            pdf_d = sample_lights_pdf(scene, lights, meta, position, inc_d)
            f_d = B.eval_bsdfcos(material, normal, outgoing, inc_d,
                                 types=types)
            ok_d = nd & ~M.is_zero3(f_d) & (pdf_d > 0.0)
            emission_d, _ = _nee_emission(scene, intersect_fn, position,
                                          inc_d, features=features)
            safe_pd = jnp.where(pdf_d == 0.0, 1.0, pdf_d)[..., None]
            st = st._replace(rng=rng, radiance=_where3(
                ok_d, st.radiance + st.weight * f_d * emission_d / safe_pd,
                st.radiance))
        next_emission = jnp.where(shade, delta, st.next_emission)
        st = st._replace(next_emission=next_emission)

        # --- continuation (same as trace_path)
        r_choice, rng = R.rand1f_if(st.rng, nd)
        use_bsdf = r_choice < 0.5
        rn2, rng = R.rand2f_if(rng, nd & use_bsdf)
        rnl, rng = R.rand1f_if(rng, nd & use_bsdf)
        inc_bsdf = B.sample_bsdfcos(material, normal, outgoing, rnl, rn2,
                                    types=types)
        if has_lights:
            ruv, rng = R.rand2f_if(rng, nd & ~use_bsdf)
            rel, rng = R.rand1f_if(rng, nd & ~use_bsdf)
            rl, rng = R.rand1f_if(rng, nd & ~use_bsdf)
            inc_light = sample_lights(scene, lights, meta, position,
                                      rl, rel, ruv)
            incoming_nd = _where3(use_bsdf, inc_bsdf, inc_light)
        else:
            incoming_nd = inc_bsdf
        nd_zero = nd & M.is_zero3(incoming_nd)
        nd_ok = nd & ~nd_zero
        f_nd = B.eval_bsdfcos(material, normal, outgoing, incoming_nd,
                              types=types)
        pdf_b = B.sample_bsdfcos_pdf(material, normal, outgoing, incoming_nd,
                                     types=types)
        if has_lights:
            pdf_l = sample_lights_pdf(scene, lights, meta, position,
                                      incoming_nd)
            pdf_nd = 0.5 * pdf_b + 0.5 * pdf_l
        else:
            pdf_nd = 0.5 * pdf_b
        safe_pdf_nd = jnp.where(pdf_nd == 0.0, 1.0, pdf_nd)[..., None]
        weight = _where3(nd_ok, st.weight * f_nd / safe_pdf_nd, st.weight)

        if has_delta:
            dl = shade & delta
            r_delta, rng = R.rand1f_if(rng, dl)
            inc_delta = B.sample_delta(material, normal, outgoing, r_delta,
                                       types=types)
            dl_zero = dl & M.is_zero3(inc_delta)
            dl_ok = dl & ~dl_zero
            f_dl = B.eval_delta(material, normal, outgoing, inc_delta,
                                types=types)
            pdf_dl = B.sample_delta_pdf(material, normal, outgoing,
                                        inc_delta, types=types)
            safe_pdf_dl = jnp.where(pdf_dl == 0.0, 1.0, pdf_dl)[..., None]
            weight = _where3(dl_ok, weight * f_dl / safe_pdf_dl, weight)
            incoming = _where3(delta, inc_delta, incoming_nd)
            alive = st.alive & ~(nd_zero | dl_zero)
        else:
            incoming = incoming_nd
            alive = st.alive & ~nd_zero
        st = st._replace(weight=weight, rng=rng, alive=alive)

        if has_volumes:
            crossed = (M.dot(normal, outgoing)
                       * M.dot(normal, incoming)) < 0.0
            vol_change = shade & alive & crossed \
                & is_volumetric_type(material.type)
            push = vol_change & (st.vol_depth == 0)
            pop = vol_change & (st.vol_depth > 0)
            st = _vol_push(st, push, material.density, material.scattering,
                           material.scanisotropy)
            st = _vol_pop(st, pop)

        ro = _where3(shade, position, st.ro)
        rd = _where3(shade, incoming, st.rd)
        if has_opacity:
            ro = _where3(op_skip, position + st.rd * 1e-2, ro)
        st = st._replace(ro=ro, rd=rd)

        # --- volume interaction
        if has_volumes:
            vol = hit_l & in_volume & st.alive
            position_v = st.ro + st.rd * tdist[..., None]
            outgoing_v = -st.rd
            r_choice_v, rng = R.rand1f_if(st.rng, vol)
            use_scat = r_choice_v < 0.5
            rn2_v, rng = R.rand2f_if(rng, vol & use_scat)
            rnl_v, rng = R.rand1f_if(rng, vol & use_scat)
            inc_scat = B.sample_scattering(top_aniso, outgoing_v, rn2_v)
            if has_lights:
                ruv_v, rng = R.rand2f_if(rng, vol & ~use_scat)
                rel_v, rng = R.rand1f_if(rng, vol & ~use_scat)
                rl_v, rng = R.rand1f_if(rng, vol & ~use_scat)
                inc_light_v = sample_lights(scene, lights, meta, position_v,
                                            rl_v, rel_v, ruv_v)
                incoming_v = _where3(use_scat, inc_scat, inc_light_v)
            else:
                incoming_v = inc_scat
            v_zero = vol & M.is_zero3(incoming_v)
            v_ok = vol & ~v_zero
            f_v = B.eval_scattering(top_density, top_scat, top_aniso,
                                    outgoing_v, incoming_v)
            pdf_vs = B.sample_scattering_pdf(top_density, top_aniso,
                                             outgoing_v, incoming_v)
            if has_lights:
                pdf_vl = sample_lights_pdf(scene, lights, meta, position_v,
                                           incoming_v)
                pdf_v = 0.5 * pdf_vs + 0.5 * pdf_vl
            else:
                pdf_v = 0.5 * pdf_vs
            safe_pdf_v = jnp.where(pdf_v == 0.0, 1.0, pdf_v)[..., None]
            weight = _where3(v_ok, st.weight * f_v / safe_pdf_v, st.weight)
            alive = st.alive & ~v_zero
            ro = _where3(v_ok, position_v, st.ro)
            rd = _where3(v_ok, incoming_v, st.rd)
            st = st._replace(weight=weight, alive=alive, ro=ro, rd=rd,
                             rng=rng)
        else:
            vol = false_

        processed = (shade | vol) & st.alive
        wzero = M.is_zero3(st.weight)
        wbad = ~M.isfinite3(st.weight)
        alive = st.alive & ~(processed & (wzero | wbad))
        st = st._replace(alive=alive)

        rr = processed & st.alive & (st.bounce > 3)
        rr_prob = jnp.minimum(jnp.float32(0.99), M.maxc(st.weight))
        r_rr, rng = R.rand1f_if(st.rng, rr)
        rr_die = rr & (r_rr >= rr_prob)
        safe_rr = jnp.where(rr_prob == 0.0, 1.0, rr_prob)
        weight = _where3(rr & ~rr_die, st.weight / safe_rr[..., None],
                         st.weight)
        alive = st.alive & ~rr_die
        st = st._replace(weight=weight, alive=alive, rng=rng)

        consumed = (shade | vol) & st.alive
        bounce = jnp.where(consumed, st.bounce + 1, st.bounce)
        alive = st.alive & jnp.where(
            shade | vol | op_skip,
            jnp.where(op_skip, True, bounce < params.bounces),
            st.alive)
        st = st._replace(bounce=bounce, alive=alive, it=st.it + 1)
        return st

    def cond(st: PathState):
        return jnp.any(st.alive) & (st.it < max_iters)

    def run(ro, rd, rngs):
        st = jax.lax.while_loop(cond, body, _init_state(ro, rd, rngs))
        return (st.radiance, st.hit, st.hit_albedo, st.hit_normal, st.rng)

    return run


def make_pathmis_sampler(scene: FlatScene, lights: FlatLights,
                         meta: LightsMeta, params: TraceParams,
                         intersect_fn, features=None):
    """`trace_pathmis` (yocto_trace.cpp:770-950): full power-2 MIS for both
    strategies at every rough vertex; the BSDF-strategy continuation reuses
    the BSDF sample direction (the reference also caches that intersection;
    re-intersecting the identical ray yields the identical hit)."""
    from .compile import ALL_FEATURES

    feat = features if features is not None else ALL_FEATURES
    types = feat.mat_types
    has_volumes = feat.has_volumes
    has_opacity = feat.has_opacity
    has_delta = feat.has_delta
    envhidden = params.envhidden
    has_env = scene.env_frame.shape[0] > 0
    has_lights = meta.n_lights > 0
    max_iters = params.bounces + 130

    def mis_heuristic(this_pdf, other_pdf):
        return (this_pdf * this_pdf) / (
            this_pdf * this_pdf + other_pdf * other_pdf)

    def body(st: PathState) -> PathState:
        isec = intersect_fn(scene, st.ro, st.rd,
                            tmax=jnp.where(st.alive, M.flt_max, 0.0))
        act = st.alive
        hit_l = act & isec.hit
        false_ = jnp.zeros_like(hit_l)

        miss = act & ~isec.hit
        if has_env:
            env_ok = miss & ((st.bounce > 0) | (not envhidden)) \
                & st.next_emission
            env = eval_environment(scene, st.rd)
            st = st._replace(radiance=_where3(
                env_ok, st.radiance + st.weight * env, st.radiance))
        st = st._replace(alive=act & isec.hit)

        inst = jnp.maximum(isec.instance, 0)
        shape = scene.inst_shape[inst]
        gelem = scene.shape_elem_start[shape] + jnp.maximum(isec.element, 0)
        rows = gather_surface_rows(scene, inst, jnp.maximum(isec.element, 0))

        if has_volumes:
            in_stack = hit_l & (st.vol_depth > 0)
            r_tr2, rng = R.rand1f_if(st.rng, in_stack)
            r_tr1, rng = R.rand1f_if(rng, in_stack)
            top_density, top_scat, top_aniso = _vol_top(st)
            tdist = SH.sample_transmittance(top_density, isec.distance,
                                            r_tr1, r_tr2)
            trans = SH.eval_transmittance(top_density, tdist)
            tpdf = SH.sample_transmittance_pdf(top_density, tdist,
                                               isec.distance)
            safe_tpdf = jnp.where(tpdf == 0.0, 1.0, tpdf)[..., None]
            weight = _where3(in_stack, st.weight * trans / safe_tpdf,
                             st.weight)
            in_volume = in_stack & (tdist < isec.distance)
            st = st._replace(weight=weight, rng=rng)
            surf = hit_l & ~in_volume
        else:
            in_volume = false_
            surf = hit_l
        outgoing = -st.rd
        position = eval_shading_position(scene, inst, gelem, isec.uv,
                                         outgoing, rows=rows)
        normal = eval_shading_normal(scene, inst, gelem, isec.uv, outgoing,
                                     features=features, rows=rows)
        material = eval_material(scene, inst, gelem, isec.uv, features=features,
                                 rows=rows)

        if params.nocaustics:
            max_roughness = jnp.where(
                surf, jnp.maximum(material.roughness, st.max_roughness),
                st.max_roughness)
            material = material._replace(
                roughness=jnp.where(surf, max_roughness, material.roughness))
            st = st._replace(max_roughness=max_roughness)

        if has_opacity:
            op_lt1 = surf & (material.opacity < 1.0)
            r_op, rng = R.rand1f_if(st.rng, op_lt1)
            op_skip = op_lt1 & (r_op >= material.opacity)
            op_die = op_skip & (st.opbounce > 128)
            opbounce = jnp.where(op_skip, st.opbounce + 1, st.opbounce)
            alive = st.alive & ~op_die
            shade = surf & ~op_skip
            st = st._replace(rng=rng, opbounce=opbounce, alive=alive)
        else:
            op_skip = false_
            shade = surf

        first = shade & (st.bounce == 0)
        st = st._replace(
            hit=st.hit | first,
            hit_albedo=_where3(first, material.color, st.hit_albedo),
            hit_normal=_where3(first, normal, st.hit_normal))

        emis = B.eval_emission(material, normal, outgoing)
        st = st._replace(radiance=_where3(
            shade & st.next_emission, st.radiance + st.weight * emis,
            st.radiance))

        delta = is_delta_point(material) if has_delta else false_
        nd = shade & ~delta if has_delta else shade

        # --- MIS: light strategy then bsdf strategy
        # light strategy
        ruv_l, rng = R.rand2f_if(st.rng, nd)
        rel_l, rng = R.rand1f_if(rng, nd)
        rl_l, rng = R.rand1f_if(rng, nd)
        if has_lights:
            inc_l = sample_lights(scene, lights, meta, position,
                                  rl_l, rel_l, ruv_l)
        else:
            inc_l = jnp.zeros_like(position)
        l_zero = nd & M.is_zero3(inc_l)
        l_live = nd & ~l_zero
        f_l = B.eval_bsdfcos(material, normal, outgoing, inc_l,
                             types=types)
        if has_lights:
            lpdf_l = sample_lights_pdf(scene, lights, meta, position, inc_l)
        else:
            lpdf_l = jnp.zeros(position.shape[0], jnp.float32)
        bpdf_l = B.sample_bsdfcos_pdf(material, normal, outgoing, inc_l,
                                      types=types)
        safe_lpdf = jnp.where(lpdf_l == 0.0, 1.0, lpdf_l)
        misw_l = mis_heuristic(lpdf_l, bpdf_l) / safe_lpdf
        misw_l = jnp.where(lpdf_l == 0.0, 0.0, misw_l)
        ok_l = l_live & ~M.is_zero3(f_l) & (misw_l != 0.0)
        em_l, _ = _nee_emission(scene, intersect_fn, position, inc_l,
                                features=features)
        st = st._replace(rng=rng, radiance=_where3(
            ok_l, st.radiance + st.weight * f_l * em_l * misw_l[..., None],
            st.radiance))

        # bsdf strategy (draws only if the light sample was nonzero,
        # matching the reference's for-loop break)
        rn2_b, rng = R.rand2f_if(st.rng, l_live)
        rnl_b, rng = R.rand1f_if(rng, l_live)
        inc_b = B.sample_bsdfcos(material, normal, outgoing, rnl_b, rn2_b,
                                 types=types)
        inc_b = _where3(l_live, inc_b, jnp.zeros_like(inc_b))
        b_zero = l_live & M.is_zero3(inc_b)
        b_live = l_live & ~b_zero
        f_b = B.eval_bsdfcos(material, normal, outgoing, inc_b,
                             types=types)
        if has_lights:
            lpdf_b = sample_lights_pdf(scene, lights, meta, position, inc_b)
        else:
            lpdf_b = jnp.zeros(position.shape[0], jnp.float32)
        bpdf_b = B.sample_bsdfcos_pdf(material, normal, outgoing, inc_b,
                                      types=types)
        safe_bpdf = jnp.where(bpdf_b == 0.0, 1.0, bpdf_b)
        misw_b = mis_heuristic(bpdf_b, lpdf_b) / safe_bpdf
        misw_b = jnp.where(bpdf_b == 0.0, 0.0, misw_b)
        ok_b = b_live & ~M.is_zero3(f_b) & (misw_b != 0.0)
        em_b, _ = _nee_emission(scene, intersect_fn, position, inc_b,
                                features=features)
        st = st._replace(rng=rng, radiance=_where3(
            ok_b, st.radiance + st.weight * f_b * em_b * misw_b[..., None],
            st.radiance))

        # indirect continuation: BSDF direction with bsdf-only pdf; a zero
        # incoming drives weight to 0/0 -> NaN -> the weight check kills the
        # lane, exactly like the reference
        incoming_nd = inc_b
        safe_bpdf3 = safe_bpdf[..., None]
        w_nd = st.weight * f_b / safe_bpdf3
        w_nd = jnp.where((bpdf_b == 0.0)[..., None],
                         jnp.full_like(w_nd, jnp.nan), w_nd)
        weight = _where3(nd, w_nd, st.weight)

        if has_delta:
            dl = shade & delta
            r_delta, rng = R.rand1f_if(rng, dl)
            inc_delta = B.sample_delta(material, normal, outgoing, r_delta,
                                       types=types)
            f_dl = B.eval_delta(material, normal, outgoing, inc_delta,
                                types=types)
            pdf_dl = B.sample_delta_pdf(material, normal, outgoing,
                                        inc_delta, types=types)
            safe_pdf_dl = jnp.where(pdf_dl == 0.0, 1.0, pdf_dl)[..., None]
            w_dl = weight * f_dl / safe_pdf_dl
            w_dl = jnp.where((pdf_dl == 0.0)[..., None],
                             jnp.full_like(w_dl, jnp.nan), w_dl)
            weight = _where3(dl, w_dl, weight)
            incoming = _where3(delta, inc_delta, incoming_nd)
        else:
            incoming = incoming_nd

        next_emission = jnp.where(shade, delta, st.next_emission)
        st = st._replace(weight=weight, rng=rng,
                         next_emission=next_emission)

        if has_volumes:
            crossed = (M.dot(normal, outgoing)
                       * M.dot(normal, incoming)) < 0.0
            vol_change = shade & st.alive & crossed \
                & is_volumetric_type(material.type)
            push = vol_change & (st.vol_depth == 0)
            pop = vol_change & (st.vol_depth > 0)
            st = _vol_push(st, push, material.density, material.scattering,
                           material.scanisotropy)
            st = _vol_pop(st, pop)

        ro = _where3(shade, position, st.ro)
        rd = _where3(shade, incoming, st.rd)
        if has_opacity:
            ro = _where3(op_skip, position + st.rd * 1e-2, ro)
        st = st._replace(ro=ro, rd=rd)

        # --- volume interaction
        if has_volumes:
            vol = hit_l & in_volume & st.alive
            position_v = st.ro + st.rd * tdist[..., None]
            outgoing_v = -st.rd
            r_choice_v, rng = R.rand1f_if(st.rng, vol)
            use_scat = r_choice_v < 0.5
            rn2_v, rng = R.rand2f_if(rng, vol & use_scat)
            rnl_v, rng = R.rand1f_if(rng, vol & use_scat)
            inc_scat = B.sample_scattering(top_aniso, outgoing_v, rn2_v)
            if has_lights:
                ruv_v, rng = R.rand2f_if(rng, vol & ~use_scat)
                rel_v, rng = R.rand1f_if(rng, vol & ~use_scat)
                rl_v, rng = R.rand1f_if(rng, vol & ~use_scat)
                inc_light_v = sample_lights(scene, lights, meta, position_v,
                                            rl_v, rel_v, ruv_v)
                incoming_v = _where3(use_scat, inc_scat, inc_light_v)
            else:
                incoming_v = inc_scat
            f_v = B.eval_scattering(top_density, top_scat, top_aniso,
                                    outgoing_v, incoming_v)
            pdf_vs = B.sample_scattering_pdf(top_density, top_aniso,
                                             outgoing_v, incoming_v)
            if has_lights:
                pdf_vl = sample_lights_pdf(scene, lights, meta, position_v,
                                           incoming_v)
                pdf_v = 0.5 * pdf_vs + 0.5 * pdf_vl
            else:
                pdf_v = 0.5 * pdf_vs
            safe_pdf_v = jnp.where(pdf_v == 0.0, 1.0, pdf_v)[..., None]
            w_v = st.weight * f_v / safe_pdf_v
            w_v = jnp.where((pdf_v == 0.0)[..., None],
                            jnp.full_like(w_v, jnp.nan), w_v)
            weight = _where3(vol, w_v, st.weight)
            next_emission = jnp.where(vol, True, st.next_emission)
            ro = _where3(vol, position_v, st.ro)
            rd = _where3(vol, incoming_v, st.rd)
            st = st._replace(weight=weight, ro=ro, rd=rd, rng=rng,
                             next_emission=next_emission)
        else:
            vol = false_

        processed = (shade | vol) & st.alive
        wzero = M.is_zero3(st.weight)
        wbad = ~M.isfinite3(st.weight)
        alive = st.alive & ~(processed & (wzero | wbad))
        st = st._replace(alive=alive)

        rr = processed & st.alive & (st.bounce > 3)
        rr_prob = jnp.minimum(jnp.float32(0.99), M.maxc(st.weight))
        r_rr, rng = R.rand1f_if(st.rng, rr)
        rr_die = rr & (r_rr >= rr_prob)
        safe_rr = jnp.where(rr_prob == 0.0, 1.0, rr_prob)
        weight = _where3(rr & ~rr_die, st.weight / safe_rr[..., None],
                         st.weight)
        alive = st.alive & ~rr_die
        st = st._replace(weight=weight, alive=alive, rng=rng)

        consumed = (shade | vol) & st.alive
        bounce = jnp.where(consumed, st.bounce + 1, st.bounce)
        alive = st.alive & jnp.where(
            shade | vol | op_skip,
            jnp.where(op_skip, True, bounce < params.bounces),
            st.alive)
        st = st._replace(bounce=bounce, alive=alive, it=st.it + 1)
        return st

    def cond(st: PathState):
        return jnp.any(st.alive) & (st.it < max_iters)

    def run(ro, rd, rngs):
        st = jax.lax.while_loop(cond, body, _init_state(ro, rd, rngs))
        return (st.radiance, st.hit, st.hit_albedo, st.hit_normal, st.rng)

    return run


def make_diagram_sampler(scene, lights, meta, params, intersect_fn,
                         features=None):
    """`trace_diagram` (yocto_trace.cpp:1178-1244)."""
    return make_eyelight_sampler(scene, lights, meta, params, intersect_fn,
                                 features=features, diagram=True)


SAMPLER_BUILDERS = {
    SamplerType.path: make_path_sampler,
    SamplerType.pathdirect: make_pathdirect_sampler,
    SamplerType.pathmis: make_pathmis_sampler,
    SamplerType.pathtest: partial(make_path_sampler, force_matte=True),
    SamplerType.naive: make_naive_sampler,
    SamplerType.eyelight: make_eyelight_sampler,
    SamplerType.diagram: make_diagram_sampler,
    SamplerType.falsecolor: make_falsecolor_sampler,
    SamplerType.furnace: make_furnace_sampler,
}


def get_sampler_builder(sampler: SamplerType):
    if sampler not in SAMPLER_BUILDERS:
        raise ValueError(f"sampler {sampler!r} not implemented yet")
    return SAMPLER_BUILDERS[sampler]


def is_sampler_lit(params: TraceParams) -> bool:
    return params.sampler in (SamplerType.path, SamplerType.pathdirect,
                              SamplerType.pathmis, SamplerType.naive,
                              SamplerType.furnace)
