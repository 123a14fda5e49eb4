"""Differentiable rendering: gradients of the path-traced image w.r.t.
scene parameters (BASELINE.json config 4; the reference renderer is not
differentiable, so this subsystem has no yocto counterpart — it follows
the standard detached-sampling estimator of differentiable-rendering
practice).

Design (TPU-first):
- The bounce loop is a fixed-length `lax.scan` (reverse-mode AD cannot
  differentiate `lax.while_loop`); dead lanes are masked, exactly like the
  forward wavefront.
- **Detached sampling**: sample directions, pdfs, Russian-roulette and
  MIS weights are computed from a *sampling* parameter set and wrapped in
  stop_gradient; BSDF values, emission, textures, and geometry terms are
  evaluated *attached*. The estimator E[f(theta)/p(theta_bar)] is unbiased
  for any fixed sampling density p, so gradients flow through f alone.
  Passing an explicit pinned `theta_sampling` makes the realized estimate
  a deterministic differentiable function of theta — finite differences
  then match `jax.grad` to float precision, which is what the gradient
  tests exercise.
- The radiance clamp is straight-through (clamped forward, identity
  backward) so bright-light gradients are not silently zeroed.
- Interior derivatives of vertex positions/instance frames flow through
  the (pure-jnp, differentiable) intersector and shading evals. Silhouette
  (visibility-discontinuity) terms are NOT estimated in v1 — vertex
  gradients are the interior/reparameterization-free part only.
- Opacity rejection and volume distance sampling are discrete decisions;
  their parameters receive no gradient in v1 (documented limitation).

Typical use:
    dr = DiffRenderer(scene, params)
    theta = dr.theta()
    loss = lambda th: ((dr.render(th) - target) ** 2).mean()
    grads = jax.grad(loss)(theta)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.scene import SceneData
from ..ops import mathops as M
from ..ops import rng as R
from ..ops import sampling as SMP
from . import bsdf as B
from .compile import FlatScene, compile_scene, scene_features
from .intersect import (RAY_EPS, SceneIntersection, _intersect_element,
                        intersect_scene_bruteforce)
from .lights import make_trace_lights, sample_lights, sample_lights_pdf
from .params import TraceParams
from .pathtrace import _nee_emission
from .renderer import render_size, sample_camera_rays
from .sceneval import (eval_environment, eval_material, eval_shading_normal,
                       eval_shading_position, is_delta_point)

# FlatScene fields exposed as differentiable parameters
THETA_FIELDS = (
    "positions", "inst_frame",
    "mat_emission", "mat_color", "mat_roughness", "mat_metallic",
    "mat_ior", "mat_scattering", "mat_scanisotropy", "mat_trdepth",
    "tex_data", "env_emission", "cam_frame",
)


def extract_theta(flat: FlatScene) -> dict:
    return {k: getattr(flat, k) for k in THETA_FIELDS}


def inject_theta(flat: FlatScene, theta: dict) -> FlatScene:
    """Replace differentiable fields; derived fields (instance inverses,
    the packed elem_attrs corner positions) are recomputed differentiably
    so frame/vertex gradients stay consistent."""
    flat = flat._replace(**{k: theta[k] for k in THETA_FIELDS})
    rot = flat.inst_frame[:, :3, :]                     # [I,3,3]
    inv_rot = jnp.linalg.inv(rot)
    inv_o = -jnp.einsum("ij,ijk->ik", flat.inst_frame[:, 3, :], inv_rot)
    # rebuild the packed per-element corner positions from the injected
    # vertex pool (one [E,4] gather per render jit; bwd is the matching
    # scatter-add into the positions gradient)
    pos_c = jnp.stack([flat.positions[flat.elements[:, k]]
                       for k in range(4)], axis=1)      # [E,4,3]
    ea = flat.elem_attrs.reshape(-1, 4, 8)
    ea = jnp.concatenate([pos_c, ea[..., 3:]], axis=-1)
    return flat._replace(
        inst_inv_frame=jnp.concatenate([inv_rot, inv_o[:, None, :]], 1),
        elem_attrs=ea.reshape(ea.shape[0], 32),
        # the packed texel-quad and candidate-join caches duplicate theta
        # leaves (tex_data; positions/materials); clearing them routes
        # eval_texture/eval_material through the differentiable pools so
        # gradients flow
        tex_quad=None, cand_attrs=None)


def _sg(x):
    return jax.lax.stop_gradient(x)


def _clamp_st(radiance, clamp):
    """Straight-through radiance clamp (forward = reference clamp
    yocto_trace.cpp:1471-1475, backward = identity)."""
    finite = M.isfinite3(radiance)[..., None]
    r = jnp.where(finite, radiance, _sg(radiance) * 0.0)
    mx = M.maxc(_sg(r))
    scale = jnp.where(mx > clamp, clamp / jnp.maximum(mx, 1e-20), 1.0)
    return r * _sg(scale)[..., None]


def _where3(c, a, b):
    return jnp.where(c[..., None], a, b)


def make_attached_intersect(fast_fn, kinds=None):
    """Scalable differentiable intersection: detached hit-FINDING through
    any fast non-differentiable intersector (threaded BVH walk or the
    Pallas cluster kernel), then a differentiable re-intersection of the
    single chosen element per lane.

    Gradient semantics match `intersect_scene_bruteforce` exactly: there,
    the argmin *choice* of the closest candidate is already detached
    (integer indices carry no tangents) while the selected uv/distance are
    attached — this wrapper reproduces that split without the O(R x C)
    dense sweep, unpinning the diff renderer from brute force
    (BASELINE.md round-1 known gap). Lanes whose re-intersection
    numerically misses (epsilon disagreements between traversal and the
    dense test) fall back to the detached uv/distance: zero geometry
    gradient for that lane rather than a wrong one.
    """

    def intersect(scene: FlatScene, ro, rd, tmin=RAY_EPS, tmax=M.flt_max):
        ids = fast_fn(_sg(scene), _sg(ro), _sg(rd), tmin=tmin,
                      tmax=_sg(tmax))
        ids = _sg(ids)
        inst = jnp.maximum(ids.instance, 0)
        shape = scene.inst_shape[inst]
        gelem = scene.shape_elem_start[shape] + jnp.maximum(ids.element, 0)
        inv = scene.inst_inv_frame[inst]                     # [R,4,3]
        local_o = (ro[..., 0:1] * inv[..., 0, :]
                   + ro[..., 1:2] * inv[..., 1, :]
                   + ro[..., 2:3] * inv[..., 2, :] + inv[..., 3, :])
        local_d = (rd[..., 0:1] * inv[..., 0, :]
                   + rd[..., 1:2] * inv[..., 1, :]
                   + rd[..., 2:3] * inv[..., 2, :])
        verts = scene.elements[gelem]                        # [R,4]
        p = scene.positions[verts]                           # [R,4,3]
        rads = scene.radius[verts]                           # [R,4]
        kind = scene.shape_kind[shape]                       # [R]
        tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32),
                                  inst.shape)
        tmax_b = jnp.full(inst.shape, M.flt_max, jnp.float32)
        hit, uv, dist = _intersect_element(local_o, local_d, tmin_b,
                                           tmax_b, p, rads, kind,
                                           kinds=kinds)
        ok = ids.hit & hit
        uv = jnp.where(ok[..., None], uv, ids.uv)
        dist = jnp.where(ok, dist, ids.distance)
        return SceneIntersection(hit=ids.hit, instance=ids.instance,
                                 element=ids.element, uv=uv,
                                 distance=dist)

    return intersect


def make_diff_path_sampler(lights, meta, params: TraceParams, features,
                           intersect_fn=None):
    """Differentiable `trace_path` analogue (yocto_trace.cpp:453-596
    estimator; fixed-length scan, detached sampling, no opacity loop).

    Returns run(scene_attached, scene_sampling, ro, rd, rngs) -> radiance.
    """
    has_lights = meta.n_lights > 0
    has_delta = features.has_delta
    has_volumes = features.has_volumes
    types = features.mat_types
    if intersect_fn is None:
        intersect_fn = partial(intersect_scene_bruteforce,
                               kinds=features.kinds)
    from ..ops import shading as SH
    from .sceneval import is_volumetric_instance

    def run(scene_a: FlatScene, scene_s: FlatScene, ro, rd, rngs):
        has_env = scene_a.env_frame.shape[0] > 0
        Rn = ro.shape[0]

        def body(carry, _):
            (ro, rd, radiance, weight, alive, bounce, rng, in_med,
             med_a, med_s) = carry
            ro_in, rd_in = ro, rd
            isec = intersect_fn(scene_a, ro, rd)
            hit_l = alive & isec.hit

            if has_env:
                miss = alive & ~isec.hit
                env_ok = miss & ((bounce > 0) | (not params.envhidden))
                env = eval_environment(scene_a, rd)
                radiance = _where3(env_ok, radiance + weight * env,
                                   radiance)
            alive = hit_l

            # --- volume transmittance (single-medium; distance sampling
            # detached from med_s, transmittance ratio attached via med_a)
            if has_volumes:
                in_stack = hit_l & in_med
                r_tr2, rng = R.rand1f_if(rng, in_stack)
                r_tr1, rng = R.rand1f_if(rng, in_stack)
                den_a, scat_a, ani_a = med_a
                den_s, scat_s, ani_s = jax.tree.map(_sg, med_s)
                tdist = _sg(SH.sample_transmittance(
                    den_s, isec.distance, r_tr1, r_tr2))
                trans = SH.eval_transmittance(den_a, tdist)
                tpdf = _sg(SH.sample_transmittance_pdf(
                    den_s, tdist, isec.distance))
                safe_tpdf = jnp.where(tpdf == 0.0, 1.0, tpdf)[..., None]
                weight = _where3(in_stack, weight * trans / safe_tpdf,
                                 weight)
                in_volume = in_stack & (tdist < isec.distance)
            else:
                in_volume = jnp.zeros(Rn, bool)
            surf = alive & ~in_volume

            inst = jnp.maximum(isec.instance, 0)
            shape = scene_a.inst_shape[inst]
            gelem = scene_a.shape_elem_start[shape] \
                + jnp.maximum(isec.element, 0)
            outgoing = -rd
            # attached evals (theta gradients flow here)
            position = eval_shading_position(scene_a, inst, gelem, isec.uv,
                                             outgoing)
            normal = eval_shading_normal(scene_a, inst, gelem, isec.uv,
                                         outgoing, features=features)
            material = eval_material(scene_a, inst, gelem, isec.uv,
                                     features=features)
            # sampling evals (detached: decide WHERE to sample from theta_s)
            material_s = jax.tree.map(_sg, eval_material(
                scene_s, inst, gelem, isec.uv, features=features))
            normal_s = _sg(eval_shading_normal(scene_s, inst, gelem,
                                               isec.uv, outgoing,
                                               features=features))

            # emission (attached)
            emis = B.eval_emission(material, normal, outgoing)
            radiance = _where3(surf, radiance + weight * emis, radiance)

            # --- next direction: 50/50 BSDF/light one-sample MIS
            delta = is_delta_point(material_s) if has_delta \
                else jnp.zeros(Rn, bool)
            nd = surf & ~delta if has_delta else surf
            r_choice, rng = R.rand1f_if(rng, nd)
            use_bsdf = r_choice < 0.5
            rn2, rng = R.rand2f_if(rng, nd & use_bsdf)
            rnl, rng = R.rand1f_if(rng, nd & use_bsdf)
            inc_bsdf = _sg(B.sample_bsdfcos(material_s, normal_s, outgoing,
                                            rnl, rn2, types=types))
            if has_lights:
                ruv, rng = R.rand2f_if(rng, nd & ~use_bsdf)
                rel, rng = R.rand1f_if(rng, nd & ~use_bsdf)
                rl, rng = R.rand1f_if(rng, nd & ~use_bsdf)
                inc_light = _sg(sample_lights(scene_s, lights, meta,
                                              _sg(position), rl, rel, ruv))
                incoming_nd = _where3(use_bsdf, inc_bsdf, inc_light)
            else:
                incoming_nd = inc_bsdf
            nd_zero = nd & M.is_zero3(incoming_nd)
            nd_ok = nd & ~nd_zero
            f_nd = B.eval_bsdfcos(material, normal, outgoing, incoming_nd,
                                  types=types)
            pdf_b = _sg(B.sample_bsdfcos_pdf(material_s, normal_s, outgoing,
                                             incoming_nd, types=types))
            if has_lights:
                pdf_l = _sg(sample_lights_pdf(scene_s, lights, meta,
                                              _sg(position), incoming_nd))
                pdf_nd = 0.5 * pdf_b + 0.5 * pdf_l
            else:
                pdf_nd = 0.5 * pdf_b
            safe_pdf = jnp.where(pdf_nd == 0.0, 1.0, pdf_nd)[..., None]
            weight = _where3(nd_ok, weight * f_nd / safe_pdf, weight)

            if has_delta:
                dl = surf & delta
                r_delta, rng = R.rand1f_if(rng, dl)
                inc_delta = _sg(B.sample_delta(material_s, normal_s,
                                               outgoing, r_delta,
                                               types=types))
                dl_zero = dl & M.is_zero3(inc_delta)
                dl_ok = dl & ~dl_zero
                f_dl = B.eval_delta(material, normal, outgoing, inc_delta,
                                    types=types)
                pdf_dl = _sg(B.sample_delta_pdf(material_s, normal_s,
                                                outgoing, inc_delta,
                                                types=types))
                safe_dl = jnp.where(pdf_dl == 0.0, 1.0, pdf_dl)[..., None]
                weight = _where3(dl_ok, weight * f_dl / safe_dl, weight)
                incoming = _where3(delta, inc_delta, incoming_nd)
                alive = alive & ~(nd_zero | dl_zero)
            else:
                incoming = incoming_nd
                alive = alive & ~nd_zero

            # --- medium toggle on transmission through volumetric surfaces
            if has_volumes:
                crossed = (M.dot(normal, outgoing)
                           * M.dot(normal, incoming)) < 0.0
                vol_change = surf & alive & crossed \
                    & is_volumetric_instance(scene_a, inst)
                enter = vol_change & ~in_med
                leave = vol_change & in_med
                in_med = jnp.where(enter, True,
                                   jnp.where(leave, False, in_med))
                sel3 = lambda old, new: _where3(enter, new, old)
                den_a, scat_a, ani_a = med_a
                med_a = (sel3(den_a, material.density),
                         sel3(scat_a, material.scattering),
                         jnp.where(enter, material.scanisotropy, ani_a))
                den_s2, scat_s2, ani_s2 = med_s
                med_s = (sel3(den_s2, material_s.density),
                         sel3(scat_s2, material_s.scattering),
                         jnp.where(enter, material_s.scanisotropy,
                                   ani_s2))

            ro = _where3(surf & alive, position, ro)
            rd = _where3(surf & alive, incoming, rd)

            # --- in-volume scattering (phase/light one-sample MIS;
            # direction detached, phase value + scattering attached)
            if has_volumes:
                vol = hit_l & in_volume & alive
                den_a, scat_a, ani_a = med_a
                den_s, scat_s, ani_s = jax.tree.map(_sg, med_s)
                position_v = ro_in + rd_in * tdist[..., None]
                outgoing_v = -rd_in
                r_choice_v, rng = R.rand1f_if(rng, vol)
                use_scat = r_choice_v < 0.5
                rn2_v, rng = R.rand2f_if(rng, vol & use_scat)
                rnl_v, rng = R.rand1f_if(rng, vol & use_scat)
                del rnl_v
                inc_scat = _sg(B.sample_scattering(ani_s, outgoing_v,
                                                   rn2_v))
                if has_lights:
                    ruv_v, rng = R.rand2f_if(rng, vol & ~use_scat)
                    rel_v, rng = R.rand1f_if(rng, vol & ~use_scat)
                    rl_v, rng = R.rand1f_if(rng, vol & ~use_scat)
                    inc_l_v = _sg(sample_lights(
                        scene_s, lights, meta, _sg(position_v), rl_v,
                        rel_v, ruv_v))
                    incoming_v = _where3(use_scat, inc_scat, inc_l_v)
                else:
                    incoming_v = inc_scat
                v_zero = vol & M.is_zero3(incoming_v)
                v_ok = vol & ~v_zero
                f_v = B.eval_scattering(den_a, scat_a, ani_a, outgoing_v,
                                        incoming_v)
                pdf_vs = _sg(B.sample_scattering_pdf(
                    den_s, ani_s, outgoing_v, incoming_v))
                if has_lights:
                    pdf_vl = _sg(sample_lights_pdf(
                        scene_s, lights, meta, _sg(position_v),
                        incoming_v))
                    pdf_v = 0.5 * pdf_vs + 0.5 * pdf_vl
                else:
                    pdf_v = 0.5 * pdf_vs
                safe_pv = jnp.where(pdf_v == 0.0, 1.0, pdf_v)[..., None]
                weight = _where3(v_ok, weight * f_v / safe_pv, weight)
                alive = alive & ~v_zero
                ro = _where3(v_ok, position_v, ro)
                rd = _where3(v_ok, incoming_v, rd)

            # weight sanity + Russian roulette (detached decisions)
            wzero = M.is_zero3(_sg(weight))
            wbad = ~M.isfinite3(_sg(weight))
            alive = alive & ~(wzero | wbad)
            rr = alive & (bounce > 3)
            rr_prob = _sg(jnp.minimum(jnp.float32(0.99), M.maxc(weight)))
            r_rr, rng = R.rand1f_if(rng, rr)
            rr_die = rr & (r_rr >= rr_prob)
            safe_rr = jnp.where(rr_prob == 0.0, 1.0, rr_prob)
            weight = _where3(rr & ~rr_die, weight / safe_rr[..., None],
                             weight)
            alive = alive & ~rr_die

            return (ro, rd, radiance, weight, alive, bounce + 1, rng,
                    in_med, med_a, med_s), None

        zero_med = (jnp.zeros((Rn, 3), jnp.float32),
                    jnp.zeros((Rn, 3), jnp.float32),
                    jnp.zeros(Rn, jnp.float32))
        init = (ro, rd, jnp.zeros((Rn, 3), jnp.float32),
                jnp.ones((Rn, 3), jnp.float32), jnp.ones(Rn, bool),
                jnp.zeros(Rn, jnp.int32), rngs, jnp.zeros(Rn, bool),
                zero_med, zero_med)
        (ro_, rd_, radiance, w_, a_, b_, rng, _, _, _), _ = jax.lax.scan(
            body, init, None, length=params.bounces)
        # final environment hit for rays still alive after the last bounce
        if has_env:
            isec = intersect_fn(scene_a, ro_, rd_)
            env_ok = a_ & ~isec.hit
            radiance = _where3(env_ok,
                               radiance + w_ * eval_environment(scene_a,
                                                                rd_),
                               radiance)
        return radiance, rng

    return run


def make_diff_pathdirect_sampler(lights, meta, params: TraceParams,
                                 features, intersect_fn=None):
    """Differentiable `trace_pathdirect` analogue with **area-measure
    NEE**: the next-event contribution is written
        f(x->y) * Le(y) * |n_y . w| / d^2 / p_A(y)
    with the geometry term attached and only the light-point sampling and
    p_A detached. In the solid-angle form (the `mis` sampler), the
    geometric coupling sits inside the detached pdf, so camera/vertex
    "interior" gradients of diffuse transport vanish; the area form is the
    standard differentiable-rendering estimator that recovers them.
    Emission on continuation rays is gated exactly like the reference's
    next_emission flag (yocto_trace.cpp:599-767), so nothing is counted
    twice. Silhouette/visibility discontinuity terms remain unestimated.
    """
    has_lights = meta.n_lights > 0
    has_delta = features.has_delta
    types = features.mat_types
    if intersect_fn is None:
        intersect_fn = partial(intersect_scene_bruteforce,
                               kinds=features.kinds)

    def run(scene_a: FlatScene, scene_s: FlatScene, ro, rd, rngs):
        has_env = scene_a.env_frame.shape[0] > 0
        Rn = ro.shape[0]

        def nee(position, material, normal, outgoing, mask, rng):
            """Area-measure next-event estimation; returns (Lo, rng)."""
            from .sceneval import eval_element_normal, eval_position
            ruv, rng = R.rand2f_if(rng, mask)
            rel, rng = R.rand1f_if(rng, mask)
            rl, rng = R.rand1f_if(rng, mask)
            light_id = _sg(SMP.sample_uniform(meta.n_lights, rl))
            inst = lights.light_instance[light_id]
            start = lights.cdf_start[light_id]
            count = lights.cdf_count[light_id]
            total = lights.cdf_total[light_id]
            idx = _sg(SMP.sample_discrete(lights.cdf_flat, rel, start,
                                          count, total))
            is_inst = inst >= 0

            # light point (attached through scene_a geometry)
            inst_c = jnp.maximum(inst, 0)
            shape = scene_a.inst_shape[inst_c]
            start_e = scene_a.shape_elem_start[shape]
            from .compile import KIND_TRIANGLES
            kind = scene_a.shape_kind[shape]
            elem = jnp.minimum(idx, scene_a.shape_elem_count[shape] - 1)
            uv_tri = SMP.sample_triangle_uv(ruv)
            uv = jnp.where((kind == KIND_TRIANGLES)[..., None], uv_tri, ruv)
            lpos = eval_position(scene_a, inst_c, start_e + elem, uv)
            wdir = M.normalize(lpos - position)

            # environment lights: detached solid-angle fallback
            if has_env and any(k == "env" for k in meta.kinds):
                dir_env = _sg(SMP.sample_sphere(ruv))
                wdir = _where3(is_inst, wdir, dir_env)

            # visibility + actual emitter along the connection
            em, isec = _nee_emission(scene_a, intersect_fn, position, wdir,
                                     features=features)
            hinst = jnp.maximum(isec.instance, 0)
            hshape = scene_a.inst_shape[hinst]
            hgelem = scene_a.shape_elem_start[hshape] \
                + jnp.maximum(isec.element, 0)
            lnormal = eval_element_normal(scene_a, hinst, hgelem)
            d2 = jnp.maximum(isec.distance * isec.distance, 1e-12)
            cos_y = jnp.abs(M.dot(lnormal, wdir))
            # p_A: uniform light x area-CDF element x uniform point
            p_area = _sg(1.0 / jnp.maximum(meta.n_lights * total, 1e-20))
            geom_inst = jnp.where(isec.hit, cos_y / d2, 0.0)
            w_inst = geom_inst / jnp.maximum(p_area, 1e-30)
            # env branch: detached uniform-sphere pdf (x uniform light
            # selection), radiance at infinity
            w_env = jnp.float32(4.0 * M.pif * meta.n_lights)
            w_conn = jnp.where(is_inst, w_inst,
                               jnp.where(isec.hit, 0.0, w_env))
            f = B.eval_bsdfcos(material, normal, outgoing, wdir,
                               types=types)
            ok = mask & ~M.is_zero3(_sg(f))
            return _where3(ok, f * em * w_conn[..., None], 0.0), rng

        def body(carry, _):
            (ro, rd, radiance, weight, alive, bounce, next_em,
             rng) = carry
            isec = intersect_fn(scene_a, ro, rd)
            hit_l = alive & isec.hit

            if has_env:
                miss = alive & ~isec.hit
                env_ok = miss & ((bounce > 0) | (not params.envhidden)) \
                    & next_em
                env = eval_environment(scene_a, rd)
                radiance = _where3(env_ok, radiance + weight * env,
                                   radiance)
            alive = hit_l

            inst = jnp.maximum(isec.instance, 0)
            shape = scene_a.inst_shape[inst]
            gelem = scene_a.shape_elem_start[shape] \
                + jnp.maximum(isec.element, 0)
            outgoing = -rd
            position = eval_shading_position(scene_a, inst, gelem, isec.uv,
                                             outgoing)
            normal = eval_shading_normal(scene_a, inst, gelem, isec.uv,
                                         outgoing, features=features)
            material = eval_material(scene_a, inst, gelem, isec.uv,
                                     features=features)
            material_s = jax.tree.map(_sg, eval_material(
                scene_s, inst, gelem, isec.uv, features=features))
            normal_s = _sg(eval_shading_normal(scene_s, inst, gelem,
                                               isec.uv, outgoing,
                                               features=features))

            emis = B.eval_emission(material, normal, outgoing)
            radiance = _where3(alive & next_em,
                               radiance + weight * emis, radiance)

            delta = is_delta_point(material_s) if has_delta \
                else jnp.zeros(Rn, bool)
            nd = alive & ~delta if has_delta else alive

            if has_lights:
                lo_nee, rng = nee(position, material, normal, outgoing,
                                  nd, rng)
                radiance = _where3(nd, radiance + weight * lo_nee,
                                   radiance)
            next_em = jnp.where(alive, delta, next_em)

            # continuation: BSDF sampling, pdf detached
            rn2, rng = R.rand2f_if(rng, nd)
            rnl, rng = R.rand1f_if(rng, nd)
            inc_bsdf = _sg(B.sample_bsdfcos(material_s, normal_s, outgoing,
                                            rnl, rn2, types=types))
            nd_zero = nd & M.is_zero3(inc_bsdf)
            nd_ok = nd & ~nd_zero
            f_nd = B.eval_bsdfcos(material, normal, outgoing, inc_bsdf,
                                  types=types)
            pdf_b = _sg(B.sample_bsdfcos_pdf(material_s, normal_s, outgoing,
                                             inc_bsdf, types=types))
            safe_pdf = jnp.where(pdf_b == 0.0, 1.0, pdf_b)[..., None]
            weight = _where3(nd_ok, weight * f_nd / safe_pdf, weight)

            if has_delta:
                dl = surf & delta
                r_delta, rng = R.rand1f_if(rng, dl)
                inc_delta = _sg(B.sample_delta(material_s, normal_s,
                                               outgoing, r_delta,
                                               types=types))
                dl_zero = dl & M.is_zero3(inc_delta)
                dl_ok = dl & ~dl_zero
                f_dl = B.eval_delta(material, normal, outgoing, inc_delta,
                                    types=types)
                pdf_dl = _sg(B.sample_delta_pdf(material_s, normal_s,
                                                outgoing, inc_delta,
                                                types=types))
                safe_dl = jnp.where(pdf_dl == 0.0, 1.0, pdf_dl)[..., None]
                weight = _where3(dl_ok, weight * f_dl / safe_dl, weight)
                incoming = _where3(delta, inc_delta, inc_bsdf)
                alive = alive & ~(nd_zero | dl_zero)
            else:
                incoming = inc_bsdf
                alive = alive & ~nd_zero

            wzero = M.is_zero3(_sg(weight))
            wbad = ~M.isfinite3(_sg(weight))
            alive = alive & ~(wzero | wbad)
            rr = alive & (bounce > 3)
            rr_prob = _sg(jnp.minimum(jnp.float32(0.99), M.maxc(weight)))
            r_rr, rng = R.rand1f_if(rng, rr)
            rr_die = rr & (r_rr >= rr_prob)
            safe_rr = jnp.where(rr_prob == 0.0, 1.0, rr_prob)
            weight = _where3(rr & ~rr_die, weight / safe_rr[..., None],
                             weight)
            alive = alive & ~rr_die

            ro = _where3(alive, position, ro)
            rd = _where3(alive, incoming, rd)
            return (ro, rd, radiance, weight, alive, bounce + 1, next_em,
                    rng), None

        init = (ro, rd, jnp.zeros((Rn, 3), jnp.float32),
                jnp.ones((Rn, 3), jnp.float32), jnp.ones(Rn, bool),
                jnp.zeros(Rn, jnp.int32), jnp.ones(Rn, bool), rngs)
        (ro_, rd_, radiance, w_, a_, b_, ne_, rng), _ = jax.lax.scan(
            body, init, None, length=params.bounces)
        if has_env:
            isec = intersect_fn(scene_a, ro_, rd_)
            env_ok = a_ & ~isec.hit & ne_
            radiance = _where3(env_ok,
                               radiance + w_ * eval_environment(scene_a,
                                                                rd_),
                               radiance)
        return radiance, rng

    return run


class DiffRenderer:
    """Differentiable renderer over a fixed scene topology.

    `render(theta)` is a pure differentiable function of the parameter
    pytree; `theta_sampling` pins the sampling distribution (defaults to
    stop_gradient(theta), the standard detached estimator)."""

    def __init__(self, scene: SceneData, params: TraceParams,
                 spp: Optional[int] = None, estimator: str = "mis",
                 intersector: str = "auto"):
        """estimator: 'mis' (trace_path analogue; best variance for
        material/emission/texture gradients) or 'nee' (area-measure
        next-event estimation; additionally recovers interior geometry
        gradients - camera, vertex positions, instance frames).

        intersector: 'bruteforce' (dense differentiable sweep; exact but
        O(rays x elements)), 'bvh' (threaded BVH walk detached +
        per-lane differentiable re-intersection via
        make_attached_intersect), 'cluster' (Pallas cluster kernel
        detached, same re-intersection; TPU-scale scenes), or 'auto'
        (bruteforce for small scenes, bvh beyond 4096 candidates)."""
        self.params = params
        self.scene_host = scene
        self.flat = compile_scene(scene)
        self.features = scene_features(scene)
        self._edge_term = None
        self._edge_nsamples = None
        if self.features.has_volumes and estimator == "nee":
            raise NotImplementedError(
                "the area-measure NEE estimator covers surface scenes; "
                "use estimator='mis' for volumetric gradients (detached "
                "distance/phase sampling, attached transmittance)")
        self.lights, self.meta = make_trace_lights(scene)
        self.width, self.height = render_size(scene, params)
        self.spp = spp if spp is not None else params.samples
        if intersector == "auto":
            ncand = int(self.flat.cand_inst.shape[0])
            intersector = "bruteforce" if ncand <= 4096 else "bvh"
        self.intersector = intersector
        if intersector == "bruteforce":
            intersect_fn = None
        elif intersector == "bvh":
            from .bvh import build_scene_bvh, make_bvh_intersector
            fast = make_bvh_intersector(build_scene_bvh(scene),
                                        kinds=self.features.kinds)
            intersect_fn = make_attached_intersect(
                fast, kinds=self.features.kinds)
        elif intersector == "cluster":
            from .pallas_cluster import ClusterIntersector
            fast = ClusterIntersector(scene, kinds=self.features.kinds)
            intersect_fn = make_attached_intersect(
                fast, kinds=self.features.kinds)
        else:
            raise ValueError(f"unknown intersector {intersector!r}")
        builder = (make_diff_pathdirect_sampler if estimator == "nee"
                   else make_diff_path_sampler)
        self._sampler = builder(self.lights, self.meta, params,
                                self.features, intersect_fn=intersect_fn)

        width, height = self.width, self.height
        n = width * height
        meta = self.meta

        @jax.jit
        def _render(theta, theta_s):
            scene_a = inject_theta(self.flat, theta)
            scene_s = inject_theta(self.flat, jax.tree.map(_sg, theta_s))
            img = jnp.zeros((height, width, 3), jnp.float32)
            for s in range(self.spp):
                rngs = R.make_rng_offset(
                    params.seed, jnp.full(n, s, jnp.int32),
                    *R.make_pixel_seqs(n))
                ro, rd, rngs = sample_camera_rays(
                    scene_a, params.camera, width, height, rngs,
                    params.tentfilter)
                radiance, _ = self._sampler(scene_a, scene_s, ro, rd, rngs)
                radiance = _clamp_st(radiance, params.clamp)
                img = img + radiance.reshape(height, width, 3)
            return img / self.spp

        self._render = _render

    def theta(self) -> dict:
        return extract_theta(self.flat)

    def render(self, theta, theta_sampling=None):
        """Differentiable [H,W,3] linear radiance image."""
        ts = theta if theta_sampling is None else theta_sampling
        return self._render(theta, ts)

    def render_edges(self, theta, key, n_samples: int = 4096,
                     theta_sampling=None, shadow: bool = False,
                     shadow_depth: int = 1):
        """Edge-aware differentiable render: the interior image plus the
        zero-valued edge-sampling carrier whose gradient is the
        primary-visibility silhouette (boundary) term — the part of
        vertex-position gradients the interior estimator cannot see
        (trace/diff_edges.py). `key` drives the edge sampler.

        With `shadow=True` the shadow boundary term is added too (moving
        geometry moves its shadows; see diff_edges.make_shadow_edge_term
        for the estimator and its scope). `shadow_depth` extends it to
        receivers reached through that many matte bounces (VERDICT r3
        #8): depth 1 is the round-3 one-indirect-bounce term; depth 2
        also recovers shadows the camera only sees bounced off other
        walls. Requires a planar rect area light in the scene."""
        from .diff_edges import (build_edge_table, find_rect_light,
                                 make_edge_term, make_shadow_edge_term)

        if getattr(self, "_edge_term", None) is None or \
                self._edge_nsamples != n_samples:
            edges = build_edge_table(self.scene_host)
            params, meta = self.params, self.meta
            sampler = self._sampler

            def trace_fn(scene_det, ro, rd, key):
                k = ro.shape[0]
                offs = jax.random.randint(key, (k,), 0, 1 << 30)
                seq_hi, seq_lo = R.make_pixel_seqs(k)
                rngs = R.make_rng_offset(params.seed + 77, offs,
                                         seq_hi, seq_lo)
                rad, _ = sampler(scene_det, scene_det, ro, rd, rngs)
                return jax.lax.stop_gradient(rad)

            self._edge_term = jax.jit(make_edge_term(
                edges, params, self.width, self.height, trace_fn,
                n_samples=n_samples))
            self._edge_nsamples = n_samples
            self._shadow_term = None

        if shadow and (getattr(self, "_shadow_term", None) is None
                       or self._shadow_depth != shadow_depth):
            light = find_rect_light(self.scene_host)
            if light is None:
                raise ValueError("shadow edge term needs a planar "
                                 "rect area light in the scene")
            kinds = self.features.kinds

            def hit_fn(scene_det, ro, rd):
                from .intersect import intersect_scene_bruteforce
                return intersect_scene_bruteforce(scene_det, ro, rd,
                                                  kinds=kinds)

            self._shadow_term = jax.jit(make_shadow_edge_term(
                build_edge_table(self.scene_host), light, self.params,
                self.width, self.height, hit_fn,
                n_samples=4 * n_samples, depth=shadow_depth))
            self._shadow_depth = shadow_depth

        img = self.render(theta, theta_sampling)
        scene_a = inject_theta(self.flat, theta)
        img = img + self._edge_term(scene_a, key)
        if shadow:
            img = img + self._shadow_term(
                scene_a, jax.random.fold_in(key, 101))
        return img
