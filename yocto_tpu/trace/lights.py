"""Light machinery: CDF build (host) + batched sampling/pdf (device).

Mirrors the reference light pipeline: `make_trace_lights` builds per-light
area CDFs over triangles/quads and a luminance*sin(theta) CDF over
environment texels (yocto_trace.cpp:1528-1581); `sample_lights` picks a
light uniformly, an element by CDF and a point on it
(yocto_trace.cpp:361-388); `sample_lights_pdf` converts area to solid angle
by walking all hits of the ray through the light geometry
(yocto_trace.cpp:391-443) — here with a static bounded walk (`pdf_walk`
segments) instead of the reference's <=100 loop.

CDFs are stored as one flat pool with per-light offset/count so the device
sampling is a vectorized binary search (ops.sampling.sample_discrete).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.scene import INVALID, SceneData
from ..ops import mathops as M
from ..ops import sampling as SMP
from ..models.shape import sample_quads_cdf, sample_triangles_cdf
from ..ops import geometry as G
from .compile import FlatScene, KIND_TRIANGLES
from .intersect import RAY_EPS, intersect_instance_elements
from .sceneval import eval_element_normal, eval_position, eval_texture


class FlatLights(NamedTuple):
    light_instance: jax.Array  # [L] i32 (-1 for env lights)
    light_env: jax.Array       # [L] i32 (-1 for instance lights)
    cdf_flat: jax.Array        # [sum] f32
    cdf_start: jax.Array       # [L] i32
    cdf_count: jax.Array       # [L] i32
    cdf_total: jax.Array       # [L] f32
    # alias tables over the same segments (env texel picking in O(1)
    # gathers — the CDF binary search over a million-texel environment
    # costs log2(N) sequential gathers per lane)
    alias_prob: jax.Array = None   # [sum] f32
    alias_idx: jax.Array = None    # [sum] i32


class LightsMeta(NamedTuple):
    """Static (python-side) metadata baked into the jitted sampler."""

    n_lights: int
    max_light_elems: int  # max element count over instance lights
    env_sizes: tuple      # (width, height) per env light, () entries for none
    kinds: tuple          # 'inst' | 'env' per light
    light_ranges: tuple = ()  # per light: (inst_id, elem_start, elem_count)
    #                           in FlatScene global element ids; None for env


def make_trace_lights(scene: SceneData, flat=None):
    """Build light CDFs on the host -> (FlatLights, LightsMeta)."""
    insts, envs, cdfs = [], [], []
    env_sizes = []
    kinds = []
    ranges = []
    # global element offsets, same ordering/priority as compile_scene
    shape_eoff = []
    eoff = 0
    for s in scene.shapes:
        shape_eoff.append(eoff)
        # priority chain identical to compile_scene's element selection
        if len(s.triangles):
            eoff += len(s.triangles)
        elif len(s.quads):
            eoff += len(s.quads)
        elif len(s.lines):
            eoff += len(s.lines)
        else:
            eoff += len(s.points)
    for handle, inst in enumerate(scene.instances):
        material = scene.materials[inst.material]
        if not np.any(np.asarray(material.emission) != 0):
            continue
        shape = scene.shapes[inst.shape]
        if not len(shape.triangles) and not len(shape.quads):
            continue
        if len(shape.triangles):
            cdf = sample_triangles_cdf(shape.triangles, shape.positions)
        else:
            cdf = sample_quads_cdf(shape.quads, shape.positions)
        insts.append(handle)
        envs.append(INVALID)
        cdfs.append(cdf.astype(np.float32))
        env_sizes.append(())
        kinds.append("inst")
        ranges.append((handle, shape_eoff[inst.shape],
                       len(shape.triangles) if len(shape.triangles)
                       else len(shape.quads)))
    for handle, env in enumerate(scene.environments):
        if not np.any(np.asarray(env.emission) != 0):
            continue
        insts.append(INVALID)
        envs.append(handle)
        kinds.append("env")
        ranges.append(None)
        if env.emission_tex != INVALID:
            tex = scene.textures[env.emission_tex]
            if tex.pixelsf is not None and tex.pixelsf.size:
                px = np.asarray(tex.pixelsf, np.float32)
            else:
                px = np.asarray(tex.pixelsb, np.float32) / 255.0
            px = px.reshape(tex.height, tex.width, 4)
            th = (np.arange(tex.height) + 0.5) * np.pi / tex.height
            # reference weights by max over all 4 channels (incl. alpha)
            weight = px.max(axis=2) * np.sin(th)[:, None]
            cdf = np.cumsum(weight.reshape(-1).astype(np.float32),
                            dtype=np.float64).astype(np.float32)
            cdfs.append(cdf)
            env_sizes.append((tex.width, tex.height))
        else:
            cdfs.append(np.zeros(0, np.float32))
            env_sizes.append(())

    starts, counts, totals = [], [], []
    alias_p, alias_i = [], []
    off = 0
    for cdf in cdfs:
        starts.append(off)
        counts.append(len(cdf))
        totals.append(float(cdf[-1]) if len(cdf) else 0.0)
        off += len(cdf)
        w = np.diff(cdf, prepend=np.float32(0.0)) if len(cdf) else cdf
        ap, ai = SMP.build_alias_table(w)
        alias_p.append(ap)
        alias_i.append(ai)
    flat_cdf = (np.concatenate(cdfs) if cdfs else np.zeros(0, np.float32))
    if len(flat_cdf) == 0:
        flat_cdf = np.zeros(1, np.float32)
    flat_ap = (np.concatenate(alias_p) if alias_p
               else np.zeros(0, np.float32))
    flat_ai = (np.concatenate(alias_i) if alias_i
               else np.zeros(0, np.int32))
    if len(flat_ap) == 0:
        flat_ap = np.ones(1, np.float32)
        flat_ai = np.zeros(1, np.int32)

    # static walk bound for the pdf: max elements across instance lights
    max_elems = 1
    for handle in insts:
        if handle == INVALID:
            continue
        shape = scene.shapes[scene.instances[handle].shape]
        max_elems = max(max_elems,
                        max(len(shape.triangles), len(shape.quads)))

    lights = FlatLights(
        light_instance=jnp.asarray(
            np.asarray(insts, np.int32) if insts else np.zeros(1, np.int32)),
        light_env=jnp.asarray(
            np.asarray(envs, np.int32) if envs else np.zeros(1, np.int32)),
        cdf_flat=jnp.asarray(flat_cdf),
        cdf_start=jnp.asarray(
            np.asarray(starts, np.int32) if starts else np.zeros(1, np.int32)),
        cdf_count=jnp.asarray(
            np.asarray(counts, np.int32) if counts else np.zeros(1, np.int32)),
        cdf_total=jnp.asarray(
            np.asarray(totals, np.float32) if totals
            else np.zeros(1, np.float32)),
        alias_prob=jnp.asarray(flat_ap),
        alias_idx=jnp.asarray(flat_ai),
    )
    meta = LightsMeta(n_lights=len(insts), max_light_elems=max_elems,
                      env_sizes=tuple(env_sizes), kinds=tuple(kinds),
                      light_ranges=tuple(ranges))
    return lights, meta


def sample_lights(scene: FlatScene, lights: FlatLights, meta: LightsMeta,
                  position, rl, rel, ruv, env_alias: bool = False):
    """Direction towards a light (yocto_trace.cpp:361-388). [R,3].

    `env_alias=True` (wavefront pipelines) picks environment texels
    through the alias tables — identical distribution to the reference's
    CDF upper_bound but one gather instead of log2(texels) sequential
    ones. The coin reuses ruv[...,0], which the env-texel branch never
    consumes (it is the surface-uv draw of instance lights). The lockstep
    renderer keeps the CDF search for bit-parity with the reference."""
    light_id = SMP.sample_uniform(meta.n_lights, rl)       # [R]
    inst = lights.light_instance[light_id]
    env = lights.light_env[light_id]
    start = lights.cdf_start[light_id]
    count = lights.cdf_count[light_id]
    total = lights.cdf_total[light_id]
    has_envtex = any(sz != () for sz in meta.env_sizes)
    if env_alias and has_envtex:
        # instance segments are small: bound the binary search by their
        # max element count; env lanes take the alias draw instead
        idx = SMP.sample_discrete(lights.cdf_flat, rel, start, count,
                                  total, max_count=meta.max_light_elems)
        idx_env = SMP.sample_alias(lights.alias_prob, lights.alias_idx,
                                   rel, ruv[..., 0], start, count)
        idx = jnp.where(env >= 0, idx_env, idx)
    else:
        idx = SMP.sample_discrete(lights.cdf_flat, rel, start, count,
                                  total)

    # --- instance lights
    inst_c = jnp.maximum(inst, 0)
    shape = scene.inst_shape[inst_c]
    start_e = scene.shape_elem_start[shape]
    kind = scene.shape_kind[shape]
    elem = jnp.minimum(idx, scene.shape_elem_count[shape] - 1)
    uv_tri = SMP.sample_triangle_uv(ruv)
    uv = jnp.where((kind == KIND_TRIANGLES)[..., None], uv_tri, ruv)
    lposition = eval_position(scene, inst_c, start_e + elem, uv)
    dir_inst = M.normalize(lposition - position)

    # --- environment lights (python loop over env lights: static count)
    dir_env = SMP.sample_sphere(ruv)
    for li, sz in enumerate(meta.env_sizes):
        if lights is None or sz == ():
            continue
        w, h = sz
        is_this = light_id == li
        i = idx % w
        j = idx // w
        u = (i.astype(jnp.float32) + 0.5) / w
        v = (j.astype(jnp.float32) + 0.5) / h
        local = M.vec(jnp.cos(u * 2 * M.pif) * jnp.sin(v * M.pif),
                      jnp.cos(v * M.pif),
                      jnp.sin(u * 2 * M.pif) * jnp.sin(v * M.pif))
        env_c = jnp.maximum(env, 0)
        frame = scene.env_frame[jnp.clip(env_c, 0,
                                         scene.env_frame.shape[0] - 1)]
        d = M.transform_direction(frame, local)
        dir_env = jnp.where(is_this[..., None], d, dir_env)

    return jnp.where((inst >= 0)[..., None], dir_inst, dir_env)


def sample_lights_pdf(scene: FlatScene, lights: FlatLights, meta: LightsMeta,
                      position, direction, pdf_walk: int = 4):
    """Solid-angle pdf of `sample_lights` (yocto_trace.cpp:391-443).

    Instance lights: bounded walk of `pdf_walk` successive hits through the
    light geometry (the reference allows up to 100; area lights in practice
    need 1-2). Environments: texel probability / solid angle.
    """
    R = position.shape[0]
    pdf = jnp.zeros(R, jnp.float32)
    for li in range(meta.n_lights):
        inst_id = lights.light_instance[li]
        # python-level switch on host metadata
        if meta.kinds[li] == "env":
            # environment light
            if meta.env_sizes[li] == ():
                pdf = pdf + 1.0 / (4.0 * M.pif)
            else:
                w, h = meta.env_sizes[li]
                env = lights.light_env[li]
                frame = scene.env_frame[jnp.clip(
                    env, 0, scene.env_frame.shape[0] - 1)]
                wl = M.transform_direction(
                    M.inverse_frame(frame), direction)
                tx = jnp.arctan2(wl[..., 2], wl[..., 0]) / (2.0 * M.pif)
                tx = jnp.where(tx < 0.0, tx + 1.0, tx)
                ty = jnp.arccos(jnp.clip(wl[..., 1], -1.0, 1.0)) / M.pif
                i = jnp.clip((tx * w).astype(jnp.int32), 0, w - 1)
                j = jnp.clip((ty * h).astype(jnp.int32), 0, h - 1)
                start = lights.cdf_start[li]
                total = lights.cdf_total[li]
                prob = SMP.sample_discrete_pdf(
                    lights.cdf_flat, j * w + i, start) / total
                angle = (2.0 * M.pif / w) * (M.pif / h) * jnp.sin(
                    M.pif * (j.astype(jnp.float32) + 0.5) / h)
                pdf = pdf + prob / angle
        elif (li < len(meta.light_ranges)
              and meta.light_ranges[li] is not None
              and meta.light_ranges[li][2] <= 8192):
            # instance light, all-hits sweep: the reference walks the ray
            # through the light geometry summing d^2/(|n.d| area) per hit
            # (yocto_trace.cpp:400-415). Light elements are planar, so a ray
            # hits each at most once and the walk's sum over successive hits
            # equals a single vectorized sum over ALL elements hit — one
            # fused [R,E] pass instead of `pdf_walk` sequential rounds of
            # closest-hit + gather-heavy eval_position/eval_element_normal.
            handle, estart, ecount = meta.light_ranges[li]
            area = lights.cdf_total[li]
            inv = scene.inst_inv_frame[handle]          # [4,3]
            frame = scene.inst_frame[handle]            # [4,3]
            lo = (position[:, 0:1] * inv[0] + position[:, 1:2] * inv[1]
                  + position[:, 2:3] * inv[2] + inv[3])          # [R,3]
            ld = (direction[:, 0:1] * inv[0] + direction[:, 1:2] * inv[1]
                  + direction[:, 2:3] * inv[2])
            verts = scene.elements[estart:estart + ecount]       # [E,4]
            p = scene.positions[verts]                           # [E,4,3]
            p0, p1, p2, p3 = p[:, 0], p[:, 1], p[:, 2], p[:, 3]
            tmin_b = jnp.broadcast_to(RAY_EPS, (R, ecount))
            tmax_b = jnp.broadcast_to(M.flt_max, (R, ecount))
            isec = G.intersect_quad(lo[:, None], ld[:, None], tmin_b,
                                    tmax_b, p0[None], p1[None], p2[None],
                                    p3[None])                    # [R,E]
            # local hit position via the same quad interpolation as
            # eval_position (sceneval._interp), then the world transform
            u = isec.uv[..., 0:1]
            v = isec.uv[..., 1:2]
            lower = (isec.uv[..., 0] + isec.uv[..., 1]) <= 1.0
            tri_a = (p0[None] * (1.0 - u - v) + p1[None] * u
                     + p3[None] * v)
            iu, iv = 1.0 - u, 1.0 - v
            tri_b = (p2[None] * (1.0 - iu - iv) + p3[None] * iu
                     + p1[None] * iv)
            local = jnp.where(lower[..., None], tri_a, tri_b)    # [R,E,3]
            lposition = M.transform_point(frame, local)
            # element normals ([E,3]), same arithmetic as eval_element_normal
            n_a = M.normalize(M.cross(p1 - p0, p3 - p0))
            n_b = M.normalize(M.cross(p3 - p2, p1 - p2))
            lnormal = M.transform_normal(frame, M.normalize(n_a + n_b))
            d2 = M.distance_squared(lposition, position[:, None])
            denom = jnp.abs(M.dot(lnormal[None], direction[:, None])) * area
            safe = jnp.where(denom == 0.0, 1.0, denom)
            contrib = jnp.where(isec.hit & (denom != 0.0), d2 / safe, 0.0)
            pdf = pdf + contrib.sum(-1)
        else:
            # huge light: bounded sequential walk fallback
            area = lights.cdf_total[li]
            lpdf = jnp.zeros(R, jnp.float32)
            next_pos = position
            active = jnp.ones(R, bool)
            inst_b = jnp.broadcast_to(inst_id, (R,))
            for _ in range(pdf_walk):
                isec = intersect_instance_elements(
                    scene, inst_b, next_pos, direction,
                    meta.max_light_elems)
                hit = isec.hit & active
                shape = scene.inst_shape[inst_b]
                gelem = scene.shape_elem_start[shape] + jnp.maximum(
                    isec.element, 0)
                lposition = eval_position(scene, inst_b, gelem, isec.uv)
                lnormal = eval_element_normal(scene, inst_b, gelem)
                d2 = M.distance_squared(lposition, position)
                denom = jnp.abs(M.dot(lnormal, direction)) * area
                safe = jnp.where(denom == 0.0, 1.0, denom)
                contrib = jnp.where(hit & (denom != 0.0), d2 / safe, 0.0)
                lpdf = lpdf + contrib
                next_pos = jnp.where(hit[..., None],
                                     lposition + direction * 1e-3, next_pos)
                active = hit
            pdf = pdf + lpdf
    if meta.n_lights > 0:
        pdf = pdf * (1.0 / meta.n_lights)
    return pdf
