"""Fused Pallas path-tracing megakernel for small scenes.

For Cornell-class scenes (<=512 elements; matte/glossy/reflective rough
lobes plus delta mirror/transparent/refractive lobes with zero-density
interiors; smooth or faceted shading; no textures; area lights and
constant-color textureless environments) the entire 8-bounce
`trace_path` estimator runs
in ONE kernel: rays, PCG32 state, weights, and radiance live in vector
registers; candidates, materials, and light geometry are compile-time
immediates. The only HBM traffic is camera rays + RNG in, radiance +
AOVs + RNG out — against ~50 separate XLA kernels per bounce for the
lockstep sampler. This is the speed-of-light configuration of
SURVEY.md §7 step 6 for the benchmark workload (BASELINE.json
config 1/2).

Semantics: the same draw sites in the same order as the lockstep path
sampler specialized to these feature sets (r_choice, rn2, rnl, ruv,
rel, rl, r_rr per bounce, all mask-guarded), the same closest-hit rule,
the same GGX lobes (yocto_shading.h:409-731 formulas), the same MIS
weights and Russian roulette — so per-pixel streams continue the
lockstep state exactly. Two intentional float-precision deviations:
the shading point is origin + t*direction rather than barycentric
interpolation, and the microfacet angle uses the algebraic identity
cos(arctan(x)) = 1/sqrt(1+x^2) instead of arctan+cos (equal
mathematically, a few ulps apart), so images match the lockstep
renderer to float precision rather than bitwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.scene import MaterialType, SceneData
from ..ops import mathops as M
from ..ops import rng as R
from .compile import SceneFeatures
from .intersect import RAY_EPS
from .pallas_intersect import _host_candidates, _tri_isect

LANE = 128
ROWS = 64  # ray rows per grid program


def supports_pallas_path(scene: SceneData, features: SceneFeatures,
                         params) -> bool:
    """Host-side qualification for the fused kernel."""
    from .params import SamplerType
    from .sceneval import MIN_ROUGHNESS
    if params.sampler not in (SamplerType.path, SamplerType.pathtest):
        return False
    if params.nocaustics or params.tentfilter:
        return False
    if not set(features.mat_types) <= {int(MaterialType.matte),
                                       int(MaterialType.glossy),
                                       int(MaterialType.reflective),
                                       int(MaterialType.transparent),
                                       int(MaterialType.refractive)}:
        return False
    if (features.has_opacity
            or features.has_emission_tex or features.has_color_tex
            or features.has_roughness_tex or features.has_scattering_tex
            or features.has_normal_tex or features.has_shape_colors):
        return False
    for mat in scene.materials:
        ty = int(mat.type)
        r2 = float(np.float32(mat.roughness) ** 2)
        if ty in (int(MaterialType.transparent),
                  int(MaterialType.refractive)) and r2 >= MIN_ROUGHNESS:
            return False  # rough dielectrics fall back to the samplers
        if ty == int(MaterialType.refractive):
            # the kernel's volume machinery is the RNG-parity reduction
            # for ZERO-density dielectrics (density = -log(clamp(color,
            # 1e-4, 1))/trdepth == 0 iff color >= 1, sceneval.py:376-379)
            if np.any(np.asarray(mat.color, np.float32) < 1.0):
                return False
            if np.any(np.asarray(mat.scattering, np.float32) != 0.0):
                return False
            if abs(float(mat.ior) - 1.0) < 1e-3:
                return False  # passthrough-ior branch not in the kernel
    if any(k not in (2, 3) for k in features.kinds):
        return False
    from ..models.scene import INVALID
    for env in scene.environments:
        # constant-color environments only: emission is a compile-time
        # immediate and sample_lights reduces to sample_sphere
        # (lights.py:218); textured envs fall back to the samplers
        if env.emission_tex != INVALID:
            return False
    ncand = 0
    for inst in scene.instances:
        shape = scene.shapes[inst.shape]
        ncand += max(len(shape.triangles), len(shape.quads))
    if ncand == 0 or ncand > 512:
        return False
    # light inventory: emissive instances with tri/quad geometry
    nlights = 0
    for inst in scene.instances:
        mat = scene.materials[inst.material]
        if np.any(np.asarray(mat.emission) != 0):
            shape = scene.shapes[inst.shape]
            ne = max(len(shape.triangles), len(shape.quads))
            if ne == 0 or ne > 8:
                return False
            nlights += 1
    for env in scene.environments:
        if np.any(np.asarray(env.emission) != 0):
            nlights += 1  # env lights join the uniform light pick
    return 1 <= nlights <= 4


def _element_normal_world(corners):
    """eval_element_normal arithmetic on one element's world corners."""
    p0, p1, p2, p3 = [np.asarray(c, np.float64) for c in corners]

    def nrm(v):
        n = np.linalg.norm(v)
        return v / n if n != 0 else v

    n_a = nrm(np.cross(p1 - p0, p3 - p0))
    n_b = nrm(np.cross(p3 - p2, p1 - p2))
    return nrm(n_a + n_b).astype(np.float32)


def _host_scene_tables(scene: SceneData):
    """Baked per-candidate shading data + light tables (world space)."""
    cands = _host_candidates(scene)
    # world corners + per-candidate normal/color/emission
    for c in cands:
        inst = scene.instances[c["inst"]]
        frame = np.asarray(inst.frame, np.float32)
        world = [list(np.asarray(p, np.float32) @ frame[:3] + frame[3])
                 for p in c["p"]]
        c["pw"] = world
        c["normal"] = [float(x) for x in _element_normal_world(world)]
        shape = scene.shapes[inst.shape]
        if len(shape.normals):
            # world-rotated UNNORMALIZED corner normals: normalize once
            # after interpolation+selection in-kernel — a linear map
            # commutes with normalization, so this equals the lockstep's
            # transform_normal(frame, normalize(interp)) (sceneval.py:198)
            nrm = np.asarray(shape.normals, np.float32)
            c["vn"] = [[float(x) for x in nrm[c["vi"][k]] @ frame[:3]]
                       for k in range(4)]
        else:
            c["vn"] = None  # faceted: kernel falls back to c["normal"]
        mat = scene.materials[inst.material]
        c["color"] = [float(x) for x in np.asarray(mat.color, np.float32)]
        c["emission"] = [float(x)
                         for x in np.asarray(mat.emission, np.float32)]
        # eval_material's processed scalars (sceneval.py:353-389, no
        # textures): roughness squared then type-dependent clamping
        from .sceneval import MIN_ROUGHNESS
        ty = int(mat.type)
        r2 = float(np.float32(mat.roughness) * np.float32(mat.roughness))
        if ty in (int(MaterialType.matte), int(MaterialType.glossy),
                  int(MaterialType.gltfpbr)):
            r2 = min(max(r2, MIN_ROUGHNESS), 1.0)
        elif r2 < MIN_ROUGHNESS:
            r2 = 0.0
        c["ty"] = float(ty)
        c["rough"] = r2
        c["ior"] = float(mat.ior)
        # identity instances keep inv=None from _host_candidates; general
        # frames were already handled there

    lights = []
    for gi, inst in enumerate(scene.instances):
        mat = scene.materials[inst.material]
        if not np.any(np.asarray(mat.emission) != 0):
            continue
        shape = scene.shapes[inst.shape]
        frame = np.asarray(inst.frame, np.float32)
        if len(shape.triangles):
            tris = np.asarray(shape.triangles, np.int64)
            verts = np.concatenate([tris, tris[:, 2:3]], 1)
            is_tri = True
        else:
            verts = np.asarray(shape.quads, np.int64)
            is_tri = False
        pos = np.asarray(shape.positions, np.float32)
        elems = []
        areas = []
        for row in verts:
            corners = [list(pos[v] @ frame[:3] + frame[3]) for v in row]
            p0, p1, p2, p3 = [np.asarray(c, np.float64) for c in corners]
            if is_tri:
                area = 0.5 * np.linalg.norm(np.cross(p1 - p0, p3 - p0))
            else:
                area = (0.5 * np.linalg.norm(np.cross(p1 - p0, p3 - p0))
                        + 0.5 * np.linalg.norm(np.cross(p3 - p2, p1 - p2)))
            areas.append(float(area))
            elems.append({
                "pw": corners,
                "normal": [float(x) for x in _element_normal_world(corners)],
            })
        cdf = np.cumsum(areas, dtype=np.float64)
        lights.append({
            "is_tri": is_tri, "elems": elems,
            "cdf": [float(x) for x in cdf],
            "area_total": float(cdf[-1]),
        })
    return cands, lights


def _interp_quad(c, u, v):
    """sceneval._interp split-quad interpolation on baked corners."""
    p0, p1, p2, p3 = c["pw"]
    lower = (u + v) <= 1.0
    out = []
    iu, iv = 1.0 - u, 1.0 - v
    for a in range(3):
        tri_a = p0[a] * (1.0 - u - v) + p1[a] * u + p3[a] * v
        tri_b = p2[a] * (1.0 - iu - iv) + p3[a] * iu + p1[a] * iv
        out.append(jnp.where(lower, tri_a, tri_b))
    return out


def _normalize3(x, y, z):
    d = x * x + y * y + z * z
    inv = 1.0 / jnp.sqrt(jnp.where(d == 0.0, 1.0, d))
    inv = jnp.where(d == 0.0, 1.0, inv)
    return x * inv, y * inv, z * inv


def _onb_mul(nx, ny, nz, lx, ly, lz):
    """Local -> world through the Pixar ONB of n (mathops.basis_fromz)."""
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    bx0, bx1, bx2 = 1.0 + sign * nx * nx * a, sign * b, -sign * nx
    by0, by1, by2 = b, sign + ny * ny * a, -ny
    return (lx * bx0 + ly * by0 + lz * nx,
            lx * bx1 + ly * by1 + lz * ny,
            lx * bx2 + ly * by2 + lz * nz)


def _cosine_dir(nx, ny, nz, r1, r2):
    """sample_hemisphere_cos with the Pixar ONB (mathops.basis_fromz)."""
    z = jnp.sqrt(r2)
    r = jnp.sqrt(1.0 - z * z)
    phi = 2.0 * M.pif * r1
    return _onb_mul(nx, ny, nz, r * jnp.cos(phi), r * jnp.sin(phi), z)


def _microfacet_dir(rough, nx, ny, nz, r1, r2):
    """sample_microfacet NDF halfway (yocto_shading.h:457-472, GGX) with
    cos(arctan(x)) = 1/sqrt(1+x^2) in place of arctan+cos/sin."""
    phi = 2.0 * M.pif * r1
    denom = jnp.maximum(1.0 - r2, 1e-20)
    t = rough * jnp.sqrt(r2 / denom)
    ct = 1.0 / jnp.sqrt(1.0 + t * t)
    st = t * ct
    return _onb_mul(nx, ny, nz, jnp.cos(phi) * st, jnp.sin(phi) * st, ct)


def _fresnel_dielectric_p(eta, cosw):
    """fresnel_dielectric on |cos| planes (yocto_shading.h:105-135)."""
    cosw = jnp.abs(cosw)
    sin2 = 1.0 - cosw * cosw
    eta2 = eta * eta
    cos2t = 1.0 - sin2 / eta2
    t0 = jnp.sqrt(jnp.maximum(cos2t, 0.0))
    t1 = eta * t0
    t2 = eta * cosw
    rs = (cosw - t1) / (cosw + t1)
    rp = (t0 - t2) / (t0 + t2)
    f = (rs * rs + rp * rp) / 2.0
    return jnp.where(cos2t < 0.0, 1.0, f)


def _fresnel_conductor_p(eta, cosw):
    """fresnel_conductor with etak=0 on planes (yocto_shading.h:137-169;
    reflectivity_to_eta path of eval_reflective)."""
    valid = cosw > 0.0
    cosw = jnp.clip(cosw, -1.0, 1.0)
    cos2 = cosw * cosw
    sin2 = jnp.clip(1.0 - cos2, 0.0, 1.0)
    eta2 = eta * eta
    t0 = eta2 - sin2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0, 0.0))
    t1 = a2b2 + cos2
    a = jnp.sqrt(jnp.maximum((a2b2 + t0) / 2.0, 0.0))
    t2 = 2.0 * a * cosw
    rs = (t1 - t2) / (t1 + t2)
    t3 = cos2 * a2b2 + sin2 * sin2
    t4 = t2 * sin2
    rp = rs * (t3 - t4) / (t3 + t4)
    return jnp.where(valid, (rp + rs) / 2.0, 0.0)


def _ggx_d(rough, coshn):
    """microfacet_distribution (GGX, yocto_shading.h:118-127)."""
    r2 = rough * rough
    c2 = coshn * coshn
    d = r2 / (M.pif * (c2 * r2 + 1.0 - c2) ** 2)
    return jnp.where(coshn <= 0.0, 0.0, d)


def _ggx_g1(rough, cosn, cosh):
    """microfacet_shadowing1 (GGX, yocto_shading.h:129-144)."""
    r2 = rough * rough
    c2 = cosn * cosn
    g = 2.0 * jnp.abs(cosn) / (
        jnp.abs(cosn) + jnp.sqrt(jnp.maximum(c2 - r2 * c2 + r2, 0.0)))
    return jnp.where(cosn * cosh <= 0.0, 0.0, g)


def make_pallas_path_sampler(scene: SceneData, params, interpret=None,
                             spp_inner: int = 0):
    """Returns run(ro, rd, rngs) -> (radiance, hit, albedo, normal, rngs)
    matching the lockstep sampler interface, or None if unsupported.

    With `spp_inner` = k > 0 the returned callable is instead
    step(i, j, rngs) -> (img_sum [N,4], albedo_sum, normal_sum,
    hits_sum, rngs): the kernel generates its own camera rays and runs k
    FULL samples per pixel in ONE launch, chaining the per-pixel PCG32
    streams exactly as k sequential lockstep samples would (camera luv
    then puv draws first, yocto_trace.cpp:1465-1467 order) and applying
    the per-sample clamp + NaN scrub (yocto_trace.cpp:1471-1475) before
    summing. One dispatch instead of k: the host->device enqueue
    (~1 ms through this tunnel) stops bounding throughput."""
    cands, lights = _host_scene_tables(scene)
    # constant-color environments (qualification rejects textured ones):
    # the miss emission is the compile-time sum over all envs
    # (eval_environment, sceneval.py:474), and each nonzero-emission env
    # is one uniform-sphere entry in the light inventory (lights.py:98)
    # accumulate in float32 in eval_environment's sequential order so the
    # multi-env miss radiance matches the lockstep sampler bit-for-bit
    env_total = np.zeros(3, np.float32)
    n_env_lights = 0
    for env in scene.environments:
        em = np.asarray(env.emission, np.float32)
        env_total = (env_total + em).astype(np.float32)
        if np.any(em != 0):
            n_env_lights += 1
    has_env = bool(np.any(env_total != 0))
    envhidden = bool(params.envhidden)
    nlights = len(lights) + n_env_lights
    bounces = int(params.bounces)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    # static lobe inventory: lobes no candidate can select are not traced
    # (mirrors SceneFeatures.mat_types specialization in trace/bsdf.py)
    has_matte = any(c["ty"] == float(MaterialType.matte) for c in cands)
    has_glossy = any(c["ty"] == float(MaterialType.glossy) for c in cands)
    has_refl = any(c["ty"] == float(MaterialType.reflective)
                   and c["rough"] > 0.0 for c in cands)
    has_spec = has_glossy or has_refl
    # delta lobes (rough==0 after eval_material clamping): mirror the
    # lockstep sampler's delta branch (pathtrace.py:269-287)
    has_refl_d = any(c["ty"] == float(MaterialType.reflective)
                     and c["rough"] == 0.0 for c in cands)
    has_transp = any(c["ty"] == float(MaterialType.transparent)
                     for c in cands)
    has_refr = any(c["ty"] == float(MaterialType.refractive)
                   for c in cands)
    has_delta = has_refl_d or has_transp or has_refr
    # refractive instances are volumetric (sceneval.py:407-412); the
    # qualified set is zero-density, so the volume machinery reduces to
    # the two transmittance draws + a depth-parity toggle
    has_vol = has_refr
    need_mat = has_spec or has_delta
    # smooth shading: candidates with vertex normals interpolate at test
    # time (3-plane carry); faceted scenes keep the constant-normal path
    has_vn = any(c["vn"] is not None for c in cands)

    def closest_hit(rox, roy, roz, rdx, rdy, rdz):
        """Baked-candidate sweep -> per-lane best hit + shading data."""
        inf = M.flt_max
        bt = jnp.full(rox.shape, inf, jnp.float32)
        bhit = jnp.zeros(rox.shape, jnp.bool_)
        attrs = {k: [jnp.zeros(rox.shape, jnp.float32) for _ in range(3)]
                 for k in ("n", "col", "em")}
        if need_mat:
            attrs["ty"] = [jnp.full(rox.shape, -1.0, jnp.float32)]
            attrs["rough"] = [jnp.zeros(rox.shape, jnp.float32)]
            attrs["ior"] = [jnp.ones(rox.shape, jnp.float32)]
        tmin = jnp.full(rox.shape, float(RAY_EPS), jnp.float32)
        tmax = jnp.full(rox.shape, inf, jnp.float32)
        for c in cands:
            p = c["pw"]
            h1, u1, v1, t1 = _tri_isect(
                rox, roy, roz, rdx, rdy, rdz, tmin, tmax,
                p[0][0], p[0][1], p[0][2], p[1][0], p[1][1], p[1][2],
                p[3][0], p[3][1], p[3][2])
            if c["kind"] == 3 and not c["degenerate"]:
                h2, u2, v2, t2 = _tri_isect(
                    rox, roy, roz, rdx, rdy, rdz, tmin, tmax,
                    p[2][0], p[2][1], p[2][2], p[3][0], p[3][1], p[3][2],
                    p[1][0], p[1][1], p[1][2])
                t1m = jnp.where(h1, t1, inf)
                t2m = jnp.where(h2, t2, inf)
                hit = (h1 | h2)
                t = jnp.minimum(t1m, t2m)
                if c["vn"] is not None:
                    take1 = t1m < t2m
                    uu = jnp.where(take1, u1, 1.0 - u2)
                    vv = jnp.where(take1, v1, 1.0 - v2)
            else:
                hit = h1
                t = jnp.where(h1, t1, inf)
                uu, vv = u1, v1
            if c["vn"] is not None:
                # split-quad interpolation of the world-rotated corner
                # normals (sceneval._interp); triangles pack n2 == n3 and
                # their uv satisfies u+v <= 1, so the lower branch is
                # exactly the triangle interp
                n0, n1c, n2c, n3c = c["vn"]
                lower = (uu + vv) <= 1.0
                iu = 1.0 - uu
                iv = 1.0 - vv
                nsel = [
                    jnp.where(lower,
                              n0[a] * (1.0 - uu - vv) + n1c[a] * uu
                              + n3c[a] * vv,
                              n2c[a] * (1.0 - iu - iv) + n3c[a] * iu
                              + n1c[a] * iv)
                    for a in range(3)]
            else:
                nsel = c["normal"]
            better = t < bt
            # boolean select via logical ops (Mosaic lacks i1 select)
            bhit = (better & hit) | (~better & bhit)
            bt = jnp.where(better, t, bt)
            sel = [("n", nsel), ("col", c["color"]),
                   ("em", c["emission"])]
            if need_mat:
                sel += [("ty", [c["ty"]]), ("rough", [c["rough"]]),
                        ("ior", [c["ior"]])]
            for key, src in sel:
                attrs[key] = [jnp.where(better, src[a], attrs[key][a])
                              for a in range(len(src))]
        if has_vn:
            # one normalize after selection == transform_normal(frame,
            # normalize(interp)) per candidate (linear maps commute with
            # normalization); misses keep n == 0
            attrs["n"] = list(_normalize3(*attrs["n"]))
        return bhit, bt, attrs

    def light_pdf(px, py, pz, dx, dy, dz):
        """sample_lights_pdf all-hits sweep on baked light geometry."""
        tmin = jnp.full(px.shape, float(RAY_EPS), jnp.float32)
        tmax = jnp.full(px.shape, M.flt_max, jnp.float32)
        pdf = jnp.zeros(px.shape, jnp.float32)
        for li in lights:
            area = li["area_total"]
            lpdf = jnp.zeros(px.shape, jnp.float32)
            for e in li["elems"]:
                p = e["pw"]
                h1, _, _, t1 = _tri_isect(
                    px, py, pz, dx, dy, dz, tmin, tmax,
                    p[0][0], p[0][1], p[0][2], p[1][0], p[1][1], p[1][2],
                    p[3][0], p[3][1], p[3][2])
                if not li["is_tri"]:
                    h2, _, _, t2 = _tri_isect(
                        px, py, pz, dx, dy, dz, tmin, tmax,
                        p[2][0], p[2][1], p[2][2], p[3][0], p[3][1],
                        p[3][2], p[1][0], p[1][1], p[1][2])
                    hit = h1 | h2
                    t = jnp.where(h1, t1, jnp.where(h2, t2, 0.0))
                else:
                    hit = h1
                    t = jnp.where(h1, t1, 0.0)
                nx, ny, nz = e["normal"]
                denom = jnp.abs(nx * dx + ny * dy + nz * dz) * area
                ok = hit & (denom != 0.0)
                lpdf = lpdf + jnp.where(
                    ok, t * t / jnp.where(denom == 0.0, 1.0, denom), 0.0)
            pdf = pdf + lpdf
        if n_env_lights:
            # textureless env: sample_sphere pdf (sample_lights_pdf,
            # lights.py:256)
            pdf = pdf + n_env_lights / (4.0 * M.pif)
        return pdf / nlights

    def sample_light_dir(px, py, pz, rl, rel, ru, rv):
        """sample_lights on baked light tables (uniform light -> CDF
        element -> point); returns a unit direction."""
        lid = jnp.clip((rl * nlights).astype(jnp.int32), 0, nlights - 1)
        lx = jnp.zeros(px.shape, jnp.float32)
        ly = jnp.zeros(px.shape, jnp.float32)
        lz = jnp.zeros(px.shape, jnp.float32)
        for i, li in enumerate(lights):
            cdf = li["cdf"]
            total = li["area_total"]
            target = rel * total
            # unrolled upper_bound over the per-element CDF
            eidx = jnp.zeros(px.shape, jnp.int32)
            for k in range(len(cdf) - 1):
                eidx = jnp.where(target >= cdf[k], k + 1, eidx)
            if li["is_tri"]:
                s = jnp.sqrt(ru)
                u = 1.0 - s
                v = rv * s
            else:
                u, v = ru, rv
            ex = jnp.zeros(px.shape, jnp.float32)
            ey = jnp.zeros(px.shape, jnp.float32)
            ez = jnp.zeros(px.shape, jnp.float32)
            for k, e in enumerate(li["elems"]):
                qx, qy, qz = _interp_quad(e, u, v)
                sel = eidx == k
                ex = jnp.where(sel, qx, ex)
                ey = jnp.where(sel, qy, ey)
                ez = jnp.where(sel, qz, ez)
            sel_l = lid == i
            lx = jnp.where(sel_l, ex, lx)
            ly = jnp.where(sel_l, ey, ly)
            lz = jnp.where(sel_l, ez, lz)
        dx, dy, dz = _normalize3(lx - px, ly - py, lz - pz)
        if n_env_lights:
            # env light pick: sample_sphere(ruv) (lights.py:218) — the
            # rel draw is consumed but unused, like the reference; all
            # env entries sit after the instance lights (lights.py:98)
            z = 2.0 * rv - 1.0
            r = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
            phi = 2.0 * M.pif * ru
            is_env = lid >= len(lights)
            dx = jnp.where(is_env, r * jnp.cos(phi), dx)
            dy = jnp.where(is_env, r * jnp.sin(phi), dy)
            dz = jnp.where(is_env, z, dz)
        return dx, dy, dz

    def trace_paths(rox, roy, roz, rdx, rdy, rdz, rng):
        """The full bounce loop on [rows, LANE] planes; returns
        (lr, lg, lb, first_hit, aov, rng). Shared by the one-sample
        kernel (camera rays as inputs) and the multi-sample kernel
        (camera rays generated in-kernel per sample)."""
        shape = rox.shape
        wr = jnp.ones(shape, jnp.float32)
        wg = jnp.ones(shape, jnp.float32)
        wb = jnp.ones(shape, jnp.float32)
        lr = jnp.zeros(shape, jnp.float32)
        lg = jnp.zeros(shape, jnp.float32)
        lb = jnp.zeros(shape, jnp.float32)
        alive = jnp.ones(shape, jnp.bool_)
        first_hit = jnp.zeros(shape, jnp.bool_)
        if has_vol:
            # depth of the per-lane volume stack; push only at depth 0 and
            # pop otherwise (yocto_trace.cpp:544-553), so it toggles 0<->1
            in_vol = jnp.zeros(shape, jnp.bool_)
        aov = {k: jnp.zeros(shape, jnp.float32)
               for k in ("ar", "ag", "ab", "nx", "ny", "nz")}

        for bounce in range(bounces):
            hit, t, attrs = closest_hit(rox, roy, roz, rdx, rdy, rdz)
            shade = alive & hit
            if has_env and (bounce > 0 or not envhidden):
                # miss: constant environment then terminate
                # (pathtrace.py:148-158)
                miss = alive & ~hit
                lr = jnp.where(miss, lr + wr * float(env_total[0]), lr)
                lg = jnp.where(miss, lg + wg * float(env_total[1]), lg)
                lb = jnp.where(miss, lb + wb * float(env_total[2]), lb)
            alive = shade

            if has_vol:
                # transmittance draws (pathtrace.py:164-181): qualified
                # scenes are zero-density, so tdist == distance and
                # trans == pdf == 1 — only the two draws (distance rand
                # then channel rand) advance the lane streams
                in_stack = shade & in_vol
                _rtr, rng = R.rand1f_if(rng, in_stack)
                _rtr, rng = R.rand1f_if(rng, in_stack)

            px = rox + rdx * t
            py = roy + rdy * t
            pz = roz + rdz * t
            ox, oy, oz = -rdx, -rdy, -rdz
            nx, ny, nz = attrs["n"]
            if need_mat:
                ty = attrs["ty"][0]
                rough = attrs["rough"][0]
                ior = attrs["ior"][0]
            # facing flip (eval_shading_normal); refractive keeps the
            # geometric orientation (sceneval.py:288-293)
            ndo = nx * ox + ny * oy + nz * oz
            flipn = ndo < 0.0
            if has_refr:
                is_rf = ty == float(MaterialType.refractive)
                flipn = flipn & ~is_rf
            nx = jnp.where(flipn, -nx, nx)
            ny = jnp.where(flipn, -ny, ny)
            nz = jnp.where(flipn, -nz, nz)

            if bounce == 0:
                first_hit = shade
                aov = dict(ar=attrs["col"][0], ag=attrs["col"][1],
                           ab=attrs["col"][2], nx=nx, ny=ny, nz=nz)

            # emission (facing test on the flipped normal like eval_emission)
            facing = (nx * ox + ny * oy + nz * oz) >= 0.0
            emit = shade & facing
            lr = jnp.where(emit, lr + wr * attrs["em"][0], lr)
            lg = jnp.where(emit, lg + wg * attrs["em"][1], lg)
            lb = jnp.where(emit, lb + wb * attrs["em"][2], lb)

            # next direction: 50/50 BSDF/light one-sample MIS on rough
            # lanes; delta lanes branch below (pathtrace.py:234-287)
            if has_delta:
                is_delta = jnp.zeros(shape, jnp.bool_)
                if has_refl_d:
                    is_delta = is_delta | (
                        (ty == float(MaterialType.reflective))
                        & (rough == 0.0))
                if has_transp:
                    is_delta = is_delta | (
                        ty == float(MaterialType.transparent))
                if has_refr:
                    is_delta = is_delta | is_rf
                nd = shade & ~is_delta
            else:
                nd = shade
            r_choice, rng = R.rand1f_if(rng, nd)
            use_bsdf = r_choice < 0.5
            rb1, rng = R.rand1f_if(rng, nd & use_bsdf)
            rb2, rng = R.rand1f_if(rng, nd & use_bsdf)
            rnl, rng = R.rand1f_if(rng, nd & use_bsdf)
            cr, cg, cb = attrs["col"]
            if has_spec:
                is_g = ty == float(MaterialType.glossy)
                is_r = ty == float(MaterialType.reflective)
                ndo_f = nx * ox + ny * oy + nz * oz
                # sample_microfacet + reflect (sample_glossy/reflective)
                hx, hy, hz = _microfacet_dir(rough, nx, ny, nz, rb1, rb2)
                doh = ox * hx + oy * hy + oz * hz
                sx = 2.0 * doh * hx - ox
                sy = 2.0 * doh * hy - oy
                sz = 2.0 * doh * hz - oz
                spec_ok = ndo_f * (nx * sx + ny * sy + nz * sz) > 0.0
                if has_glossy:
                    F1 = _fresnel_dielectric_p(ior, ndo_f)
                    take_spec = is_r | (is_g & (rnl < F1))
                else:
                    take_spec = is_r
                if has_matte or has_glossy:
                    cxd, cyd, czd = _cosine_dir(nx, ny, nz, rb1, rb2)
                    bx = jnp.where(take_spec, sx, cxd)
                    by = jnp.where(take_spec, sy, cyd)
                    bz = jnp.where(take_spec, sz, czd)
                else:
                    bx, by, bz = sx, sy, sz
                # specular pick landing under the surface samples zero
                sbad = take_spec & ~spec_ok
                bx = jnp.where(sbad, 0.0, bx)
                by = jnp.where(sbad, 0.0, by)
                bz = jnp.where(sbad, 0.0, bz)
            else:
                del rnl  # drawn for stream parity; matte ignores it
                bx, by, bz = _cosine_dir(nx, ny, nz, rb1, rb2)
            ru, rng = R.rand1f_if(rng, nd & ~use_bsdf)
            rv, rng = R.rand1f_if(rng, nd & ~use_bsdf)
            rel, rng = R.rand1f_if(rng, nd & ~use_bsdf)
            rl, rng = R.rand1f_if(rng, nd & ~use_bsdf)
            gx, gy, gz = sample_light_dir(px, py, pz, rl, rel, ru, rv)
            ix = jnp.where(use_bsdf, bx, gx)
            iy = jnp.where(use_bsdf, by, gy)
            iz = jnp.where(use_bsdf, bz, gz)

            zero_inc = (ix == 0.0) & (iy == 0.0) & (iz == 0.0)
            alive = alive & ~(nd & zero_inc)

            ndi = nx * ix + ny * iy + nz * iz
            ndo2 = nx * ox + ny * oy + nz * oz
            valid = (ndi * ndo2) > 0.0
            absndi = jnp.abs(ndi)
            # sample_hemisphere_cos_pdf on the flipped normal
            pdf_cos = jnp.where(ndi <= 0.0, 0.0, ndi / M.pif)
            ok = nd & ~zero_inc
            if not has_spec:
                # f = color/pi * |n.i| (eval_matte); pdf = cos/pi
                pdf_b = jnp.where(valid, pdf_cos, 0.0)
                pdf_l = light_pdf(px, py, pz, ix, iy, iz)
                pdf = 0.5 * pdf_b + 0.5 * pdf_l
                safe = jnp.where(pdf == 0.0, 1.0, pdf)
                fw = jnp.where(valid, absndi / M.pif, 0.0) / safe
                wr = jnp.where(ok, wr * cr * fw, wr)
                wg = jnp.where(ok, wg * cg * fw, wg)
                wb = jnp.where(ok, wb * cb * fw, wb)
            else:
                # shared GGX terms on the eval halfway (yocto_shading.h
                # eval_glossy/eval_reflective and their pdfs)
                ex, ey, ez = _normalize3(ix + ox, iy + oy, iz + oz)
                coshn = nx * ex + ny * ey + nz * ez
                cosho = ox * ex + oy * ey + oz * ez
                coshi = ix * ex + iy * ey + iz * ez
                D = _ggx_d(rough, coshn)
                G = (_ggx_g1(rough, ndo2, cosho)
                     * _ggx_g1(rough, ndi, coshi))
                denom = 4.0 * ndo2 * ndi
                safe_den = jnp.where(denom == 0.0, 1.0, denom)
                spec_term = D * G / safe_den * absndi
                mfp = jnp.where(coshn < 0.0, 0.0, D * coshn)
                abs_doh = jnp.abs(cosho)
                safe_doh = jnp.where(abs_doh == 0.0, 1.0, abs_doh)
                pdf_spec = mfp / (4.0 * safe_doh)

                f_r = jnp.zeros_like(cr)
                f_g = jnp.zeros_like(cr)
                f_b = jnp.zeros_like(cr)
                pdf_b = jnp.zeros_like(cr)
                if has_matte:
                    is_m = ty == float(MaterialType.matte)
                    lam = absndi / M.pif
                    f_r = jnp.where(is_m, cr * lam, f_r)
                    f_g = jnp.where(is_m, cg * lam, f_g)
                    f_b = jnp.where(is_m, cb * lam, f_b)
                    pdf_b = jnp.where(is_m, pdf_cos, pdf_b)
                if has_glossy:
                    Fh = _fresnel_dielectric_p(ior, coshi)
                    base = (1.0 - F1) / M.pif * absndi
                    spec_g = Fh * spec_term
                    f_r = jnp.where(is_g, cr * base + spec_g, f_r)
                    f_g = jnp.where(is_g, cg * base + spec_g, f_g)
                    f_b = jnp.where(is_g, cb * base + spec_g, f_b)
                    pdf_b = jnp.where(
                        is_g, F1 * pdf_spec + (1.0 - F1) * pdf_cos, pdf_b)
                if has_refl:
                    # fresnel_conductor(reflectivity_to_eta(color), 0)
                    def _eta(c):
                        rt = jnp.sqrt(jnp.clip(c, 0.0, 0.99))
                        return (1.0 + rt) / (1.0 - rt)
                    f_r = jnp.where(
                        is_r,
                        _fresnel_conductor_p(_eta(cr), coshi) * spec_term,
                        f_r)
                    f_g = jnp.where(
                        is_r,
                        _fresnel_conductor_p(_eta(cg), coshi) * spec_term,
                        f_g)
                    f_b = jnp.where(
                        is_r,
                        _fresnel_conductor_p(_eta(cb), coshi) * spec_term,
                        f_b)
                    pdf_b = jnp.where(is_r, pdf_spec, pdf_b)
                # each lobe eval returns 0 on invalid incoming, so ok
                # lanes with f == 0 die at the weight-sanity check below,
                # exactly like the lockstep sampler
                f_r = jnp.where(valid, f_r, 0.0)
                f_g = jnp.where(valid, f_g, 0.0)
                f_b = jnp.where(valid, f_b, 0.0)
                pdf_b = jnp.where(valid, pdf_b, 0.0)
                pdf_l = light_pdf(px, py, pz, ix, iy, iz)
                pdf = 0.5 * pdf_b + 0.5 * pdf_l
                safe = jnp.where(pdf == 0.0, 1.0, pdf)
                wr = jnp.where(ok, wr * f_r / safe, wr)
                wg = jnp.where(ok, wg * f_g / safe, wg)
                wb = jnp.where(ok, wb * f_b / safe, wb)

            if has_delta:
                # delta branch (pathtrace.py:269-287): one lobe rand,
                # BSDF-only continuation, weight *= eval_delta/pdf_delta
                dl = shade & is_delta
                r_dl, rng = R.rand1f_if(rng, dl)
                ndo_s = nx * ox + ny * oy + nz * oz
                # mirror about the shading normal (non-refractive lanes
                # have n facing outgoing, so up == n)
                mrx = 2.0 * ndo_s * nx - ox
                mry = 2.0 * ndo_s * ny - oy
                mrz = 2.0 * ndo_s * nz - oz
                dxv = jnp.zeros(shape, jnp.float32)
                dyv = jnp.zeros(shape, jnp.float32)
                dzv = jnp.zeros(shape, jnp.float32)
                fd_r = jnp.zeros(shape, jnp.float32)
                fd_g = jnp.zeros(shape, jnp.float32)
                fd_b = jnp.zeros(shape, jnp.float32)
                pdf_d = jnp.zeros(shape, jnp.float32)
                if has_refl_d:
                    # eval/sample_reflective_delta (yocto_shading.h:
                    # conductor mirror; fresnel on dot(up, outgoing))
                    is_rd = ((ty == float(MaterialType.reflective))
                             & (rough == 0.0))

                    def _ceta(c):
                        rt = jnp.sqrt(jnp.clip(c, 0.0, 0.99))
                        return (1.0 + rt) / (1.0 - rt)
                    mval = ndo_s * (nx * mrx + ny * mry + nz * mrz) > 0.0
                    fm_r = _fresnel_conductor_p(_ceta(cr), ndo_s)
                    fm_g = _fresnel_conductor_p(_ceta(cg), ndo_s)
                    fm_b = _fresnel_conductor_p(_ceta(cb), ndo_s)
                    zf = jnp.zeros(shape, jnp.float32)
                    dxv = jnp.where(is_rd, mrx, dxv)
                    dyv = jnp.where(is_rd, mry, dyv)
                    dzv = jnp.where(is_rd, mrz, dzv)
                    fd_r = jnp.where(is_rd, jnp.where(mval, fm_r, zf), fd_r)
                    fd_g = jnp.where(is_rd, jnp.where(mval, fm_g, zf), fd_g)
                    fd_b = jnp.where(is_rd, jnp.where(mval, fm_b, zf), fd_b)
                    pdf_d = jnp.where(is_rd & mval, 1.0, pdf_d)
                if has_transp:
                    # eval/sample_transparent_delta: fresnel-weighted
                    # mirror vs tinted passthrough (-outgoing)
                    is_tp = ty == float(MaterialType.transparent)
                    Ft = _fresnel_dielectric_p(ior, ndo_s)
                    take_r = r_dl < Ft
                    tix = jnp.where(take_r, mrx, -ox)
                    tiy = jnp.where(take_r, mry, -oy)
                    tiz = jnp.where(take_r, mrz, -oz)
                    rside = (ndo_s
                             * (nx * tix + ny * tiy + nz * tiz)) >= 0.0
                    fd1 = jnp.where(rside, Ft, 1.0 - Ft)
                    dxv = jnp.where(is_tp, tix, dxv)
                    dyv = jnp.where(is_tp, tiy, dyv)
                    dzv = jnp.where(is_tp, tiz, dzv)
                    fd_r = jnp.where(is_tp, jnp.where(rside, Ft,
                                                      cr * (1.0 - Ft)),
                                     fd_r)
                    fd_g = jnp.where(is_tp, jnp.where(rside, Ft,
                                                      cg * (1.0 - Ft)),
                                     fd_g)
                    fd_b = jnp.where(is_tp, jnp.where(rside, Ft,
                                                      cb * (1.0 - Ft)),
                                     fd_b)
                    pdf_d = jnp.where(is_tp, fd1, pdf_d)
                if has_refr:
                    # eval/sample_refractive_delta: side-dependent eta,
                    # fresnel-weighted mirror vs refraction about `up`
                    entering = ndo_s >= 0.0
                    rel = jnp.where(entering, ior, 1.0 / ior)
                    cos_uo = jnp.abs(ndo_s)
                    sgn = jnp.where(entering, 1.0, -1.0)
                    upx, upy, upz = sgn * nx, sgn * ny, sgn * nz
                    Frf = _fresnel_dielectric_p(rel, cos_uo)
                    take_r = r_dl < Frf
                    rrx = 2.0 * cos_uo * upx - ox
                    rry = 2.0 * cos_uo * upy - oy
                    rrz = 2.0 * cos_uo * upz - oz
                    inv_eta = 1.0 / rel
                    k = 1.0 + inv_eta * inv_eta * (cos_uo * cos_uo - 1.0)
                    tir = k < 0.0
                    coef = inv_eta * cos_uo - jnp.sqrt(jnp.maximum(k, 0.0))
                    fx = -ox * inv_eta + coef * upx
                    fy = -oy * inv_eta + coef * upy
                    fz = -oz * inv_eta + coef * upz
                    fx = jnp.where(tir, 0.0, fx)
                    fy = jnp.where(tir, 0.0, fy)
                    fz = jnp.where(tir, 0.0, fz)
                    gix = jnp.where(take_r, rrx, fx)
                    giy = jnp.where(take_r, rry, fy)
                    giz = jnp.where(take_r, rrz, fz)
                    rside = (ndo_s
                             * (nx * gix + ny * giy + nz * giz)) >= 0.0
                    fg = jnp.where(rside, Frf,
                                   (1.0 - Frf) / (rel * rel))
                    pg = jnp.where(rside, Frf, 1.0 - Frf)
                    dxv = jnp.where(is_rf, gix, dxv)
                    dyv = jnp.where(is_rf, giy, dyv)
                    dzv = jnp.where(is_rf, giz, dzv)
                    fd_r = jnp.where(is_rf, fg, fd_r)
                    fd_g = jnp.where(is_rf, fg, fd_g)
                    fd_b = jnp.where(is_rf, fg, fd_b)
                    pdf_d = jnp.where(is_rf, pg, pdf_d)
                d_zero = dl & (dxv == 0.0) & (dyv == 0.0) & (dzv == 0.0)
                dl_ok = dl & ~d_zero
                safe_d = jnp.where(pdf_d == 0.0, 1.0, pdf_d)
                wr = jnp.where(dl_ok, wr * fd_r / safe_d, wr)
                wg = jnp.where(dl_ok, wg * fd_g / safe_d, wg)
                wb = jnp.where(dl_ok, wb * fd_b / safe_d, wb)
                ix = jnp.where(is_delta, dxv, ix)
                iy = jnp.where(is_delta, dyv, iy)
                iz = jnp.where(is_delta, dzv, iz)
                alive = alive & ~d_zero

            if has_vol:
                # volume-stack toggle on refractive crossing
                # (pathtrace.py:290-300; push only at depth 0, pop above)
                crossed = ((nx * ox + ny * oy + nz * oz)
                           * (nx * ix + ny * iy + nz * iz)) < 0.0
                vchg = shade & alive & crossed & is_rf
                in_vol = (vchg & ~in_vol) | (~vchg & in_vol)

            # weight sanity
            wzero = (wr == 0.0) & (wg == 0.0) & (wb == 0.0)
            wfin = (jnp.isfinite(wr) & jnp.isfinite(wg) & jnp.isfinite(wb))
            alive = alive & ~(shade & (wzero | ~wfin))

            # Russian roulette (bounce > 3), prob = min(.99, max weight)
            if bounce > 3:
                rr = shade & alive
                rr_prob = jnp.minimum(
                    jnp.float32(0.99),
                    jnp.maximum(wr, jnp.maximum(wg, wb)))
                r_rr, rng = R.rand1f_if(rng, rr)
                die = rr & (r_rr >= rr_prob)
                keep = rr & ~die
                inv = 1.0 / jnp.where(rr_prob == 0.0, 1.0, rr_prob)
                wr = jnp.where(keep, wr * inv, wr)
                wg = jnp.where(keep, wg * inv, wg)
                wb = jnp.where(keep, wb * inv, wb)
                alive = alive & ~die

            rox = jnp.where(shade, px, rox)
            roy = jnp.where(shade, py, roy)
            roz = jnp.where(shade, pz, roz)
            rdx = jnp.where(shade, ix, rdx)
            rdy = jnp.where(shade, iy, rdy)
            rdz = jnp.where(shade, iz, rdz)

        return lr, lg, lb, first_hit, aov, rng

    def kernel(rox_r, roy_r, roz_r, rdx_r, rdy_r, rdz_r,
               sh_r, sl_r, ih_r, il_r,
               rr_r, rg_r, rb_r, hit_r, ar_r, ag_r, ab_r,
               nx_r, ny_r, nz_r, osh_r, osl_r):
        rng = R.RngState(sh_r[:], sl_r[:], ih_r[:], il_r[:])
        lr, lg, lb, first_hit, aov, rng = trace_paths(
            rox_r[:], roy_r[:], roz_r[:], rdx_r[:], rdy_r[:], rdz_r[:],
            rng)
        rr_r[:] = lr
        rg_r[:] = lg
        rb_r[:] = lb
        hit_r[:] = first_hit.astype(jnp.int32)
        ar_r[:] = aov["ar"]
        ag_r[:] = aov["ag"]
        ab_r[:] = aov["ab"]
        nx_r[:] = aov["nx"]
        ny_r[:] = aov["ny"]
        nz_r[:] = aov["nz"]
        osh_r[:] = rng.state_hi
        osl_r[:] = rng.state_lo

    block = ROWS * LANE

    @jax.jit
    def run(ro, rd, rngs):
        n = ro.shape[0]
        npad = max(block, ((n + block - 1) // block) * block)

        def prep(x, dtype=jnp.float32):
            x = x.astype(dtype) if x.dtype != dtype else x
            if npad != n:
                x = jnp.pad(x, (0, npad - n))
            return x.reshape(npad // LANE, LANE)

        ins = [prep(ro[:, 0]), prep(ro[:, 1]), prep(ro[:, 2]),
               prep(rd[:, 0]), prep(rd[:, 1]), prep(rd[:, 2]),
               prep(rngs.state_hi, jnp.uint32),
               prep(rngs.state_lo, jnp.uint32),
               prep(rngs.inc_hi, jnp.uint32),
               prep(rngs.inc_lo, jnp.uint32)]
        srows = npad // LANE
        grid = srows // ROWS
        bspec = pl.BlockSpec((ROWS, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        f32 = jax.ShapeDtypeStruct((srows, LANE), jnp.float32)
        i32 = jax.ShapeDtypeStruct((srows, LANE), jnp.int32)
        u32 = jax.ShapeDtypeStruct((srows, LANE), jnp.uint32)
        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[bspec] * 10,
            out_specs=(bspec,) * 12,
            out_shape=(f32, f32, f32, i32, f32, f32, f32, f32, f32, f32,
                       u32, u32),
            interpret=interpret,
            # the fused estimator keeps many ray/weight/attr planes live
            # across the unrolled bounce loop; give it headroom over the
            # default 16M scoped-vmem cap (v5e: 128M physical)
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*ins)
        (orr, org, orb, hit_i, ar, ag, ab, onx, ony, onz,
         osh, osl) = outs
        flat = lambda x: x.reshape(-1)[:n]
        radiance = jnp.stack([flat(orr), flat(org), flat(orb)], axis=-1)
        albedo = jnp.stack([flat(ar), flat(ag), flat(ab)], axis=-1)
        normal = jnp.stack([flat(onx), flat(ony), flat(onz)], axis=-1)
        hit = flat(hit_i) != 0
        rngs_out = R.RngState(flat(osh), flat(osl), rngs.inc_hi,
                              rngs.inc_lo)
        return radiance, hit, albedo, normal, rngs_out

    if not spp_inner:
        return run

    # ------------------------------------------------------------------
    # multi-sample kernel: camera rays generated in-kernel, spp_inner
    # full samples per launch (device-side sample loop)
    # ------------------------------------------------------------------
    cam = scene.cameras[params.camera]
    cfr = np.asarray(cam.frame, np.float32)
    c_lens = float(cam.lens)
    c_focus = float(cam.focus)
    c_aperture = float(cam.aperture)
    c_ortho = bool(cam.orthographic)
    c_film = float(cam.film)
    c_aspect = float(cam.aspect)
    film_x = c_film if c_aspect >= 1.0 else c_film * c_aspect
    film_y = c_film / c_aspect if c_aspect >= 1.0 else c_film
    if c_aspect >= 1.0:
        k_width = int(params.resolution)
        k_height = int(round(params.resolution / c_aspect))
    else:
        k_height = int(params.resolution)
        k_width = int(round(params.resolution * c_aspect))
    clamp = float(params.clamp)
    accum_misses = has_env and not envhidden
    tent = bool(params.tentfilter)

    def camera_ray(iplane, jplane, rng):
        """sample_camera + eval_camera on planes, same draw order as
        renderer.sample_camera_rays (luv FIRST, then puv)."""
        # rand2f draws x then y sequentially (ops/rng.rand2f); planes
        # stay 2-D (a stacked [.., 2] trailing axis tiles badly in
        # Mosaic, CLAUDE.md)
        l0, rng = R.rand1f(rng)
        l1, rng = R.rand1f(rng)
        p0, rng = R.rand1f(rng)
        p1, rng = R.rand1f(rng)
        if tent:
            p0 = jnp.where(p0 < 0.5, jnp.sqrt(2.0 * p0) - 1.0,
                           1.0 - jnp.sqrt(2.0 - 2.0 * p0)) * 2.0 + 0.5
            p1 = jnp.where(p1 < 0.5, jnp.sqrt(2.0 * p1) - 1.0,
                           1.0 - jnp.sqrt(2.0 - 2.0 * p1)) * 2.0 + 0.5
        u = (iplane + p0) / float(k_width)
        v = (jplane + p1) / float(k_height)
        qx = film_x * (0.5 - u)
        qy = film_y * (v - 0.5)
        # sample_disk(luv) scaled by aperture/2 (zero aperture folds out)
        dr_ = jnp.sqrt(l1)
        dphi = 2.0 * M.pif * l0
        ex = jnp.cos(dphi) * dr_ * (c_aperture / 2.0)
        ey = jnp.sin(dphi) * dr_ * (c_aperture / 2.0)
        if not c_ortho:
            # dc = -normalize([qx, qy, lens]); p = dc * focus/|dc_z|
            qn = jnp.sqrt(qx * qx + qy * qy + c_lens * c_lens)
            dcx, dcy, dcz = -qx / qn, -qy / qn, -c_lens / qn
            s = c_focus / jnp.abs(dcz)
            dx0 = dcx * s - ex
            dy0 = dcy * s - ey
            dz0 = dcz * s
            dx, dy, dz = _normalize3(dx0, dy0, dz0)
            ez = jnp.zeros_like(ex)
        else:
            scale = 1.0 / c_lens
            ex = -qx * scale + ex
            ey = -qy * scale + ey
            ez = jnp.zeros_like(ex)
            dx0 = jnp.zeros_like(ex)
            dy0 = jnp.zeros_like(ex)
            dz0 = jnp.full_like(ex, -c_focus)
            dx, dy, dz = _normalize3(dx0, dy0, dz0)
        # frame transform (rows of cfr are the basis vectors)
        rox = (ex * cfr[0, 0] + ey * cfr[1, 0] + ez * cfr[2, 0]
               + cfr[3, 0])
        roy = (ex * cfr[0, 1] + ey * cfr[1, 1] + ez * cfr[2, 1]
               + cfr[3, 1])
        roz = (ex * cfr[0, 2] + ey * cfr[1, 2] + ez * cfr[2, 2]
               + cfr[3, 2])
        rdx = dx * cfr[0, 0] + dy * cfr[1, 0] + dz * cfr[2, 0]
        rdy = dx * cfr[0, 1] + dy * cfr[1, 1] + dz * cfr[2, 1]
        rdz = dx * cfr[0, 2] + dy * cfr[1, 2] + dz * cfr[2, 2]
        return rox, roy, roz, rdx, rdy, rdz, rng

    def kernel_ms(pi_r, pj_r, sh_r, sl_r, ih_r, il_r,
                  sr_r, sg2_r, sb_r, sa_r, har_r, hag_r, hab_r,
                  hnx_r, hny_r, hnz_r, hits_r, osh_r, osl_r):
        iplane = pi_r[:]
        jplane = pj_r[:]
        ih, il = ih_r[:], il_r[:]
        zero = jnp.zeros(iplane.shape, jnp.float32)

        def body(_, carry):
            (sh, sl, sr, sg2, sb, sa, har, hag, hab, hnx, hny, hnz,
             hits) = carry
            rng = R.RngState(sh, sl, ih, il)
            rox, roy, roz, rdx, rdy, rdz, rng = camera_ray(
                iplane, jplane, rng)
            lr, lg, lb, first_hit, aov, rng = trace_paths(
                rox, roy, roz, rdx, rdy, rdz, rng)
            # per-sample clamp + NaN scrub (yocto_trace.cpp:1471-1475)
            fin = (jnp.isfinite(lr) & jnp.isfinite(lg) & jnp.isfinite(lb))
            lr = jnp.where(fin, lr, 0.0)
            lg = jnp.where(fin, lg, 0.0)
            lb = jnp.where(fin, lb, 0.0)
            mx = jnp.maximum(lr, jnp.maximum(lg, lb))
            scl = jnp.where(mx > clamp,
                            clamp / jnp.maximum(mx, 1e-20), 1.0)
            lr, lg, lb = lr * scl, lg * scl, lb * scl
            hitf = first_hit
            if accum_misses:
                use = jnp.ones_like(lr, jnp.bool_)
                a_r = jnp.where(hitf, aov["ar"], 1.0)
                a_g = jnp.where(hitf, aov["ag"], 1.0)
                a_b = jnp.where(hitf, aov["ab"], 1.0)
                hinc = jnp.ones_like(lr)
            else:
                use = hitf
                a_r = jnp.where(hitf, aov["ar"], 0.0)
                a_g = jnp.where(hitf, aov["ag"], 0.0)
                a_b = jnp.where(hitf, aov["ab"], 0.0)
                hinc = jnp.where(hitf, 1.0, 0.0)
            n_x = jnp.where(hitf, aov["nx"], -rdx)
            n_y = jnp.where(hitf, aov["ny"], -rdy)
            n_z = jnp.where(hitf, aov["nz"], -rdz)
            sr = sr + jnp.where(use, lr, 0.0)
            sg2 = sg2 + jnp.where(use, lg, 0.0)
            sb = sb + jnp.where(use, lb, 0.0)
            sa = sa + jnp.where(use, 1.0, 0.0)
            har, hag, hab = har + a_r, hag + a_g, hab + a_b
            hnx, hny, hnz = hnx + n_x, hny + n_y, hnz + n_z
            hits = hits + hinc
            return (rng.state_hi, rng.state_lo, sr, sg2, sb, sa,
                    har, hag, hab, hnx, hny, hnz, hits)

        init = (sh_r[:], sl_r[:], zero, zero, zero, zero, zero, zero,
                zero, zero, zero, zero, zero)
        out = jax.lax.fori_loop(0, spp_inner, body, init)
        (sh, sl, sr, sg2, sb, sa, har, hag, hab, hnx, hny, hnz,
         hits) = out
        sr_r[:] = sr
        sg2_r[:] = sg2
        sb_r[:] = sb
        sa_r[:] = sa
        har_r[:] = har
        hag_r[:] = hag
        hab_r[:] = hab
        hnx_r[:] = hnx
        hny_r[:] = hny
        hnz_r[:] = hnz
        hits_r[:] = hits
        osh_r[:] = sh
        osl_r[:] = sl

    block_ms = ROWS * LANE

    @jax.jit
    def step(pi, pj, rngs):
        n = pi.shape[0]
        npad = max(block_ms, ((n + block_ms - 1) // block_ms) * block_ms)

        def prep(x, dtype=jnp.float32):
            x = x.astype(dtype) if x.dtype != dtype else x
            if npad != n:
                x = jnp.pad(x, (0, npad - n))
            return x.reshape(npad // LANE, LANE)

        ins = [prep(pi), prep(pj),
               prep(rngs.state_hi, jnp.uint32),
               prep(rngs.state_lo, jnp.uint32),
               prep(rngs.inc_hi, jnp.uint32),
               prep(rngs.inc_lo, jnp.uint32)]
        srows = npad // LANE
        grid = srows // ROWS
        bspec = pl.BlockSpec((ROWS, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        f32 = jax.ShapeDtypeStruct((srows, LANE), jnp.float32)
        u32 = jax.ShapeDtypeStruct((srows, LANE), jnp.uint32)
        outs = pl.pallas_call(
            kernel_ms,
            grid=(grid,),
            in_specs=[bspec] * 6,
            out_specs=(bspec,) * 13,
            out_shape=(f32,) * 11 + (u32, u32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*ins)
        (sr, sg2, sb, sa, har, hag, hab, hnx, hny, hnz, hits,
         osh, osl) = outs
        flat = lambda x: x.reshape(-1)[:n]
        img_sum = jnp.stack([flat(sr), flat(sg2), flat(sb), flat(sa)],
                            axis=-1)
        albedo_sum = jnp.stack([flat(har), flat(hag), flat(hab)], axis=-1)
        normal_sum = jnp.stack([flat(hnx), flat(hny), flat(hnz)], axis=-1)
        hits_sum = flat(hits)
        rngs_out = R.RngState(flat(osh), flat(osl), rngs.inc_hi,
                              rngs.inc_lo)
        return img_sum, albedo_sum, normal_sum, hits_sum, rngs_out

    return step
