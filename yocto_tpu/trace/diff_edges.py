"""Edge-sampled silhouette gradients for differentiable rendering.

The interior estimator in trace/diff.py differentiates radiance where
visibility is locally constant; moving a vertex also MOVES SILHOUETTES,
whose contribution is a boundary integral the interior estimator cannot
see (its vertex gradients are zero across occlusion changes). This module
estimates that boundary term for PRIMARY visibility by edge sampling
(the approach of differentiable rasterization/path-tracing practice; no
yocto counterpart — the reference is not differentiable):

    dI_j/dtheta = sum_over_silhouette_edges
        \\int (L_out(u) - L_in(u)) (n_hat(u) . du_edge/dtheta) dl

in screen space (pixel units): u_edge(t; theta) is the projected edge
curve, n_hat its screen normal pointing out of the occluder, L_in/L_out
the radiance just inside/outside the silhouette. Monte-Carlo over
(edge, t) with everything except the projected position detached yields a
surrogate scalar whose jax.grad adds exactly this term, composed with the
interior vjp through a custom_vjp in DiffRenderer.render_edge_aware.

v1 scope: primary (camera) visibility, pinhole cameras, triangle/quad
surfaces.

Round 3 adds ONE INDIRECT BOUNCE of the boundary term: SHADOW silhouettes
(make_shadow_edge_term). Moving geometry also moves the shadows it casts;
for a receiver y lit by an area light, the visible region of the light is
bounded by the occluder's silhouette edges projected from y onto the light
plane, and Reynolds transport gives

    dI(y)/dtheta = oint_curve g(z) (n_hat(z) . dz/dtheta) dl,
    g(z) = f(y) Le cos_y cos_l / r^2          (the NEE integrand),

with n_hat the in-plane curve normal pointing INTO the blocked region
(outward of the visible region). The projected curve point
z(t; theta) = y + (x(t; theta) - y) s is attached through the edge point
x; everything else is detached.

Shadow-term v2 scope (documented, mirrors the primary term's v1 scoping):
one planar rect area light (the scene's first single-quad emissive
instance), matte untextured receivers, no second occluder between the
sampled edge and the light, static light geometry. Receiver-to-edge
occlusion IS tested (a detached hit_fn ray gates each sample), so edges
hidden from the receiver by other geometry inject no gradient. The light
is treated as TWO-SIDED, matching the interior estimator: non-refractive
shading normals are flipped toward the outgoing direction
(sceneval.eval_shading_normal), so eval_emission's facing test always
passes and emissive quads radiate from both faces.

Round 4 extends the shadow term to ARBITRARY RECEIVER DEPTH (`depth`
flag): the detached receiver path is continued by cosine-sampled matte
bounces, and every generation adds the same Reynolds-transport boundary
term weighted by the interior estimator's path throughput (for matte
receivers under cosine sampling f/pdf == albedo exactly). Depth 2
recovers shadow gradients the camera only sees bounced off other
surfaces, which the depth-1 term is provably blind to
(tests/test_diff.py::test_shadow_silhouette_grad_two_bounce).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.scene import SceneData
from ..ops import mathops as M


class EdgeTable(NamedTuple):
    """Static mesh-edge table in the flat scene's index spaces."""

    e_verts: jax.Array   # [E,2] i32 global position-pool vertex ids
    f1_verts: jax.Array  # [E,4] i32 face 1 corner ids (quad; tri = xyzz)
    f2_verts: jax.Array  # [E,4] i32 face 2 corner ids (= f1 on boundary)
    inst: jax.Array      # [E] i32 instance id
    boundary: jax.Array  # [E] bool


def build_edge_table(scene: SceneData) -> EdgeTable:
    """Unique mesh edges with their adjacent faces, per instance, using
    the same vertex-pool offsets as trace.compile.compile_scene."""
    voffs = []
    off = 0
    for shape in scene.shapes:
        voffs.append(off)
        off += len(shape.positions)

    ev, f1, f2, ei, eb = [], [], [], [], []
    for iidx, inst in enumerate(scene.instances):
        shape = scene.shapes[inst.shape]
        if len(shape.triangles):
            tris = np.asarray(shape.triangles, np.int64)
            faces = np.concatenate([tris, tris[:, 2:3]], axis=1)
            corners = [(0, 1), (1, 2), (2, 0)]
        elif len(shape.quads):
            faces = np.asarray(shape.quads, np.int64)
            corners = [(0, 1), (1, 2), (2, 3), (3, 0)]
        else:
            continue
        edge_map = {}
        for fidx in range(len(faces)):
            f = faces[fidx]
            for a, b in corners:
                va, vb = int(f[a]), int(f[b])
                if va == vb:
                    continue  # degenerate corner of tri-as-quad
                key = (min(va, vb), max(va, vb))
                if key in edge_map:
                    edge_map[key] = (edge_map[key][0], fidx)
                else:
                    edge_map[key] = (fidx, None)
        voff = voffs[inst.shape]
        for (va, vb), (fa, fb) in edge_map.items():
            ev.append((va + voff, vb + voff))
            f1.append(faces[fa] + voff)
            f2.append(faces[fb if fb is not None else fa] + voff)
            ei.append(iidx)
            eb.append(fb is None)

    return EdgeTable(
        e_verts=jnp.asarray(np.asarray(ev, np.int32).reshape(-1, 2)),
        f1_verts=jnp.asarray(np.asarray(f1, np.int32).reshape(-1, 4)),
        f2_verts=jnp.asarray(np.asarray(f2, np.int32).reshape(-1, 4)),
        inst=jnp.asarray(np.asarray(ei, np.int32)),
        boundary=jnp.asarray(np.asarray(eb, bool)))


def project_camera(scene, camera, x):
    """World point -> continuous image uv in [0,1]^2 (pinhole inverse of
    sceneval.eval_camera's perspective branch). Differentiable."""
    frame = scene.cam_frame[camera]
    lens = scene.cam_lens[camera]
    film_w = scene.cam_film[camera]
    aspect = scene.cam_aspect[camera]
    film_x = jnp.where(aspect >= 1.0, film_w, film_w * aspect)
    film_y = jnp.where(aspect >= 1.0, film_w / aspect, film_w)
    rel = x - frame[3]
    lx = jnp.stack([M.dot(rel, frame[0]), M.dot(rel, frame[1]),
                    M.dot(rel, frame[2])], axis=-1)
    lz = jnp.minimum(lx[..., 2], -1e-8)  # visible points have lz < 0
    qx = lens * lx[..., 0] / lz
    qy = lens * lx[..., 1] / lz
    u = 0.5 - qx / film_x
    v = 0.5 + qy / film_y
    return jnp.stack([u, v], axis=-1)


def _world_vert(scene, vid, inst):
    """Instance-transformed vertex position (attached)."""
    p = scene.positions[vid]
    fr = scene.inst_frame[inst]
    return (p[..., 0:1] * fr[..., 0, :] + p[..., 1:2] * fr[..., 1, :]
            + p[..., 2:3] * fr[..., 2, :] + fr[..., 3, :])


def _face_normal(scene, fverts, inst):
    p0 = _world_vert(scene, fverts[..., 0], inst)
    p1 = _world_vert(scene, fverts[..., 1], inst)
    p3 = _world_vert(scene, fverts[..., 3], inst)
    p2 = _world_vert(scene, fverts[..., 2], inst)
    # split-quad average like eval_element_normal; tris give n_a == n_b
    n_a = jnp.cross(p1 - p0, p3 - p0)
    n_b = jnp.cross(p3 - p2, p1 - p2)
    return n_a + n_b


def make_edge_term(edges: EdgeTable, params, width, height, trace_fn,
                   n_samples: int = 4096, probe_px: float = 0.25):
    """Returns edge_term(scene_attached, key) -> [H,W,3] image that is
    IDENTICALLY ZERO in value but whose gradient w.r.t. the attached
    scene is the primary-visibility boundary term (each sample adds
    coef * (n_hat . s(theta) - stop_grad(same)) to its pixel). Adding it
    to the interior render makes any downstream loss edge-aware without
    a custom VJP.

    `trace_fn(scene, ro, rd, key) -> [K,3]` computes (detached) radiance
    for probe rays — typically the detached diff sampler at 1 spp.
    """
    E = int(edges.e_verts.shape[0])
    cam = params.camera

    def edge_term(scene_a, key):
        k1, k2, k3 = jax.random.split(key, 3)
        eidx = jax.random.randint(k1, (n_samples,), 0, E)
        t = jax.random.uniform(k2, (n_samples,))

        ev = edges.e_verts[eidx]
        inst = edges.inst[eidx]
        v0 = _world_vert(scene_a, ev[:, 0], inst)
        v1 = _world_vert(scene_a, ev[:, 1], inst)
        x = v0 + (v1 - v0) * t[:, None]                  # [K,3] attached

        # screen position in PIXEL units (attached — this is the only
        # theta-attached quantity in the estimator)
        uv = project_camera(scene_a, cam, x)
        s = uv * jnp.asarray([width, height], jnp.float32)

        sg = jax.lax.stop_gradient
        # silhouette test (detached): exactly one adjacent face fronts
        # the camera (boundary edges always qualify)
        eye = scene_a.cam_frame[cam][3]
        view = sg(x) - eye[None, :]
        n1 = _face_normal(scene_a, edges.f1_verts[eidx], inst)
        n2 = _face_normal(scene_a, edges.f2_verts[eidx], inst)
        front1 = M.dot(sg(n1), view) < 0.0
        front2 = M.dot(sg(n2), view) < 0.0
        silho = jnp.where(edges.boundary[eidx], front1,
                          front1 != front2)

        # screen tangent/normal (detached); normal oriented out of the
        # occluder using the front face's third corner as interior probe
        s0 = sg(project_camera(scene_a, cam, v0)
                * jnp.asarray([width, height], jnp.float32))
        s1 = sg(project_camera(scene_a, cam, v1)
                * jnp.asarray([width, height], jnp.float32))
        ds = s1 - s0                                      # [K,2]
        dl = jnp.linalg.norm(ds, axis=-1)
        tang = ds / jnp.maximum(dl, 1e-12)[:, None]
        nrm = jnp.stack([tang[:, 1], -tang[:, 0]], axis=-1)
        ffront = jnp.where(front1[:, None], edges.f1_verts[eidx],
                           edges.f2_verts[eidx])
        centroid = (_world_vert(scene_a, ffront[:, 0], inst)
                    + _world_vert(scene_a, ffront[:, 1], inst)
                    + _world_vert(scene_a, ffront[:, 2], inst)
                    + _world_vert(scene_a, ffront[:, 3], inst)) / 4.0
        c_s = sg(project_camera(scene_a, cam, centroid)
                 * jnp.asarray([width, height], jnp.float32))
        inward = jnp.sum((c_s - sg(s)) * nrm, axis=-1) > 0.0
        nrm = jnp.where(inward[:, None], -nrm, nrm)       # out of occluder

        # probe radiance just inside/outside the silhouette (detached)
        s_det = sg(s)
        s_out = s_det + nrm * probe_px
        s_in = s_det - nrm * probe_px
        wh = jnp.asarray([width, height], jnp.float32)

        def rays_at(spx):
            uvp = spx / wh
            from .sceneval import eval_camera
            ro, rd = eval_camera(scene_a, cam,
                                 sg(uvp), jnp.zeros_like(uvp))
            return sg(ro), sg(rd)

        ro_o, rd_o = rays_at(s_out)
        ro_i, rd_i = rays_at(s_in)
        L_out = trace_fn(sg_scene(scene_a), ro_o, rd_o, k3)
        L_in = trace_fn(sg_scene(scene_a), ro_i, rd_i,
                        jax.random.fold_in(k3, 1))

        px = jnp.clip(s_det[:, 0].astype(jnp.int32), 0, width - 1)
        py = jnp.clip(s_det[:, 1].astype(jnp.int32), 0, height - 1)
        inside = ((s_det[:, 0] >= 0) & (s_det[:, 0] < width)
                  & (s_det[:, 1] >= 0) & (s_det[:, 1] < height)
                  & (dl > 1e-9))
        coef = jnp.where((silho & inside)[:, None],
                         (L_in - L_out) * (dl * (E / n_samples))[:, None],
                         0.0)                             # [K,3] detached
        # zero-valued carrier: gradient flows only through n_hat.s(theta)
        ns = jnp.sum(nrm * s, axis=-1)
        carrier = (ns - sg(ns))[:, None]
        return (jnp.zeros((height, width, 3), jnp.float32)
                .at[py, px].add(sg(coef) * carrier))

    return edge_term


def sg_scene(scene):
    return jax.tree.map(jax.lax.stop_gradient, scene)


class RectLight(NamedTuple):
    """Planar rectangular area light (host-extracted, detached)."""

    c0: np.ndarray   # [3] world corner
    e1: np.ndarray   # [3] first edge vector (c1 - c0)
    e2: np.ndarray   # [3] second edge vector (c3 - c0)
    normal: np.ndarray  # [3] unit plane normal
    emission: np.ndarray  # [3]


def find_rect_light(scene: SceneData):
    """First emissive single-quad instance as a RectLight, else None."""
    for inst in scene.instances:
        mat = scene.materials[inst.material]
        em = np.asarray(mat.emission, np.float32)
        shp = scene.shapes[inst.shape]
        if not np.any(em > 0) or len(shp.quads) != 1:
            continue
        frame = np.asarray(inst.frame, np.float32)
        q = np.asarray(shp.quads[0], np.int64)
        c = np.asarray(shp.positions, np.float32)[q] @ frame[:3] + frame[3]
        e1 = c[1] - c[0]
        e2 = c[3] - c[0]
        n = np.cross(e1, e2)
        ln = np.linalg.norm(n)
        if ln < 1e-12:
            continue
        return RectLight(c[0], e1, e2, (n / ln).astype(np.float32), em)
    return None


def make_shadow_edge_term(edges: EdgeTable, light: RectLight, params,
                          width, height, hit_fn, n_samples: int = 16384,
                          depth: int = 1):
    """Returns shadow_term(scene_attached, key) -> [H,W,3] zero-valued
    carrier image whose gradient is the shadow boundary term at up to
    `depth` receiver generations (see module docstring for the estimator
    and its scope).

    `hit_fn(scene_detached, ro, rd) -> SceneIntersection` supplies the
    detached hits; each sample draws one pixel, one (edge, t) point,
    projects the attached edge point from the receiver onto the light
    plane, and accumulates g * |dz/dt| * (E * W * H / N) at the CAMERA
    pixel through the n_hat . z(theta) carrier.

    `depth` (VERDICT r3 #8): generation 1 is the camera hit (the round-3
    one-indirect-bounce term); each further generation extends the
    detached receiver path by one cosine-sampled matte bounce and adds
    the same boundary term weighted by the path throughput. For matte
    receivers under cosine sampling the interior estimator's f/pdf is
    exactly the albedo, so throughput_k = prod(albedo_1..k-1) — the
    shadow moving on a wall the camera only sees via other walls still
    injects its gradient at the camera pixel. Receiver chains stop at
    non-matte or emissive hits (scope unchanged otherwise).
    """
    E = int(edges.e_verts.shape[0])
    cam = params.camera
    c0 = jnp.asarray(light.c0)
    le1 = jnp.asarray(light.e1)
    le2 = jnp.asarray(light.e2)
    n_l = jnp.asarray(light.normal)
    Le = jnp.asarray(light.emission)
    inv_l1 = 1.0 / float(np.dot(light.e1, light.e1))
    inv_l2 = 1.0 / float(np.dot(light.e2, light.e2))

    def shadow_term(scene_a, key):
        from ..ops import sampling as SMP
        from .sceneval import eval_camera, eval_element_normal, eval_position

        sg = jax.lax.stop_gradient
        scene_d = sg_scene(scene_a)
        kp, ke, kt, kb = jax.random.split(key, 4)

        # camera samples: one jittered pixel each (detached)
        uv_pix = jax.random.uniform(kp, (n_samples, 2))
        ro, rd = eval_camera(scene_d, cam, uv_pix,
                             jnp.zeros((n_samples, 2)))
        isec = hit_fn(scene_d, ro, rd)

        # edge points (ATTACHED through the vertex pool), shared by all
        # receiver generations — each generation projects the same edge
        # sample from its own receiver, an independent unbiased estimator
        eidx = jax.random.randint(ke, (n_samples,), 0, E)
        t = jax.random.uniform(kt, (n_samples,))
        ev = edges.e_verts[eidx]
        inst_e = edges.inst[eidx]
        v0a = _world_vert(scene_a, ev[:, 0], inst_e)
        v1a = _world_vert(scene_a, ev[:, 1], inst_e)
        x_a = v0a + (v1a - v0a) * t[:, None]
        v0d, v1d = sg(v0a), sg(v1a)
        x_d = sg(x_a)

        px = jnp.clip((uv_pix[:, 0] * width).astype(jnp.int32),
                      0, width - 1)
        py = jnp.clip((uv_pix[:, 1] * height).astype(jnp.int32),
                      0, height - 1)
        img = jnp.zeros((height, width, 3), jnp.float32)

        def receiver_fields(cur_isec, cur_rd):
            inst_r = jnp.maximum(cur_isec.instance, 0)
            gelem = (scene_d.shape_elem_start[scene_d.inst_shape[inst_r]]
                     + jnp.maximum(cur_isec.element, 0))
            y = eval_position(scene_d, inst_r, gelem, cur_isec.uv)
            ny = eval_element_normal(scene_d, inst_r, gelem)
            mat_r = scene_d.inst_material[inst_r]
            alb = scene_d.mat_color[mat_r]
            matte = (cur_isec.hit
                     & (scene_d.mat_type[mat_r] == 0)
                     & (M.maxc(scene_d.mat_emission[mat_r]) == 0.0))
            ny = jnp.where(M.dot(ny, cur_rd)[:, None] > 0, -ny, ny)
            return y, ny, alb, matte

        def generation_term(y, ny, alb, ok, W):
            """Boundary term at one receiver generation (all detached
            except the z_a projection of the attached edge point)."""

            def proj(xx):
                """Project xx from y onto the light plane:
                z = y + (xx - y) s."""
                dirv = xx - y
                denom = jnp.sum(dirv * n_l, axis=-1)
                s_raw = (jnp.sum((c0 - y) * n_l, axis=-1)
                         / jnp.where(denom == 0.0, 1e-20, denom))
                # grazing edges give astronomically distant projections;
                # those samples must stay finite (masked-out lanes must
                # not inject inf - inf = NaN into the scatter) but the
                # clamp must not bias legitimate in-scope samples, so
                # out-of-range s is REPLACED (detached constant), never
                # saturated: a replaced sample projects far outside the
                # light rect and fails the `inside` gate instead of
                # contributing a clipped-z gradient
                grazing = jnp.abs(s_raw) > 1e4
                s = jnp.where(grazing, jax.lax.stop_gradient(
                    jnp.sign(s_raw) * 1e4), s_raw)
                return y + dirv * s[:, None], s

            z_a, s_a = proj(x_a)
            s_d = sg(s_a)

            # detached curve speed |dz/dt| (the edge's image on the light
            # plane is traversed non-uniformly in t: projective map)
            def z_of_t(tt):
                return proj(v0d + (v1d - v0d) * tt[:, None])[0]

            z_d, dz_dt = jax.jvp(z_of_t, (t,), (jnp.ones_like(t),))
            dl = jnp.linalg.norm(dz_dt, axis=-1)

            # the blocker must sit strictly between receiver and light
            # plane; grazing projections (|s| pinned at 1e4 by proj) are
            # dropped outright — bias bound: they need the receiver
            # within ~1e-4 of the occluder plane, measure-zero in the FD
            # test scenes
            between = (s_d > 1.0 + 1e-4) & (jnp.abs(s_d) < 1e4)

            # inside the light rectangle (detached)
            dz0 = z_d - c0
            lu = jnp.sum(dz0 * le1, axis=-1) * inv_l1
            lv = jnp.sum(dz0 * le2, axis=-1) * inv_l2
            inside = (lu >= 0) & (lu <= 1) & (lv >= 0) & (lv <= 1)

            # shadow silhouette from the receiver: boundary edges of open
            # sheets always block; interior edges need exactly one face
            # fronting y (two-sided blocking, unlike the camera case)
            view = x_d - y
            n1 = _face_normal(scene_d, edges.f1_verts[eidx], inst_e)
            n2 = _face_normal(scene_d, edges.f2_verts[eidx], inst_e)
            front1 = M.dot(n1, view) < 0.0
            front2 = M.dot(n2, view) < 0.0
            silho = edges.boundary[eidx] | (front1 != front2)

            # NEE integrand g(z) at the curve (detached)
            dvec = z_d - y
            r2 = jnp.maximum(jnp.sum(dvec * dvec, axis=-1), 1e-12)
            wdir = dvec / jnp.sqrt(r2)[:, None]
            cos_y = jnp.sum(ny * wdir, axis=-1)
            # two-sided |cos_l| matches the interior estimator: shading
            # normals flip toward outgoing (sceneval.eval_shading_normal),
            # so emissive quads radiate from both faces (module docstring)
            cos_l = jnp.abs(jnp.sum(n_l * wdir, axis=-1))
            g = (alb / jnp.pi) * W * Le[None, :] * (
                jnp.maximum(cos_y, 0.0) * cos_l / r2)[:, None]

            # in-plane curve normal, oriented INTO the blocked region (the
            # occluder interior's own projection): outward of the visible
            tang = dz_dt / jnp.maximum(dl, 1e-12)[:, None]
            nhat = jnp.cross(jnp.broadcast_to(n_l, tang.shape), tang)
            ffront = jnp.where(front1[:, None], edges.f1_verts[eidx],
                               edges.f2_verts[eidx])
            centroid = (_world_vert(scene_d, ffront[:, 0], inst_e)
                        + _world_vert(scene_d, ffront[:, 1], inst_e)
                        + _world_vert(scene_d, ffront[:, 2], inst_e)
                        + _world_vert(scene_d, ffront[:, 3], inst_e)) / 4.0
            c_z, _ = proj(centroid)
            away = jnp.sum((sg(c_z) - z_d) * nhat, axis=-1) < 0.0
            nhat = jnp.where(away[:, None], -nhat, nhat)

            # receiver -> edge visibility (ADVICE r3): an edge hidden
            # from y by other geometry must not inject gradient. The
            # detached ray y -> x grazes the occluder AT x, so "blocked"
            # means a hit strictly before the edge point (rel tol; the
            # grazing self-hit lands at ~|x - y| and passes).
            to_x = x_d - y
            dist_x = jnp.linalg.norm(to_x, axis=-1)
            dir_x = to_x / jnp.maximum(dist_x, 1e-12)[:, None]
            occ = hit_fn(scene_d, y + ny * 1e-4, dir_x)
            edge_visible = ~(occ.hit
                             & (occ.distance < dist_x * (1.0 - 1e-3)))

            valid = (ok & between & inside & silho & (cos_y > 0)
                     & edge_visible)
            weight = dl * (E * width * height / n_samples)
            coef = jnp.where(valid[:, None], g * weight[:, None], 0.0)
            ns = jnp.sum(nhat * z_a, axis=-1)
            carrier = (ns - sg(ns))[:, None]
            return sg(coef) * carrier

        cur_isec, cur_rd = isec, rd
        W = jnp.ones((n_samples, 3), jnp.float32)  # detached throughput
        alive = jnp.ones(n_samples, jnp.bool_)
        for k in range(depth):
            y, ny, alb, matte = receiver_fields(cur_isec, cur_rd)
            ok = alive & matte
            img = img.at[py, px].add(generation_term(y, ny, alb, ok, W))
            if k + 1 < depth:
                # extend the detached receiver path by one cosine-sampled
                # matte bounce; f/pdf == albedo cancels exactly
                # (pathtrace.py matte branch under cosine sampling)
                u = jax.random.uniform(jax.random.fold_in(kb, k),
                                       (n_samples, 2))
                newdir = SMP.sample_hemisphere_cos(u, ny)
                nro = y + ny * 1e-4
                cur_isec = hit_fn(scene_d, nro, newdir)
                W = W * alb
                alive = ok & cur_isec.hit
                cur_rd = newdir
        return img

    return shadow_term
