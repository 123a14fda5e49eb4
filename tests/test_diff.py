"""Differentiable rendering: jax.grad vs central finite differences
(BASELINE.json config 4).

With the sampling distribution pinned (theta_sampling = theta0), the
rendered image is a deterministic differentiable function of theta, so
finite differences of the realized estimate must match reverse-mode AD —
this validates the full vjp wiring (camera -> intersector -> shading ->
BSDF -> MIS -> accumulation). Detached-sampling unbiasedness is a
property of the estimator, not of the code under test.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yocto_tpu.models.examples import make_cornellbox
from yocto_tpu.models.procedural import make_sphere
from yocto_tpu.models.scene import InstanceData, MaterialData, MaterialType
from yocto_tpu.trace.diff import DiffRenderer
from yocto_tpu.trace.params import SamplerType, TraceParams


def _scene():
    scene = make_cornellbox()
    sph = make_sphere(steps=6, scale=0.3)
    scene.shapes.append(sph)
    scene.materials.append(MaterialData(
        type=MaterialType.glossy,
        color=np.array([0.7, 0.5, 0.3], np.float32), roughness=0.3))
    fr = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [0.3, 0.9, 0.3]],
                  np.float32)
    scene.instances.append(InstanceData(frame=fr, shape=len(scene.shapes) - 1,
                                        material=len(scene.materials) - 1))
    return scene


@pytest.fixture(scope="module")
def setup():
    params = TraceParams(resolution=16, samples=2, bounces=3,
                         sampler=SamplerType.path)
    dr = DiffRenderer(_scene(), params)
    theta0 = dr.theta()
    rng = np.random.RandomState(5)
    wimg = jnp.asarray(rng.rand(dr.height, dr.width, 3).astype(np.float32))

    def loss(theta):
        return jnp.sum(dr.render(theta, theta_sampling=theta0) * wimg)

    g = jax.grad(loss)(theta0)
    return theta0, loss, g


def _fd(loss, theta0, field, idx, eps):
    def at(delta):
        arr = np.asarray(theta0[field]).copy()
        arr[idx] += delta
        th = dict(theta0)
        th[field] = jnp.asarray(arr)
        return float(loss(th))
    return (at(eps) - at(-eps)) / (2 * eps)


@pytest.mark.parametrize("field,idx,eps,rtol", [
    ("mat_emission", (7, 1), 1e-2, 2e-2),   # light green channel
    ("mat_color", (2, 0), 1e-2, 2e-2),      # a wall albedo channel
    ("mat_color", (8, 2), 1e-2, 5e-2),      # glossy sphere albedo
    ("mat_roughness", (8,), 5e-3, 1e-1),    # glossy lobe width (nonlinear)
])
def test_grad_matches_fd(setup, field, idx, eps, rtol):
    theta0, loss, g = setup
    fd = _fd(loss, theta0, field, idx, eps)
    ad = float(np.asarray(g[field])[idx])
    assert np.isfinite(ad)
    # meaningful signal: at least one of the two should be clearly nonzero
    scale = max(abs(fd), abs(ad), 1e-3)
    assert abs(ad - fd) / scale < rtol, (field, idx, ad, fd)


def test_grads_nonzero_and_finite(setup):
    theta0, loss, g = setup
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    # light emission and wall colors must receive gradient
    assert np.abs(np.asarray(g["mat_emission"])).max() > 0
    assert np.abs(np.asarray(g["mat_color"])).max() > 0
    # interior vertex-position gradients flow through the intersector
    assert np.abs(np.asarray(g["positions"])).max() > 0
    assert np.abs(np.asarray(g["cam_frame"])).max() > 0


def _open_scene():
    """Occluder-free setup for geometry gradients: a big matte floor seen
    from above, one area light overhead and behind the camera. No visible
    silhouettes in the image interior -> finite differences see only the
    interior (continuous) terms, which is exactly what the area-measure
    NEE estimator differentiates."""
    from yocto_tpu.models.scene import CameraData, SceneData
    from yocto_tpu.models.shape import ShapeData

    def quad(pts):
        return ShapeData(
            positions=np.asarray(pts, np.float32),
            quads=np.array([[0, 1, 2, 3]], np.int32))

    scene = SceneData()
    scene.cameras.append(CameraData(
        frame=np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0], [0, 2.0, 0]],
                       np.float32),  # looking straight down
        lens=0.05, film=0.036, aspect=1.0, focus=2.0))
    scene.materials.append(MaterialData(
        color=np.array([0.7, 0.7, 0.7], np.float32)))
    scene.materials.append(MaterialData(
        emission=np.array([10.0, 10.0, 10.0], np.float32)))
    # floor much larger than the view frustum
    scene.shapes.append(quad([[-20, 0, 20], [20, 0, 20],
                              [20, 0, -20], [-20, 0, -20]]))
    scene.instances.append(InstanceData(shape=0, material=0))
    # light panel above and off to the side (not directly visible)
    scene.shapes.append(quad([[3.0, 3.0, 0.5], [3.5, 3.0, 0.5],
                              [3.5, 3.0, -0.5], [3.0, 3.0, -0.5]]))
    scene.instances.append(InstanceData(shape=1, material=1))
    return scene


@pytest.fixture(scope="module")
def setup_geo():
    params = TraceParams(resolution=12, samples=2, bounces=2,
                         sampler=SamplerType.path)
    dr = DiffRenderer(_open_scene(), params, estimator="nee")
    theta0 = dr.theta()
    rng = np.random.RandomState(9)
    wimg = np.zeros((dr.height, dr.width, 3), np.float32)
    wimg[3:-3, 3:-3] = rng.rand(dr.height - 6, dr.width - 6, 3)  # interior
    wimg = jnp.asarray(wimg)

    def loss(theta):
        return jnp.sum(dr.render(theta, theta_sampling=theta0) * wimg)

    g = jax.grad(loss)(theta0)
    return theta0, loss, g


@pytest.mark.parametrize("field,idx,eps,rtol", [
    ("cam_frame", (0, 3, 1), 1e-3, 5e-2),    # camera height
    ("positions", (5, 1), 1e-3, 5e-2),       # light corner height
    ("inst_frame", (1, 3, 0), 1e-3, 5e-2),   # light panel x offset
    ("mat_emission", (1, 0), 1e-2, 2e-2),    # emission sanity in nee mode
])
def test_geometry_grad_matches_fd(setup_geo, field, idx, eps, rtol):
    theta0, loss, g = setup_geo
    fd = _fd(loss, theta0, field, idx, eps)
    ad = float(np.asarray(g[field])[idx])
    assert np.isfinite(ad)
    scale = max(abs(fd), abs(ad), 1e-3)
    assert abs(ad - fd) / scale < rtol, (field, idx, ad, fd)
    # these must be real signals, not 0==0
    assert abs(ad) > 1e-5, (field, idx, ad, fd)


# ---------------------------------------------------------------------------
# silhouette (boundary) gradients: edge sampling vs finite differences
# ---------------------------------------------------------------------------

def _silhouette_scene():
    """A bright emissive backdrop with a dark occluder whose edge cuts
    through the middle of the image: moving the occluder changes the
    image ONLY by silhouette motion, which the interior estimator cannot
    see (its vertex gradient is ~0) and the edge term must recover."""
    from yocto_tpu.models.scene import CameraData, SceneData
    from yocto_tpu.models.shape import ShapeData

    def quad(pts):
        return ShapeData(
            positions=np.asarray(pts, np.float32),
            quads=np.array([[0, 1, 2, 3]], np.int32))

    scene = SceneData()
    scene.cameras.append(CameraData(
        frame=np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 2.0]],
                       np.float32),
        lens=0.05, film=0.036, aspect=1.0, focus=2.0))
    scene.materials.append(MaterialData(
        emission=np.array([5.0, 5.0, 5.0], np.float32)))
    scene.materials.append(MaterialData(
        color=np.array([0.05, 0.05, 0.05], np.float32)))
    # backdrop at z=-1 filling the view
    scene.shapes.append(quad([[-3, -3, -1], [3, -3, -1],
                              [3, 3, -1], [-3, 3, -1]]))
    scene.instances.append(InstanceData(shape=0, material=0))
    # occluder at z=0 covering the LEFT half; its right edge (x=0) is the
    # silhouette under study
    scene.shapes.append(quad([[-3, -3, 0], [0, -3, 0],
                              [0, 3, 0], [-3, 3, 0]]))
    scene.instances.append(InstanceData(shape=1, material=1))
    return scene


def test_silhouette_grad_edge_sampled_matches_fd():
    params = TraceParams(resolution=16, samples=8, bounces=2,
                         sampler=SamplerType.path)
    dr = DiffRenderer(_silhouette_scene(), params)
    theta0 = dr.theta()
    key = jax.random.PRNGKey(3)

    def loss_interior(theta):
        return jnp.mean(dr.render(theta, theta_sampling=theta0))

    def loss_edges(theta):
        return jnp.mean(dr.render_edges(theta, key,
                                        theta_sampling=theta0))

    # d(loss)/dx of the occluder's right-edge vertices (positions 5, 6 of
    # the pool: occluder verts 1, 2)
    g_int = jax.grad(loss_interior)(theta0)
    g_edge = jax.grad(loss_edges)(theta0)
    ad_int = float(np.asarray(g_int["positions"])[5, 0]
                   + np.asarray(g_int["positions"])[6, 0])
    ad_edge = float(np.asarray(g_edge["positions"])[5, 0]
                    + np.asarray(g_edge["positions"])[6, 0])

    # finite difference of the REAL (non-pinned-visibility) image mean:
    # shift the whole occluder in x via its instance frame
    def mean_at(dx):
        th = {k: np.asarray(v).copy() for k, v in theta0.items()}
        th["positions"][4:8, 0] += dx
        th = {k: jnp.asarray(v) for k, v in th.items()}
        return float(jnp.mean(dr.render(th, theta_sampling=theta0)))

    h = 2e-2
    fd = (mean_at(h) - mean_at(-h)) / (2 * h)  # per unit x of all 4 verts
    # the loss moves only the right-edge verts (5,6) in AD; FD moved all
    # four, but the left edge is off-screen so only the silhouette at x=0
    # contributes -> comparable quantities.
    assert np.isfinite(fd) and abs(fd) > 1e-3, fd
    # interior estimator is blind to the silhouette
    assert abs(ad_int) < 0.25 * abs(fd), (ad_int, fd)
    # edge-aware gradient recovers it (sign + magnitude)
    assert np.sign(ad_edge) == np.sign(fd)
    assert abs(ad_edge - fd) / abs(fd) < 0.5, (ad_edge, fd)


# ---------------------------------------------------------------------------
# volume gradients: transmittance through an absorbing refractive medium
# ---------------------------------------------------------------------------

def _volume_scene():
    """Emissive backdrop seen through an absorbing glass sphere: the
    pixel radiance depends on the in-medium transmittance, so gradients
    w.r.t. the medium parameters (trdepth, absorption color) flow through
    the attached eval_transmittance ratio."""
    from yocto_tpu.models.procedural import make_sphere
    from yocto_tpu.models.scene import CameraData, MaterialType, SceneData
    from yocto_tpu.models.shape import ShapeData

    def quad(pts):
        return ShapeData(
            positions=np.asarray(pts, np.float32),
            quads=np.array([[0, 1, 2, 3]], np.int32))

    scene = SceneData()
    scene.cameras.append(CameraData(
        frame=np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 2.0]],
                       np.float32),
        lens=0.05, film=0.036, aspect=1.0, focus=2.0))
    scene.materials.append(MaterialData(
        emission=np.array([5.0, 5.0, 5.0], np.float32)))
    scene.materials.append(MaterialData(
        type=MaterialType.refractive,
        color=np.array([0.6, 0.7, 0.8], np.float32),
        roughness=0.0, trdepth=0.5))
    scene.shapes.append(quad([[-3, -3, -1], [3, -3, -1],
                              [3, 3, -1], [-3, 3, -1]]))
    scene.instances.append(InstanceData(shape=0, material=0))
    scene.shapes.append(make_sphere(steps=4, scale=0.4))
    scene.instances.append(InstanceData(shape=1, material=1))
    return scene


@pytest.fixture(scope="module")
def setup_volume():
    params = TraceParams(resolution=10, samples=2, bounces=6,
                         sampler=SamplerType.path)
    dr = DiffRenderer(_volume_scene(), params)
    theta0 = dr.theta()

    def loss(theta):
        return jnp.mean(dr.render(theta, theta_sampling=theta0))

    g = jax.grad(loss)(theta0)
    return theta0, loss, g


@pytest.mark.parametrize("field,idx,eps,rtol", [
    ("mat_trdepth", (1,), 1e-4, 1e-1),     # medium mean free path
    ("mat_color", (1, 1), 1e-3, 1e-1),     # absorption via -log(c)/d
])
def test_volume_grad_matches_fd(setup_volume, field, idx, eps, rtol):
    theta0, loss, g = setup_volume
    fd = _fd(loss, theta0, field, idx, eps)
    ad = float(np.asarray(g[field])[idx])
    assert np.isfinite(ad)
    scale = max(abs(fd), abs(ad), 1e-3)
    assert abs(ad - fd) / scale < rtol, (field, idx, ad, fd)
    assert abs(ad) > 1e-5, (field, idx, ad, fd)


# ---------------------------------------------------------------------------
# scalable intersection: detached BVH hit-finding + attached re-intersection
# ---------------------------------------------------------------------------

class TestBvhIntersector:
    """DiffRenderer(intersector='bvh') must agree with the brute-force
    dense sweep in forward radiance and in FD-validated gradients —
    the detached-find/attached-reintersect split (make_attached_intersect)
    is exactly the gradient semantics of the dense argmin."""

    @pytest.fixture(scope="class")
    def pair(self):
        params = TraceParams(resolution=12, samples=2, bounces=2,
                             sampler=SamplerType.path)
        scene = _scene()
        dr_bf = DiffRenderer(scene, params, intersector="bruteforce")
        dr_bvh = DiffRenderer(scene, params, intersector="bvh")
        theta0 = dr_bf.theta()
        return dr_bf, dr_bvh, theta0

    def test_forward_matches_bruteforce(self, pair):
        dr_bf, dr_bvh, theta0 = pair
        a = np.asarray(dr_bf.render(theta0, theta_sampling=theta0))
        b = np.asarray(dr_bvh.render(theta0, theta_sampling=theta0))
        # same hits -> same radiance; allow a tiny tail of tie-broken lanes
        close = np.isclose(a, b, rtol=1e-4, atol=1e-5)
        assert close.mean() > 0.999, (1 - close.mean())

    @pytest.mark.parametrize("field,idx,eps,rtol", [
        ("mat_emission", (7, 1), 1e-2, 2e-2),
        ("mat_color", (2, 0), 1e-2, 2e-2),
        ("positions", (1, 0), 1e-3, 1e-1),   # wall vertex (interior term)
    ])
    def test_grad_matches_fd(self, pair, field, idx, eps, rtol):
        _, dr_bvh, theta0 = pair
        rng = np.random.RandomState(11)
        wimg = jnp.asarray(
            rng.rand(dr_bvh.height, dr_bvh.width, 3).astype(np.float32))

        def loss(theta):
            return jnp.sum(dr_bvh.render(theta, theta_sampling=theta0)
                           * wimg)

        g = jax.grad(loss)(theta0)
        fd = _fd(loss, theta0, field, idx, eps)
        ad = float(np.asarray(g[field])[idx])
        assert np.isfinite(ad)
        scale = max(abs(fd), abs(ad), 1e-3)
        assert abs(ad - fd) / scale < rtol, (field, idx, ad, fd)


# ---------------------------------------------------------------------------
# shadow (secondary-bounce) silhouette gradients: the occluder is OUTSIDE
# the camera frustum, so only its moving SHADOW changes the image
# ---------------------------------------------------------------------------

def _shadow_scene():
    """Floor seen from a camera beneath the occluder: moving the occluder
    changes the image ONLY through its shadow (one indirect bounce). The
    primary-visibility edge term is blind to it; the shadow edge term
    must recover the full gradient."""
    from yocto_tpu.models.scene import CameraData, SceneData
    from yocto_tpu.models.shape import ShapeData

    def quad(pts):
        return ShapeData(
            positions=np.asarray(pts, np.float32),
            quads=np.array([[0, 1, 2, 3]], np.int32))

    scene = SceneData()
    # camera at (0, 1.2, 0) looking straight down, below the occluder
    scene.cameras.append(CameraData(
        frame=np.array([[-1, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1.2, 0]],
                       np.float32),
        lens=0.05, film=0.036, aspect=1.0, focus=1.2))
    scene.materials.append(MaterialData(
        color=np.array([0.7, 0.7, 0.7], np.float32)))        # floor
    scene.materials.append(MaterialData(
        emission=np.array([10.0, 10.0, 10.0], np.float32)))  # light
    scene.materials.append(MaterialData(
        color=np.array([0.05, 0.05, 0.05], np.float32)))     # occluder
    # floor at y=0 (verts 0-3)
    scene.shapes.append(quad([[-1, 0, -1], [1, 0, -1],
                              [1, 0, 1], [-1, 0, 1]]))
    scene.instances.append(InstanceData(shape=0, material=0))
    # rect area light at y=4 (verts 4-7)
    scene.shapes.append(quad([[-0.3, 4, -0.3], [0.3, 4, -0.3],
                              [0.3, 4, 0.3], [-0.3, 4, 0.3]]))
    scene.instances.append(InstanceData(shape=1, material=1))
    # occluder sheet at y=2 covering x<0; its right edge (x=0) casts the
    # penumbra under study onto the floor (verts 8-11; edge verts 9, 10)
    scene.shapes.append(quad([[-2, 2, -1.5], [0, 2, -1.5],
                              [0, 2, 1.5], [-2, 2, 1.5]]))
    scene.instances.append(InstanceData(shape=2, material=2))
    return scene


def test_shadow_silhouette_grad_matches_fd():
    params = TraceParams(resolution=32, samples=8, bounces=2,
                         sampler=SamplerType.path)
    dr = DiffRenderer(_shadow_scene(), params)
    theta0 = dr.theta()
    key = jax.random.PRNGKey(7)

    def loss_primary_only(theta):
        return jnp.mean(dr.render_edges(theta, key,
                                        theta_sampling=theta0))

    def loss_shadow(theta):
        return jnp.mean(dr.render_edges(theta, key, theta_sampling=theta0,
                                        shadow=True))

    g_prim = jax.grad(loss_primary_only)(theta0)
    g_shad = jax.grad(loss_shadow)(theta0)
    # occluder right-edge verts are pool positions 9, 10
    ad_prim = float(np.asarray(g_prim["positions"])[9, 0]
                    + np.asarray(g_prim["positions"])[10, 0])
    ad_shad = float(np.asarray(g_shad["positions"])[9, 0]
                    + np.asarray(g_shad["positions"])[10, 0])

    # finite difference of the real image mean: shift the whole occluder
    def mean_at(dx):
        th = {k: np.asarray(v).copy() for k, v in theta0.items()}
        th["positions"][8:12, 0] += dx
        th = {k: jnp.asarray(v) for k, v in th.items()}
        return float(jnp.mean(dr.render(th, theta_sampling=theta0)))

    h = 2e-2
    fd = (mean_at(h) - mean_at(-h)) / (2 * h)
    assert np.isfinite(fd) and abs(fd) > 1e-3, fd
    # the primary-only estimator is blind to the moving shadow
    assert abs(ad_prim) < 0.25 * abs(fd), (ad_prim, fd)
    # the shadow edge term recovers it (sign + magnitude)
    assert np.isfinite(ad_shad)
    assert np.sign(ad_shad) == np.sign(fd), (ad_shad, fd)
    assert abs(ad_shad - fd) / abs(fd) < 0.5, (ad_shad, fd)


# ---------------------------------------------------------------------------
# TWO-bounce shadow silhouette gradients (VERDICT r3 #8): the shadow falls
# on a floor the camera never sees directly — only its bounce onto a wall
# is visible, so the depth-1 shadow term is blind and depth-2 must recover
# ---------------------------------------------------------------------------

def _two_bounce_shadow_scene():
    """Camera stares at a wall lit (a) directly by the light and (b) by
    bounce off a floor whose shadow the occluder casts. The occluder sits
    outside the camera frustum AND never blocks wall<->light paths (its
    sheet covers z < 0 at y=2; wall-light segments cross y=2 at z > 0.4),
    so moving it changes the image ONLY through floor-mediated bounce."""
    from yocto_tpu.models.scene import CameraData, SceneData
    from yocto_tpu.models.shape import ShapeData

    def quad(pts):
        return ShapeData(
            positions=np.asarray(pts, np.float32),
            quads=np.array([[0, 1, 2, 3]], np.int32))

    scene = SceneData()
    # camera at (0, 0.8, -2.5) looking toward +z; lens 0.1 narrows the
    # frustum to ~±0.72 at the wall (z=1.5): the wall fills the view
    scene.cameras.append(CameraData(
        frame=np.array([[-1, 0, 0], [0, 1, 0], [0, 0, -1], [0, 0.8, -2.5]],
                       np.float32),
        lens=0.1, film=0.036, aspect=1.0, focus=4.0))
    scene.materials.append(MaterialData(
        color=np.array([0.8, 0.8, 0.8], np.float32)))        # floor
    scene.materials.append(MaterialData(
        emission=np.array([10.0, 10.0, 10.0], np.float32)))  # light
    scene.materials.append(MaterialData(
        color=np.array([0.05, 0.05, 0.05], np.float32)))     # occluder
    scene.materials.append(MaterialData(
        color=np.array([0.7, 0.7, 0.7], np.float32)))        # wall
    # floor at y=0 (verts 0-3)
    scene.shapes.append(quad([[-1, 0, -1], [1, 0, -1],
                              [1, 0, 1], [-1, 0, 1]]))
    scene.instances.append(InstanceData(shape=0, material=0))
    # rect area light at y=4 (verts 4-7)
    scene.shapes.append(quad([[-0.3, 4, -0.3], [0.3, 4, -0.3],
                              [0.3, 4, 0.3], [-0.3, 4, 0.3]]))
    scene.instances.append(InstanceData(shape=1, material=1))
    # occluder sheet at y=2 covering x<0, z<0 (verts 8-11); its x=0 edge
    # (verts 9, 10) casts the moving shadow onto the floor quadrant
    scene.shapes.append(quad([[-2, 2, -1.5], [0, 2, -1.5],
                              [0, 2, 0], [-2, 2, 0]]))
    scene.instances.append(InstanceData(shape=2, material=2))
    # wall at z=1.5 facing the camera (verts 12-15)
    scene.shapes.append(quad([[-1.2, 0, 1.5], [1.2, 0, 1.5],
                              [1.2, 2.2, 1.5], [-1.2, 2.2, 1.5]]))
    scene.instances.append(InstanceData(shape=3, material=3))
    return scene


def test_shadow_silhouette_grad_two_bounce():
    params = TraceParams(resolution=24, samples=8, bounces=3,
                         sampler=SamplerType.path)
    dr = DiffRenderer(_two_bounce_shadow_scene(), params)
    theta0 = dr.theta()
    key = jax.random.PRNGKey(13)

    def loss(theta, depth):
        return jnp.mean(dr.render_edges(theta, key, theta_sampling=theta0,
                                        shadow=True, shadow_depth=depth))

    g_d1 = jax.grad(lambda th: loss(th, 1))(theta0)
    g_d2 = jax.grad(lambda th: loss(th, 2))(theta0)
    occ = slice(8, 12)
    ad_d1 = float(np.asarray(g_d1["positions"])[occ, 0].sum())
    ad_d2 = float(np.asarray(g_d2["positions"])[occ, 0].sum())

    # finite difference of the real image mean: shift the whole occluder
    def mean_at(dx):
        th = {k: np.asarray(v).copy() for k, v in theta0.items()}
        th["positions"][occ, 0] += dx
        th = {k: jnp.asarray(v) for k, v in th.items()}
        return float(jnp.mean(dr.render(th, theta_sampling=theta0)))

    h = 3e-2
    fd = (mean_at(h) - mean_at(-h)) / (2 * h)
    assert np.isfinite(fd) and abs(fd) > 1e-5, fd
    # the depth-1 term only sees camera-visible receivers (the wall,
    # whose direct light the occluder never blocks) -> provably blind
    assert abs(ad_d1) < 0.25 * abs(fd), (ad_d1, fd)
    # depth 2 walks one matte bounce to the floor and recovers it
    assert np.isfinite(ad_d2)
    assert np.sign(ad_d2) == np.sign(fd), (ad_d2, fd)
    assert abs(ad_d2 - fd) / abs(fd) < 0.5, (ad_d2, fd)
