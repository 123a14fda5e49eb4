"""BVH build + traversal tests: native builder vs NumPy oracle, and
BVH traversal vs brute-force intersection."""

import numpy as np

from yocto_tpu.models.examples import make_cornellbox
from yocto_tpu.models.scene import InstanceData
from yocto_tpu.ops import bvh as HB


def _random_bboxes(n, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    sizes = rng.uniform(0.01, 0.1, (n, 3)).astype(np.float32)
    return np.stack([centers - sizes, centers + sizes], axis=1)


def test_native_matches_numpy_builder():
    from yocto_tpu.native import build_bvh_native

    bboxes = _random_bboxes(500)
    for hq in (False, True):
        ref = HB.make_bvh(bboxes, hq)
        native = build_bvh_native(bboxes, hq)
        if native is None:  # toolchain unavailable: numpy fallback only
            return
        np.testing.assert_array_equal(native.start, ref.start)
        np.testing.assert_array_equal(native.num, ref.num)
        np.testing.assert_array_equal(native.axis, ref.axis)
        np.testing.assert_array_equal(native.internal, ref.internal)
        np.testing.assert_array_equal(native.primitives, ref.primitives)
        np.testing.assert_allclose(native.bbox_min, ref.bbox_min)
        np.testing.assert_allclose(native.bbox_max, ref.bbox_max)


def test_bvh_hits_match_bruteforce():
    import jax.numpy as jnp

    from yocto_tpu.trace.bvh import build_scene_bvh, make_bvh_intersector
    from yocto_tpu.trace.compile import compile_scene
    from yocto_tpu.trace.intersect import intersect_scene_bruteforce

    scene_host = make_cornellbox()
    # add a scaled/rotated instance to exercise non-rigid transforms
    th = 0.7
    rot = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                    [-np.sin(th), 0, np.cos(th)]], np.float32) * 0.6
    scene_host.instances.append(InstanceData(
        frame=np.concatenate([rot, np.array([[0.3, 0.4, 0.1]], np.float32)]),
        shape=5, material=5))
    scene_host.instance_names.append("extra")
    scene = compile_scene(scene_host)
    bvh = build_scene_bvh(scene_host)
    intersect = make_bvh_intersector(bvh)

    rng = np.random.default_rng(11)
    n = 512
    ro = jnp.asarray(rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
                     * np.array([1, 0.5, 1], np.float32)
                     + np.array([0, 1, 0], np.float32))
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    rd = jnp.asarray(rd)

    a = intersect_scene_bruteforce(scene, ro, rd)
    b = intersect(scene, ro, rd)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    # coplanar surfaces (the boxes sit ON the floor) create exact-distance
    # ties where traversal order picks a different but equally-near hit;
    # require identical ids except at ties, and matching distances always
    same = (np.asarray(a.instance) == np.asarray(b.instance)) \
        & (np.asarray(a.element) == np.asarray(b.element))
    tie = np.isclose(np.asarray(a.distance), np.asarray(b.distance),
                     rtol=1e-5)
    assert np.all(same | tie)
    np.testing.assert_allclose(np.asarray(a.distance),
                               np.asarray(b.distance), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a.uv)[same],
                               np.asarray(b.uv)[same], rtol=1e-5, atol=1e-6)


def test_overlap_scene_closest_point():
    """Point-overlap queries (overlap_scene_bvh semantics,
    yocto_bvh.cpp:638-781): the returned uv must be the true closest
    point on the winning primitive (no sampled uv may be closer)."""
    import jax.numpy as jnp
    from yocto_tpu.models.examples import make_cornellbox
    from yocto_tpu.trace.compile import compile_scene
    from yocto_tpu.trace.intersect import overlap_scene_bruteforce
    from yocto_tpu.trace.sceneval import eval_position

    scene = make_cornellbox()
    flat = compile_scene(scene)
    rng = np.random.RandomState(5)
    pts = jnp.asarray((rng.rand(64, 3).astype(np.float32) - 0.5) * 2
                      + np.array([0, 1, 0], np.float32))
    o = overlap_scene_bruteforce(flat, pts, 10.0)
    assert np.asarray(o.hit).all()

    inst = jnp.maximum(o.instance, 0)
    shape = flat.inst_shape[inst]
    gelem = flat.shape_elem_start[shape] + jnp.maximum(o.element, 0)
    closest = eval_position(flat, inst, gelem, o.uv)
    d = np.linalg.norm(np.asarray(closest) - np.asarray(pts), axis=-1)
    np.testing.assert_allclose(d, np.asarray(o.distance), rtol=2e-3,
                               atol=2e-4)

    # optimality: random uvs on the winning element may not be closer
    for _ in range(10):
        ruv = jnp.asarray(rng.rand(64, 2).astype(np.float32))
        alt = eval_position(flat, inst, gelem, ruv)
        da = np.linalg.norm(np.asarray(alt) - np.asarray(pts), axis=-1)
        assert (da >= d - 1e-4).all()

    # tight radius: far points must miss
    far = overlap_scene_bruteforce(flat, pts + 100.0, 1.0)
    assert not np.asarray(far.hit).any()


def test_overlap_bvh_matches_bruteforce():
    """BVH-accelerated overlap (make_bvh_overlap) vs brute force on a
    scene with a scaled/rotated instance: same hit/instance/element/uv/
    distance up to exact-distance ties (yocto_bvh.cpp:638-781)."""
    import jax.numpy as jnp
    from yocto_tpu.trace.bvh import build_scene_bvh, make_bvh_overlap
    from yocto_tpu.trace.compile import compile_scene
    from yocto_tpu.trace.intersect import overlap_scene_bruteforce

    scene_host = make_cornellbox()
    th = 0.7
    rot = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                    [-np.sin(th), 0, np.cos(th)]], np.float32) * 0.6
    scene_host.instances.append(InstanceData(
        frame=np.concatenate([rot, np.array([[0.3, 0.4, 0.1]], np.float32)]),
        shape=5, material=5))
    scene_host.instance_names.append("extra")
    flat = compile_scene(scene_host)
    bvh = build_scene_bvh(scene_host)
    overlap = make_bvh_overlap(bvh, unroll=1, kinds=(3,))

    rng = np.random.RandomState(7)
    pts = jnp.asarray((rng.rand(256, 3).astype(np.float32) - 0.5) * 2.4
                      + np.array([0, 1, 0], np.float32))
    for dmax in (10.0, 0.35):
        a = overlap_scene_bruteforce(flat, pts, dmax)
        b = overlap(flat, pts, dmax)
        np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
        np.testing.assert_allclose(np.asarray(a.distance),
                                   np.asarray(b.distance), rtol=1e-5)
        same = (np.asarray(a.instance) == np.asarray(b.instance)) \
            & (np.asarray(a.element) == np.asarray(b.element))
        tie = np.isclose(np.asarray(a.distance), np.asarray(b.distance),
                         rtol=1e-5)
        assert np.all(same | tie)
        np.testing.assert_allclose(np.asarray(a.uv)[same],
                                   np.asarray(b.uv)[same],
                                   rtol=1e-4, atol=1e-5)


def test_overlap_bvh_scaling_smoke():
    """Node culling must visit far fewer nodes than the tree holds: on a
    many-instance scene the walk terminates well under the brute-force
    candidate count and answers match brute force."""
    import jax.numpy as jnp
    from yocto_tpu.models.examples import make_cornellbox
    from yocto_tpu.models.procedural import make_sphere
    from yocto_tpu.models.scene import SceneData, InstanceData, MaterialData
    from yocto_tpu.trace.bvh import build_scene_bvh, make_bvh_overlap
    from yocto_tpu.trace.compile import compile_scene
    from yocto_tpu.trace.intersect import overlap_scene_bruteforce

    scene = SceneData()
    scene.shapes.append(make_sphere(steps=8, scale=0.08))
    scene.shape_names.append("s")
    scene.materials.append(MaterialData())
    scene.material_names.append("m")
    rng = np.random.RandomState(3)
    for i in range(64):
        frame = np.concatenate(
            [np.eye(3, dtype=np.float32),
             rng.uniform(-1, 1, (1, 3)).astype(np.float32)])
        scene.instances.append(InstanceData(frame=frame, shape=0,
                                            material=0))
        scene.instance_names.append(f"i{i}")
    flat = compile_scene(scene)
    bvh = build_scene_bvh(scene)
    overlap = make_bvh_overlap(bvh, unroll=1, kinds=(3,))
    pts = jnp.asarray(rng.uniform(-1, 1, (128, 3)).astype(np.float32))
    a = overlap_scene_bruteforce(flat, pts, 0.5)
    b = overlap(flat, pts, 0.5)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    np.testing.assert_allclose(np.asarray(a.distance),
                               np.asarray(b.distance), rtol=1e-5)
