"""Cluster-binned Pallas intersector vs the pure-jnp oracle.

The cluster pipeline (cull -> bin -> per-cluster sweep -> reduce) must
reproduce brute-force closest-hit results: same hit mask and distances;
instance/element may differ only where two candidates hit at the exact
same t (measure-zero tie-breaks across candidate orders).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from yocto_tpu.models.procedural import make_box, make_sphere, make_uvsphere
from yocto_tpu.models.scene import (CameraData, InstanceData, MaterialData,
                                    SceneData)
from yocto_tpu.trace.compile import compile_scene, scene_features
from yocto_tpu.trace.intersect import intersect_scene_bruteforce
from yocto_tpu.trace.pallas_cluster import make_cluster_intersector


def _multi_sphere_scene():
    """3 instanced spheres + a box: ~5k candidates -> several clusters."""
    scene = SceneData()
    scene.cameras.append(CameraData())
    scene.materials.append(MaterialData(color=np.ones(3, np.float32)))
    scene.shapes.append(make_uvsphere(steps=(32, 32), scale=0.6))
    scene.shapes.append(make_box(steps=(4, 4, 4), scale=(0.4, 0.4, 0.4)))
    offsets = [(-1.0, 0.0, 0.0), (1.1, 0.3, 0.2), (0.0, -0.9, 0.5)]
    for off in offsets:
        fr = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], off], np.float32)
        scene.instances.append(InstanceData(frame=fr, shape=0, material=0))
    fr = np.array([[0.8, 0.2, 0], [-0.2, 0.8, 0], [0, 0, 1.0],
                   [0.2, 1.2, -0.4]], np.float32)
    scene.instances.append(InstanceData(frame=fr, shape=1, material=0))
    return scene


def _rays(n, seed, spread=3.0):
    rng = np.random.RandomState(seed)
    ro = (rng.rand(n, 3).astype(np.float32) - 0.5) * spread
    rd = rng.randn(n, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_cluster_matches_bruteforce():
    scene = _multi_sphere_scene()
    flat = compile_scene(scene)
    feats = scene_features(scene)
    isect = make_cluster_intersector(scene, kinds=feats.kinds,
                                     interpret=True)
    assert isect is not None, "scene should qualify for clustering"
    assert isect.n_clusters > 2
    ro, rd = _rays(512, seed=5)
    a = intersect_scene_bruteforce(flat, ro, rd, kinds=feats.kinds)
    b = isect(flat, ro, rd)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    hit = np.asarray(a.hit)
    np.testing.assert_allclose(np.asarray(a.distance)[hit],
                               np.asarray(b.distance)[hit], rtol=1e-5,
                               atol=1e-6)
    # ids may differ only on exact-t ties; require near-total agreement
    same = (np.asarray(a.instance) == np.asarray(b.instance)) & \
           (np.asarray(a.element) == np.asarray(b.element))
    assert same[hit].mean() > 0.999
    uv_same = same[hit]
    np.testing.assert_allclose(np.asarray(a.uv)[hit][uv_same],
                               np.asarray(b.uv)[hit][uv_same], atol=1e-5)


def test_cluster_tmax_clips_hits():
    scene = _multi_sphere_scene()
    flat = compile_scene(scene)
    feats = scene_features(scene)
    isect = make_cluster_intersector(scene, kinds=feats.kinds,
                                     interpret=True)
    ro, rd = _rays(256, seed=9)
    full = isect(flat, ro, rd)
    near = isect(flat, ro, rd, tmax=jnp.float32(0.5))
    d = np.asarray(full.distance)
    nhit = np.asarray(near.hit)
    # rays whose closest hit is beyond tmax must report a miss (or a hit
    # closer than the clip; brute force has a single hit per ray here)
    assert not np.any(nhit & (np.asarray(near.distance) > 0.5 + 1e-5))
    assert np.all(nhit[np.asarray(full.hit) & (d <= 0.45)])


def test_cluster_small_scene_returns_none():
    scene = SceneData()
    scene.cameras.append(CameraData())
    scene.materials.append(MaterialData())
    scene.shapes.append(make_sphere(steps=4))
    scene.instances.append(InstanceData(shape=0, material=0))
    assert make_cluster_intersector(scene) is None


def test_cluster_tile_stats():
    scene = _multi_sphere_scene()
    feats = scene_features(scene)
    isect = make_cluster_intersector(scene, kinds=feats.kinds,
                                     interpret=True)
    ro, rd = _rays(256, seed=3)
    mean_c, max_c, overflow = isect.tile_stats(ro, rd)
    assert 0 < mean_c <= isect.n_clusters
    assert max_c <= isect.n_clusters
    assert overflow == 0


def test_cluster_any_hit_matches_bruteforce():
    """any_hit == (bruteforce closest-hit exists within tmax), both for
    unbounded and per-lane shadow-ray tmax (find_any semantics,
    yocto_bvh.cpp:540-552)."""
    scene = _multi_sphere_scene()
    flat = compile_scene(scene)
    feats = scene_features(scene)
    isect = make_cluster_intersector(scene, kinds=feats.kinds,
                                     interpret=True)
    assert isect is not None
    ro, rd = _rays(512, seed=3)
    want_full = intersect_scene_bruteforce(flat, jnp.asarray(ro),
                                           jnp.asarray(rd),
                                           kinds=feats.kinds)
    got = isect.any_hit(jnp.asarray(ro), jnp.asarray(rd))
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(want_full.hit))

    # shadow-ray tmax: block only when the closest hit is nearer
    dist = np.asarray(want_full.distance)
    tmax = np.where(np.asarray(want_full.hit), dist * 0.5, 1.0)
    got_t = isect.any_hit(jnp.asarray(ro), jnp.asarray(rd),
                          tmax=jnp.asarray(tmax.astype(np.float32)))
    want_t = intersect_scene_bruteforce(
        flat, jnp.asarray(ro), jnp.asarray(rd),
        tmax=jnp.asarray(tmax.astype(np.float32)), kinds=feats.kinds)
    np.testing.assert_array_equal(np.asarray(got_t),
                                  np.asarray(want_t.hit))
