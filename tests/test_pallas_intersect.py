"""Pallas fused brute-force intersector vs the pure-jnp oracle.

Runs the kernel in interpreter mode (tests execute on the CPU backend;
the TPU path compiles the same kernel) and checks hit/instance/element/
uv/distance agreement against intersect_scene_bruteforce on the Cornell
box and on a mixed lines+points scene.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from yocto_tpu.models.examples import make_cornellbox
from yocto_tpu.models.scene import (CameraData, InstanceData, MaterialData,
                                    SceneData)
from yocto_tpu.models.shape import ShapeData
from yocto_tpu.trace.compile import compile_scene, scene_features
from yocto_tpu.trace.intersect import intersect_scene_bruteforce
from yocto_tpu.trace.pallas_intersect import (
    make_pallas_bruteforce_intersector, make_pallas_small_intersector)


def _rays(n, seed, center=(0.0, 0.0, 0.0), spread=2.0):
    rng = np.random.RandomState(seed)
    ro = (rng.rand(n, 3).astype(np.float32) - 0.5) * spread + center
    rd = rng.randn(n, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def _check(scene, n=2048, seed=7, center=(0, 1, 0), small=False):
    flat = compile_scene(scene)
    feats = scene_features(scene)
    if small:
        isect_p = make_pallas_small_intersector(scene, interpret=True)
        assert isect_p is not None
    else:
        isect_p = make_pallas_bruteforce_intersector(
            scene, kinds=feats.kinds, interpret=True)
    ro, rd = _rays(n, seed, center=center)
    a = intersect_scene_bruteforce(flat, ro, rd, kinds=feats.kinds)
    b = isect_p(flat, ro, rd)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    np.testing.assert_array_equal(np.asarray(a.instance),
                                  np.asarray(b.instance))
    np.testing.assert_array_equal(np.asarray(a.element),
                                  np.asarray(b.element))
    hit = np.asarray(a.hit)
    # FMA-contraction differences between backends allow ulp-level drift
    np.testing.assert_allclose(np.asarray(a.distance)[hit],
                               np.asarray(b.distance)[hit], rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.uv)[hit],
                               np.asarray(b.uv)[hit], atol=1e-5)


def test_pallas_matches_jnp_cornell():
    _check(make_cornellbox())


def test_pallas_matches_jnp_lines_points():
    rng = np.random.RandomState(3)
    scene = SceneData()
    scene.cameras.append(CameraData())
    scene.materials.append(MaterialData(color=np.ones(3, np.float32)))
    # line strips
    npts = 40
    pos = rng.rand(npts, 3).astype(np.float32) * 2 - 1
    lines = np.stack([np.arange(npts - 1), np.arange(1, npts)], 1)
    sh = ShapeData(positions=pos, lines=lines.astype(np.int32),
                   radius=np.full(npts, 0.05, np.float32))
    scene.shapes.append(sh)
    scene.instances.append(InstanceData(shape=0, material=0))
    # points
    pos2 = rng.rand(16, 3).astype(np.float32) * 2 - 1
    sh2 = ShapeData(positions=pos2,
                    points=np.arange(16, dtype=np.int32),
                    radius=np.full(16, 0.08, np.float32))
    scene.shapes.append(sh2)
    fr = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [0.1, 0.2, 0.0]],
                  np.float32)
    scene.instances.append(InstanceData(frame=fr, shape=1, material=0))
    _check(scene, n=1024, seed=11, center=(0, 0, 0))


def test_pallas_small_matches_jnp_cornell():
    _check(make_cornellbox(), small=True)


def test_pallas_small_matches_jnp_lines_points():
    # reuse the mixed-kind scene from the chunked-kernel test
    import tests.test_pallas_intersect as me
    rng = np.random.RandomState(3)
    scene = SceneData()
    scene.cameras.append(CameraData())
    scene.materials.append(MaterialData(color=np.ones(3, np.float32)))
    npts = 40
    pos = rng.rand(npts, 3).astype(np.float32) * 2 - 1
    lines = np.stack([np.arange(npts - 1), np.arange(1, npts)], 1)
    scene.shapes.append(ShapeData(positions=pos,
                                  lines=lines.astype(np.int32),
                                  radius=np.full(npts, 0.05, np.float32)))
    scene.instances.append(InstanceData(shape=0, material=0))
    pos2 = rng.rand(16, 3).astype(np.float32) * 2 - 1
    scene.shapes.append(ShapeData(positions=pos2,
                                  points=np.arange(16, dtype=np.int32),
                                  radius=np.full(16, 0.08, np.float32)))
    fr = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [0.1, 0.2, 0.0]],
                  np.float32)
    scene.instances.append(InstanceData(frame=fr, shape=1, material=0))
    _check(scene, n=1024, seed=11, center=(0, 0, 0), small=True)
