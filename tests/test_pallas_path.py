"""Fused Pallas path megakernel vs the lockstep path sampler.

The kernel consumes the same per-pixel PCG32 draws in the same order, so
at equal seeds the images agree to float precision (the only deviation is
the o + t*d shading point vs barycentric interpolation, a few ulps)."""

import numpy as np
import jax.numpy as jnp

from yocto_tpu.models.examples import make_cornellbox
from yocto_tpu.trace.compile import scene_features
from yocto_tpu.trace.pallas_path import (make_pallas_path_sampler,
                                         supports_pallas_path)
from yocto_tpu.trace.params import SamplerType, TraceParams
from yocto_tpu.trace.renderer import (Renderer, get_image,
                                      make_trace_state, sample_camera_rays)


def test_megakernel_matches_lockstep():
    scene = make_cornellbox()
    params = TraceParams(resolution=24, samples=3, bounces=5,
                         sampler=SamplerType.path)
    assert supports_pallas_path(scene, scene_features(scene), params)
    r = Renderer(scene, params)
    ref = get_image(r.render())[..., :3]

    run = make_pallas_path_sampler(scene, params, interpret=True)
    state = make_trace_state(scene, params)
    img = np.zeros((24, 24, 3), np.float32)
    rngs = state.rng
    for s in range(3):
        ro, rd, rngs = sample_camera_rays(r.flat, 0, 24, 24, rngs, False)
        radiance, hit, alb, nrm, rngs = run(ro, rd, rngs)
        rad = np.nan_to_num(np.asarray(radiance), nan=0.0)
        mx = rad.max(-1)
        scale = np.where(mx > params.clamp,
                         params.clamp / np.maximum(mx, 1e-20), 1.0)
        rad = rad * scale[:, None]
        img += (rad.reshape(24, 24, 3) - img) / (s + 1)
    d = np.abs(img - ref)
    # ulp-level fp-order differences can flip a rare edge hit; match the
    # golden-test style thresholds
    assert d.mean() < 2e-4, d.mean()
    assert (d.max(-1) > 0.05).mean() < 0.005


def test_megakernel_qualification():
    from yocto_tpu.models.procedural import make_sphere
    from yocto_tpu.models.scene import InstanceData, MaterialData, \
        MaterialType

    scene = make_cornellbox()
    params = TraceParams(resolution=24, samples=1, bounces=4,
                         sampler=SamplerType.path)
    feats = scene_features(scene)
    assert supports_pallas_path(scene, feats, params)
    # a delta material (refractive, roughness 0) disqualifies — the
    # kernel covers the rough lobe families only
    scene.materials.append(MaterialData(type=MaterialType.refractive,
                                        roughness=0.0))
    scene.shapes.append(make_sphere(steps=4, scale=0.2))
    scene.instances.append(InstanceData(shape=len(scene.shapes) - 1,
                                        material=len(scene.materials) - 1))
    assert not supports_pallas_path(scene, scene_features(scene), params)


def _pbr_boxes_scene():
    """Cornell box with the two inner boxes turned GGX glossy/metal —
    faceted (no vertex normals), <=512 candidates, no delta lobes."""
    from yocto_tpu.models.scene import MaterialData, MaterialType

    scene = make_cornellbox()
    m_short = scene.instances[scene.instance_names.index("shortbox")]
    scene.materials[m_short.material] = MaterialData(
        type=MaterialType.glossy,
        color=np.array([0.5, 0.7, 0.5], np.float32), roughness=0.2)
    m_tall = scene.instances[scene.instance_names.index("tallbox")]
    scene.materials[m_tall.material] = MaterialData(
        type=MaterialType.reflective,
        color=np.array([0.66, 0.45, 0.34], np.float32), roughness=0.15)
    return scene


def test_megakernel_glossy_reflective_matches_lockstep():
    scene = _pbr_boxes_scene()
    params = TraceParams(resolution=24, samples=3, bounces=5,
                         sampler=SamplerType.path)
    feats = scene_features(scene)
    assert supports_pallas_path(scene, feats, params)
    assert set(feats.mat_types) == {0, 1, 2}
    r = Renderer(scene, params)
    ref = get_image(r.render())[..., :3]

    run = make_pallas_path_sampler(scene, params, interpret=True)
    state = make_trace_state(scene, params)
    img = np.zeros((24, 24, 3), np.float32)
    rngs = state.rng
    for s in range(3):
        ro, rd, rngs = sample_camera_rays(r.flat, 0, 24, 24, rngs, False)
        radiance, hit, alb, nrm, rngs = run(ro, rd, rngs)
        rad = np.nan_to_num(np.asarray(radiance), nan=0.0)
        mx = rad.max(-1)
        scale = np.where(mx > params.clamp,
                         params.clamp / np.maximum(mx, 1e-20), 1.0)
        rad = rad * scale[:, None]
        img += (rad.reshape(24, 24, 3) - img) / (s + 1)
    d = np.abs(img - ref)
    assert d.mean() < 2e-4, d.mean()
    assert (d.max(-1) > 0.05).mean() < 0.005
