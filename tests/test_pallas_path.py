"""Fused Pallas path megakernel vs the lockstep path sampler.

The kernel consumes the same per-pixel PCG32 draws in the same order, so
at equal seeds the images agree to float precision (the only deviation is
the o + t*d shading point vs barycentric interpolation, a few ulps)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

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
    # white delta glass (zero density) qualifies since round 2; TINTED
    # glass (absorbing interior -> real transmittance sampling) does not
    scene.materials.append(MaterialData(
        type=MaterialType.refractive, roughness=0.0,
        color=np.ones(3, np.float32)))
    sph = make_sphere(steps=4, scale=0.2)
    sph.normals = np.zeros((0, 3), np.float32)  # faceted (no interp carry)
    scene.shapes.append(sph)
    scene.instances.append(InstanceData(shape=len(scene.shapes) - 1,
                                        material=len(scene.materials) - 1))
    assert supports_pallas_path(scene, scene_features(scene), params)
    scene.materials[-1] = MaterialData(
        type=MaterialType.refractive, roughness=0.0,
        color=np.array([1.0, 0.7, 0.7], np.float32))
    assert not supports_pallas_path(scene, scene_features(scene), params)
    # rough refractive falls back to the general samplers
    scene.materials[-1] = MaterialData(type=MaterialType.refractive,
                                       roughness=0.2)
    assert not supports_pallas_path(scene, scene_features(scene), params)


def _delta_scene():
    """Cornell box + delta glass sphere, mirror tall box, transparent
    short box — every delta lobe family in one <=512-candidate scene."""
    from yocto_tpu.models.procedural import make_sphere
    from yocto_tpu.models.scene import InstanceData, MaterialData, \
        MaterialType

    scene = make_cornellbox()
    m_tall = scene.instances[scene.instance_names.index("tallbox")]
    scene.materials[m_tall.material] = MaterialData(
        type=MaterialType.reflective,
        color=np.array([0.8, 0.8, 0.8], np.float32), roughness=0.0)
    m_short = scene.instances[scene.instance_names.index("shortbox")]
    scene.materials[m_short.material] = MaterialData(
        type=MaterialType.transparent,
        color=np.array([0.7, 0.9, 0.7], np.float32), roughness=0.0)
    scene.materials.append(MaterialData(
        type=MaterialType.refractive, roughness=0.0,
        color=np.ones(3, np.float32)))
    # small candidate count: interpret-mode unrolls candidates x bounces,
    # and XLA CPU compiles of the big graph take minutes on this host
    sph = make_sphere(steps=4, scale=0.25)
    sph.normals = np.zeros((0, 3), np.float32)  # faceted (no interp carry)
    scene.shapes.append(sph)
    frame = np.eye(4, 3, dtype=np.float32)
    frame[3] = (0.0, 0.8, 0.5)
    scene.instances.append(InstanceData(
        frame=frame, shape=len(scene.shapes) - 1,
        material=len(scene.materials) - 1))
    return scene


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW_TESTS"),
    reason="interpret-mode compile of the delta megakernel takes >1h on "
           "this 1-core host; set RUN_SLOW_TESTS=1 (TPU parity is driven "
           "by scripts/ + bench jobs, where remote compiles are fast)")
def test_megakernel_delta_matches_lockstep():
    scene = _delta_scene()
    params = TraceParams(resolution=24, samples=3, bounces=5,
                         sampler=SamplerType.path)
    feats = scene_features(scene)
    assert supports_pallas_path(scene, feats, params)
    assert feats.has_delta and feats.has_volumes
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
    # delta lobes amplify ulp noise: a fresnel/TIR branch that flips under
    # float-order differences sends the path somewhere else entirely, so
    # at 3 spp a handful of pixels legitimately diverge. Measured on TPU:
    # megakernel-vs-lockstep (same device) mean 4.3e-4 / 0.9% > 0.05,
    # SMALLER than lockstep-vs-itself across devices (8.3e-4 / 1.2%).
    assert d.mean() < 1.5e-3, d.mean()
    assert (d.max(-1) > 0.05).mean() < 0.025


def _smooth_sphere_scene():
    """Cornell box + a SMOOTH glossy sphere (vertex normals kept): the
    kernel's test-time normal interpolation vs the lockstep eval_normal."""
    from yocto_tpu.models.procedural import make_sphere
    from yocto_tpu.models.scene import InstanceData, MaterialData, \
        MaterialType

    scene = make_cornellbox()
    scene.materials.append(MaterialData(
        type=MaterialType.glossy,
        color=np.array([0.5, 0.7, 0.5], np.float32), roughness=0.2))
    sph = make_sphere(steps=2, scale=0.35)  # tiny: interpret compile cost
    scene.shapes.append(sph)
    frame = np.eye(4, 3, dtype=np.float32)
    frame[3] = (0.0, 0.4, 0.3)
    scene.instances.append(InstanceData(
        frame=frame, shape=len(scene.shapes) - 1,
        material=len(scene.materials) - 1))
    return scene


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW_TESTS"),
    reason="interpret-mode compile of the smooth-normal megakernel takes "
           ">20 min on this 1-core host; set RUN_SLOW_TESTS=1. Verified "
           "on the real TPU (64^2, 8 spp, 8 bounces): mean abs diff vs "
           "lockstep 1.8e-9, 0 pixels diverge")
def test_megakernel_smooth_normals_match_lockstep():
    scene = _smooth_sphere_scene()
    params = TraceParams(resolution=24, samples=3, bounces=4,
                         sampler=SamplerType.path)
    feats = scene_features(scene)
    assert supports_pallas_path(scene, feats, params)
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


def test_megakernel_constant_env_matches_lockstep():
    """Cornell + a constant-color textureless environment: the env joins
    the uniform light pick (sample_sphere direction, 1/4pi pdf) and misses
    collect weight * emission — same draw sites as the lockstep sampler."""
    from yocto_tpu.models.scene import EnvironmentData

    scene = make_cornellbox()
    scene.environments.append(EnvironmentData(
        emission=np.array([0.2, 0.3, 0.4], np.float32)))
    scene.environment_names.append("sky")
    params = TraceParams(resolution=24, samples=3, bounces=5,
                         sampler=SamplerType.path)
    feats = scene_features(scene)
    assert supports_pallas_path(scene, feats, params)
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


def test_megakernel_env_qualification():
    """Textured environments fall back; constant ones qualify."""
    from yocto_tpu.models.scene import EnvironmentData, TextureData

    params = TraceParams(resolution=24, samples=1, bounces=4,
                         sampler=SamplerType.path)
    scene = make_cornellbox()
    scene.textures.append(TextureData(
        pixelsf=np.ones((4, 4, 4), np.float32), width=4, height=4))
    scene.texture_names.append("sky_tex")
    scene.environments.append(EnvironmentData(
        emission=np.ones(3, np.float32), emission_tex=0))
    scene.environment_names.append("sky")
    assert not supports_pallas_path(scene, scene_features(scene), params)


@pytest.mark.skipif(not os.environ.get("RUN_SLOW_TESTS"),
                    reason="XLA CPU compile of the fori_loop megakernel "
                           "takes tens of minutes on this 1-core host; "
                           "the real-TPU tier covers it every round")
def test_megakernel_multisample_matches_sequential():
    """spp_inner=k (device-side sample loop + in-kernel camera rays)
    equals k sequential one-sample megakernel runs: same chained PCG32
    streams, same per-sample clamp, same accumulators."""
    scene = make_cornellbox()
    spp = 2
    params = TraceParams(resolution=8, samples=spp, bounces=3,
                         sampler=SamplerType.path)
    assert supports_pallas_path(scene, scene_features(scene), params)
    r = Renderer(scene, params)

    # sequential reference: the one-sample kernel driven by the host
    run = make_pallas_path_sampler(scene, params, interpret=True)
    state = make_trace_state(scene, params)
    rngs = state.rng
    img = np.zeros((8 * 8, 3), np.float32)
    hits = np.zeros(8 * 8, np.int64)
    for s in range(spp):
        ro, rd, rngs = sample_camera_rays(r.flat, 0, 8, 8, rngs, False)
        radiance, hit, alb, nrm, rngs = run(ro, rd, rngs)
        rad = np.nan_to_num(np.asarray(radiance), nan=0.0)
        mx = rad.max(-1)
        scale = np.where(mx > params.clamp,
                         params.clamp / np.maximum(mx, 1e-20), 1.0)
        rad = rad * scale[:, None]
        rad = np.where(np.asarray(hit)[:, None], rad, 0.0)
        img += rad
        hits += np.asarray(hit)

    step = make_pallas_path_sampler(scene, params, interpret=True,
                                    spp_inner=spp)
    jj, ii = jnp.meshgrid(jnp.arange(8, dtype=jnp.float32),
                          jnp.arange(8, dtype=jnp.float32),
                          indexing="ij")
    img_sum, alb_sum, nrm_sum, hits_sum, rngs_ms = step(
        ii.reshape(-1), jj.reshape(-1), state.rng)

    # golden-style thresholds: the in-kernel camera ray differs from the
    # XLA-computed one by ulps, which can flip a rare grazing hit (one
    # lane in 4096 measured on chip); everything else is identical
    d = np.abs(np.asarray(img_sum)[:, :3] - img)
    assert d.mean() < 1e-3, d.mean()
    assert (d.max(-1) > 1e-3).mean() < 0.005
    np.testing.assert_array_equal(np.asarray(hits_sum).astype(np.int64),
                                  hits)
    # the chained streams END at the same state as sequential sampling
    # (up to the same rare flipped lanes)
    same = (np.asarray(rngs_ms.state_lo) == np.asarray(rngs.state_lo))
    assert same.mean() > 0.995, same.mean()
