"""Wavefront renderer vs lockstep renderer: statistical agreement.

The wavefront pipeline uses per-(pixel,sample) PCG streams (independent of
the lockstep renderer's sequential streams) so images agree in expectation,
not bitwise; at equal spp the residual is Monte-Carlo noise.
"""

import numpy as np
import pytest

from yocto_tpu.models.examples import make_cornellbox
from yocto_tpu.models.procedural import make_sphere
from yocto_tpu.models.scene import InstanceData, MaterialData, MaterialType
from yocto_tpu.trace.params import SamplerType, TraceParams
from yocto_tpu.trace.renderer import Renderer, get_image
from yocto_tpu.trace.wavefront import WavefrontRenderer


def _glass_cornell():
    scene = make_cornellbox()
    sph = make_sphere(steps=8, scale=0.35)
    scene.shapes.append(sph)
    scene.materials.append(MaterialData(
        type=MaterialType.refractive,
        color=np.array([0.9, 0.9, 0.9], np.float32), roughness=0.0))
    fr = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [0.3, 0.6, 0.3]],
                  np.float32)
    scene.instances.append(InstanceData(
        frame=fr, shape=len(scene.shapes) - 1,
        material=len(scene.materials) - 1))
    return scene


@pytest.mark.parametrize("make_scene,spp,tol_mean,tol_img", [
    (_glass_cornell, 12, 1.2e-2, 0.08),
])
def test_wavefront_matches_lockstep(make_scene, spp, tol_mean, tol_img):
    scene = make_scene()
    base = dict(resolution=32, samples=spp, bounces=4,
                sampler=SamplerType.path)
    ref = get_image(Renderer(scene, TraceParams(**base)).render())[..., :3]
    wf = WavefrontRenderer(scene, TraceParams(**base, spp_batch=4))
    st = wf.render()
    assert int(st.samples) == spp
    img = np.asarray(st.image)[..., :3]
    assert np.isfinite(img).all()
    # global mean converges much faster than per-pixel values
    assert abs(img.mean() - ref.mean()) < tol_mean
    assert np.abs(img - ref).mean() < tol_img


@pytest.mark.skipif(
    not __import__("os").environ.get("RUN_SLOW_TESTS"),
    reason="XLA CPU compile of the traversal takes minutes on 1 core; "
           "the BVH wavefront path is exercised on TPU by bench/corpus "
           "runs (set RUN_SLOW_TESTS=1 to run here)")
def test_wavefront_bvh_path():
    """Force the BVH + compacted-rounds traversal (not the dense sweep)."""
    scene = _glass_cornell()
    # subdivide the sphere so the candidate count crosses the BVH threshold
    from yocto_tpu.models.procedural import make_sphere
    scene.shapes[-1] = make_sphere(steps=48, scale=0.35)
    base = dict(resolution=32, samples=4, bounces=4,
                sampler=SamplerType.path)
    ref = get_image(Renderer(scene, TraceParams(**base)).render())[..., :3]
    wf = WavefrontRenderer(scene, TraceParams(**base, spp_batch=2))
    assert wf.use_bvh
    img = np.asarray(wf.render().image)[..., :3]
    assert np.isfinite(img).all()
    assert abs(img.mean() - ref.mean()) < 2e-2


def test_wavefront_nocaustics_matches_lockstep():
    """nocaustics (per-lane max-roughness history, yocto_trace.cpp:499-502)
    through the wavefront: must be accepted AND agree with the lockstep
    nocaustics render — which differs visibly from the caustic render."""
    scene = _glass_cornell()
    base = dict(resolution=32, samples=12, bounces=4,
                sampler=SamplerType.path, nocaustics=True)
    ref = get_image(Renderer(scene, TraceParams(**base)).render())[..., :3]
    wf = WavefrontRenderer(scene, TraceParams(**base, spp_batch=4))
    img = np.asarray(wf.render().image)[..., :3]
    assert np.isfinite(img).all()
    assert abs(img.mean() - ref.mean()) < 1.2e-2
    assert np.abs(img - ref).mean() < 0.08


def test_wavefront_pathmis_matches_lockstep():
    from yocto_tpu.trace.wavefront import WavefrontPathmisRenderer

    # glass sphere: exercises the delta branch AND the volume stack
    scene = _glass_cornell()
    base = dict(resolution=32, samples=12, bounces=4,
                sampler=SamplerType.pathmis)
    ref = get_image(Renderer(scene, TraceParams(**base)).render())[..., :3]
    wf = WavefrontPathmisRenderer(scene, TraceParams(**base, spp_batch=4))
    img = np.asarray(wf.render().image)[..., :3]
    assert np.isfinite(img).all()
    assert abs(img.mean() - ref.mean()) < 1.5e-2
    assert np.abs(img - ref).mean() < 0.08


def test_wavefront_pathdirect_matches_lockstep():
    from yocto_tpu.trace.wavefront import WavefrontPathdirectRenderer

    # glass sphere: exercises the delta branch AND the volume stack
    scene = _glass_cornell()
    base = dict(resolution=32, samples=12, bounces=4,
                sampler=SamplerType.pathdirect)
    ref = get_image(Renderer(scene, TraceParams(**base)).render())[..., :3]
    wf = WavefrontPathdirectRenderer(scene,
                                     TraceParams(**base, spp_batch=4))
    img = np.asarray(wf.render().image)[..., :3]
    assert np.isfinite(img).all()
    assert abs(img.mean() - ref.mean()) < 1.5e-2
    assert np.abs(img - ref).mean() < 0.08


def test_pathmis_two_pass_nee_matches_one_pass():
    """The two-pass NEE connection (emissive-closest + any-hit shadow)
    must reproduce the one-pass full-closest-hit contribution: same rng
    draws, same light-strategy radiance (up to intersector-uv ulps)."""
    import dataclasses

    from yocto_tpu.models.examples import make_cornellbox_pbr
    from yocto_tpu.trace.wavefront import WavefrontPathmisRenderer

    import yocto_tpu.trace.wavefront as WF

    scene = make_cornellbox_pbr()
    params = TraceParams(resolution=24, samples=1, bounces=3,
                         sampler=SamplerType.pathmis, spp_batch=1,
                         intersector="cluster")
    orig = WF.NEE_TWO_PASS_MIN_CLUSTERS
    WF.NEE_TWO_PASS_MIN_CLUSTERS = 0  # force it on for the small scene
    try:
        r2 = WavefrontPathmisRenderer(scene, params)
    finally:
        WF.NEE_TWO_PASS_MIN_CLUSTERS = orig
    assert r2._cluster is not None and r2._nee is not None, \
        "pbr cornell must engage the cluster intersector + two-pass NEE"
    img2, *_ = r2.render_sample(r2.flat, r2.lights, 0)

    r1 = WavefrontPathmisRenderer(scene, params)
    r1._nee = None
    r1._jits.clear()
    img1, *_ = r1.render_sample(r1.flat, r1.lights, 0)

    a, b = np.asarray(img2), np.asarray(img1)
    assert np.isfinite(a).all()
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
