"""On-TPU parity drive for the fused path megakernel (all lobe families).

The CPU suite exercises the megakernel in interpret mode, but the delta
(glass/mirror/transparent) variant's interpret compile takes >1h on the
1-core CI host, so that test is RUN_SLOW_TESTS-gated and THIS script is
the fast on-hardware equivalent: remote TPU compiles finish in minutes.

Renders the delta scene (tests/test_pallas_path._delta_scene) twice on
the real chip — lockstep sampler (megakernel dispatch disabled) and the
fused megakernel — and checks float-level agreement. Delta lobes amplify
ulp noise (a flipped fresnel/TIR branch re-routes the whole path), so
thresholds are wider than the matte test's; measured reference points:
megakernel-vs-lockstep same-device mean 4.3e-4 / 0.9% pixels > 0.05,
lockstep-vs-itself ACROSS devices 8.3e-4 / 1.2%.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_megakernel_parity.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np


def main():
    import yocto_tpu.trace.pallas_path as PP
    from yocto_tpu.trace.compile import scene_features
    from yocto_tpu.trace.params import SamplerType, TraceParams
    from yocto_tpu.trace.renderer import (Renderer, get_image,
                                          make_trace_state,
                                          sample_camera_rays)
    from test_pallas_path import _delta_scene

    scene = _delta_scene()
    params = TraceParams(resolution=24, samples=3, bounces=5,
                         sampler=SamplerType.path)
    assert PP.supports_pallas_path(scene, scene_features(scene), params)

    orig = PP.supports_pallas_path
    PP.supports_pallas_path = lambda *a, **k: False
    r = Renderer(scene, params)            # lockstep reference
    ref = np.asarray(get_image(r.render())[..., :3])
    PP.supports_pallas_path = orig
    print("lockstep done, mean", float(ref.mean()))

    run = PP.make_pallas_path_sampler(scene, params, interpret=False)
    state = make_trace_state(scene, params)
    res = params.resolution
    img = np.zeros((res, res, 3), np.float32)
    rngs = state.rng
    for s in range(params.samples):
        ro, rd, rngs = sample_camera_rays(r.flat, 0, res, res, rngs, False)
        radiance, hit, alb, nrm, rngs = run(ro, rd, rngs)
        rad = np.nan_to_num(np.asarray(radiance), nan=0.0)
        mx = rad.max(-1)
        scale = np.where(mx > params.clamp,
                         params.clamp / np.maximum(mx, 1e-20), 1.0)
        rad = rad * scale[:, None]
        img += (rad.reshape(res, res, 3) - img) / (s + 1)
    d = np.abs(img - ref)
    print("mean", float(d.mean()), "max", float(d.max()),
          "frac>0.05", float((d.max(-1) > 0.05).mean()))
    assert d.mean() < 1.5e-3, d.mean()
    assert (d.max(-1) > 0.05).mean() < 0.025
    print("TPU delta megakernel parity OK")


if __name__ == "__main__":
    main()
