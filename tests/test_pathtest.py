"""`pathtest` sampler parity vs the reference binary.

The reference's trace_pathtest (yocto_trace.cpp:953-1030) is the path
sampler with every hit material forced to matte AFTER evaluation — no
volume, opacity, or delta machinery. Goldens were rendered with the
reference build from tests/assets/cornellbox_spheres (Cornell box + a
rough-metal and a delta-glass sphere, so pathtest visibly differs from
path).
"""

import os

import numpy as np
import pytest

from yocto_tpu.io.imageio import load_image
from yocto_tpu.io.sceneio import load_scene
from yocto_tpu.trace.params import SamplerType, TraceParams
from yocto_tpu.trace.renderer import Renderer, get_image

ASSETS = os.path.join(os.path.dirname(__file__), "assets",
                      "cornellbox_spheres", "cornellbox_spheres.json")
GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def _render(sampler):
    scene = load_scene(ASSETS)
    params = TraceParams(resolution=64, samples=8, bounces=4,
                         sampler=sampler)
    return get_image(Renderer(scene, params).render())


@pytest.mark.parametrize("sampler,golden", [
    (SamplerType.pathtest, "cornellbox_spheres_pathtest_64x64_8spp.exr"),
    (SamplerType.path, "cornellbox_spheres_path_64x64_8spp.exr"),
])
def test_sampler_matches_reference(sampler, golden):
    img = _render(sampler)
    ref = np.asarray(load_image(os.path.join(GOLDENS, golden))[0])
    d = np.abs(img - ref)
    assert d.max() < 2e-3, f"max diff {d.max()}"


def test_pathtest_differs_from_path():
    # the forced-matte override must actually change the image on a
    # scene with reflective/refractive materials
    a = _render(SamplerType.pathtest)
    b = _render(SamplerType.path)
    assert np.abs(a - b).max() > 0.05
