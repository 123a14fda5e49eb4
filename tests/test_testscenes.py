"""Programmatic corpus-scene generator (scripts/make-tests.py parity)."""

import os

import numpy as np
import pytest

from yocto_tpu.models.scene import scene_validation
from yocto_tpu.models.testscenes import make_test_scene
from yocto_tpu.trace.params import SamplerType, TraceParams

ALL = ("features1", "features2", "materials1", "materials2", "materials4",
       "shapes1", "shapes2")


@pytest.mark.parametrize("name", ALL)
def test_generate_and_validate(name):
    scene = make_test_scene(name)
    assert len(scene.cameras) == 1
    assert len(scene.environments) == 1
    # 2 area lights + floor + 5 objects (+ hairball interior in features2)
    assert len(scene.instances) >= 8
    assert scene_validation(scene) == []
    # every instanced shape has sane indices
    for inst in scene.instances:
        s = scene.shapes[inst.shape]
        for arr in (s.triangles, s.quads, s.lines):
            a = np.asarray(arr)
            if a.size:
                assert int(a.max()) < len(s.positions)


def test_render_generated_scene():
    scene = make_test_scene("materials1")
    from yocto_tpu.trace.renderer import Renderer, get_image
    params = TraceParams(resolution=32, samples=1, bounces=2,
                         sampler=SamplerType.eyelight)
    img = get_image(Renderer(scene, params).render())[..., :3]
    assert np.isfinite(img).all() and img.max() > 0
