"""Example scenes.

`make_cornellbox` reproduces the standard Cornell-box scene with the same
camera, geometry and material values as the reference generator
(yocto_scene.cpp:970-1078) so golden comparisons line up.
"""

from __future__ import annotations

import numpy as np

from .scene import (CameraData, InstanceData, MaterialData, SceneData)
from .shape import ShapeData


def _quad_shape(positions):
    return ShapeData(
        positions=np.asarray(positions, np.float32),
        triangles=np.asarray([[0, 1, 2], [2, 3, 0]], np.int32))


def _box_shape(positions):
    tris = []
    for f in range(6):
        b = f * 4
        tris += [[b, b + 1, b + 2], [b + 2, b + 3, b]]
    return ShapeData(positions=np.asarray(positions, np.float32),
                     triangles=np.asarray(tris, np.int32))


def make_cornellbox() -> SceneData:
    scene = SceneData()
    scene.cameras.append(CameraData(
        frame=np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 1, 3.9]],
                       np.float32),
        lens=0.035, aperture=0.0, focus=3.9, film=0.024, aspect=1.0))
    scene.camera_names.append("camera")

    grey = np.array([0.725, 0.71, 0.68], np.float32)

    def add(name, shape, color=None, emission=None):
        scene.shapes.append(shape)
        scene.shape_names.append(name)
        mat = MaterialData()
        if color is not None:
            mat.color = np.asarray(color, np.float32)
        if emission is not None:
            mat.emission = np.asarray(emission, np.float32)
        scene.materials.append(mat)
        scene.material_names.append(name)
        scene.instances.append(InstanceData(
            shape=len(scene.shapes) - 1, material=len(scene.materials) - 1))
        scene.instance_names.append(name)

    add("floor", _quad_shape(
        [[-1, 0, 1], [1, 0, 1], [1, 0, -1], [-1, 0, -1]]), grey)
    add("ceiling", _quad_shape(
        [[-1, 2, 1], [-1, 2, -1], [1, 2, -1], [1, 2, 1]]), grey)
    add("backwall", _quad_shape(
        [[-1, 0, -1], [1, 0, -1], [1, 2, -1], [-1, 2, -1]]), grey)
    add("rightwall", _quad_shape(
        [[1, 0, -1], [1, 0, 1], [1, 2, 1], [1, 2, -1]]),
        [0.14, 0.45, 0.091])
    add("leftwall", _quad_shape(
        [[-1, 0, 1], [-1, 0, -1], [-1, 2, -1], [-1, 2, 1]]),
        [0.63, 0.065, 0.05])
    add("shortbox", _box_shape(
        [[0.53, 0.6, 0.75], [0.7, 0.6, 0.17], [0.13, 0.6, 0.0],
         [-0.05, 0.6, 0.57], [-0.05, 0.0, 0.57], [-0.05, 0.6, 0.57],
         [0.13, 0.6, 0.0], [0.13, 0.0, 0.0], [0.53, 0.0, 0.75],
         [0.53, 0.6, 0.75], [-0.05, 0.6, 0.57], [-0.05, 0.0, 0.57],
         [0.7, 0.0, 0.17], [0.7, 0.6, 0.17], [0.53, 0.6, 0.75],
         [0.53, 0.0, 0.75], [0.13, 0.0, 0.0], [0.13, 0.6, 0.0],
         [0.7, 0.6, 0.17], [0.7, 0.0, 0.17], [0.53, 0.0, 0.75],
         [0.7, 0.0, 0.17], [0.13, 0.0, 0.0], [-0.05, 0.0, 0.57]]), grey)
    add("tallbox", _box_shape(
        [[-0.53, 1.2, 0.09], [0.04, 1.2, -0.09], [-0.14, 1.2, -0.67],
         [-0.71, 1.2, -0.49], [-0.53, 0.0, 0.09], [-0.53, 1.2, 0.09],
         [-0.71, 1.2, -0.49], [-0.71, 0.0, -0.49], [-0.71, 0.0, -0.49],
         [-0.71, 1.2, -0.49], [-0.14, 1.2, -0.67], [-0.14, 0.0, -0.67],
         [-0.14, 0.0, -0.67], [-0.14, 1.2, -0.67], [0.04, 1.2, -0.09],
         [0.04, 0.0, -0.09], [0.04, 0.0, -0.09], [0.04, 1.2, -0.09],
         [-0.53, 1.2, 0.09], [-0.53, 0.0, 0.09], [-0.53, 0.0, 0.09],
         [0.04, 0.0, -0.09], [-0.14, 0.0, -0.67], [-0.71, 0.0, -0.49]]),
        grey)
    add("light", _quad_shape(
        [[-0.25, 1.99, 0.25], [-0.25, 1.99, -0.25], [0.25, 1.99, -0.25],
         [0.25, 1.99, 0.25]]), None, emission=[17, 12, 4])
    return scene


def make_cornellbox_pbr() -> SceneData:
    """Cornell box + three tessellated GGX metal/glass/glossy spheres —
    the BASELINE.json config-2 workload (full PBR BSDFs, delta + volume
    machinery active, ~10.4k candidates so the two-level intersector
    engages)."""
    from .procedural import make_sphere
    from .scene import MaterialType

    scene = make_cornellbox()
    spheres = [
        ("sphere_metal", 0.3, (0.4, 0.3, 0.3),
         MaterialData(type=MaterialType.reflective,
                      color=np.array([0.66, 0.45, 0.34], np.float32),
                      roughness=0.1)),
        ("sphere_glass", 0.3, (-0.4, 0.3, 0.5),
         MaterialData(type=MaterialType.refractive,
                      color=np.array([1.0, 1.0, 1.0], np.float32),
                      roughness=0.0)),
        ("sphere_glossy", 0.25, (0.0, 1.4, -0.3),
         MaterialData(type=MaterialType.glossy,
                      color=np.array([0.5, 0.7, 0.5], np.float32),
                      roughness=0.2)),
    ]
    for name, radius, offset, mat in spheres:
        scene.shapes.append(make_sphere(steps=24, scale=radius))
        scene.shape_names.append(name)
        scene.materials.append(mat)
        scene.material_names.append(name)
        frame = np.eye(4, 3, dtype=np.float32)
        frame[3] = offset
        scene.instances.append(InstanceData(
            frame=frame, shape=len(scene.shapes) - 1,
            material=len(scene.materials) - 1))
        scene.instance_names.append(name)
    return scene
