"""Scene model: host-side containers with the reference's schema.

Mirrors the data model of yocto_scene.h:83-213 (xelatihy/yocto-gl):
cameras (photographic lens model), textures (float or byte pixels, linear
flag), 8 material types with 5 texture slots, instances (frame+shape+
material), environments, face-varying subdivs, and the scene aggregate with
name tables. Containers are NumPy on the host; `yocto_tpu.trace.compile_scene`
flattens them into the SoA device representation the tracer consumes.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

INVALID = -1

_IDENTITY = np.array(
    [[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 0]], dtype=np.float32)


def identity_frame() -> np.ndarray:
    return _IDENTITY.copy()


def _f32(x):
    return np.asarray(x, np.float32)


@dataclass
class CameraData:
    """Photographic camera (yocto_scene.h:83-92 defaults)."""

    frame: np.ndarray = field(default_factory=identity_frame)  # [4,3] x,y,z,o
    orthographic: bool = False
    lens: float = 0.050
    film: float = 0.036
    aspect: float = 1.500
    focus: float = 10000.0
    aperture: float = 0.0


@dataclass
class TextureData:
    """Float or byte texture (yocto_scene.h:95-104)."""

    width: int = 0
    height: int = 0
    linear: bool = False
    nearest: bool = False
    clamp: bool = False
    pixelsf: Optional[np.ndarray] = None  # [H,W,4] f32
    pixelsb: Optional[np.ndarray] = None  # [H,W,4] u8


class MaterialType(enum.IntEnum):
    """Material types, same order as the reference enum
    (yocto_scene.h:106-111)."""

    matte = 0
    glossy = 1
    reflective = 2
    transparent = 3
    refractive = 4
    subsurface = 5
    volumetric = 6
    gltfpbr = 7


MATERIAL_TYPE_NAMES = ["matte", "glossy", "reflective", "transparent",
                       "refractive", "subsurface", "volumetric", "gltfpbr"]


@dataclass
class MaterialData:
    """Surface material (yocto_scene.h:122-142 defaults)."""

    type: MaterialType = MaterialType.matte
    emission: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    color: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    roughness: float = 0.0
    metallic: float = 0.0
    ior: float = 1.5
    scattering: np.ndarray = field(
        default_factory=lambda: np.zeros(3, np.float32))
    scanisotropy: float = 0.0
    trdepth: float = 0.01
    opacity: float = 1.0
    emission_tex: int = INVALID
    color_tex: int = INVALID
    roughness_tex: int = INVALID
    scattering_tex: int = INVALID
    normal_tex: int = INVALID


@dataclass
class InstanceData:
    frame: np.ndarray = field(default_factory=identity_frame)
    shape: int = INVALID
    material: int = INVALID


@dataclass
class EnvironmentData:
    frame: np.ndarray = field(default_factory=identity_frame)
    emission: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    emission_tex: int = INVALID


@dataclass
class SubdivData:
    """Face-varying subdiv with displacement (yocto_scene.h:161-186)."""

    quadspos: np.ndarray = field(
        default_factory=lambda: np.zeros((0, 4), np.int32))
    quadsnorm: np.ndarray = field(
        default_factory=lambda: np.zeros((0, 4), np.int32))
    quadstexcoord: np.ndarray = field(
        default_factory=lambda: np.zeros((0, 4), np.int32))
    positions: np.ndarray = field(
        default_factory=lambda: np.zeros((0, 3), np.float32))
    normals: np.ndarray = field(
        default_factory=lambda: np.zeros((0, 3), np.float32))
    texcoords: np.ndarray = field(
        default_factory=lambda: np.zeros((0, 2), np.float32))
    subdivisions: int = 0
    catmullclark: bool = True
    smooth: bool = True
    displacement: float = 0.0
    displacement_tex: int = INVALID
    shape: int = INVALID


@dataclass
class SceneData:
    """Scene aggregate (yocto_scene.h:192-213)."""

    cameras: list = field(default_factory=list)
    instances: list = field(default_factory=list)
    environments: list = field(default_factory=list)
    shapes: list = field(default_factory=list)  # of shape.ShapeData
    textures: list = field(default_factory=list)
    materials: list = field(default_factory=list)
    subdivs: list = field(default_factory=list)
    camera_names: list = field(default_factory=list)
    texture_names: list = field(default_factory=list)
    material_names: list = field(default_factory=list)
    shape_names: list = field(default_factory=list)
    instance_names: list = field(default_factory=list)
    environment_names: list = field(default_factory=list)
    subdiv_names: list = field(default_factory=list)
    copyright: str = ""


# ----------------------------------------------------------------------------
# Host-side scene utilities
# ----------------------------------------------------------------------------

def compute_bounds(scene: SceneData):
    """Scene bbox over transformed shape bboxes (yocto_scene.cpp:718-736)."""
    lo = np.full(3, np.inf, np.float32)
    hi = np.full(3, -np.inf, np.float32)
    shape_bounds = []
    for shape in scene.shapes:
        if len(shape.positions):
            shape_bounds.append(
                (shape.positions.min(0), shape.positions.max(0)))
        else:
            shape_bounds.append((np.zeros(3, np.float32),
                                 np.zeros(3, np.float32)))
    for inst in scene.instances:
        slo, shi = shape_bounds[inst.shape]
        corners = np.array([[x, y, z] for x in (slo[0], shi[0])
                            for y in (slo[1], shi[1])
                            for z in (slo[2], shi[2])], np.float32)
        world = corners @ inst.frame[:3] + inst.frame[3]
        lo = np.minimum(lo, world.min(0))
        hi = np.maximum(hi, world.max(0))
    return lo, hi


def find_camera(scene: SceneData, name: str) -> int:
    """Find camera by name with the reference's fallbacks
    (yocto_scene.cpp:577-595 equivalent)."""
    if not scene.cameras:
        return INVALID
    for preferred in [name, "default", "camera", "camera0", "camera1"]:
        for idx, cname in enumerate(scene.camera_names):
            if cname == preferred:
                return idx
    return 0


def scene_stats(scene: SceneData) -> list:
    """Human-readable stats (yocto_scene.cpp:867-930 equivalent)."""
    def acc(fn):
        return sum(fn(s) for s in scene.shapes)

    lo, hi = compute_bounds(scene) if scene.instances else (
        np.zeros(3), np.zeros(3))
    return [
        f"cameras:      {len(scene.cameras)}",
        f"instances:    {len(scene.instances)}",
        f"environments: {len(scene.environments)}",
        f"shapes:       {len(scene.shapes)}",
        f"subdivs:      {len(scene.subdivs)}",
        f"textures:     {len(scene.textures)}",
        f"materials:    {len(scene.materials)}",
        f"points:       {acc(lambda s: len(s.points))}",
        f"lines:        {acc(lambda s: len(s.lines))}",
        f"triangles:    {acc(lambda s: len(s.triangles))}",
        f"quads:        {acc(lambda s: len(s.quads))}",
        f"positions:    {acc(lambda s: len(s.positions))}",
        f"center:       {((lo + hi) / 2).tolist()}",
        f"size:         {(hi - lo).tolist()}",
    ]


def scene_validation(scene: SceneData, notextures: bool = False) -> list:
    """Validation errors (yocto_scene.cpp:822-865 equivalent)."""
    errs = []

    def check_names(names, base):
        if not names:
            return
        used = {}
        for n in names:
            used[n] = used.get(n, 0) + 1
        for name, count in used.items():
            if name == "":
                errs.append(f"empty {base} name")
            elif count > 1:
                errs.append(f"duplicated {base} name {name}")

    check_names(scene.camera_names, "camera")
    check_names(scene.shape_names, "shape")
    check_names(scene.texture_names, "texture")
    check_names(scene.material_names, "material")
    check_names(scene.instance_names, "instance")
    check_names(scene.environment_names, "environment")
    if not notextures:
        for idx, tex in enumerate(scene.textures):
            if tex.pixelsf is None and tex.pixelsb is None:
                name = (scene.texture_names[idx]
                        if idx < len(scene.texture_names) else str(idx))
                errs.append(f"empty texture {name}")
    return errs
