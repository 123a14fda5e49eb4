"""Programmatic test-scene generator (scripts/make-tests.py equivalent).

Rebuilds the reference's corpus scenes (features1/2, materials1/2/4,
shapes1/2) in memory with the exact camera, light frames, material table,
and row layout of the generator — substituting procedural preset shapes
for the binary assets the reference copies from tests/_assets (bunny and
teapot become spheres; the hairballs/suzanne/subdivs come from the preset
catalogue). Useful for corpus-shaped testing without shipping assets.
"""

from __future__ import annotations

import numpy as np

from ..models.image import ImageData, make_sunsky
from ..models.scene import (EnvironmentData, InstanceData, MaterialData,
                            MaterialType, SceneData, TextureData, CameraData)

_CAMERA_FRAME = [
    0.8151804208755493, -0.0, 0.579207181930542, 0.16660168766975403,
    0.9577393531799316, -0.23447643220424652, -0.5547295212745667,
    0.28763750195503235, 0.7807304263114929, -0.75, 0.4000000059604645,
    0.8999999761581421]

_AREALIGHT_FRAMES = {
    "arealight1": [0.8944271802902222, -0.0, 0.4472135901451111,
                   0.27562475204467773, 0.7874992489814758,
                   -0.5512495040893555, -0.3521803617477417,
                   0.6163156628608704, 0.7043607234954834,
                   -0.4000000059604645, 0.800000011920929,
                   0.800000011920929],
    "arealight2": [0.8944271802902222, 0.0, -0.4472135901451111,
                   -0.27562475204467773, 0.7874992489814758,
                   -0.5512495040893555, 0.3521803617477417,
                   0.6163156628608704, 0.7043607234954834,
                   0.4000000059604645, 0.800000011920929, 0.800000011920929],
    "largearealight1": [0.8944271802902222, -0.0, 0.4472135901451111,
                        0.2873478829860687, 0.766261100769043,
                        -0.5746957659721375, -0.3426823318004608,
                        0.6425293684005737, 0.6853646636009216,
                        -0.800000011920929, 1.600000023841858,
                        1.600000023841858],
    "largearealight2": [0.8944271802902222, 0.0, -0.4472135901451111,
                        -0.2873478829860687, 0.766261100769043,
                        -0.5746957659721375, 0.3426823318004608,
                        0.6425293684005737, 0.6853646636009216,
                        0.800000011920929, 1.600000023841858,
                        1.600000023841858],
}

# material table from scripts/make-tests.py:128-290
_MATERIALS = {
    "floor": dict(type="matte", color=[1, 1, 1], color_tex="floor"),
    "arealight": dict(type="matte", emission=[20, 20, 20], color=[0, 0, 0]),
    "largearealight": dict(type="matte", emission=[10, 10, 10],
                           color=[0, 0, 0]),
    "uvgrid": dict(type="glossy", color=[1, 1, 1], roughness=0.2,
                   color_tex="uvgrid"),
    "matte": dict(type="matte", color=[0.7, 0.7, 0.7]),
    "plastic": dict(type="glossy", color=[0.5, 0.7, 0.5], roughness=0.2),
    "roughplastic": dict(type="glossy", color=[0.5, 0.7, 0.5],
                         roughness=0.2),
    "sharpplastic": dict(type="glossy", color=[0.5, 0.5, 0.7],
                         roughness=0),
    "glass": dict(type="refractive", color=[1, 1, 1], roughness=0),
    "jade": dict(type="refractive", color=[0.5, 0.5, 0.5], roughness=0,
                 scattering=[0.3, 0.6, 0.3]),
    "cloud": dict(type="volumetric", color=[0.5, 0.5, 0.5], roughness=0,
                  scattering=[0.9, 0.9, 0.9]),
    "smoke": dict(type="volumetric", color=[0.65, 0.65, 0.65], roughness=0,
                  scattering=[0.2, 0.2, 0.2]),
    "roughmetal": dict(type="reflective", color=[0.66, 0.45, 0.34],
                       roughness=0.2),
    "sharpmetal": dict(type="reflective", color=[0.7, 0.7, 0.7],
                       roughness=0),
    "redglass": dict(type="refractive", color=[1, 0.5, 0.5], roughness=0),
    "sharpglass": dict(type="refractive", color=[1, 1, 1], roughness=0),
    "roughglass": dict(type="refractive", color=[1, 0.7, 0.7],
                       roughness=0.1),
    "sharpthinglass": dict(type="transparent", color=[1, 1, 1],
                           roughness=0),
    "roughthinglass": dict(type="transparent", color=[1, 0.7, 0.7],
                           roughness=0.1),
    "notopaque": dict(type="matte", color=[0.7, 0.5, 0.5], opacity=0.2,
                      roughness=0.1),
    "bumped": dict(type="glossy", color=[0.5, 0.7, 0.5], roughness=0.2,
                   normal_tex="bumpsnormal"),
    "hair": dict(type="matte", color=[0.7, 0.7, 0.7]),
}

# shape substitutions: preset names producing geometry shaped like the
# corpus assets (bunny/teapot become test-sphere stand-ins)
_SHAPES = {
    "floor": "test-smallfloor-like",   # handled specially (2x2 quad)
    "arealight": "arealight-quad",     # 0.4 x 0.4 quad
    "sphere": "test-sphere",
    "bunny": "test-sphere",
    "teapot": "test-sphere",
    "cube": "test-cube",
    "disk": "test-disk",
    "flipcapuvsphere": "test-uvsphere-flipcap",
    "uvcylinder": "test-uvcylinder",
    "suzannesubdiv": "test-suzanne-subdiv",
    "displacedsubdiv": "test-quady-displaced",
    "cubesubdiv": "test-cube",
    "hairball": "test-hairball2",
    "hairballi": "test-hairball-interior",
}

_LAYOUTS = {
    "features1": ["bunny-uvgrid", "sphere-redglass", "bunny-jade",
                  "sphere-bumped", "bunny-roughmetal"],
    "features2": ["sphere-uvgrid", "suzannesubdiv-roughplastic",
                  "hairball-hair", "displacedsubdiv-roughplastic",
                  "cube-uvgrid"],
    "materials1": ["sphere-sharpplastic", "sphere-roughplastic",
                   "sphere-matte", "sphere-sharpmetal",
                   "sphere-roughmetal"],
    "materials2": ["sphere-sharpglass", "sphere-roughglass",
                   "sphere-notopaque", "sphere-sharpthinglass",
                   "sphere-roughthinglass"],
    "materials4": ["sphere-cloud", "sphere-redglass", "sphere-glass",
                   "sphere-jade", "sphere-smoke"],
    "shapes1": ["sphere-uvgrid", "flipcapuvsphere-uvgrid", "disk-uvgrid",
                "uvcylinder-uvgrid", "cube-uvgrid"],
    "shapes2": ["cubesubdiv-uvgrid", "suzannesubdiv-matte",
                "displacedsubdiv-plastic", "bunny-uvgrid",
                "teapot-uvgrid"],
}

_INTERIORS = {"features2": ["", "", "hairballi-hair", "", ""]}


def _quad_shape(scale):
    from .shape import ShapeData
    s = scale
    return ShapeData(
        positions=np.array([[-s, -s, 0], [s, -s, 0], [s, s, 0],
                            [-s, s, 0]], np.float32),
        texcoords=np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32),
        quads=np.array([[0, 1, 2, 3]], np.int32))


def _floor_shape():
    from .shape import ShapeData
    return ShapeData(
        positions=np.array([[-2, 0, 2], [2, 0, 2], [2, 0, -2],
                            [-2, 0, -2]], np.float32),
        texcoords=np.array([[0, 20], [20, 20], [20, 0], [0, 0]],
                           np.float32),
        quads=np.array([[0, 1, 2, 3]], np.int32))


def make_test_scene(name: str) -> SceneData:
    from ..io.presets import make_shape_preset, make_texture_preset

    if name not in _LAYOUTS:
        raise ValueError(f"unknown test scene {name!r} "
                         f"(have {sorted(_LAYOUTS)})")
    scene = SceneData()
    scene.cameras.append(CameraData(
        frame=np.asarray(_CAMERA_FRAME, np.float32).reshape(4, 3),
        aspect=2.4000000953674316, focus=1.2168092727661133))
    scene.camera_names.append("default")

    tex_ids = {}

    def texture(tname):
        if tname is None:
            return -1
        if tname not in tex_ids:
            if tname == "sky":
                img = ImageData(1024, 512, True, make_sunsky(1024, 512))
            elif tname == "floor":
                from ..models import image as I
                img = I.add_border(I.make_grid(1024, 1024), 0.0025)
            elif tname == "bumpsnormal":
                from ..models import image as I
                img = I.bump_to_normal(I.make_bumps(1024, 1024), 0.05)
            else:
                img = make_texture_preset(tname)
            px = np.asarray(img.pixels, np.float32)
            if img.linear:
                tex = TextureData(width=img.width, height=img.height,
                                  linear=True, pixelsf=px)
            else:
                tex = TextureData(
                    width=img.width, height=img.height, linear=False,
                    pixelsb=np.clip(px * 255.0 + 0.5, 0,
                                    255).astype(np.uint8))
            scene.textures.append(tex)
            scene.texture_names.append(tname)
            tex_ids[tname] = len(scene.textures) - 1
        return tex_ids[tname]

    scene.environments.append(EnvironmentData(
        emission=np.asarray([0.5, 0.5, 0.5], np.float32),
        emission_tex=texture("sky")))
    scene.environment_names.append("sky")

    mat_ids, shape_ids = {}, {}

    def material(mname):
        if mname not in mat_ids:
            spec = dict(_MATERIALS[mname])
            mat = MaterialData(type=MaterialType[spec.pop("type")])
            for k in ("color", "emission", "scattering"):
                if k in spec:
                    setattr(mat, k, np.asarray(spec.pop(k), np.float32))
            for k in ("roughness", "opacity"):
                if k in spec:
                    setattr(mat, k, float(spec.pop(k)))
            for k in ("color_tex", "normal_tex"):
                if k in spec:
                    setattr(mat, k, texture(spec.pop(k)))
            scene.materials.append(mat)
            scene.material_names.append(mname)
            mat_ids[mname] = len(scene.materials) - 1
        return mat_ids[mname]

    def shape(sname):
        if sname not in shape_ids:
            if sname == "floor":
                sh = _floor_shape()
            elif sname == "arealight":
                sh = _quad_shape(0.2)
            elif sname == "largearealight":
                sh = _quad_shape(0.4)
            else:
                sh = make_shape_preset(_SHAPES[sname])
            scene.shapes.append(sh)
            scene.shape_names.append(sname)
            shape_ids[sname] = len(scene.shapes) - 1
        return shape_ids[sname]

    def instance(iname, frame=None):
        sname, mname = iname.split("-") if "-" in iname else (iname, iname)
        if frame is None:
            frame = np.eye(4, 3, k=0)
            frame = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 0]],
                             np.float32)
        scene.instances.append(InstanceData(
            frame=np.asarray(frame, np.float32).reshape(4, 3),
            shape=shape(sname), material=material(mname)))
        scene.instance_names.append(iname)

    large = name in ("materials1", "materials2", "materials4")
    mname = "largearealight" if large else "arealight"
    for light in (("largearealight1", "largearealight2") if large
                  else ("arealight1", "arealight2")):
        scene.instances.append(InstanceData(
            frame=np.asarray(_AREALIGHT_FRAMES[light],
                             np.float32).reshape(4, 3),
            shape=shape(mname), material=material(mname)))
        scene.instance_names.append(light)
    instance("floor-floor")

    names = _LAYOUTS[name]
    interiors = _INTERIORS.get(name, [])
    stride = 0.2
    for idx, iname in enumerate(names):
        origin = [stride * (idx - len(names) // 2), 0.0, 0.0]
        frame = [[1, 0, 0], [0, 1, 0], [0, 0, 1], origin]
        instance(iname, frame)
    for idx, iname in enumerate(interiors):
        if not iname:
            continue
        origin = [stride * (idx - len(interiors) // 2), 0.0, 0.0]
        frame = [[1, 0, 0], [0, 1, 0], [0, 0, 1], origin]
        instance(iname, frame)
    return scene


def make_bistro_like(n_major: int = 9, steps: int = 120,
                     seed: int = 11) -> SceneData:
    """Bistro-class stress scene: >1M triangles of instanced, transformed
    high-tessellation geometry with varied PBR materials plus a floor and
    an area light (BASELINE.json config 5 stand-in; the reference handles
    such scenes through per-shape GAS + IAS, yocto_cutrace.cpp:721-885 —
    here they exercise the instance-sharded ring renderer)."""
    import numpy as np

    from .procedural import make_sphere, make_uvsphere
    from .scene import (CameraData, InstanceData, MaterialData,
                        MaterialType, SceneData)

    rng = np.random.RandomState(seed)
    scene = SceneData()
    scene.cameras.append(CameraData(
        frame=np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 2.0, 9.0]],
                       np.float32),
        lens=0.05, film=0.036, aspect=16 / 9, focus=9.0))
    scene.camera_names.append("camera")

    # two heavy base shapes, instanced with distinct frames/materials
    scene.shapes.append(make_sphere(steps=steps, scale=1.0))
    scene.shape_names.append("blob")
    scene.shapes.append(make_uvsphere(steps=(2 * steps, steps), scale=1.0))
    scene.shape_names.append("dome")

    mats = [
        MaterialData(type=MaterialType.matte,
                     color=np.array([0.7, 0.5, 0.3], np.float32)),
        MaterialData(type=MaterialType.glossy,
                     color=np.array([0.5, 0.7, 0.5], np.float32),
                     roughness=0.2),
        MaterialData(type=MaterialType.reflective,
                     color=np.array([0.66, 0.45, 0.34], np.float32),
                     roughness=0.1),
    ]
    for i, m in enumerate(mats):
        scene.materials.append(m)
        scene.material_names.append(f"mat{i}")

    half = int(np.ceil(np.sqrt(n_major)))
    for i in range(n_major):
        gx = (i % half) - (half - 1) / 2
        gz = (i // half) - (half - 1) / 2
        s = 0.6 + 0.5 * rng.rand()
        ang = rng.rand() * 2 * np.pi
        c, sn = np.cos(ang), np.sin(ang)
        frame = np.array([[c * s, 0, -sn * s],
                          [0, s, 0],
                          [sn * s, 0, c * s],
                          [2.5 * gx, s, 2.5 * gz]], np.float32)
        scene.instances.append(InstanceData(
            frame=frame, shape=i % 2, material=i % len(mats)))
        scene.instance_names.append(f"blob{i}")

    # floor
    scene.shapes.append(_floor_shape())
    scene.shape_names.append("floor")
    scene.materials.append(MaterialData(
        color=np.array([0.725, 0.71, 0.68], np.float32)))
    scene.material_names.append("floor")
    fl = np.eye(4, 3, dtype=np.float32)
    fl[:3] *= 12.0
    scene.instances.append(InstanceData(
        frame=fl, shape=len(scene.shapes) - 1,
        material=len(scene.materials) - 1))
    scene.instance_names.append("floor")

    # area light overhead
    light = _quad_shape(1.5)
    scene.shapes.append(light)
    scene.shape_names.append("arealight")
    scene.materials.append(MaterialData(
        emission=np.array([30.0, 28.0, 24.0], np.float32)))
    scene.material_names.append("arealight")
    lf = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0], [0, 8.0, 0]],
                  np.float32)
    scene.instances.append(InstanceData(
        frame=lf, shape=len(scene.shapes) - 1,
        material=len(scene.materials) - 1))
    scene.instance_names.append("arealight")
    return scene
