"""Procedural presets addressable as fake paths (`*.ypreset`), mirroring
the reference's preset system (yocto_sceneio.h:91-218; shape parameters
from make_shape_preset, yocto_sceneio.cpp:1358-1520, texture parameters
from make_image_preset, yocto_sceneio.cpp:700-860)."""

from __future__ import annotations

import numpy as np


def _fv_to_shape(fv):
    from ..models.shape import ShapeData
    from ..models.tesselate import split_facevarying
    quads, positions, normals, texcoords = split_facevarying(
        fv.quadspos, fv.quadsnorm, fv.quadstexcoord,
        fv.positions, fv.normals, fv.texcoords)
    return ShapeData(positions=positions, normals=normals,
                     texcoords=texcoords, quads=quads)


def _lift(shape, dy):
    shape.positions = np.asarray(shape.positions, np.float32) \
        + np.asarray([0, dy, 0], np.float32)
    return shape


def make_shape_preset(name: str):
    from ..models import procedural as P
    from ..models.sampleshape import make_hair

    def hairball(length_scale, noise=None, clump=None):
        base = _lift(P.make_sphere(32, 0.075 * 0.8, 1), 0.075)
        kw = {}
        if noise is not None:
            kw["noise"] = noise
        if clump is not None:
            kw["clump"] = clump
        return make_hair(base, steps=(4, 65536),
                         length=(0.1 * 0.15, 0.1 * 0.15),
                         rad=(0.001 * 0.15, 0.0005 * 0.15), **kw)

    makers = {
        # default-* presets (yocto_sceneio.cpp:1358-1416)
        "default-quad": P.make_rect,
        "default-quady": P.make_recty,
        "default-cube": P.make_box,
        "default-cube-rounded": P.make_rounded_box,
        "default-sphere": P.make_sphere,
        "default-matcube": P.make_rounded_box,
        "default-matsphere": P.make_uvspherey,
        "default-disk": P.make_disk,
        "default-disk-bulged": P.make_bulged_disk,
        "default-quad-bulged": P.make_bulged_rect,
        "default-uvsphere": P.make_uvsphere,
        "default-uvsphere-flipcap": P.make_capped_uvsphere,
        "default-uvspherey": P.make_uvspherey,
        "default-uvspherey-flipcap": P.make_capped_uvspherey,
        "default-uvdisk": P.make_uvdisk,
        "default-uvcylinder": P.make_uvcylinder,
        "default-uvcylinder-rounded":
            lambda: P.make_rounded_uvcylinder((32, 32, 32)),
        "default-geosphere": P.make_geosphere,
        "default-floor": P.make_floor,
        "default-floor-bent": P.make_bent_floor,
        "default-matball": P.make_sphere,
        "default-hairball": lambda: make_hair(
            P.make_sphere(32, 0.8), steps=(4, 65536), length=(0.2, 0.2),
            rad=(0.002, 0.001)),
        "default-hairball-interior": lambda: P.make_sphere(32, 0.8),
        "default-suzanne": P.make_monkey,
        "default-cube-facevarying": lambda: _fv_to_shape(P.make_fvbox()),
        "default-sphere-facevarying":
            lambda: _fv_to_shape(P.make_fvsphere()),
        "default-quady-displaced": lambda: P.make_recty((256, 256)),
        "default-sphere-displaced": lambda: P.make_sphere(128),
        # test-* presets (yocto_sceneio.cpp:1417-1520)
        "test-cube": lambda: _lift(P.make_rounded_box(
            (32, 32, 32), (0.075, 0.075, 0.075), (1, 1, 1),
            0.3 * 0.075), 0.075),
        "test-uvsphere": lambda: _lift(
            P.make_uvsphere((32, 32), 0.075), 0.075),
        "test-uvsphere-flipcap": lambda: _lift(P.make_capped_uvsphere(
            (32, 32), 0.075, (1, 1), 0.3 * 0.075), 0.075),
        "test-uvspherey": lambda: _lift(
            P.make_uvspherey((32, 32), 0.075), 0.075),
        "test-uvspherey-flipcap": lambda: _lift(P.make_capped_uvspherey(
            (32, 32), 0.075, (1, 1), 0.3 * 0.075), 0.075),
        "test-sphere": lambda: _lift(P.make_sphere(32, 0.075, 1), 0.075),
        "test-matcube": lambda: _lift(P.make_rounded_box(
            (32, 32, 32), (0.075, 0.075, 0.075), (1, 1, 1),
            0.3 * 0.075), 0.075),
        "test-matsphere": lambda: _lift(
            P.make_uvspherey((32, 32), 0.075, (2, 1)), 0.075),
        "test-sphere-displaced": lambda: _lift(
            P.make_sphere(128, 0.075, 1), 0.075),
        "test-smallsphere": lambda: _lift(
            P.make_sphere(32, 0.015, 1), 0.015),
        "test-disk": lambda: _lift(P.make_disk(32, 0.075, 1), 0.075),
        "test-uvcylinder": lambda: _lift(P.make_rounded_uvcylinder(
            (32, 32, 32), (0.075, 0.075), (1, 1, 1), 0.3 * 0.075), 0.075),
        "test-floor": lambda: P.make_floor((1, 1), (2, 2), (20, 20)),
        "test-smallfloor": lambda: P.make_floor((1, 1), (0.5, 0.5),
                                                (1, 1)),
        "test-quad": lambda: P.make_rect((1, 1), (0.075, 0.075), (1, 1)),
        "test-quady": lambda: P.make_recty((1, 1), (0.075, 0.075), (1, 1)),
        "test-quad-displaced": lambda: P.make_rect(
            (256, 256), (0.075, 0.075), (1, 1)),
        "test-quady-displaced": lambda: P.make_recty(
            (256, 256), (0.075, 0.075), (1, 1)),
        "test-matball": lambda: _lift(P.make_sphere(32, 0.075), 0.075),
        "test-geosphere": lambda: _lift(P.make_geosphere(0.075, 3), 0.075),
        "test-geosphere-subdivided": lambda: _lift(
            P.make_geosphere(0.075, 6), 0.075),
        "test-hairball1": lambda: hairball(0.15, noise=(0.03, 100)),
        "test-hairball2": lambda: hairball(0.15),
        "test-hairball3": lambda: hairball(0.15, clump=(0.5, 128)),
        "test-hairball-interior": lambda: _lift(
            P.make_sphere(32, 0.075 * 0.8, 1), 0.075),
        "test-suzanne-subdiv": lambda: _lift(
            P.make_monkey(0.075 * 0.8), 0.075),
        # short aliases kept for convenience
        "quad": P.make_rect,
        "quady": P.make_recty,
        "cube": P.make_box,
        "box": P.make_box,
        "sphere": P.make_sphere,
        "uvsphere": P.make_uvsphere,
        "disk": P.make_disk,
        "floor": P.make_floor,
        "matball": P.make_sphere,
        "monkey": P.make_monkey,
        "geosphere": P.make_geosphere,
        "bunny": P.make_sphere,   # stand-in when asset not available
        "uvcylinder": P.make_uvcylinder,
        "capsule": P.make_capsule,
        "cone": P.make_cone,
    }
    if name == "test-geosphere-flat":
        shape = makers["test-geosphere"]()
        shape.normals = np.zeros((0, 3), np.float32)
        return shape
    if name not in makers:
        raise ValueError(f"unknown shape preset {name!r}")
    return makers[name]()


def make_texture_preset(name: str):
    from ..models import image as I

    if name.startswith("test-"):
        base = name[len("test-"):]
        if base == "floor":
            return I.add_border(I.make_grid(), 0.0025)
        if base == "bumps-normal":
            return I.bump_to_normal(I.make_bumps(), 0.05)
        if base in ("bumps-displacement",):
            return I.make_bumps()
        if base in ("fbm-displacement",):
            return I.make_fbmmap()
        name = base

    makers = {
        "grid": lambda: I.make_grid(),
        "checker": lambda: I.make_checker(),
        "bumps": lambda: I.make_bumps(),
        "ramp": lambda: I.make_ramp(),
        "gammaramp": lambda: I.make_gammaramp(),
        "uvramp": lambda: I.make_uvramp(),
        "uvgrid": lambda: I.make_uvgrid(),
        "blackbodyramp": lambda: I.make_blackbodyramp(),
        "colormapramp": lambda: I.make_colormapramp(),
        "noise": lambda: I.make_noisemap(),
        "noisemap": lambda: I.make_noisemap(),
        "fbm": lambda: I.make_fbmmap(),
        "fbmmap": lambda: I.make_fbmmap(),
        "turbulence": lambda: I.make_turbulencemap(),
        "turbulencemap": lambda: I.make_turbulencemap(),
        "ridge": lambda: I.make_ridgemap(),
        "ridgemap": lambda: I.make_ridgemap(),
        "bump-normal": lambda: I.bump_to_normal(I.make_bumps(), 0.05),
        "sky": lambda: I.ImageData(1024, 512, True,
                                   I.make_sunsky(1024, 512)),
        "sunsky": lambda: I.ImageData(
            1024, 512, True, I.make_sunsky(1024, 512, has_sun=True)),
    }
    if name not in makers:
        raise ValueError(f"unknown texture preset {name!r}")
    return makers[name]()
