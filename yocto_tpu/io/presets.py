"""Procedural presets addressable as fake paths (`*.ypreset`), mirroring
the reference's preset system (yocto_sceneio.h:91-218)."""

from __future__ import annotations

import numpy as np


def make_shape_preset(name: str):
    from ..models import procedural as P

    makers = {
        "default-quad": P.make_rect,
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
    if name not in makers:
        raise ValueError(f"unknown shape preset {name!r}")
    return makers[name]()


def make_texture_preset(name: str):
    from ..models import image as I

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
        "noisemap": lambda: I.make_noisemap(),
        "fbmmap": lambda: I.make_fbmmap(),
        "turbulencemap": lambda: I.make_turbulencemap(),
        "ridgemap": lambda: I.make_ridgemap(),
        "sky": lambda: I.ImageData(1024, 512, True,
                                   I.make_sunsky(1024, 512)),
        "sunsky": lambda: I.ImageData(
            1024, 512, True, I.make_sunsky(1024, 512, has_sun=True)),
    }
    if name not in makers:
        raise ValueError(f"unknown texture preset {name!r}")
    return makers[name]()
