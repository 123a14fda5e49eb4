"""Trace parameters, field- and default-compatible with the reference
(yocto_trace.h:95-113), with enum label lists for the CLI/JSON config layer
(yocto_trace.h:228-276)."""

from __future__ import annotations

import enum
from dataclasses import dataclass


class SamplerType(enum.IntEnum):
    path = 0
    pathdirect = 1
    pathmis = 2
    pathtest = 3
    naive = 4
    eyelight = 5
    diagram = 6
    furnace = 7
    falsecolor = 8


class FalsecolorType(enum.IntEnum):
    position = 0
    normal = 1
    frontfacing = 2
    gnormal = 3
    gfrontfacing = 4
    texcoord = 5
    mtype = 6
    color = 7
    emission = 8
    roughness = 9
    opacity = 10
    metallic = 11
    delta = 12
    instance = 13
    shape = 14
    material = 15
    element = 16
    highlight = 17


SAMPLER_NAMES = ["path", "pathdirect", "pathmis", "pathtest", "naive",
                 "eyelight", "diagram", "furnace", "falsecolor"]

FALSECOLOR_NAMES = ["position", "normal", "frontfacing", "gnormal",
                    "gfrontfacing", "texcoord", "mtype", "color", "emission",
                    "roughness", "opacity", "metallic", "delta", "instance",
                    "shape", "material", "element", "highlight"]

TRACE_DEFAULT_SEED = 961748941


@dataclass
class TraceParams:
    camera: int = 0
    resolution: int = 1280
    sampler: SamplerType = SamplerType.path
    falsecolor: FalsecolorType = FalsecolorType.color
    samples: int = 512
    bounces: int = 8
    clamp: float = 10.0
    nocaustics: bool = False
    envhidden: bool = False
    tentfilter: bool = False
    seed: int = TRACE_DEFAULT_SEED
    embreebvh: bool = False       # reference: use the native fast path;
    #                               here it forces the cluster intersector
    highqualitybvh: bool = False  # -> SAH build instead of middle split
    noparallel: bool = False
    pratio: int = 8
    denoise: bool = False
    batch: int = 1
    # TPU-specific extensions (not in the reference)
    bruteforce: bool = False      # skip the BVH, intersect all elements
    exact_rng: bool = True        # bit-exact PCG32 streams per pixel
    spp_batch: int = 1            # samples per device step (>1 implies
    #                               decorrelated per-sample streams)
    intersector: str = "auto"     # auto|dense|cluster|bvh backend select
