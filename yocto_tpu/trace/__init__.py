"""The TPU renderer: scene compilation to flat SoA device arrays, batched
scene evaluation, intersection (brute-force and BVH), light sampling, the
wavefront path-tracing samplers, and the progressive renderer API."""

from .params import TraceParams, SamplerType, FalsecolorType  # noqa: F401
from .compile import compile_scene, FlatScene  # noqa: F401
from .lights import make_trace_lights, FlatLights  # noqa: F401
from .renderer import (  # noqa: F401
    make_trace_state, trace_samples, trace_image, get_image, TraceState)
