"""yocto-tpu: a TPU-native differentiable path-tracing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of Yocto/GL
(https://github.com/xelatihy/yocto-gl): physically-based wavefront path
tracing over SoA ray batches, a two-level BVH, the full PBR material set,
geometry/image processing, and scene IO — designed for TPU hardware
(MXU/VPU-friendly batched kernels, static shapes, `lax` control flow,
`shard_map` over device meshes) rather than translated from the reference's
C++/CUDA architecture.
"""

__version__ = "0.1.0"
