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


def enable_compilation_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at `path` (default:
    `$JAX_COMPILATION_CACHE_DIR` or `<repo>/.jax_cache`).

    On this backend the `JAX_COMPILATION_CACHE_DIR` env var alone does
    NOT activate the cache (verified: a 450 s compile wrote zero
    entries); `jax.config.update` does. Every entry point that compiles
    big graphs (bench.py, apps, scripts) calls this so warm runs skip
    the 20-240 s remote compiles."""
    import os

    import jax

    if path is None:
        path = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
