"""Test config: run everything on a virtual 8-device CPU mesh so sharding
logic is exercised without TPU hardware (SURVEY.md §4 implication (d)).

The environment preimports jax (sitecustomize) with JAX_PLATFORMS=axon, so
plain env vars are too late; use jax.config.update before any backend use.
"""

import os

_backend = os.environ.get("YOCTO_TPU_TESTS_BACKEND", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if (_backend == "cpu"
        and "xla_force_host_platform_device_count" not in flags):
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
if _backend == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"

# persistent compile cache: XLA CPU compiles take minutes for the big
# sampler graphs on this 1-core host; caching makes re-runs fast
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"))

import jax  # noqa: E402

if _backend == "cpu":
    jax.config.update("jax_platforms", "cpu")
# the env var alone does not activate the persistent cache on the axon
# TPU backend (see yocto_tpu.enable_compilation_cache); jax.config does,
# and both backends want it (XLA CPU compiles take minutes on this host,
# TPU compiles go through a slow remote helper)
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
# cache everything, including small/fast-compiling executables
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
