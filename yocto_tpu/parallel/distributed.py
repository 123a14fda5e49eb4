"""Multi-host initialization and mesh construction.

Single-chip and single-host meshes need nothing special; across hosts the
single-controller `jax.distributed` runtime joins all processes into one
device list, and the same tile/instance sharding code spans it — XLA
routes collectives over ICI within a slice and DCN across slices
(SURVEY.md §2.3 / §5 mapping). This module is the thin entry point.

Usage on each host of a multi-host slice:

    from yocto_tpu.parallel.distributed import init_distributed, make_mesh
    init_distributed()            # env-driven on TPU pods
    mesh = make_mesh()            # 1-D mesh over all global devices
    dr = DistributedRenderer(scene, params, mesh=mesh)   # tile sharding
    # or shard_scene/make_sharded_intersector for instance sharding
"""

from __future__ import annotations

import numpy as np


def init_distributed(coordinator_address: str = None,
                     num_processes: int = None,
                     process_id: int = None) -> None:
    """Join the jax.distributed runtime (no-op for a single process).

    On TPU pods the arguments resolve from the environment; pass them
    explicitly for CPU/GPU multi-process simulation.
    """
    import jax

    if num_processes in (None, 1) and coordinator_address is None:
        # single-process: nothing to initialize
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def make_mesh(axis: str = "tiles"):
    """1-D mesh over ALL global devices (all hosts)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), axis_names=(axis,))


def local_tile_bounds(height: int):
    """Row range this PROCESS owns under tile sharding (for host-side IO
    like writing its slice of a tiled EXR)."""
    import jax

    ndev = jax.device_count()
    nloc = jax.local_device_count()
    pid = jax.process_index()
    rows_per_dev = height // ndev
    start = pid * nloc * rows_per_dev
    return start, start + nloc * rows_per_dev
