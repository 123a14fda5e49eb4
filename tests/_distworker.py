"""Worker process for the 2-process jax.distributed CPU simulation test
(SURVEY.md §4 implication (d); VERDICT round-1 row 23).

Launched by tests/test_distributed.py with JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=2 already in the
environment (sitecustomize preimports jax, so env must be set by the
parent). Each of the two processes contributes 2 virtual CPU devices to a
4-device global mesh, renders its tile-sharded rows of the Cornell box,
and writes its addressable shards to <outdir>/proc<pid>.npz.

Usage: python tests/_distworker.py <process_id> <num_processes> <port> <outdir>
"""

import os
import sys

import numpy as np


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    outdir = sys.argv[4]

    import jax

    from yocto_tpu.parallel.distributed import init_distributed, make_mesh
    init_distributed(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=nproc, process_id=pid)
    assert jax.process_index() == pid
    assert jax.device_count() == 2 * nproc, jax.device_count()
    assert jax.local_device_count() == 2, jax.local_device_count()

    from yocto_tpu.models.examples import make_cornellbox
    from yocto_tpu.parallel.mesh import DistributedRenderer
    from yocto_tpu.trace.params import SamplerType, TraceParams

    params = TraceParams(resolution=16, samples=1, bounces=2,
                         sampler=SamplerType.path, bruteforce=True)
    dr = DistributedRenderer(make_cornellbox(), params,
                             mesh=make_mesh("tiles"))
    state = dr.render(1)

    shards = {}
    for s in state.image.addressable_shards:
        shards[str(s.index[0].start or 0)] = np.asarray(s.data)
    np.savez(os.path.join(outdir, f"proc{pid}.npz"), **shards)
    print(f"proc {pid} wrote {sorted(shards)} rows-starts", flush=True)


if __name__ == "__main__":
    main()
