"""Multi-host simulation: 2 OS processes join one jax.distributed runtime
(SURVEY.md §4 implication (d)); the tile-sharded render over the 4-device
global mesh must reproduce the single-process render.

This is the CPU stand-in for a 2-host TPU slice: same init path
(parallel/distributed.py), same Mesh spanning all global devices, same
DistributedRenderer SPMD program — only the transport differs (TCP
coordination service instead of ICI/DCN).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.skipif(
    not os.environ.get("RUN_SLOW_TESTS"),
    reason="spawns 2 processes that each compile the sampler on CPU "
           "(minutes on this host); set RUN_SLOW_TESTS=1 to run")
def test_two_process_render_matches_single_process(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_distworker.py")
    port = _free_port()

    env = os.environ.copy()
    # sitecustomize registers the axon TPU plugin whenever
    # PALLAS_AXON_POOL_IPS is set — and registration dials the remote chip
    # at interpreter start. CPU workers must never touch it.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        logs.append(out.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    # assemble the global image from each process's addressable shards
    rows = {}
    for i in range(2):
        with np.load(tmp_path / f"proc{i}.npz") as z:
            for k in z.files:
                rows[int(k)] = z[k]
    assert len(rows) == 4  # 4 devices, one row block each
    img = np.concatenate([rows[k] for k in sorted(rows)], axis=0)
    assert img.shape == (16, 16, 4)  # RGBA accumulator

    # single-process reference on this process's virtual mesh (1 device)
    import jax

    from yocto_tpu.models.examples import make_cornellbox
    from yocto_tpu.parallel.mesh import DistributedRenderer, make_tile_mesh
    from yocto_tpu.trace.params import SamplerType, TraceParams

    params = TraceParams(resolution=16, samples=1, bounces=2,
                         sampler=SamplerType.path, bruteforce=True)
    dr = DistributedRenderer(make_cornellbox(), params,
                             mesh=make_tile_mesh([jax.devices()[0]]))
    ref = dr.gather_image(dr.render(1))
    np.testing.assert_allclose(img, ref, rtol=1e-5, atol=1e-6)
