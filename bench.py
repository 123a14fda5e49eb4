"""Benchmark: Mrays/s per chip on the Cornell box path tracer.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The workload is BASELINE.json config 1/2 territory: Cornell box, path
sampler with MIS, 8 bounces. Rays/s counts camera rays (paths) per second
of steady-state sampling, i.e. full paths traced to termination — the same
accounting a `spp * W * H / wall` measurement of the reference gives.

vs_baseline compares against the reference CPU renderer measured on this
machine (see BASELINE.md): ytrace-equivalent paths/s on all host cores.
"""

import json
import os
import sys
import time

REF_CPU_PATHS_PER_SEC = None  # filled from BASELINE.md measurement below
# Reference CPU measurement (this machine, all cores): Cornell box 256x256,
# 64 spp, 8 bounces, path sampler -> see BASELINE.md. Updated when measured.
_REF_FILE = os.path.join(os.path.dirname(__file__), "BASELINE.md")


def _ref_paths_per_sec(default=2.9e6):
    try:
        with open(_REF_FILE) as f:
            for line in f:
                if line.startswith("<!-- ref_cornell_paths_per_sec="):
                    return float(line.split("=")[1].split()[0].rstrip("->"))
    except OSError:
        pass
    return default


def main():
    import jax

    from yocto_tpu.models.examples import make_cornellbox
    from yocto_tpu.trace.params import SamplerType, TraceParams
    from yocto_tpu.trace.renderer import Renderer

    res = int(os.environ.get("BENCH_RES", "256"))
    warmup = 2
    iters = int(os.environ.get("BENCH_ITERS", "16"))

    scene = make_cornellbox()
    params = TraceParams(resolution=res, samples=warmup + iters, bounces=8,
                         sampler=SamplerType.path)
    r = Renderer(scene, params)
    state = r.make_state()
    for _ in range(warmup):
        state = r.sample(state)
    jax.block_until_ready(state.image)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = r.sample(state)
    jax.block_until_ready(state.image)
    dt = time.perf_counter() - t0

    paths = res * res * iters
    paths_per_sec = paths / dt
    ref = _ref_paths_per_sec()
    print(json.dumps({
        "metric": "cornellbox_path_Mpaths_per_sec",
        "value": round(paths_per_sec / 1e6, 4),
        "unit": "Mpaths/s/chip",
        "vs_baseline": round(paths_per_sec / ref, 4),
    }))


if __name__ == "__main__":
    main()
