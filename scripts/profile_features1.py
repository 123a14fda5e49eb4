"""Per-stage wall-clock attribution for the features1 wavefront path.

Times, on the real chip, at the dominant lane counts of the bench
workload (320 res x 8 spp batch): raygen, the fused bounce (isect+shade),
and the split isect / shade pieces, plus compaction. The split times tell
where the next optimization dollar goes (cull vs sweep vs shade gathers).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_features1.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from yocto_tpu.io.sceneio import load_scene
from yocto_tpu.trace.params import SamplerType, TraceParams
from yocto_tpu.trace.wavefront import WavefrontRenderer

FEATURES1 = "/root/reference/tests/features1/features1.json"


def t(fn, *args, n=4, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / n, out


def main():
    import sys
    scene = load_scene(FEATURES1)
    params = TraceParams(resolution=320, samples=64, bounces=8,
                         sampler=SamplerType.path, spp_batch=8)
    r = WavefrontRenderer(scene, params)
    if len(sys.argv) > 1:  # optional cluster-size override experiment
        from yocto_tpu.trace.pallas_cluster import make_cluster_intersector
        r._cluster = make_cluster_intersector(
            scene, kinds=r.features.kinds, cluster=int(sys.argv[1]))
        r._jits.clear()
    print("cluster:", r._cluster is not None,
          "n_clusters:", getattr(r._cluster, "n_clusters", None),
          "cluster size:", getattr(r._cluster, "cluster", None))

    flat, lights = r.flat, r.lights
    dt, lanes0 = t(lambda: r._raygen()(flat, 0), n=2)
    npix = r.width * r.height
    print(f"raygen ({lanes0.pix.shape[0]} lanes): {dt*1e3:.1f} ms")

    img = jnp.zeros((npix, 3), jnp.float32)
    alb = jnp.zeros((npix, 3), jnp.float32)
    nrm = jnp.zeros((npix, 3), jnp.float32)
    hits = jnp.zeros(npix, jnp.int32)

    bounce = r._bounce()
    lanes = lanes0
    state = (img, alb, nrm, hits)
    for it in range(4):
        B = int(lanes.pix.shape[0])
        dt, out = t(bounce, flat, lights, lanes, *state,
                    first_bounce=(it == 0), n=2)
        lanes, img, alb, nrm, hits, nlive = out
        state = (img, alb, nrm, hits)
        print(f"bounce {it} @ {B} lanes: {dt*1e3:.1f} ms "
              f"(live after: {int(nlive)})")
        # split attribution at this lane count
        tmax = jnp.where(lanes.pix >= 0, 3.4e38, 0.0)
        isect_fn = jax.jit(r._intersect_raw())
        dt_i, isec = t(isect_fn, flat, lanes.ro, lanes.rd, tmax=tmax, n=2)
        shade = r._shade()
        dt_s, _ = t(shade, flat, lights, lanes, isec.hit, isec.instance,
                    isec.element, isec.uv, isec.distance, *state,
                    first_bounce=False, n=2)
        print(f"    split: isect {dt_i*1e3:.1f} ms, shade {dt_s*1e3:.1f} ms")
        from yocto_tpu.trace.wavefront import _next_bucket
        nl = int(nlive)
        if nl == 0:
            break
        bucket = _next_bucket(nl)
        if bucket < lanes.pix.shape[0]:
            dt_c, lanes = t(r._compact(), lanes, bucket=bucket, n=2)
            print(f"    compact -> {bucket}: {dt_c*1e3:.1f} ms")

    # whole-sample wall clock (the bench number's building block)
    dt, _ = t(lambda: r.render_sample(flat, lights, 1), n=1)
    paths = npix * r.spp_batch
    print(f"render_sample: {dt*1e3:.0f} ms -> "
          f"{paths/dt/1e6:.3f} Mpaths/s")


if __name__ == "__main__":
    main()
