"""Per-stage TPU wall-clock profile of the features1 wavefront bounce.

Times, at representative bucket sizes, the pieces of the fused bounce:
  sort   — 5-D morton keys + argsort + ray permute
  cull   — _tile_clusters (per-ray slab tests vs every cluster bbox)
  sweep  — the Pallas tile sweep (entry-sorted slot walk)
  isect  — the whole ClusterIntersector call (sort+cull+sweep+unpermute)
  shade  — the wavefront shade stage
  bounce — the fused intersect+shade+live-count dispatch

Run: python scripts/profile_features1.py [bucket ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from yocto_tpu.io.sceneio import load_scene
from yocto_tpu.trace.params import SamplerType, TraceParams
from yocto_tpu.trace.wavefront import WavefrontRenderer
from yocto_tpu.trace import pallas_cluster as PC
from yocto_tpu.ops import mathops as M


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    buckets = [int(a) for a in sys.argv[1:]] or [819200, 262144, 65536]
    scene = load_scene("/root/reference/tests/features1/features1.json")
    params = TraceParams(resolution=320, samples=64, bounces=8,
                         sampler=SamplerType.path, spp_batch=8)
    wf = WavefrontRenderer(scene, params)
    cl = wf._cluster
    assert cl is not None
    print(f"clusters={cl.n_clusters} cluster={cl.cluster} "
          f"max_slots={cl.max_slots} ray_tile={cl.ray_tile}")

    flat, lights = wf.flat, wf.lights
    raygen = wf._raygen()
    lanes0 = raygen(flat, 0)
    bounce = wf._bounce()
    # one real bounce to get realistic secondary rays
    n0 = lanes0.pix.shape[0]
    img = jnp.zeros((wf.width * wf.height, 3), jnp.float32)
    alb = jnp.zeros_like(img)
    nrm = jnp.zeros_like(img)
    hit = jnp.zeros((wf.width * wf.height,), jnp.int32)
    lanes1, *_ = bounce(flat, lights, lanes0, img, alb, nrm, hit,
                        first_bounce=True)
    jax.block_until_ready(lanes1.pix)

    for bucket in buckets:
        for name, lanes in (("camera", lanes0), ("bounce1", lanes1)):
            if lanes.pix.shape[0] < bucket:
                continue
            sl = jax.tree.map(lambda a: a[:bucket], lanes)
            ro, rd = sl.ro, sl.rd
            tmax = jnp.where(sl.pix >= 0, M.flt_max, 0.0)

            t_isect = timeit(
                jax.jit(lambda ro, rd, tmax: cl(flat, ro, rd, tmax=tmax)),
                ro, rd, tmax)

            keyfn = jax.jit(lambda ro, rd: jnp.argsort(
                PC.ray_sort_keys(ro, rd)))
            t_sort = timeit(keyfn, ro, rd)

            order = keyfn(ro, rd)
            ros, rds = ro[order], rd[order]
            tmins = jnp.full(bucket, 1e-4, jnp.float32)
            tmaxs = tmax[order]
            ntiles = bucket // cl.ray_tile

            cullfn = jax.jit(lambda a, b, c, d: cl._tile_clusters(
                a, b, c, d, ntiles))
            t_cull = timeit(cullfn, ros, rds, tmins, tmaxs)

            clist, centry, maxent, _ = cullfn(ros, rds, tmins, tmaxs)
            rays = jnp.concatenate(
                [ros, rds, tmins[:, None], tmaxs[:, None],
                 maxent[:, None], jnp.zeros((bucket, 7), jnp.float32)],
                axis=1)
            ckind = jnp.where(clist >= 0,
                              cl.c_kind[jnp.maximum(clist, 0)], 0)
            t_sweep = timeit(
                lambda: PC._run_sweep(rays, cl.prims, clist, centry,
                                      ckind, cl.cluster, cl.variants,
                                      cl.interpret, ray_tile=cl.ray_tile))

            t_bounce = timeit(
                lambda: bounce(flat, lights, sl, img, alb, nrm, hit,
                               first_bounce=False))
            t_shade = t_bounce - t_isect
            mean_cl = float(jnp.where(clist >= 0, 1, 0).sum(1).mean())
            print(f"[{bucket:7d} {name:7s}] isect {t_isect*1e3:7.1f} ms "
                  f"(sort {t_sort*1e3:6.1f} cull {t_cull*1e3:6.1f} "
                  f"sweep {t_sweep*1e3:6.1f}) bounce {t_bounce*1e3:7.1f} "
                  f"shade~{t_shade*1e3:7.1f} slots/tile {mean_cl:6.1f}")


if __name__ == "__main__":
    main()
