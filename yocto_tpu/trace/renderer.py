"""Progressive renderer: state, per-sample accumulation, orchestration.

Replicates the reference's progressive API (yocto_trace.cpp:1440-1676):
`make_trace_state` (running-mean image/albedo/normal accumulators plus a
per-pixel PCG32 generator seeded exactly like the reference's
make_trace_state, yocto_trace.cpp:1495-1520), `trace_samples` (one batch of
samples for every pixel — here a single jitted device step over the whole
megabatch of rays instead of a scanline thread pool), `trace_image` (full
loop) and `get_image`.

The sampler runs once per pixel per sample over a flat [H*W] lane batch;
accumulation is the reference's clamped running mean
(yocto_trace.cpp:1461-1492).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.scene import SceneData
from ..ops import mathops as M
from ..ops import rng as R
from ..ops import sampling as SMP
from .compile import FlatScene, compile_scene, scene_features
from .intersect import intersect_scene_bruteforce
from .lights import FlatLights, LightsMeta, make_trace_lights
from .params import SamplerType, TraceParams
from .pathtrace import get_sampler_builder


class TraceState(NamedTuple):
    image: jax.Array    # [H,W,4] running mean
    albedo: jax.Array   # [H,W,3]
    normal: jax.Array   # [H,W,3]
    hits: jax.Array     # [H,W] i32
    rng: R.RngState     # leaves [H*W]
    samples: jax.Array  # scalar i32


def render_size(scene: SceneData, params: TraceParams):
    cam = scene.cameras[params.camera]
    if cam.aspect >= 1:
        width = params.resolution
        height = int(round(params.resolution / cam.aspect))
    else:
        height = params.resolution
        width = int(round(params.resolution * cam.aspect))
    return width, height


def make_trace_state(scene: SceneData, params: TraceParams) -> TraceState:
    width, height = render_size(scene, params)
    n = width * height
    return TraceState(
        image=jnp.zeros((height, width, 4), jnp.float32),
        albedo=jnp.zeros((height, width, 3), jnp.float32),
        normal=jnp.zeros((height, width, 3), jnp.float32),
        hits=jnp.zeros((height, width), jnp.int32),
        rng=R.make_pixel_seeds(n, params.seed),
        samples=jnp.zeros((), jnp.int32))


def sample_camera_rays(scene: FlatScene, camera: int, width: int,
                       height: int, rngs, tentfilter: bool,
                       row_offset=0, full_height: int = None):
    """Camera ray batch with pixel jitter + lens sampling
    (yocto_trace.cpp:338-358). Returns (ro, rd, rng').

    `row_offset`/`full_height` support tile-sharded rendering: this batch
    covers rows [row_offset, row_offset+height) of a full_height image.
    """
    from .sceneval import eval_camera

    if full_height is None:
        full_height = height
    jj, ii = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32),
                          indexing="ij")
    i = ii.reshape(-1)
    j = jj.reshape(-1) + row_offset
    # NOTE: the reference passes rand2f(rng) twice as call arguments
    # (yocto_trace.cpp:1465-1467); gcc evaluates arguments right-to-left,
    # so the lens uv consumes the FIRST pair of draws. Matching that order
    # keeps per-pixel streams bit-identical to the reference build.
    luv, rngs = R.rand2f(rngs)
    puv, rngs = R.rand2f(rngs)
    if not tentfilter:
        uv = jnp.stack([(i + puv[..., 0]) / width,
                        (j + puv[..., 1]) / full_height], axis=-1)
    else:
        fuv = 2.0 * jnp.stack([
            jnp.where(puv[..., 0] < 0.5,
                      jnp.sqrt(2.0 * puv[..., 0]) - 1.0,
                      1.0 - jnp.sqrt(2.0 - 2.0 * puv[..., 0])),
            jnp.where(puv[..., 1] < 0.5,
                      jnp.sqrt(2.0 * puv[..., 1]) - 1.0,
                      1.0 - jnp.sqrt(2.0 - 2.0 * puv[..., 1])),
        ], axis=-1) + 0.5
        uv = jnp.stack([(i + fuv[..., 0]) / width,
                        (j + fuv[..., 1]) / full_height], axis=-1)
    ro, rd = eval_camera(scene, camera, uv, SMP.sample_disk(luv))
    return ro, rd, rngs


def _one_sample(scene: FlatScene, lights: FlatLights, state: TraceState,
                meta: LightsMeta, params: TraceParams, width: int,
                height: int, row_offset=0, full_height: int = None,
                bvh=None, features=None, intersect_fn=None,
                sampler_fn=None):
    """One sample for every pixel (or row block) + accumulation.
    Traced under jit; `row_offset`/`full_height` support tile sharding.
    `bvh` (FlatBvh) selects the accelerated intersector; None = brute
    force. `features` (SceneFeatures) specializes the traced code to the
    scene's static capabilities; `intersect_fn` overrides the intersector
    (e.g. the fused Pallas sweep)."""
    if sampler_fn is not None:
        sampler = sampler_fn
    else:
        kinds = features.kinds if features is not None else None
        if intersect_fn is not None:
            pass
        elif bvh is None:
            intersect_fn = partial(intersect_scene_bruteforce, kinds=kinds)
        else:
            from .bvh import make_bvh_intersector
            intersect_fn = make_bvh_intersector(bvh, kinds=kinds)
        builder = get_sampler_builder(params.sampler)
        sampler = builder(scene, lights, meta, params, intersect_fn,
                          features=features)

    ro, rd, rngs = sample_camera_rays(
        scene, params.camera, width, height, state.rng, params.tentfilter,
        row_offset=row_offset, full_height=full_height)
    radiance, hit, albedo, normal, rngs = sampler(ro, rd, rngs)

    # clamp + nan scrub (yocto_trace.cpp:1471-1475)
    finite = M.isfinite3(radiance)[..., None]
    radiance = jnp.where(finite, radiance, 0.0)
    mx = M.maxc(radiance)
    scale = jnp.where(mx > params.clamp, params.clamp / jnp.maximum(mx, 1e-20),
                      1.0)
    radiance = radiance * scale[..., None]

    has_env = scene.env_frame.shape[0] > 0
    w = 1.0 / (state.samples.astype(jnp.float32) + 1.0)

    img_new = jnp.concatenate(
        [radiance, jnp.ones_like(radiance[..., :1])], axis=-1)
    if has_env and not params.envhidden:
        # miss lanes still accumulate environment radiance
        use_img = jnp.ones_like(hit)
        albedo_new = jnp.where(hit[..., None], albedo,
                               jnp.ones_like(albedo))
        normal_new = jnp.where(hit[..., None], normal, -rd)
        hits_inc = jnp.ones_like(hit, jnp.int32)
    else:
        use_img = hit
        albedo_new = jnp.where(hit[..., None], albedo,
                               jnp.zeros_like(albedo))
        normal_new = jnp.where(hit[..., None], normal, -rd)
        hits_inc = hit.astype(jnp.int32)
    img_new = jnp.where(use_img[..., None], img_new,
                        jnp.zeros_like(img_new))

    shape2 = (height, width)
    image = state.image + (img_new.reshape(shape2 + (4,))
                           - state.image) * w
    albedo_acc = state.albedo + (albedo_new.reshape(shape2 + (3,))
                                 - state.albedo) * w
    normal_acc = state.normal + (normal_new.reshape(shape2 + (3,))
                                 - state.normal) * w
    hits = state.hits + hits_inc.reshape(shape2)
    return TraceState(image=image, albedo=albedo_acc, normal=normal_acc,
                      hits=hits, rng=rngs, samples=state.samples + 1)


def _multi_sample(scene: FlatScene, lights: FlatLights, state: TraceState,
                  meta: LightsMeta, params: TraceParams, width: int,
                  height: int, spp: int, seq_hi, seq_lo, bvh=None,
                  row_offset=0, full_height: int = None, features=None,
                  intersect_fn=None):
    """`spp` samples for every pixel in ONE device step (fast mode).

    Lanes are (sample, pixel) pairs with per-lane PCG32 streams seeded from
    (seed + golden * global_sample_index, pixel_seq) — statistically
    independent of each other and of the exact mode's sequential streams,
    converging to the same expectation. Accumulation applies the
    reference's per-sample clamp before averaging."""
    kinds = features.kinds if features is not None else None
    if intersect_fn is not None:
        pass
    elif bvh is None:
        intersect_fn = partial(intersect_scene_bruteforce, kinds=kinds)
    else:
        from .bvh import make_bvh_intersector
        intersect_fn = make_bvh_intersector(bvh, kinds=kinds)
    builder = get_sampler_builder(params.sampler)
    sampler = builder(scene, lights, meta, params, intersect_fn,
                      features=features)

    n = width * height
    k_lane = (state.samples
              + jnp.repeat(jnp.arange(spp, dtype=jnp.int32), n))
    rngs = R.make_rng_offset(params.seed, k_lane,
                             jnp.tile(seq_hi, spp), jnp.tile(seq_lo, spp))
    jj, ii = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32),
                          indexing="ij")
    i = jnp.tile(ii.reshape(-1), spp)
    j = jnp.tile(jj.reshape(-1) + row_offset, spp)
    fh = full_height if full_height is not None else height
    luv, rngs = R.rand2f(rngs)
    puv, rngs = R.rand2f(rngs)
    uv = jnp.stack([(i + puv[..., 0]) / width,
                    (j + puv[..., 1]) / fh], axis=-1)
    from .sceneval import eval_camera
    ro, rd = eval_camera(scene, params.camera, uv, SMP.sample_disk(luv))

    radiance, hit, albedo, normal, _ = sampler(ro, rd, rngs)

    finite = M.isfinite3(radiance)[..., None]
    radiance = jnp.where(finite, radiance, 0.0)
    mx = M.maxc(radiance)
    scale = jnp.where(mx > params.clamp,
                      params.clamp / jnp.maximum(mx, 1e-20), 1.0)
    radiance = radiance * scale[..., None]

    has_env = scene.env_frame.shape[0] > 0
    img_new = jnp.concatenate(
        [radiance, jnp.ones_like(radiance[..., :1])], axis=-1)
    if has_env and not params.envhidden:
        use_img = jnp.ones_like(hit)
        albedo_new = jnp.where(hit[..., None], albedo, 1.0)
        normal_new = jnp.where(hit[..., None], normal, -rd)
        hits_inc = jnp.ones_like(hit, jnp.int32)
    else:
        use_img = hit
        albedo_new = jnp.where(hit[..., None], albedo, 0.0)
        normal_new = jnp.where(hit[..., None], normal, -rd)
        hits_inc = hit.astype(jnp.int32)
    img_new = jnp.where(use_img[..., None], img_new, 0.0)

    shape2 = (height, width)
    img_avg = img_new.reshape((spp,) + shape2 + (4,)).mean(0)
    alb_avg = albedo_new.reshape((spp,) + shape2 + (3,)).mean(0)
    nrm_avg = normal_new.reshape((spp,) + shape2 + (3,)).mean(0)
    hits_sum = hits_inc.reshape((spp,) + shape2).sum(0)
    w = spp / (state.samples.astype(jnp.float32) + spp)
    return TraceState(
        image=state.image + (img_avg - state.image) * w,
        albedo=state.albedo + (alb_avg - state.albedo) * w,
        normal=state.normal + (nrm_avg - state.normal) * w,
        hits=state.hits + hits_sum,
        rng=state.rng, samples=state.samples + spp)


class Renderer:
    """Holds compiled scene + lights and a cached jitted sample step."""

    def __init__(self, scene: SceneData, params: TraceParams):
        self.scene_host = scene
        self.params = params
        self.flat = compile_scene(scene)
        self.features = scene_features(scene)
        self.lights, self.lights_meta = make_trace_lights(scene)
        self.width, self.height = render_size(scene, params)
        n_candidates = sum(
            max(len(scene.shapes[i.shape].points),
                len(scene.shapes[i.shape].lines),
                len(scene.shapes[i.shape].triangles),
                len(scene.shapes[i.shape].quads))
            for i in scene.instances)
        # intersector selection (params.intersector overrides "auto"):
        #   <=4096 candidates -> fused dense Pallas sweep (TPU)
        #   larger, TPU       -> cluster-binned Pallas pipeline (the
        #                        "Embree fast path"; also what embreebvh
        #                        requests) with threaded-BVH fallback
        #   CPU/tests         -> pure-jnp brute force / threaded BVH
        on_tpu = jax.default_backend() != "cpu"
        mode = params.intersector
        if mode == "auto":
            if params.bruteforce:
                mode = "dense"
            elif n_candidates <= 4096:
                mode = "dense"
            elif on_tpu or params.embreebvh:
                mode = "cluster"
            else:
                mode = "bvh"
        self.bvh = None
        self._isect = None
        self._pallas_sampler = None
        if mode == "cluster":
            from .pallas_cluster import make_cluster_intersector
            self._isect = make_cluster_intersector(
                scene, kinds=self.features.kinds,
                highquality=params.highqualitybvh)
            if self._isect is None:
                mode = "dense" if n_candidates <= 4096 else "bvh"
        if mode == "bvh":
            from .bvh import build_scene_bvh
            self.bvh = build_scene_bvh(scene, params.highqualitybvh)
        # fused Pallas sweep for the dense path (TPU only; the CPU/test
        # path keeps the pure-jnp reference intersector)
        if mode == "dense" and on_tpu:
            # full path-tracing megakernel for qualifying small scenes
            # (matte/glossy/reflective rough lobes + delta mirror/
            # transparent/zero-density glass, constant-color environments,
            # no textures): one kernel per sample instead of ~50 XLA
            # kernels per bounce (same draw sites/streams as the lockstep
            # sampler)
            from .pallas_path import (make_pallas_path_sampler,
                                      supports_pallas_path)
            if (params.exact_rng and max(1, params.spp_batch) == 1
                    and supports_pallas_path(scene, self.features, params)):
                self._pallas_sampler = make_pallas_path_sampler(
                    scene, params)
            from .pallas_intersect import (
                make_pallas_bruteforce_intersector,
                make_pallas_small_intersector)
            self._isect = make_pallas_small_intersector(scene)
            if self._isect is None:
                self._isect = make_pallas_bruteforce_intersector(
                    scene, kinds=self.features.kinds)

        meta, width, height = self.lights_meta, self.width, self.height
        features = self.features
        spp = max(1, params.spp_batch)
        # exact-RNG multi-spp megakernel: k full samples per pixel in ONE
        # launch with the per-pixel PCG32 streams chained in-kernel, so
        # the result equals k sequential exact samples (float-precision).
        # Removes the per-sample host->device enqueue (~1 ms here) from
        # the throughput path.
        self._pallas_ms = None
        if (spp > 1 and params.exact_rng and mode == "dense" and on_tpu):
            from .pallas_path import (make_pallas_path_sampler,
                                      supports_pallas_path)
            if supports_pallas_path(scene, self.features, params):
                self._pallas_ms = make_pallas_path_sampler(
                    scene, params, spp_inner=spp)
        if self._pallas_ms is not None:
            ms = self._pallas_ms
            jj, ii = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                                  jnp.arange(width, dtype=jnp.float32),
                                  indexing="ij")
            pi = ii.reshape(-1)
            pj = jj.reshape(-1)

            @jax.jit
            def step(flat, lights, bvh, state):
                img_sum, alb_sum, nrm_sum, hits_sum, rngs = ms(
                    pi, pj, state.rng)
                shape2 = (height, width)
                w = spp / (state.samples.astype(jnp.float32) + spp)
                img_avg = img_sum.reshape(shape2 + (4,)) / spp
                alb_avg = alb_sum.reshape(shape2 + (3,)) / spp
                nrm_avg = nrm_sum.reshape(shape2 + (3,)) / spp
                return TraceState(
                    image=state.image + (img_avg - state.image) * w,
                    albedo=state.albedo + (alb_avg - state.albedo) * w,
                    normal=state.normal + (nrm_avg - state.normal) * w,
                    hits=state.hits + hits_sum.reshape(shape2).astype(
                        jnp.int32),
                    rng=rngs, samples=state.samples + spp)

            self._step = step
            self.spp_batch = spp
            return
        if spp > 1 or not params.exact_rng:
            seq_hi, seq_lo = R.make_pixel_seqs(width * height)

            isect = self._isect

            @jax.jit
            def step(flat, lights, bvh, state):
                return _multi_sample(flat, lights, state, meta, params,
                                     width, height, spp, seq_hi, seq_lo,
                                     bvh=bvh, features=features,
                                     intersect_fn=isect)
        else:
            isect = self._isect
            psampler = self._pallas_sampler

            @jax.jit
            def step(flat, lights, bvh, state):
                return _one_sample(flat, lights, state, meta, params,
                                   width, height, bvh=bvh,
                                   features=features, intersect_fn=isect,
                                   sampler_fn=psampler)

        self._step = step
        self.spp_batch = spp

    def make_state(self) -> TraceState:
        return make_trace_state(self.scene_host, self.params)

    def sample(self, state: TraceState) -> TraceState:
        return self._step(self.flat, self.lights, self.bvh, state)

    def render(self, nsamples: Optional[int] = None,
               callback=None) -> TraceState:
        state = self.make_state()
        n = self.params.samples if nsamples is None else nsamples
        for s in range(n):
            state = self.sample(state)
            if callback is not None:
                callback(state, s)
        return state


def make_renderer(scene: SceneData, params: TraceParams,
                  wavefront: str = "auto", spp_batch: Optional[int] = None):
    """Auto-select the production renderer for a scene (the role of
    ycutrace vs ytrace dispatch in the reference, apps/ytrace.cpp:98-160):
    big scenes with path-family samplers go through the wavefront
    pipeline; small/megakernel-qualified scenes use the lockstep
    Renderer.  `wavefront` is "auto" | "on" | "off"."""
    import dataclasses

    from .params import SamplerType as _ST

    n_cands = sum(
        max(len(scene.shapes[i.shape].points),
            len(scene.shapes[i.shape].lines),
            len(scene.shapes[i.shape].triangles),
            len(scene.shapes[i.shape].quads))
        for i in scene.instances if 0 <= i.shape < len(scene.shapes))
    wf_auto = (params.sampler in (_ST.path, _ST.pathtest, _ST.pathmis,
                                  _ST.pathdirect)
               and n_cands > 4096)
    if wavefront == "on" or (wavefront == "auto" and wf_auto):
        from .wavefront import (WavefrontPathdirectRenderer,
                                WavefrontPathmisRenderer, WavefrontRenderer)
        spp = spp_batch or max(params.batch, params.spp_batch, 4)
        cls = {_ST.pathmis: WavefrontPathmisRenderer,
               _ST.pathdirect: WavefrontPathdirectRenderer}.get(
                   params.sampler, WavefrontRenderer)
        try:
            return cls(scene, dataclasses.replace(params, spp_batch=spp))
        except ValueError:
            pass  # unsupported feature combination -> lockstep fallback
    return Renderer(scene, params)


def trace_samples(renderer: Renderer, state: TraceState,
                  params: TraceParams) -> TraceState:
    """Advance the accumulator by params.batch samples."""
    for _ in range(max(1, params.batch)):
        if int(state.samples) >= params.samples:
            break
        state = renderer.sample(state)
    return state


def trace_image(scene: SceneData, params: TraceParams):
    """One-call render (yocto_trace.cpp:1584-1592 equivalent)."""
    renderer = Renderer(scene, params)
    state = renderer.render()
    return get_image(state)


def get_image(state: TraceState) -> np.ndarray:
    """Linear [H,W,4] float image."""
    return np.asarray(state.image)
