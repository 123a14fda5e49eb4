"""Progressive/interactive rendering machinery + checkpoint/resume.

The reference's interactive contract (SURVEY.md §3.4) is cancel ->
low-res preview -> progressive batches on a worker thread
(trace_context/trace_start/trace_cancel/trace_preview,
yocto_trace.h:202-226, yocto_trace.cpp:1622-1676). Here the worker is a
host thread launching device steps; cancellation granularity is one
sample batch (one jit dispatch), exactly the "dispatch granularity"
noted in SURVEY.md §2.3.

Checkpoint/resume follows the reference's design where the progressive
accumulator IS the checkpoint (trace_state is a pure value,
yocto_trace.h:147-157): `save_state`/`load_state` serialize the
TraceState pytree (image/AOVs/per-pixel RNG/sample counter) so a render
resumes exactly where it stopped — the `ytrace --savebatch` flow.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..models.scene import SceneData
from ..ops import rng as R
from .params import TraceParams
from .renderer import Renderer, TraceState, get_image


# ----------------------------------------------------------------------------
# checkpoint / resume (yocto_trace.h:147-157 "state is a value" design)
# ----------------------------------------------------------------------------

def save_state(path: str, state: TraceState) -> None:
    """Serialize the progressive accumulator (the checkpoint unit)."""
    np.savez_compressed(
        path,
        image=np.asarray(state.image),
        albedo=np.asarray(state.albedo),
        normal=np.asarray(state.normal),
        hits=np.asarray(state.hits),
        rng_hi=np.asarray(state.rng.state_hi),
        rng_lo=np.asarray(state.rng.state_lo),
        rng_inc_hi=np.asarray(state.rng.inc_hi),
        rng_inc_lo=np.asarray(state.rng.inc_lo),
        samples=np.asarray(state.samples))


def load_state(path: str) -> TraceState:
    import jax.numpy as jnp
    z = np.load(path)
    return TraceState(
        image=jnp.asarray(z["image"]),
        albedo=jnp.asarray(z["albedo"]),
        normal=jnp.asarray(z["normal"]),
        hits=jnp.asarray(z["hits"]),
        rng=R.RngState(jnp.asarray(z["rng_hi"]), jnp.asarray(z["rng_lo"]),
                       jnp.asarray(z["rng_inc_hi"]),
                       jnp.asarray(z["rng_inc_lo"])),
        samples=jnp.asarray(z["samples"]))


# ----------------------------------------------------------------------------
# preview (yocto_trace.cpp:1660-1676)
# ----------------------------------------------------------------------------

def trace_preview(scene: SceneData, params: TraceParams) -> np.ndarray:
    """One low-resolution sample, upscaled to full size by pixel
    replication — the reference's preview semantics (res/pratio, 1 spp,
    then nearest upsample)."""
    import dataclasses
    pparams = dataclasses.replace(
        params, resolution=max(params.resolution // max(params.pratio, 1),
                               8), samples=1)
    r = Renderer(scene, pparams)
    state = r.render(nsamples=1)
    small = get_image(state)
    from .renderer import render_size
    width, height = render_size(scene, params)
    sh, sw = small.shape[:2]
    yy = np.clip((np.arange(height) * sh) // max(height, 1), 0, sh - 1)
    xx = np.clip((np.arange(width) * sw) // max(width, 1), 0, sw - 1)
    return small[yy][:, xx]


# ----------------------------------------------------------------------------
# async render context (yocto_trace.h:202-206, yocto_trace.cpp:1622-1658)
# ----------------------------------------------------------------------------

@dataclass
class TraceContext:
    """Background progressive render with cooperative cancellation."""

    renderer: Renderer
    state: TraceState = None
    done: bool = False
    stop: bool = False
    _thread: Optional[threading.Thread] = None
    _lock: threading.Lock = field(default_factory=threading.Lock)


def make_trace_context(scene: SceneData, params: TraceParams) -> TraceContext:
    return TraceContext(renderer=Renderer(scene, params))


def trace_start(context: TraceContext, state: Optional[TraceState] = None):
    """Launch/resume progressive sampling on a worker thread; returns
    immediately. Each loop iteration advances one sample batch and checks
    the stop flag (cancellation granularity = one device step)."""
    trace_cancel(context)
    context.stop = False
    context.done = False
    if state is None:
        state = context.state if context.state is not None \
            else context.renderer.make_state()
    context.state = state

    def worker():
        r = context.renderer
        while (not context.stop
               and int(context.state.samples) < r.params.samples):
            for _ in range(max(1, r.params.batch)):
                if context.stop:
                    break
                new_state = r.sample(context.state)
                new_state.image.block_until_ready()
                with context._lock:
                    context.state = new_state
        context.done = True

    context._thread = threading.Thread(target=worker, daemon=True)
    context._thread.start()


def trace_cancel(context: TraceContext) -> None:
    """Cooperative cancel + join (yocto_trace.cpp:1652-1655)."""
    context.stop = True
    if context._thread is not None and context._thread.is_alive():
        context._thread.join()
    context._thread = None
    context.stop = False


def trace_done(context: TraceContext) -> bool:
    return context.done


def get_current_image(context: TraceContext) -> np.ndarray:
    with context._lock:
        state = context.state
    return get_image(state)
