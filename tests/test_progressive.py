"""Progressive API: checkpoint/resume exactness, preview, async context."""

import os
import time

import numpy as np

from yocto_tpu.models.examples import make_cornellbox
from yocto_tpu.trace.params import SamplerType, TraceParams
from yocto_tpu.trace.progressive import (get_current_image, load_state,
                                         make_trace_context, save_state,
                                         trace_cancel, trace_done,
                                         trace_preview, trace_start)
from yocto_tpu.trace.renderer import Renderer, get_image


def test_checkpoint_resume_exact(tmp_path):
    """Resuming from a saved state must be bit-identical to an unbroken
    render (the accumulator IS the checkpoint, yocto_trace.h:147-157)."""
    scene = make_cornellbox()
    params = TraceParams(resolution=32, samples=6, bounces=3,
                         sampler=SamplerType.path)
    r = Renderer(scene, params)
    full = r.render()

    state = r.make_state()
    for _ in range(3):
        state = r.sample(state)
    p = str(tmp_path / "ckpt.npz")
    save_state(p, state)
    resumed = load_state(p)
    assert int(resumed.samples) == 3
    for _ in range(3):
        resumed = r.sample(resumed)
    np.testing.assert_array_equal(np.asarray(full.image),
                                  np.asarray(resumed.image))


def test_preview_shape_and_content():
    scene = make_cornellbox()
    params = TraceParams(resolution=64, samples=8, bounces=2,
                         sampler=SamplerType.eyelight, pratio=4)
    img = trace_preview(scene, params)
    assert img.shape == (64, 64, 4)
    assert np.isfinite(img).all() and img[..., :3].max() > 0


def test_async_context_progressive_and_cancel():
    scene = make_cornellbox()
    params = TraceParams(resolution=24, samples=4, bounces=2,
                         sampler=SamplerType.eyelight)
    ctx = make_trace_context(scene, params)
    trace_start(ctx)
    deadline = time.time() + 300
    while not trace_done(ctx) and time.time() < deadline:
        time.sleep(0.2)
    assert trace_done(ctx)
    assert int(ctx.state.samples) == 4
    img = get_current_image(ctx)
    assert np.isfinite(img).all()

    # restart-from-scratch after a parameter-edit style cancel
    trace_cancel(ctx)
    ctx.state = None
    trace_start(ctx)
    trace_cancel(ctx)  # cancel mid-flight must leave a consistent state
    assert int(ctx.state.samples) <= 4
