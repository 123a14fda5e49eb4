"""AOV-guided denoiser: must reduce error towards a converged render."""

import numpy as np

from yocto_tpu.models.examples import make_cornellbox
from yocto_tpu.trace.denoise import denoise_state
from yocto_tpu.trace.params import SamplerType, TraceParams
from yocto_tpu.trace.renderer import Renderer, get_image


def test_denoise_reduces_noise():
    scene = make_cornellbox()
    noisy_params = TraceParams(resolution=48, samples=2, bounces=4,
                               sampler=SamplerType.path)
    clean_params = TraceParams(resolution=48, samples=64, bounces=4,
                               sampler=SamplerType.path, spp_batch=8,
                               exact_rng=False)
    r = Renderer(scene, noisy_params)
    state = r.render()
    noisy = get_image(state)[..., :3]
    clean = get_image(Renderer(scene, clean_params).render())[..., :3]

    den = denoise_state(state)[..., :3]
    assert np.isfinite(den).all()
    # robust MSE: the top-1% error pixels are paths the 2-spp render never
    # sampled at all (bright light reflections) — no spatial filter can
    # invent them, so they are excluded from the improvement metric
    e_noisy = ((noisy - clean) ** 2).mean(-1)
    e_den = ((den - clean) ** 2).mean(-1)
    keep = e_noisy < np.quantile(e_noisy, 0.99)
    ratio = e_den[keep].mean() / e_noisy[keep].mean()
    assert ratio < 0.5, ratio
