"""AOV-guided denoiser (the reference's optional OIDN hook,
yocto_trace.cpp:1729-1872, rebuilt as a TPU-native edge-aware filter).

The reference ships Intel Open Image Denoise behind YOCTO_DENOISE
(default off in CI) and feeds it color + albedo + normal AOVs. Here the
same AOV-guided interface drives an a-trous wavelet filter (SVGF-style
without the temporal part): N dilated 5x5 B3-spline passes whose weights
combine color, albedo, and normal similarity. Everything is jnp
convolution/arithmetic — one jit, XLA-fused, runs on the chip the render
already lives on (no host round trip, no vendor library).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# 5-tap B3 spline, separable (host constants: used as python floats)
_B3 = np.asarray([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0


def _shift2(img, dy, dx):
    """Edge-clamped spatial shift."""
    h, w = img.shape[:2]
    ys = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
    xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
    return img[ys][:, xs]


def _atrous_pass(color, albedo, normal, lum_var, step,
                 sigma_color, sigma_albedo, sigma_normal):
    """One dilated 5x5 edge-aware pass."""
    acc = jnp.zeros_like(color)
    wsum = jnp.zeros(color.shape[:2] + (1,), jnp.float32)
    lum = color.mean(-1, keepdims=True)
    for iy in range(-2, 3):
        for ix in range(-2, 3):
            k = float(_B3[iy + 2] * _B3[ix + 2])
            dy, dx = iy * step, ix * step
            c2 = _shift2(color, dy, dx)
            a2 = _shift2(albedo, dy, dx)
            n2 = _shift2(normal, dy, dx)
            l2 = c2.mean(-1, keepdims=True)
            w_c = jnp.exp(-jnp.abs(lum - l2)
                          / (sigma_color * jnp.sqrt(lum_var) + 1e-3))
            w_a = jnp.exp(-jnp.sum(jnp.abs(albedo - a2), -1, keepdims=True)
                          / sigma_albedo)
            ndot = jnp.sum(normal * n2, -1, keepdims=True)
            w_n = jnp.maximum(ndot, 0.0) ** sigma_normal
            w = k * w_c * w_a * w_n
            acc = acc + c2 * w
            wsum = wsum + w
    return acc / jnp.maximum(wsum, 1e-8)


@functools.partial(jax.jit, static_argnames=("iterations", "sigma_color",
                                             "sigma_albedo",
                                             "sigma_normal"))
def denoise_image(image, albedo, normal, iterations: int = 5,
                  sigma_color: float = 16.0, sigma_albedo: float = 0.2,
                  sigma_normal: float = 64.0):
    """Denoise a linear [H,W,3|4] render guided by its AOVs.

    `albedo`/`normal` are the accumulated first-hit AOVs the renderer
    already produces (TraceState.albedo/.normal), matching the data the
    reference hands to OIDN."""
    rgb = image[..., :3]
    alpha = image[..., 3:] if image.shape[-1] > 3 else None
    nrm = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-6)
    # local luminance variance estimate drives the color sigma
    lum = rgb.mean(-1, keepdims=True)
    mean = lum
    meansq = lum * lum
    for d in (1, 2):
        for dy, dx in ((d, 0), (-d, 0), (0, d), (0, -d)):
            s = _shift2(lum, dy, dx)
            mean = mean + s
            meansq = meansq + s * s
    mean = mean / 9.0
    meansq = meansq / 9.0
    lum_var = jnp.maximum(meansq - mean * mean, 0.0)

    out = rgb
    for i in range(iterations):
        out = _atrous_pass(out, albedo, nrm, lum_var, 1 << i,
                           sigma_color, sigma_albedo, sigma_normal)
    if alpha is not None:
        out = jnp.concatenate([out, alpha], axis=-1)
    return out


def denoise_state(state):
    """Denoise a TraceState's running-mean image using its AOVs."""
    return np.asarray(denoise_image(state.image, state.albedo,
                                    state.normal))
