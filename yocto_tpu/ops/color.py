"""Batched color conversion / tonemap / grading kernels.

TPU-native equivalents of the reference color library (yocto_color.h in
xelatihy/yocto-gl). Colors are jnp arrays with a trailing 3/4 component
axis; every function broadcasts over leading axes so whole images are one
call. The ``colorgrade_params`` dataclass keeps the reference's field names
and defaults (yocto_color.h:140-156).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np


def xyz(a):
    """RGB part of an RGBA array."""
    return a[..., :3]


def float_to_byte(a):
    return jnp.clip((a * 256.0).astype(jnp.int32), 0, 255).astype(jnp.uint8)


def byte_to_float(a):
    return a.astype(jnp.float32) / 255.0


def luminance(a):
    return (0.2126 * a[..., 0] + 0.7152 * a[..., 1] + 0.0722 * a[..., 2])


def srgb_to_rgb(srgb):
    """sRGB decode; alpha channel (if present) passes through."""
    rgb = jnp.where(srgb <= 0.04045, srgb / 12.92,
                    jnp.power(jnp.maximum((srgb + 0.055) / 1.055, 0.0), 2.4))
    if srgb.shape[-1] == 4:
        return jnp.concatenate([rgb[..., :3], srgb[..., 3:]], axis=-1)
    return rgb


def rgb_to_srgb(rgb):
    srgb = jnp.where(rgb <= 0.0031308, 12.92 * rgb,
                     1.055 * jnp.power(jnp.maximum(rgb, 0.0), 1 / 2.4) - 0.055)
    if rgb.shape[-1] == 4:
        return jnp.concatenate([srgb[..., :3], rgb[..., 3:]], axis=-1)
    return srgb


def lincontrast(rgb, contrast, grey):
    return jnp.maximum(0.0, grey + (rgb - grey) * (contrast * 2.0))


def logcontrast(rgb, contrast, grey):
    eps = 0.0001
    log_grey = jnp.log2(grey)
    log_ldr = jnp.log2(rgb + eps)
    adjusted = log_grey + (log_ldr - log_grey) * (contrast * 2.0)
    return jnp.maximum(0.0, jnp.exp2(adjusted) - eps)


def _bias(a, b):
    return a / ((1.0 / b - 2.0) * (1.0 - a) + 1.0)


def gain(a, g):
    return jnp.where(a < 0.5, _bias(a * 2.0, g) / 2.0,
                     _bias(a * 2.0 - 1.0, 1.0 - g) / 2.0 + 0.5)


def contrast(rgb, c):
    return gain(rgb, 1.0 - c)


def saturate(rgb, saturation, weights=(1 / 3, 1 / 3, 1 / 3)):
    w = jnp.asarray(weights, jnp.float32)
    grey = jnp.sum(w * rgb, axis=-1, keepdims=True)
    return jnp.maximum(0.0, grey + (rgb - grey) * (saturation * 2.0))


def tonemap_filmic(hdr, accurate_fit=False):
    if not accurate_fit:
        h = hdr * 0.6  # ACES range
        ldr = (h * h * 2.51 + h * 0.03) / (h * h * 2.43 + h * 0.59 + 0.14)
        return jnp.maximum(0.0, ldr)
    ACES_IN = np.array([[0.59719, 0.35458, 0.04823],
                        [0.07600, 0.90834, 0.01566],
                        [0.02840, 0.13383, 0.83777]], np.float32)
    ACES_OUT = np.array([[1.60475, -0.53108, -0.07367],
                         [-0.10208, 1.10813, -0.00605],
                         [-0.00327, -0.07276, 1.07602]], np.float32)
    v = jnp.einsum("ij,...j->...i", ACES_IN, hdr)
    v = (v * v + v * 0.0245786 - 0.000090537) / (
        v * v * 0.983729 + v * 0.4329510 + 0.238081)
    return jnp.maximum(0.0, jnp.einsum("ij,...j->...i", ACES_OUT, v))


def tonemap(hdr, exposure, filmic=False, srgb=True):
    rgb = xyz(hdr) if hdr.shape[-1] == 4 else hdr
    rgb = rgb * jnp.exp2(jnp.asarray(exposure, jnp.float32))
    if filmic:
        rgb = tonemap_filmic(rgb)
    if srgb:
        rgb = rgb_to_srgb(rgb)
    if hdr.shape[-1] == 4:
        return jnp.concatenate([rgb, hdr[..., 3:]], axis=-1)
    return rgb


def composite(a, b):
    """Alpha-over composite (yocto_color.h:369-374)."""
    aw = a[..., 3:4]
    bw = b[..., 3:4]
    ca = aw + bw * (1.0 - aw)
    cc = xyz(a) * aw + xyz(b) * bw * (1.0 - aw)
    safe = jnp.where(ca == 0.0, 1.0, ca)
    out = jnp.concatenate([cc / safe, ca], axis=-1)
    return jnp.where(ca == 0.0, jnp.zeros_like(out), out)


_RGB_TO_XYZ = np.array([[0.4124, 0.3576, 0.1805],
                        [0.2126, 0.7152, 0.0722],
                        [0.0193, 0.1192, 0.9504]], np.float32)
_XYZ_TO_RGB = np.array([[+3.2406, -1.5372, -0.4986],
                        [-0.9689, +1.8758, +0.0415],
                        [+0.0557, -0.2040, +1.0570]], np.float32)


def rgb_to_xyz(rgb):
    return jnp.einsum("ij,...j->...i", _RGB_TO_XYZ, rgb)


def xyz_to_rgb(v):
    return jnp.einsum("ij,...j->...i", _XYZ_TO_RGB, v)


def xyz_to_xyY(v):
    s = jnp.sum(v, axis=-1, keepdims=True)
    safe = jnp.where(s == 0.0, 1.0, s)
    out = jnp.stack([v[..., 0], v[..., 1], v[..., 1]], axis=-1)
    out = out.at[..., 0].set(v[..., 0] / safe[..., 0])
    out = out.at[..., 1].set(v[..., 1] / safe[..., 0])
    return jnp.where(s == 0.0, jnp.zeros_like(out), out)


def xyY_to_xyz(v):
    y = v[..., 1]
    safe = jnp.where(y == 0.0, 1.0, y)
    out = jnp.stack([v[..., 0] * v[..., 2] / safe, v[..., 2],
                     (1.0 - v[..., 0] - v[..., 1]) * v[..., 2] / safe],
                    axis=-1)
    return jnp.where((y == 0.0)[..., None], jnp.zeros_like(out), out)


def hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h6 = jnp.mod(h, 1.0) * 6.0
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q)
    grey = s == 0.0
    return jnp.stack([jnp.where(grey, v, r), jnp.where(grey, v, g),
                      jnp.where(grey, v, b)], axis=-1)


def rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    swap1 = g < b
    g1 = jnp.where(swap1, b, g)
    b1 = jnp.where(swap1, g, b)
    k = jnp.where(swap1, -1.0, 0.0)
    swap2 = r < g1
    r2 = jnp.where(swap2, g1, r)
    g2 = jnp.where(swap2, r, g1)
    k = jnp.where(swap2, -2.0 / 6.0 - k, k)
    chroma = r2 - jnp.minimum(g2, b1)
    return jnp.stack([
        jnp.abs(k + (g2 - b1) / (6.0 * chroma + 1e-20)),
        chroma / (r2 + 1e-20), r2], axis=-1)


def blackbody_to_rgb(temperature):
    """Planckian locus approximation (yocto_color.h:448-474)."""
    temperature = jnp.asarray(temperature, jnp.float32)
    t = jnp.clip(temperature, 1667.0, 25000.0) / 1000.0
    x = jnp.where(
        temperature < 4000.0,
        -0.2661239 / (t * t * t) - 0.2343589 / (t * t) + 0.8776956 / t
        + 0.179910,
        -3.0258469 / (t * t * t) + 2.1070379 / (t * t) + 0.2226347 / t
        + 0.240390)
    y = jnp.where(
        temperature < 2222.0,
        -1.1063814 * x**3 - 1.34811020 * x**2 + 2.18555832 * x - 0.20219683,
        jnp.where(
            temperature < 4000.0,
            -0.9549476 * x**3 - 1.37418593 * x**2 + 2.09137015 * x
            - 0.16748867,
            +3.0817580 * x**3 - 5.87338670 * x**2 + 3.75112997 * x
            - 0.37001483))
    return xyz_to_rgb(xyY_to_xyz(jnp.stack([x, y, jnp.ones_like(x)], -1)))


# Polynomial colormap fits (public-domain shadertoy fits, as used by the
# reference yocto_color.h:476-556).
_COLORMAPS = {
    "viridis": np.array([
        [0.2777273272234177, 0.005407344544966578, 0.3340998053353061],
        [0.1050930431085774, 1.404613529898575, 1.384590162594685],
        [-0.3308618287255563, 0.214847559468213, 0.09509516302823659],
        [-4.634230498983486, -5.799100973351585, -19.33244095627987],
        [6.228269936347081, 14.17993336680509, 56.69055260068105],
        [4.776384997670288, -13.74514537774601, -65.35303263337234],
        [-5.435455855934631, 4.645852612178535, 26.3124352495832]],
        np.float32),
    "plasma": np.array([
        [0.05873234392399702, 0.02333670892565664, 0.5433401826748754],
        [2.176514634195958, 0.2383834171260182, 0.7539604599784036],
        [-2.689460476458034, -7.455851135738909, 3.110799939717086],
        [6.130348345893603, 42.3461881477227, -28.51885465332158],
        [-11.10743619062271, -82.66631109428045, 60.13984767418263],
        [10.02306557647065, 71.41361770095349, -54.07218655560067],
        [-3.658713842777788, -22.93153465461149, 18.19190778539828]],
        np.float32),
    "magma": np.array([
        [-0.002136485053939582, -0.000749655052795221, -0.005386127855323933],
        [0.2516605407371642, 0.6775232436837668, 2.494026599312351],
        [8.353717279216625, -3.577719514958484, 0.3144679030132573],
        [-27.66873308576866, 14.26473078096533, -13.64921318813922],
        [52.17613981234068, -27.94360607168351, 12.94416944238394],
        [-50.76852536473588, 29.04658282127291, 4.23415299384598],
        [18.65570506591883, -11.48977351997711, -5.601961508734096]],
        np.float32),
    "inferno": np.array([
        [0.0002189403691192265, 0.001651004631001012, -0.01948089843709184],
        [0.1065134194856116, 0.5639564367884091, 3.932712388889277],
        [11.60249308247187, -3.972853965665698, -15.9423941062914],
        [-41.70399613139459, 17.43639888205313, 44.35414519872813],
        [77.162935699427, -33.40235894210092, -81.80730925738993],
        [-71.31942824499214, 32.62606426397723, 73.20951985803202],
        [25.13112622477341, -12.24266895238567, -23.07032500287172]],
        np.float32),
}


def colormap(t, kind="viridis"):
    c = _COLORMAPS[kind]
    t = jnp.clip(jnp.asarray(t, jnp.float32), 0.0, 1.0)[..., None]
    out = jnp.broadcast_to(c[6], t.shape[:-1] + (3,))
    for k in range(5, -1, -1):
        out = c[k] + t * out
    return out


@dataclass
class ColorgradeParams:
    """Color grading controls (yocto_color.h:140-156 field-compatible)."""

    exposure: float = 0.0
    tint: tuple = (1.0, 1.0, 1.0)
    lincontrast: float = 0.5
    logcontrast: float = 0.5
    linsaturation: float = 0.5
    filmic: bool = False
    srgb: bool = True
    contrast: float = 0.5
    saturation: float = 0.5
    shadows: float = 0.5
    midtones: float = 0.5
    highlights: float = 0.5
    shadows_color: tuple = (1.0, 1.0, 1.0)
    midtones_color: tuple = (1.0, 1.0, 1.0)
    highlights_color: tuple = (1.0, 1.0, 1.0)


def colorgrade(color, linear, params: ColorgradeParams):
    """Full grading chain (yocto_color.h:571-603)."""
    has_alpha = color.shape[-1] == 4
    rgb = color[..., :3]
    if params.exposure != 0:
        rgb = rgb * float(np.exp2(params.exposure))
    if tuple(params.tint) != (1.0, 1.0, 1.0):
        rgb = rgb * jnp.asarray(params.tint, jnp.float32)
    if params.lincontrast != 0.5:
        rgb = lincontrast(rgb, params.lincontrast, 0.18 if linear else 0.5)
    if params.logcontrast != 0.5:
        rgb = logcontrast(rgb, params.logcontrast, 0.18 if linear else 0.5)
    if params.linsaturation != 0.5:
        rgb = saturate(rgb, params.linsaturation)
    if params.filmic:
        rgb = tonemap_filmic(rgb)
    if linear and params.srgb:
        rgb = rgb_to_srgb(rgb)
    if params.contrast != 0.5:
        rgb = contrast(rgb, params.contrast)
    if params.saturation != 0.5:
        rgb = saturate(rgb, params.saturation)
    if (params.shadows != 0.5 or params.midtones != 0.5
            or params.highlights != 0.5
            or tuple(params.shadows_color) != (1.0, 1.0, 1.0)
            or tuple(params.midtones_color) != (1.0, 1.0, 1.0)
            or tuple(params.highlights_color) != (1.0, 1.0, 1.0)):
        lift = np.asarray(params.shadows_color, np.float32)
        gamma = np.asarray(params.midtones_color, np.float32)
        gn = np.asarray(params.highlights_color, np.float32)
        lift = lift - lift.mean() + params.shadows - 0.5
        gn = gn - gn.mean() + params.highlights + 0.5
        grey = gamma - gamma.mean() + params.midtones
        gamma = np.log((0.5 - lift) / (gn - lift)) / np.log(grey)
        lerp_value = jnp.clip(
            jnp.power(jnp.maximum(rgb, 0.0), 1.0 / gamma), 0.0, 1.0)
        rgb = gn * lerp_value + lift * (1.0 - lerp_value)
    if has_alpha:
        return jnp.concatenate([rgb, color[..., 3:]], axis=-1)
    return rgb


def colorgrade_params_vector(params: ColorgradeParams) -> np.ndarray:
    """Pack the numeric grading controls into one f32[21] vector for the
    traced chain (interactive editors re-grade per edit without
    retracing; filmic/srgb stay static booleans)."""
    return np.asarray(
        [params.exposure, *params.tint, params.lincontrast,
         params.logcontrast, params.linsaturation, params.contrast,
         params.saturation, params.shadows, params.midtones,
         params.highlights, *params.shadows_color, *params.midtones_color,
         *params.highlights_color], np.float32)


def colorgrade_dynamic(color, linear, vec, filmic=False, srgb=True):
    """`colorgrade` with every numeric control as traced DATA
    (vec = colorgrade_params_vector(params)). Applies every step
    unconditionally — each step is the identity at its default value —
    so ONE compile serves every slider position (the interactive
    editors\' path; yocto_color.h:571-603 semantics)."""
    has_alpha = color.shape[-1] == 4
    rgb = color[..., :3]
    rgb = rgb * jnp.exp2(vec[0])
    rgb = rgb * vec[1:4]
    rgb = lincontrast(rgb, vec[4], 0.18 if linear else 0.5)
    rgb = logcontrast(rgb, vec[5], 0.18 if linear else 0.5)
    rgb = saturate(rgb, vec[6])
    if filmic:
        rgb = tonemap_filmic(rgb)
    if linear and srgb:
        rgb = rgb_to_srgb(rgb)
    rgb = contrast(rgb, vec[7])
    rgb = saturate(rgb, vec[8])
    # shadows/midtones/highlights lift-gamma-gain (yocto_color.h:594-603)
    lift = vec[12:15] - vec[12:15].mean() + vec[9] - 0.5
    gn = vec[18:21] - vec[18:21].mean() + vec[11] + 0.5
    grey = vec[15:18] - vec[15:18].mean() + vec[10]
    span = jnp.where(gn - lift == 0.0, 1.0, gn - lift)
    gamma = (jnp.log(jnp.maximum((0.5 - lift) / span, 1e-12))
             / jnp.log(jnp.maximum(grey, 1e-12)))
    lerp_value = jnp.clip(
        jnp.power(jnp.maximum(rgb, 0.0), 1.0 / gamma), 0.0, 1.0)
    rgb = gn * lerp_value + lift * (1.0 - lerp_value)
    if has_alpha:
        return jnp.concatenate([rgb, color[..., 3:]], axis=-1)
    return rgb
