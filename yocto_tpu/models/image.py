"""Image model + processing + procedural generation.

Equivalent of the reference image layer (yocto_image.h/.cpp): `ImageData`
(linear flag + [H,W,4] float pixels), eval/tonemap/resize/diff/composite/
colorgrade, the procedural generators (grid/checker/bumps/ramps/uvgrid/
noise maps/blackbody), bump-to-normal, add_border, and the Perez-model
analytic sun-sky (yocto_image.cpp:655-790). Pixel math runs as batched jnp
on device (the reference's `_mt` threaded variants map to jit).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import color as C
from ..ops import noise as N
from ..ops.mathops import pif


@dataclass
class ImageData:
    width: int = 0
    height: int = 0
    linear: bool = False
    pixels: np.ndarray = field(
        default_factory=lambda: np.zeros((0, 0, 4), np.float32))


def make_image(width: int, height: int, linear: bool) -> ImageData:
    return ImageData(width=width, height=height, linear=linear,
                     pixels=np.zeros((height, width, 4), np.float32))


def image_uv_grid(width: int, height: int):
    """uv = pixel * (1/max(w,h)) grid, as the reference proc images use."""
    scale = 1.0 / max(width, height)
    j, i = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                        jnp.arange(width, dtype=jnp.float32), indexing="ij")
    return jnp.stack([i * scale, j * scale], axis=-1)


def _fract(x):
    return x - jnp.floor(x) if False else x - jnp.trunc(x)


# ----------------------------------------------------------------------------
# Image operations (yocto_image.h:99-149)
# ----------------------------------------------------------------------------

def eval_image(image: ImageData, uv, as_linear: bool = False,
               no_interpolation: bool = False, clamp_to_edge: bool = False):
    """Bilinear/tiled lookup matching eval_texture semantics."""
    px = jnp.asarray(image.pixels)
    h, w = px.shape[:2]
    s = uv[..., 0]
    t = uv[..., 1]
    if clamp_to_edge:
        s = jnp.clip(s, 0.0, 1.0) * w
        t = jnp.clip(t, 0.0, 1.0) * h
    else:
        s = jnp.mod(s, 1.0) * w
        s = jnp.where(s < 0, s + w, s)
        t = jnp.mod(t, 1.0) * h
        t = jnp.where(t < 0, t + h, t)
    i = jnp.clip(s.astype(jnp.int32), 0, w - 1)
    j = jnp.clip(t.astype(jnp.int32), 0, h - 1)
    ii = (i + 1) % w
    jj = (j + 1) % h
    u = s - i
    v = t - j

    def fetch(ci, cj):
        texel = px[cj, ci]
        if as_linear and not image.linear:
            texel = C.srgb_to_rgb(texel)
        return texel

    if no_interpolation:
        return fetch(i, j)
    return (fetch(i, j) * ((1 - u) * (1 - v))[..., None]
            + fetch(i, jj) * ((1 - u) * v)[..., None]
            + fetch(ii, j) * (u * (1 - v))[..., None]
            + fetch(ii, jj) * (u * v)[..., None])


def tonemap_image(image: ImageData, exposure: float, filmic: bool = False
                  ) -> ImageData:
    if not image.linear:
        return ImageData(image.width, image.height, False,
                         np.asarray(image.pixels))
    out = C.tonemap(jnp.asarray(image.pixels), exposure, filmic, srgb=True)
    return ImageData(image.width, image.height, False, np.asarray(out))


def colorgrade_image(image: ImageData, params: C.ColorgradeParams
                     ) -> ImageData:
    out = C.colorgrade(jnp.asarray(image.pixels), image.linear, params)
    return ImageData(image.width, image.height, False, np.asarray(out))


def resize_image(image: ImageData, width: int = 0, height: int = 0
                 ) -> ImageData:
    """Resize preserving aspect when one dim is 0 (yocto_image.cpp:247)."""
    if width == 0 and height == 0:
        raise ValueError("bad image size")
    if height == 0:
        height = int(round(width * image.height / image.width))
    elif width == 0:
        width = int(round(height * image.width / image.height))
    out = jax.image.resize(jnp.asarray(image.pixels), (height, width, 4),
                           method="cubic")
    return ImageData(width, height, image.linear, np.asarray(out))


def image_difference(a: ImageData, b: ImageData, display: bool) -> ImageData:
    if a.width != b.width or a.height != b.height:
        raise ValueError("image sizes are different")
    if a.linear != b.linear:
        raise ValueError("image types are different")
    diff = np.abs(np.asarray(a.pixels) - np.asarray(b.pixels))
    if display:
        d = diff.max(axis=2)
        px = np.stack([d, d, d, np.ones_like(d)], axis=2)
        return ImageData(a.width, a.height, a.linear, px.astype(np.float32))
    return ImageData(a.width, a.height, a.linear, diff.astype(np.float32))


def composite_image(a: ImageData, b: ImageData) -> ImageData:
    out = C.composite(jnp.asarray(a.pixels), jnp.asarray(b.pixels))
    return ImageData(a.width, a.height, a.linear, np.asarray(out))


def bump_to_normal(image: ImageData, scale: float = 1.0) -> ImageData:
    """Central-difference bump -> tangent normal map
    (yocto_image.cpp bump_to_normal semantics)."""
    px = jnp.asarray(image.pixels)
    h, w = px.shape[:2]
    dx = 1.0 / w
    dy = 1.0 / h
    p = px[..., :3].mean(-1)
    p10 = jnp.roll(p, -1, axis=1)
    p01 = jnp.roll(p, -1, axis=0)
    g = jnp.stack([(p - p10) / dx * scale, (p - p01) / dy * scale,
                   jnp.ones_like(p)], axis=-1)
    n = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
    n = n * jnp.asarray([0.5, -0.5, 0.5]) + jnp.asarray([0.5, 0.5, 0.5])
    out = jnp.concatenate([n, jnp.ones_like(n[..., :1])], axis=-1)
    return ImageData(image.width, image.height, image.linear,
                     np.asarray(out))


def add_border(image: ImageData, width: float = 0.001,
               color=(0, 0, 0, 1)) -> ImageData:
    px = np.asarray(image.pixels).copy()
    h, w = px.shape[:2]
    scale = 1.0 / max(w, h)
    i = np.arange(w) * scale
    j = np.arange(h) * scale
    mask = ((i[None, :] < width) | (j[:, None] < width)
            | (i[None, :] > w * scale - width)
            | (j[:, None] > h * scale - width))
    px[mask] = np.asarray(color, np.float32)
    return ImageData(image.width, image.height, image.linear, px)


# ----------------------------------------------------------------------------
# Procedural images (yocto_image.cpp:455-650)
# ----------------------------------------------------------------------------

def _proc(width, height, linear, fn) -> ImageData:
    uv = image_uv_grid(width, height)
    px = fn(uv)
    return ImageData(width, height, linear, np.asarray(px, np.float32))


def _c4(c):
    return jnp.asarray(c, jnp.float32)


def make_grid(width=1024, height=1024, scale=1.0,
              color0=(0.2, 0.2, 0.2, 1), color1=(0.5, 0.5, 0.5, 1)):
    def fn(uv):
        uv = _fract(uv * 4 * scale)
        thick = 0.01 / 2
        c = ((uv[..., 0] <= thick) | (uv[..., 0] >= 1 - thick)
             | (uv[..., 1] <= thick) | (uv[..., 1] >= 1 - thick)
             | ((uv[..., 0] >= 0.5 - thick) & (uv[..., 0] <= 0.5 + thick))
             | ((uv[..., 1] >= 0.5 - thick) & (uv[..., 1] <= 0.5 + thick)))
        return jnp.where(c[..., None], _c4(color0), _c4(color1))
    return _proc(width, height, True, fn)


def make_checker(width=1024, height=1024, scale=1.0,
                 color0=(0.2, 0.2, 0.2, 1), color1=(0.5, 0.5, 0.5, 1)):
    def fn(uv):
        uv = _fract(uv * 4 * scale)
        c = (uv[..., 0] <= 0.5) != (uv[..., 1] <= 0.5)
        return jnp.where(c[..., None], _c4(color0), _c4(color1))
    return _proc(width, height, True, fn)


def make_bumps(width=1024, height=1024, scale=1.0,
               color0=(0, 0, 0, 1), color1=(1, 1, 1, 1)):
    def fn(uv):
        uv = _fract(uv * 4 * scale)
        thick = 0.125
        cx = jnp.where(uv[..., 0] <= 0.5, 0.25, 0.75)
        cy = jnp.where(uv[..., 1] <= 0.5, 0.25, 0.75)
        dist = jnp.clip(jnp.sqrt((uv[..., 0] - cx) ** 2
                                 + (uv[..., 1] - cy) ** 2), 0, thick) / thick
        checker = (uv[..., 0] <= 0.5) != (uv[..., 1] <= 0.5)
        val = jnp.where(checker, (1 + jnp.sqrt(1 - dist)) / 2,
                        (dist * dist) / 2)
        return _c4(color0) * (1 - val[..., None]) + _c4(color1) \
            * val[..., None]
    return _proc(width, height, True, fn)


def make_ramp(width=1024, height=1024, scale=1.0,
              color0=(0, 0, 0, 1), color1=(1, 1, 1, 1)):
    def fn(uv):
        uv = _fract(uv * scale)
        u = uv[..., 0:1]
        return _c4(color0) * (1 - u) + _c4(color1) * u
    return _proc(width, height, True, fn)


def make_gammaramp(width=1024, height=1024, scale=1.0,
                   color0=(0, 0, 0, 1), color1=(1, 1, 1, 1)):
    def fn(uv):
        uv = _fract(uv * scale)
        u = uv[..., 0]
        v = uv[..., 1]
        t = jnp.where(v < 1 / 3, jnp.power(u, 2.2),
                      jnp.where(v < 2 / 3, u, jnp.power(u, 1 / 2.2)))
        return _c4(color0) * (1 - t[..., None]) + _c4(color1) * t[..., None]
    return _proc(width, height, False, fn)


def make_uvramp(width=1024, height=1024, scale=1.0):
    def fn(uv):
        uv = _fract(uv * scale)
        return jnp.stack([uv[..., 0], uv[..., 1],
                          jnp.zeros_like(uv[..., 0]),
                          jnp.ones_like(uv[..., 0])], axis=-1)
    return _proc(width, height, True, fn)


def make_uvgrid(width=1024, height=1024, scale=1.0, colored=True):
    def fn(uv):
        uv = _fract(uv * scale)
        v_ = 1 - uv[..., 1]
        u_ = uv[..., 0]
        hue = (jnp.clip((u_ * 8).astype(jnp.int32), 0, 7)
               + (jnp.clip((v_ * 8).astype(jnp.int32), 0, 7) + 5) % 8 * 8
               ) / 64.0
        vuv = _fract(jnp.stack([u_, v_], -1) * 4)
        vc = (vuv[..., 0] <= 0.5) != (vuv[..., 1] <= 0.5)
        value = jnp.where(vc, 0.5 - 0.05, 0.5 + 0.05)
        suv = _fract(jnp.stack([u_, v_], -1) * 16)
        st = 0.01 / 2
        sc = ((suv[..., 0] <= st) | (suv[..., 0] >= 1 - st)
              | (suv[..., 1] <= st) | (suv[..., 1] >= 1 - st))
        sat = jnp.where(sc, 0.2, 0.8)
        value = jnp.where(sc, 0.8, value)
        hsv = jnp.stack([hue, sat, value], axis=-1)
        rgb = C.hsv_to_rgb(hsv) if colored else jnp.stack(
            [value, value, value], -1)
        return jnp.concatenate([rgb, jnp.ones_like(rgb[..., :1])], -1)
    return _proc(width, height, True, fn)


def make_blackbodyramp(width=1024, height=1024, scale=1.0,
                       from_=1000.0, to=12000.0):
    def fn(uv):
        uv = _fract(uv * scale)
        rgb = C.blackbody_to_rgb(from_ + (to - from_) * uv[..., 0])
        return jnp.concatenate([rgb, jnp.ones_like(rgb[..., :1])], -1)
    return _proc(width, height, True, fn)


def make_colormapramp(width=1024, height=1024, scale=1.0):
    def fn(uv):
        uv = _fract(uv * scale)
        u = uv[..., 0]
        v = uv[..., 1]
        rgb = jnp.where((v < 0.25)[..., None], C.colormap(u, "viridis"),
                        jnp.where((v < 0.5)[..., None],
                                  C.colormap(u, "plasma"),
                                  jnp.where((v < 0.75)[..., None],
                                            C.colormap(u, "magma"),
                                            C.colormap(u, "inferno"))))
        return jnp.concatenate([rgb, jnp.ones_like(rgb[..., :1])], -1)
    return _proc(width, height, False, fn)


def make_noisemap(width=1024, height=1024, scale=1.0,
                  color0=(0, 0, 0, 1), color1=(1, 1, 1, 1)):
    def fn(uv):
        uv = uv * 8 * scale
        p = jnp.stack([uv[..., 0], uv[..., 1], jnp.zeros_like(uv[..., 0])],
                      -1)
        v = jnp.clip(N.perlin_noise(p), 0.0, 1.0)[..., None]
        return _c4(color0) * (1 - v) + _c4(color1) * v
    return _proc(width, height, True, fn)


def make_fbmmap(width=1024, height=1024, scale=1.0,
                noise=(2.0, 0.5, 8, 1), color0=(0, 0, 0, 1),
                color1=(1, 1, 1, 1)):
    def fn(uv):
        uv = uv * 8 * scale
        p = jnp.stack([uv[..., 0], uv[..., 1], jnp.zeros_like(uv[..., 0])],
                      -1)
        v = jnp.clip(N.perlin_fbm(p, noise[0], noise[1], int(noise[2])),
                     0.0, 1.0)[..., None]
        return _c4(color0) * (1 - v) + _c4(color1) * v
    return _proc(width, height, True, fn)


def make_turbulencemap(width=1024, height=1024, scale=1.0,
                       noise=(2.0, 0.5, 8, 1), color0=(0, 0, 0, 1),
                       color1=(1, 1, 1, 1)):
    def fn(uv):
        uv = uv * 8 * scale
        p = jnp.stack([uv[..., 0], uv[..., 1], jnp.zeros_like(uv[..., 0])],
                      -1)
        v = jnp.clip(
            N.perlin_turbulence(p, noise[0], noise[1], int(noise[2])),
            0.0, 1.0)[..., None]
        return _c4(color0) * (1 - v) + _c4(color1) * v
    return _proc(width, height, True, fn)


def make_ridgemap(width=1024, height=1024, scale=1.0,
                  noise=(2.0, 0.5, 8, 1), color0=(0, 0, 0, 1),
                  color1=(1, 1, 1, 1)):
    def fn(uv):
        uv = uv * 8 * scale
        p = jnp.stack([uv[..., 0], uv[..., 1], jnp.zeros_like(uv[..., 0])],
                      -1)
        v = jnp.clip(
            N.perlin_ridge(p, noise[0], noise[1], int(noise[2]), noise[3]),
            0.0, 1.0)[..., None]
        return _c4(color0) * (1 - v) + _c4(color1) * v
    return _proc(width, height, True, fn)


# ----------------------------------------------------------------------------
# Analytic sun-sky (Perez model; yocto_image.cpp:655-790)
# ----------------------------------------------------------------------------

def make_sunsky(width=1024, height=512, theta_sun=np.pi / 4, turbidity=3.0,
                has_sun=False, sun_intensity=1.0, sun_radius=1.0,
                ground_albedo=(0.2, 0.2, 0.2)) -> np.ndarray:
    """Returns [H,W,4] f32 linear pixels."""
    t = turbidity
    ts = theta_sun
    zenith = np.array([
        (0.00165 * ts**3 - 0.00374 * ts**2 + 0.00208 * ts) * t**2
        + (-0.02902 * ts**3 + 0.06377 * ts**2 - 0.03202 * ts + 0.00394) * t
        + (0.11693 * ts**3 - 0.21196 * ts**2 + 0.06052 * ts + 0.25885),
        (0.00275 * ts**3 - 0.00610 * ts**2 + 0.00316 * ts) * t**2
        + (-0.04214 * ts**3 + 0.08970 * ts**2 - 0.04153 * ts + 0.00515) * t
        + (0.15346 * ts**3 - 0.26756 * ts**2 + 0.06669 * ts + 0.26688),
        1000 * (4.0453 * t - 4.9710)
        * np.tan((4.0 / 9.0 - t / 120.0) * (np.pi - 2 * ts))
        - 0.2155 * t + 2.4192,
    ], np.float32)

    pA = np.array([-0.01925 * t - 0.25922, -0.01669 * t - 0.26078,
                   0.17872 * t - 1.46303], np.float32)
    pB = np.array([-0.06651 * t + 0.00081, -0.09495 * t + 0.00921,
                   -0.35540 * t + 0.42749], np.float32)
    pC = np.array([-0.00041 * t + 0.21247, -0.00792 * t + 0.21023,
                   -0.02266 * t + 5.32505], np.float32)
    pD = np.array([-0.06409 * t - 0.89887, -0.04405 * t - 1.65369,
                   0.12064 * t - 2.57705], np.float32)
    pE = np.array([-0.00325 * t + 0.04517, -0.01092 * t + 0.05291,
                   -0.06696 * t + 0.37027], np.float32)

    def perez(theta, gamma):
        theta = theta[..., None]
        gamma = gamma[..., None]
        num = ((1 + pA * np.exp(pB / np.cos(theta)))
               * (1 + pC * np.exp(pD * gamma)
                  + pE * np.cos(gamma) ** 2))
        den = ((1 + pA * np.exp(pB))
               * (1 + pC * np.exp(pD * ts) + pE * np.cos(ts) ** 2))
        return zenith * num / den

    def sky(theta, gamma):
        xyY = perez(theta, gamma)
        y = xyY[..., 1]
        safe = np.where(y == 0, 1, y)
        xyz_v = np.stack([xyY[..., 0] * xyY[..., 2] / safe, xyY[..., 2],
                          (1 - xyY[..., 0] - xyY[..., 1]) * xyY[..., 2]
                          / safe], -1)
        mat = np.array([[+3.2406, -1.5372, -0.4986],
                        [-0.9689, +1.8758, +0.0415],
                        [+0.0557, -0.2040, +1.0570]], np.float32)
        return (xyz_v @ mat.T) / 10000.0

    # sun spectral attenuation
    ko = np.array([0.48, 0.75, 0.14], np.float32)
    kg = np.array([0.1, 0.0, 0.0], np.float32)
    kwa = np.array([0.02, 0.0, 0.0], np.float32)
    sol = np.array([20000.0, 27000.0, 30000.0], np.float32)
    lam = np.array([680, 530, 480], np.float32)
    beta = 0.04608365822050 * t - 0.04586025928522
    m = 1.0 / (np.cos(ts) + 0.000940 * (1.6386 - ts) ** -1.253)
    tauR = np.exp(-m * 0.008735 * (lam / 1000) ** -4.08)
    tauA = np.exp(-m * beta * (lam / 1000) ** -1.3)
    tauO = np.exp(-m * ko * 0.35)
    tauG = np.exp(-1.41 * kg * m / (1 + 118.93 * kg * m) ** 0.45)
    tauWA = np.exp(-0.2385 * kwa * 2.0 * m
                   / (1 + 20.07 * kwa * 2.0 * m) ** 0.45)
    sun_le = sol * tauR * tauA * tauO * tauG * tauWA * 10000 * sun_intensity

    sun_angular_radius = max(9.35e-03 / 2 * sun_radius, 2 * np.pi / height)
    sun_dir = np.array([0, np.cos(ts), np.sin(ts)], np.float32)

    img = np.zeros((height, width, 4), np.float32)
    img[..., 3] = 1.0
    jj = np.arange(height // 2)
    theta = np.clip(np.pi * (jj + 0.5) / height, 0,
                    np.pi / 2 - np.finfo(np.float32).eps)
    phi = 2 * np.pi * (np.arange(width) + 0.5) / width
    th = theta[:, None]
    ph = phi[None, :]
    w = np.stack([np.cos(ph) * np.sin(th) + 0 * th,
                  np.cos(th) + 0 * ph,
                  np.sin(ph) * np.sin(th) + 0 * th], axis=-1)
    gamma = np.arccos(np.clip(w @ sun_dir, -1, 1))
    col = sky(np.broadcast_to(th, gamma.shape), gamma)
    if has_sun:
        col = col + np.where((gamma < sun_angular_radius)[..., None],
                             sun_le / 10000.0, 0.0)
    img[:height // 2, :, :3] = col

    ga = np.asarray(ground_albedo, np.float32)
    if np.any(ga != 0):
        angle = np.sin(th) * 4 * np.pi / (width * height)
        ground = (col * (ga / np.pi) * np.cos(th[..., None])
                  * angle[..., None]).sum((0, 1))
        img[height // 2:, :, :3] = ground
    return img


def make_lights(width=1024, height=512, le=(1, 1, 1), nlights=4,
                langle=np.pi / 4, lwidth=np.pi / 16,
                lheight=np.pi / 16) -> np.ndarray:
    """Multiple area lights on a lat-long env (yocto_image.cpp:790+)."""
    img = np.zeros((height, width, 4), np.float32)
    img[..., 3] = 1.0
    jj = np.arange(height)
    theta = np.pi * (jj + 0.5) / height
    inside_theta = np.abs(theta - langle) <= lheight / 2
    phi = 2 * np.pi * (np.arange(width) + 0.5) / width
    inphi = np.zeros(width, bool)
    for l in range(nlights):
        lphi = 2 * np.pi * (l + 0.5) / nlights
        inphi |= np.abs(phi - lphi) <= lwidth / 2
    mask = inside_theta[:, None] & inphi[None, :]
    img[..., :3] = np.where(mask[..., None], np.asarray(le, np.float32), 0.0)
    return img
