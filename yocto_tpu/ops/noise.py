"""Batched Perlin noise (revised gradient noise) + fractal variants.

Equivalent of the reference noise library (yocto_noise.h:95-380). The
permutation table is regenerated from the same documented recipe the
reference uses (python `random.seed(12876289)` shuffle of range(256),
yocto_noise.h:97-115) rather than hard-coding values. All functions are
elementwise jnp over [..., 3] points.
"""

from __future__ import annotations

import random as _random

import jax.numpy as jnp
import numpy as np


def _make_permutation() -> np.ndarray:
    perm = list(range(256))
    rng = _random.Random()
    rng.seed(12876289)
    rng.shuffle(perm)
    return np.asarray(perm + perm, np.int32)


_PERM = _make_permutation()


def _ease(a):
    return ((a * 6.0 - 15.0) * a + 10.0) * a * a * a


def _grad3(ix, iy, iz, fx, fy, fz, mx, my, mz):
    # index chain follows C precedence in the reference:
    # _p[_p[_p[ix & mx] + iy & my] + iz & mz] == _p[(_p[(_p[ix&mx]+iy)&my]+iz)&mz]
    perm = jnp.asarray(_PERM)
    idx1 = (perm[ix & mx] + iy) & my
    idx2 = (perm[idx1] + iz) & mz
    h = perm[idx2] & 15
    u = jnp.where(h < 8, fx, fy)
    v = jnp.where(h < 4, fy, jnp.where((h == 12) | (h == 14), fx, fz))
    return (jnp.where((h & 1) != 0, -u, u)
            + jnp.where((h & 2) != 0, -v, v))


def perlin_noise(p, wrap=(0, 0, 0)):
    """3D Perlin noise in [0,1]; p: [...,3]."""
    mx = (wrap[0] - 1) & 255
    my = (wrap[1] - 1) & 255
    mz = (wrap[2] - 1) & 255
    i = jnp.floor(p).astype(jnp.int32)
    f = p - i.astype(jnp.float32)
    u = _ease(f)
    ix, iy, iz = i[..., 0], i[..., 1], i[..., 2]
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]

    def g(dx, dy, dz):
        return _grad3(ix + dx, iy + dy, iz + dz,
                      fx - dx, fy - dy, fz - dz, mx, my, mz)

    n000 = g(0, 0, 0)
    n001 = g(0, 0, 1)
    n010 = g(0, 1, 0)
    n011 = g(0, 1, 1)
    n100 = g(1, 0, 0)
    n101 = g(1, 0, 1)
    n110 = g(1, 1, 0)
    n111 = g(1, 1, 1)
    uz = u[..., 2]
    uy = u[..., 1]
    ux = u[..., 0]
    n00 = n000 + (n001 - n000) * uz
    n01 = n010 + (n011 - n010) * uz
    n10 = n100 + (n101 - n100) * uz
    n11 = n110 + (n111 - n110) * uz
    n0 = n00 + (n01 - n00) * uy
    n1 = n10 + (n11 - n10) * uy
    return (n0 + (n1 - n0) * ux) * 0.5 + 0.5


def perlin_fbm(p, lacunarity=2.0, gain=0.5, octaves=6, wrap=(0, 0, 0)):
    frequency, amplitude = 1.0, 1.0
    total = jnp.zeros(p.shape[:-1], jnp.float32)
    for _ in range(int(octaves)):
        total = total + perlin_noise(p * frequency, wrap) * amplitude
        frequency *= lacunarity
        amplitude *= gain
    return total


def perlin_turbulence(p, lacunarity=2.0, gain=0.5, octaves=6, wrap=(0, 0, 0)):
    frequency, amplitude = 1.0, 1.0
    total = jnp.zeros(p.shape[:-1], jnp.float32)
    for _ in range(int(octaves)):
        total = total + jnp.abs(
            perlin_noise(p * frequency, wrap) * 2.0 - 1.0) * amplitude
        frequency *= lacunarity
        amplitude *= gain
    return total


def perlin_ridge(p, lacunarity=2.0, gain=0.5, octaves=6, offset=1.0,
                 wrap=(0, 0, 0)):
    frequency = 1.0
    prev = jnp.ones(p.shape[:-1], jnp.float32)
    amplitude = 0.5
    total = jnp.zeros(p.shape[:-1], jnp.float32)
    for _ in range(int(octaves)):
        r = offset - jnp.abs(perlin_noise(p * frequency, wrap) * 2.0 - 1.0)
        r = r * r
        total = total + r * amplitude * prev
        prev = r
        frequency *= lacunarity
        amplitude *= gain
    return total
