"""Batched Monte Carlo sampling primitives.

TPU-native equivalents of the reference sampling library
(yocto_sampling.h:248-409 in xelatihy/yocto-gl). All functions take random
numbers explicitly (produced by `ops.rng`) and broadcast over leading axes.
Discrete CDF sampling is a vectorized `searchsorted` over flat CDF pools so
light/element picking stays a gather, not a loop.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .mathops import basis_fromz, cross, length, pif, vec


def _dir_from(z, r, phi):
    return vec(r * jnp.cos(phi), r * jnp.sin(phi), z)


def _rotate(normal, local_dir):
    basis = basis_fromz(normal)
    return (local_dir[..., 0:1] * basis[..., 0, :]
            + local_dir[..., 1:2] * basis[..., 1, :]
            + local_dir[..., 2:3] * basis[..., 2, :])


def sample_hemisphere(ruv, normal=None):
    z = ruv[..., 1]
    r = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
    phi = 2.0 * pif * ruv[..., 0]
    d = _dir_from(z, r, phi)
    return d if normal is None else _rotate(normal, d)


def sample_hemisphere_pdf(normal, direction):
    cosw = jnp.sum(normal * direction, axis=-1)
    return jnp.where(cosw <= 0.0, 0.0, 1.0 / (2.0 * pif))


def sample_sphere(ruv):
    z = 2.0 * ruv[..., 1] - 1.0
    r = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
    phi = 2.0 * pif * ruv[..., 0]
    return _dir_from(z, r, phi)


def sample_sphere_pdf():
    return 1.0 / (4.0 * pif)


def sample_hemisphere_cos(ruv, normal=None):
    z = jnp.sqrt(ruv[..., 1])
    r = jnp.sqrt(1.0 - z * z)
    phi = 2.0 * pif * ruv[..., 0]
    d = _dir_from(z, r, phi)
    return d if normal is None else _rotate(normal, d)


def sample_hemisphere_cos_pdf(normal, direction):
    cosw = jnp.sum(normal * direction, axis=-1)
    return jnp.where(cosw <= 0.0, 0.0, cosw / pif)


def sample_hemisphere_cospower(exponent, ruv, normal=None):
    z = jnp.power(ruv[..., 1], 1.0 / (exponent + 1.0))
    r = jnp.sqrt(1.0 - z * z)
    phi = 2.0 * pif * ruv[..., 0]
    d = _dir_from(z, r, phi)
    return d if normal is None else _rotate(normal, d)


def sample_hemisphere_cospower_pdf(exponent, normal, direction):
    cosw = jnp.sum(normal * direction, axis=-1)
    return jnp.where(
        cosw <= 0.0, 0.0,
        jnp.power(cosw, exponent) * (exponent + 1.0) / (2.0 * pif))


def sample_disk(ruv):
    r = jnp.sqrt(ruv[..., 1])
    phi = 2.0 * pif * ruv[..., 0]
    return jnp.stack([jnp.cos(phi) * r, jnp.sin(phi) * r], axis=-1)


def sample_disk_pdf():
    return 1.0 / pif


def sample_cylinder(ruv):
    phi = 2.0 * pif * ruv[..., 0]
    return vec(jnp.sin(phi), jnp.cos(phi), ruv[..., 1] * 2.0 - 1.0)


def sample_triangle_uv(ruv):
    s = jnp.sqrt(ruv[..., 0])
    return jnp.stack([1.0 - s, ruv[..., 1] * s], axis=-1)


def sample_triangle(p0, p1, p2, ruv):
    uv = sample_triangle_uv(ruv)
    u = uv[..., 0:1]
    v = uv[..., 1:2]
    return p0 * (1.0 - u - v) + p1 * u + p2 * v


def sample_triangle_pdf(p0, p1, p2):
    return 2.0 / length(cross(p1 - p0, p2 - p0))


def sample_uniform(size, r):
    idx = (r * size).astype(jnp.int32)
    return jnp.clip(idx, 0, size - 1)


def sample_uniform_pdf(size):
    return 1.0 / size


def build_alias_table(weights):
    """Walker/Vose alias table for exact O(1)-gather discrete sampling.

    Host-side (NumPy). Returns (prob f32[N], alias i32[N]) with LOCAL
    alias indices. Sampling: pick column k = floor(r_col*N), return k if
    r_coin < prob[k] else alias[k] — the same marginal distribution as
    the CDF upper_bound search (yocto_sampling.h:388) but with ONE gather
    instead of log2(N) sequential ones; built for the wavefront's
    million-texel environment CDFs where the binary search dominated the
    shade stage (measured 63 ms/bounce at 340k lanes on features1)."""
    import numpy as np
    w = np.asarray(weights, np.float64).reshape(-1)
    n = w.shape[0]
    if n == 0:
        return (np.zeros(0, np.float32), np.zeros(0, np.int32))
    total = w.sum()
    if not np.isfinite(total) or total <= 0.0:
        return (np.ones(n, np.float32), np.arange(n, dtype=np.int32))
    p = w * (n / total)
    prob = np.ones(n, np.float64)
    alias = np.arange(n, dtype=np.int64)
    small = list(np.nonzero(p < 1.0)[0][::-1])
    large = list(np.nonzero(p >= 1.0)[0][::-1])
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = p[s]
        alias[s] = l
        p[l] -= 1.0 - p[s]
        (small if p[l] < 1.0 else large).append(l)
    # leftovers (float residue) keep prob=1 -> always take own column
    return prob.astype(np.float32), alias.astype(np.int32)


def sample_alias(prob_flat, alias_flat, r_col, r_coin, start=None,
                 count=None):
    """Draw from a flat-pooled alias table segment (see build_alias_table).

    `start`/`count` select the segment; returns LOCAL indices. `r_col`
    picks the column, `r_coin` the biased coin — two independent uniforms
    (splitting one float leaves too few mantissa bits at million-entry
    tables)."""
    if start is None:
        start = 0
        count = prob_flat.shape[0]
    cnt = jnp.maximum(count, 1)
    k = jnp.clip((r_col * cnt.astype(jnp.float32)).astype(jnp.int32),
                 0, cnt - 1)
    g = jnp.clip(start + k, 0, prob_flat.shape[0] - 1)
    take_own = r_coin < prob_flat[g]
    return jnp.where(take_own, k, alias_flat[g])


def sample_discrete(cdf, r, start=None, count=None, total=None,
                    max_count=None):
    """Sample an index from a (possibly flat-pooled) CDF segment.

    `cdf` is a flat [N] array of inclusive prefix sums. With `start`/`count`
    (broadcastable int arrays) the search runs inside `cdf[start:start+count]`
    and returns an index relative to `start`; `total` is the segment's last
    value (cdf.back()). This mirrors `sample_discrete`
    (yocto_sampling.h:388-394) but as a fixed-iteration branchless binary
    search so it vectorizes on TPU.
    """
    if start is None:
        start = jnp.zeros(r.shape if hasattr(r, "shape") else (), jnp.int32)
        count = cdf.shape[0]
        total = cdf[-1]
    r = jnp.clip(r * total, 0.0, total - 1e-5)
    # branchless binary search for upper_bound within [start, start+count)
    n = cdf.shape[0]
    # max_count (static) bounds the iteration count when the caller knows
    # every segment it will query is small — e.g. instance-light CDFs in
    # a pool shared with a million-texel environment CDF
    max_steps = max(1, int(math.ceil(math.log2(
        max(n if max_count is None else min(max_count, n), 2)))) + 1)
    shape = jnp.broadcast_shapes(jnp.shape(r), jnp.shape(start))
    lo = jnp.broadcast_to(jnp.asarray(start, jnp.int32), shape)
    hi = jnp.broadcast_to(jnp.asarray(start + count, jnp.int32), shape)
    for _ in range(max_steps):
        active = lo < hi
        mid = (lo + hi) // 2
        go_right = cdf[jnp.clip(mid, 0, n - 1)] <= r
        lo = jnp.where(active & go_right, mid + 1, lo)
        hi = jnp.where(active & ~go_right, mid, hi)
    idx = lo - start
    return jnp.clip(idx, 0, jnp.maximum(count - 1, 0))


def sample_discrete_pdf(cdf, idx, start=None):
    """Unnormalized weight of element idx (cdf delta)."""
    if start is None:
        start = 0
    gidx = start + idx
    prev = jnp.where(idx == 0, 0.0, cdf[jnp.maximum(gidx - 1, 0)])
    return cdf[gidx] - prev
