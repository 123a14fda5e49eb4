"""Batched vector/frame math on jnp arrays.

TPU-native equivalent of the reference math core (yocto_math.h:128-1002 in
xelatihy/yocto-gl): vectors are arrays with a trailing component axis
(``[..., 3]``), affine frames are ``[..., 4, 3]`` with rows ``x, y, z, o``
(the reference's column-major frame3f laid out SoA-friendly). Every function
broadcasts over leading axes, so one call handles a megabatch of rays.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

pif = np.float32(np.pi)
flt_max = np.float32(np.finfo(np.float32).max)
flt_eps = np.float32(np.finfo(np.float32).eps)


def vec(*comps):
    """Stack scalars/batches into a trailing-axis vector."""
    return jnp.stack([jnp.asarray(c, jnp.float32) for c in comps], axis=-1)


def dot(a, b):
    # componentwise: reductions over the 3-wide axis compile to separate
    # (fusion-breaking) reduce kernels on TPU; explicit slices fuse.
    return (a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1]
            + a[..., 2] * b[..., 2])


def cross(a, b):
    return jnp.stack([
        a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
        a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
        a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]], axis=-1)


def length(a):
    return jnp.sqrt(dot(a, a))


def length_squared(a):
    return dot(a, a)


def normalize(a):
    """v / |v|, passing v through unchanged when |v| == 0 (yocto semantics).

    The guard sits INSIDE the sqrt: sqrt'(0) is inf, and jnp.where does
    not stop gradients from the unselected branch, so the naive
    where(l != 0, a/l, a) is forward-correct but back-propagates NaN for
    zero vectors (degenerate quad triangles, absent normals). This form
    is bit-identical forward and NaN-free backward."""
    d = dot(a, a)
    l = jnp.sqrt(jnp.where(d == 0.0, 1.0, d))[..., None]
    return jnp.where(d[..., None] != 0.0, a / l, a)


def distance(a, b):
    return length(a - b)


def distance_squared(a, b):
    return dot(a - b, a - b)


def orthogonal(v):
    cond = jnp.abs(v[..., 0]) > jnp.abs(v[..., 2])
    return jnp.where(
        cond[..., None],
        vec(-v[..., 1], v[..., 0], jnp.zeros_like(v[..., 0])),
        vec(jnp.zeros_like(v[..., 0]), -v[..., 2], v[..., 1]))


def orthonormalize(a, b):
    return normalize(a - b * dot(a, b)[..., None])


def reflect(w, n):
    return -w + 2.0 * dot(n, w)[..., None] * n


def refract(w, n, inv_eta):
    """Refracted direction; zero vector on total internal reflection."""
    cosine = dot(n, w)
    k = 1.0 + inv_eta * inv_eta * (cosine * cosine - 1.0)
    refr = -w * jnp.asarray(inv_eta)[..., None] + (
        inv_eta * cosine - jnp.sqrt(jnp.maximum(k, 0.0)))[..., None] * n
    return jnp.where((k < 0.0)[..., None], jnp.zeros_like(w), refr)


def lerp(a, b, u):
    return a * (1.0 - u) + b * u


def mean3(a):
    return (a[..., 0] + a[..., 1] + a[..., 2]) / 3.0


def maxc(a):
    """Max component (yocto `max(vec3f)`)."""
    return jnp.maximum(jnp.maximum(a[..., 0], a[..., 1]), a[..., 2])


def minc(a):
    return jnp.minimum(jnp.minimum(a[..., 0], a[..., 1]), a[..., 2])


def isfinite3(a):
    return (jnp.isfinite(a[..., 0]) & jnp.isfinite(a[..., 1])
            & jnp.isfinite(a[..., 2]))


def is_zero3(a):
    return (a[..., 0] == 0.0) & (a[..., 1] == 0.0) & (a[..., 2] == 0.0)


def sum3(a):
    return a[..., 0] + a[..., 1] + a[..., 2]


# ----------------------------------------------------------------------------
# Frames: [..., 4, 3] rows x, y, z, o
# ----------------------------------------------------------------------------

IDENTITY_FRAME = np.array(
    [[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 0]], dtype=np.float32)


def make_frame(x, y, z, o):
    return jnp.stack([x, y, z, o], axis=-2)


def frame_x(f):
    return f[..., 0, :]


def frame_y(f):
    return f[..., 1, :]


def frame_z(f):
    return f[..., 2, :]


def frame_o(f):
    return f[..., 3, :]


def transform_point(frame, p):
    """p.x*X + p.y*Y + p.z*Z + O (componentwise: batched tiny matmuls are
    slow on TPU, elementwise FMAs are fast)."""
    return (p[..., 0:1] * frame[..., 0, :] + p[..., 1:2] * frame[..., 1, :]
            + p[..., 2:3] * frame[..., 2, :] + frame[..., 3, :])


def transform_vector(frame, v):
    return (v[..., 0:1] * frame[..., 0, :] + v[..., 1:2] * frame[..., 1, :]
            + v[..., 2:3] * frame[..., 2, :])


def transform_direction(frame, d):
    return normalize(transform_vector(frame, d))


def transform_normal(frame, n, non_rigid=False):
    if non_rigid:
        raise NotImplementedError("non-rigid normal transform")
    return normalize(transform_vector(frame, n))


def inverse_frame(frame, non_rigid=False):
    """Inverse of an affine frame (rigid: rotation transpose)."""
    rot = frame[..., :3, :]
    if non_rigid:
        inv_rot = jnp.linalg.inv(rot)
    else:
        inv_rot = jnp.swapaxes(rot, -1, -2)
    o = frame[..., 3, :]
    inv_o = -jnp.einsum("...i,...ij->...j", o, inv_rot)
    return jnp.concatenate([inv_rot, inv_o[..., None, :]], axis=-2)


def transform_point_inverse(frame, p):
    """Transform by the inverse of a rigid frame without materializing it."""
    d = p - frame[..., 3, :]
    return jnp.stack([jnp.sum(d * frame[..., 0, :], -1),
                      jnp.sum(d * frame[..., 1, :], -1),
                      jnp.sum(d * frame[..., 2, :], -1)], axis=-1)


def transform_vector_inverse(frame, v):
    return jnp.stack([jnp.sum(v * frame[..., 0, :], -1),
                      jnp.sum(v * frame[..., 1, :], -1),
                      jnp.sum(v * frame[..., 2, :], -1)], axis=-1)


def basis_fromz(v):
    """Orthonormal basis from a z direction (Pixar ONB; yocto_math.h:1977).

    Returns a [..., 3, 3] rotation with rows x, y, z.
    """
    z = normalize(v)
    sign = jnp.where(z[..., 2] >= 0.0, 1.0, -1.0).astype(jnp.float32)
    a = -1.0 / (sign + z[..., 2])
    b = z[..., 0] * z[..., 1] * a
    x = vec(1.0 + sign * z[..., 0] * z[..., 0] * a, sign * b,
            -sign * z[..., 0])
    y = vec(b, sign + z[..., 1] * z[..., 1] * a, -z[..., 1])
    return jnp.stack([x, y, z], axis=-2)


def lookat_frame(eye, center, up, inv_ok=False):
    z = normalize(eye - center)
    x = normalize(cross(up, z))
    y = normalize(cross(z, x))
    return make_frame(x, y, z, eye)
