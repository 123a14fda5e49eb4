"""Bit-exact PCG32 random number generation on TPU.

Replicates the semantics of the reference PCG32 implementation
(yocto_sampling.h:81-232 in xelatihy/yocto-gl): 64-bit LCG state advanced as
``state = state * 6364136223846793005 + inc`` with XSH-RR output, floats via
the mantissa trick ``bitcast((u >> 9) | 0x3f800000) - 1``.

TPU design: JAX runs with 32-bit types by default, so the 64-bit state is
carried as two uint32 limbs ``(hi, lo)`` and all 64-bit arithmetic is done
with explicit limb ops. State is a pytree of arrays, so a whole image worth
of per-pixel generators is a single SoA batch; every op below is elementwise
and shape-polymorphic (works equally for scalars and [H*W] batches).

A NumPy mirror (`np_make_rng`, `np_rand1f`, ...) provides the host-side
oracle used for seeding tables and unit tests.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# 6364136223846793005 = 0x5851F42D4C957F2D
_MUL_HI = 0x5851F42D
_MUL_LO = 0x4C957F2D

_U32 = jnp.uint32


class RngState(NamedTuple):
    """PCG32 state: 64-bit state and stream increment as uint32 limb pairs."""

    state_hi: jax.Array
    state_lo: jax.Array
    inc_hi: jax.Array
    inc_lo: jax.Array


def _u32(x) -> jax.Array:
    return jnp.asarray(x, dtype=_U32)


def _umulhi32(a: jax.Array, b: jax.Array) -> jax.Array:
    """High 32 bits of a 32x32->64 unsigned multiply, via 16-bit limbs."""
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    t = a1 * b0 + ((a0 * b0) >> 16)
    w1 = t & 0xFFFF
    w2 = t >> 16
    t2 = a0 * b1 + w1
    return a1 * b1 + w2 + (t2 >> 16)


def _mul64(ah, al, bh, bl):
    """Low 64 bits of (ah:al) * (bh:bl) as (hi, lo) uint32 limbs."""
    lo = al * bl
    hi = _umulhi32(al, bl) + al * bh + ah * bl
    return hi, lo


def _add64(ah, al, bh, bl):
    lo = al + bl
    carry = (lo < al).astype(_U32)
    hi = ah + bh + carry
    return hi, lo


def _advance(state: RngState):
    """One PCG32 step; returns (uint32 output, new state).

    Mirrors `_advance_rng` (yocto_sampling.h:187-196).
    """
    oh, ol = state.state_hi, state.state_lo
    nh, nl = _mul64(oh, ol, _u32(_MUL_HI), _u32(_MUL_LO))
    nh, nl = _add64(nh, nl, state.inc_hi, state.inc_lo)
    # xorshifted = (uint32)(((old >> 18) ^ old) >> 27)
    s18_lo = (ol >> 18) | (oh << 14)
    s18_hi = oh >> 18
    xh = s18_hi ^ oh
    xl = s18_lo ^ ol
    xorshifted = (xl >> 27) | (xh << 5)
    rot = oh >> 27  # (uint32)(old >> 59)
    out = (xorshifted >> rot) | (xorshifted << ((32 - rot) & 31))
    return out, RngState(nh, nl, state.inc_hi, state.inc_lo)


def make_rng(seed, seq=1) -> RngState:
    """Init generator(s); `seed`/`seq` are python ints or uint32-limb pairs.

    Mirrors `make_rng` (yocto_sampling.h:199-206): state=0, inc=(seq<<1)|1,
    advance, state += seed, advance.
    """
    if isinstance(seed, tuple):
        seed_hi, seed_lo = _u32(seed[0]), _u32(seed[1])
    else:
        seed = int(seed) & 0xFFFFFFFFFFFFFFFF
        seed_hi, seed_lo = _u32(seed >> 32), _u32(seed & 0xFFFFFFFF)
    if isinstance(seq, tuple):
        seq_hi, seq_lo = _u32(seq[0]), _u32(seq[1])
    else:
        seq = int(seq) & 0xFFFFFFFFFFFFFFFF
        seq_hi, seq_lo = _u32(seq >> 32), _u32(seq & 0xFFFFFFFF)
    inc_hi = (seq_hi << 1) | (seq_lo >> 31)
    inc_lo = (seq_lo << 1) | _u32(1)
    zero = jnp.zeros_like(inc_lo)
    st = RngState(zero, zero, inc_hi, inc_lo)
    _, st = _advance(st)
    st = RngState(*_add64(st.state_hi, st.state_lo, seed_hi, seed_lo),
                  st.inc_hi, st.inc_lo)
    _, st = _advance(st)
    return st


def rand1u(state: RngState):
    """Raw uint32 draw."""
    return _advance(state)


_GOLDEN_HI = 0x9E3779B9
_GOLDEN_LO = 0x7F4A7C15


def make_rng_offset(seed: int, k, seq_hi, seq_lo) -> RngState:
    """Device-side generator for (pixel, sample-offset) lanes.

    seed64' = seed + k * 0x9E3779B97F4A7C15 (wrapping), seq = pixel seq.
    Used by the fast (statistically independent) sampling mode where
    several samples per pixel run concurrently; the exact mode instead
    carries sequential per-pixel streams.
    """
    k = jnp.asarray(k, _U32)
    mh, ml = _mul64(jnp.zeros_like(k), k, _u32(_GOLDEN_HI), _u32(_GOLDEN_LO))
    seed = int(seed) & 0xFFFFFFFFFFFFFFFF
    sh, sl = _add64(mh, ml, _u32(seed >> 32), _u32(seed & 0xFFFFFFFF))
    return make_rng((sh, sl), (seq_hi, seq_lo))


def make_pixel_seqs(npixels: int):
    """The per-pixel stream ids of make_trace_state
    (yocto_trace.cpp:1512-1515) as uint32 limb arrays (hi, lo)."""
    meta_state, meta_inc = np_make_rng(1301081)
    with np.errstate(over="ignore"):
        pows = np.empty(npixels, dtype=np.uint64)
        pows[0] = np.uint64(1)
        if npixels > 1:
            np.multiply.accumulate(
                np.full(npixels - 1, _NP_MUL, dtype=np.uint64), out=pows[1:])
        geo = np.empty(npixels, dtype=np.uint64)
        geo[0] = np.uint64(0)
        if npixels > 1:
            np.add.accumulate(pows[:-1], out=geo[1:])
        old = pows * meta_state + geo * meta_inc
        x = (((old >> np.uint64(18)) ^ old) >> np.uint64(27)).astype(np.uint32)
        r = (old >> np.uint64(59)).astype(np.uint32)
        outs = (x >> r) | (x << ((np.uint32(32) - r) & np.uint32(31)))
    seqs = (outs.astype(np.uint64) % np.uint64(0x80000000)) // np.uint64(2) \
        + np.uint64(1)
    return (jnp.asarray((seqs >> np.uint64(32)).astype(np.uint32)),
            jnp.asarray((seqs & np.uint64(0xFFFFFFFF)).astype(np.uint32)))


def rand1f(state: RngState):
    """Float in [0,1) via the mantissa trick (yocto_sampling.h:209-218)."""
    bits, state = _advance(state)
    f = jax.lax.bitcast_convert_type((bits >> 9) | _u32(0x3F800000),
                                     jnp.float32)
    return f - 1.0, state


def rand2f(state: RngState):
    x, state = rand1f(state)
    y, state = rand1f(state)
    return jnp.stack([x, y], axis=-1), state


def rand3f(state: RngState):
    x, state = rand1f(state)
    y, state = rand1f(state)
    z, state = rand1f(state)
    return jnp.stack([x, y, z], axis=-1), state


def rand1f_if(state: RngState, cond):
    """Draw a float but only advance the state where `cond` is True.

    This is what lets a masked/batched sampler consume *exactly* the same
    per-pixel random stream as the reference's data-dependent control flow.
    """
    val, new_state = rand1f(state)
    keep = lambda new, old: jnp.where(cond, new, old)
    state = RngState(
        keep(new_state.state_hi, state.state_hi),
        keep(new_state.state_lo, state.state_lo),
        state.inc_hi, state.inc_lo)
    return val, state


def rand2f_if(state: RngState, cond):
    x, state = rand1f_if(state, cond)
    y, state = rand1f_if(state, cond)
    return jnp.stack([x, y], axis=-1), state


# ----------------------------------------------------------------------------
# NumPy mirror (host-side oracle; used for per-pixel seed tables and tests)
# ----------------------------------------------------------------------------

_NP_MUL = np.uint64(6364136223846793005)


def np_advance(state: np.ndarray, inc: np.ndarray):
    """Vectorized PCG32 step on uint64 numpy arrays -> (uint32 out, state)."""
    old = state
    with np.errstate(over="ignore"):
        state = old * _NP_MUL + inc
    xorshifted = (((old >> np.uint64(18)) ^ old) >> np.uint64(27)).astype(
        np.uint32)
    rot = (old >> np.uint64(59)).astype(np.uint32)
    out = (xorshifted >> rot) | (
        xorshifted << ((np.uint32(32) - rot) & np.uint32(31)))
    return out, state


def np_make_rng(seed, seq=1):
    """NumPy make_rng -> (state, inc) uint64 arrays (broadcasting)."""
    seed = np.asarray(seed, dtype=np.uint64)
    seq = np.asarray(seq, dtype=np.uint64)
    inc = (seq << np.uint64(1)) | np.uint64(1)
    state = np.zeros_like(inc)
    _, state = np_advance(state, inc)
    with np.errstate(over="ignore"):
        state = state + seed
    _, state = np_advance(state, inc)
    return state, inc


def np_rand1f(state, inc):
    bits, state = np_advance(state, inc)
    f = ((bits >> np.uint32(9)) | np.uint32(0x3F800000)).view(np.float32)
    return f - np.float32(1.0), state


def make_pixel_seeds(npixels: int, seed: int):
    """Per-pixel decorrelated streams exactly as make_trace_state
    (yocto_trace.cpp:1495-1520): a meta-RNG seeded with 1301081 draws one
    uint32 per pixel; pixel seq = (draw % 2^31)/2 + 1; pixel seed = params.seed.

    Returns an RngState with [npixels] leaves.
    """
    meta_state, meta_inc = np_make_rng(1301081)
    # Closed-form LCG jump (vectorized): s_k = A^k s0 + (sum_{j<k} A^j) inc.
    with np.errstate(over="ignore"):
        pows = np.empty(npixels, dtype=np.uint64)
        pows[0] = np.uint64(1)
        if npixels > 1:
            np.multiply.accumulate(
                np.full(npixels - 1, _NP_MUL, dtype=np.uint64),
                out=pows[1:])
        geo = np.empty(npixels, dtype=np.uint64)
        geo[0] = np.uint64(0)
        if npixels > 1:
            np.add.accumulate(pows[:-1], out=geo[1:])
        old = pows * meta_state + geo * meta_inc  # state before k-th draw
        x = (((old >> np.uint64(18)) ^ old) >> np.uint64(27)).astype(np.uint32)
        r = (old >> np.uint64(59)).astype(np.uint32)
        outs = (x >> r) | (x << ((np.uint32(32) - r) & np.uint32(31)))
    seqs = (outs.astype(np.uint64) % np.uint64(0x80000000)) // np.uint64(2) \
        + np.uint64(1)
    state, inc = np_make_rng(np.full(npixels, seed, dtype=np.uint64), seqs)
    return RngState(
        jnp.asarray((state >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((state & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((inc >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((inc & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
    )
