"""PCG32 bit-exactness tests.

The jnp limb implementation must match (a) the official PCG32 reference
output vector and (b) the NumPy uint64 mirror, for both scalars and batches.
"""

import jax.numpy as jnp
import numpy as np

from yocto_tpu.ops import rng as R

# Official pcg32 demo output: seed=42, seq=54 (pcg_setseq_64_xsh_rr_32)
PCG32_SEED42_SEQ54 = [
    0xA15C02B7, 0x7B47F409, 0xBA1D3330, 0x83D2F293, 0xBFA4784B, 0xCBED606E,
]


def test_np_mirror_matches_pcg_reference():
    state, inc = R.np_make_rng(42, 54)
    for expected in PCG32_SEED42_SEQ54:
        out, state = R.np_advance(state, inc)
        assert int(out) == expected


def test_jnp_matches_pcg_reference():
    st = R.make_rng(42, 54)
    for expected in PCG32_SEED42_SEQ54:
        out, st = R.rand1u(st)
        assert int(out) == expected


def test_jnp_rand1f_matches_np_mirror():
    st = R.make_rng(961748941, 12345)
    nstate, ninc = R.np_make_rng(961748941, 12345)
    for _ in range(20):
        f, st = R.rand1f(st)
        nf, nstate = R.np_rand1f(nstate, ninc)
        assert np.float32(f) == nf


def test_batched_streams_independent():
    seeds = np.arange(16, dtype=np.uint64)
    state, inc = R.np_make_rng(np.full(16, 7, np.uint64), seeds * 2 + 1)
    st = R.RngState(
        jnp.asarray((state >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((state & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((inc >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((inc & np.uint64(0xFFFFFFFF)).astype(np.uint32)))
    f, st = R.rand1f(st)
    nf, _ = R.np_rand1f(state, inc)
    np.testing.assert_array_equal(np.asarray(f), nf)
    assert len(np.unique(np.asarray(f))) > 10  # streams decorrelated


def test_rand1f_if_only_advances_where_true():
    st = R.make_rng(1, 1)
    st_batch = R.RngState(
        jnp.broadcast_to(st.state_hi, (4,)),
        jnp.broadcast_to(st.state_lo, (4,)),
        jnp.broadcast_to(st.inc_hi, (4,)),
        jnp.broadcast_to(st.inc_lo, (4,)))
    cond = jnp.asarray([True, False, True, False])
    _, st2 = R.rand1f_if(st_batch, cond)
    assert np.asarray(st2.state_lo)[0] != np.asarray(st_batch.state_lo)[0]
    assert np.asarray(st2.state_lo)[1] == np.asarray(st_batch.state_lo)[1]


def test_make_pixel_seeds_matches_sequential_reference():
    """The vectorized closed-form seeding must equal the sequential loop the
    reference runs (yocto_trace.cpp:1512-1515)."""
    n = 37
    seeds = R.make_pixel_seeds(n, 961748941)
    # sequential oracle
    meta_state, meta_inc = R.np_make_rng(1301081)
    for i in range(n):
        out, meta_state = R.np_advance(meta_state, meta_inc)
        seq = (int(out) % 0x80000000) // 2 + 1
        state, inc = R.np_make_rng(961748941, seq)
        assert int(seeds.state_hi[i]) == int(state) >> 32
        assert int(seeds.state_lo[i]) == int(state) & 0xFFFFFFFF
        assert int(seeds.inc_lo[i]) == int(inc) & 0xFFFFFFFF


def test_conductor_eta_table():
    """Named conductor IOR lookup (yocto_shading.h:1116-1199)."""
    from yocto_tpu.ops.shading import CONDUCTOR_ETAS, conductor_eta
    assert len(CONDUCTOR_ETAS) == 40
    eta, etak = conductor_eta("Au")
    assert abs(eta[0] - 0.1431189557) < 1e-9
    assert abs(etak[2] - 1.6032152899) < 1e-9
    assert conductor_eta("unobtanium") == ((0.0, 0.0, 0.0), (0.0, 0.0, 0.0))


def test_alias_table_matches_cdf_distribution():
    """sample_alias draws the exact CDF probabilities (wavefront env
    sampling uses the alias table; the lockstep keeps the CDF search)."""
    import jax.numpy as jnp
    import numpy as np
    from yocto_tpu.ops import sampling as SMP

    w = np.array([0.1, 3.0, 0.5, 0.0, 2.4, 1.0], np.float64)
    prob, alias = SMP.build_alias_table(w)
    n = len(w)
    g = 2000
    cols = ((np.arange(n).repeat(g)
             + np.tile((np.arange(g) + 0.5) / g, n)) / n)
    coins = np.tile((np.arange(g) + 0.5) / g, n)
    idx = np.asarray(SMP.sample_alias(
        jnp.asarray(prob), jnp.asarray(alias),
        jnp.asarray(cols, jnp.float32), jnp.asarray(coins, jnp.float32)))
    freq = np.bincount(idx, minlength=n) / len(idx)
    want = w / w.sum()
    assert np.abs(freq - want).max() < 2e-3

    # flat-pool segment: same table appended after a dummy segment
    pool_p = np.concatenate([np.ones(3, np.float32), prob])
    pool_a = np.concatenate([np.zeros(3, np.int32), alias])
    idx2 = np.asarray(SMP.sample_alias(
        jnp.asarray(pool_p), jnp.asarray(pool_a),
        jnp.asarray(cols, jnp.float32), jnp.asarray(coins, jnp.float32),
        start=jnp.full(len(cols), 3, jnp.int32),
        count=jnp.full(len(cols), n, jnp.int32)))
    assert np.array_equal(idx, idx2)
