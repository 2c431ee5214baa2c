"""Parity: batched device SW extension vs exact scalar transcription of the
reference's scalarBandedSWA (bandedSWA.cpp:116-234)."""

import numpy as np
import jax.numpy as jnp

from fgdp_tpu.config import AlignConfig
from fgdp_tpu.ops.sw import SWParams, sw_extend
from fgdp_tpu.testing import oracles

OPT = AlignConfig()
MAT = OPT.score_matrix()


def _params(end_bonus):
    return SWParams(o_del=OPT.o_del, e_del=OPT.e_del, o_ins=OPT.o_ins,
                    e_ins=OPT.e_ins, zdrop=OPT.zdrop, end_bonus=end_bonus,
                    mat_max=OPT.a)


def _random_pairs(rng, n, qmax, tmax, mut=0.05):
    """Extension-shaped pairs: target is a mutated superstring of query."""
    qs = np.zeros((n, qmax), np.int32)
    ts = np.zeros((n, tmax), np.int32)
    qlen = np.zeros(n, np.int32)
    tlen = np.zeros(n, np.int32)
    for i in range(n):
        ql = int(rng.integers(1, qmax + 1))
        tl = int(rng.integers(1, tmax + 1))
        q = rng.integers(0, 4, ql)
        t = rng.integers(0, 4, tl)
        # half the time, make target an error-laden copy of query
        if rng.random() < 0.7:
            tl = min(tmax, ql + int(rng.integers(0, 20)))
            t = np.concatenate([q, rng.integers(0, 4, max(0, tl - ql))])[:tl]
            m = rng.random(tl) < mut
            t = np.where(m, rng.integers(0, 4, tl), t)
        qs[i, :ql] = q
        ts[i, :tl] = t
        qlen[i] = ql
        tlen[i] = tl
    return qs, ts, qlen, tlen


def test_sw_extend_parity(rng):
    n, qmax, tmax = 64, 96, 128
    qs, ts, qlen, tlen = _random_pairs(rng, n, qmax, tmax)
    h0 = rng.integers(1, 80, n).astype(np.int32)
    w = 100
    p = _params(OPT.pen_clip5)
    res = sw_extend(jnp.asarray(qs), jnp.asarray(qlen), jnp.asarray(ts),
                    jnp.asarray(tlen), jnp.asarray(h0), w,
                    jnp.asarray(MAT), p)
    got = {k: np.asarray(v) for k, v in res._asdict().items()}
    for i in range(n):
        ref = oracles.banded_swa_ref(
            qs[i, :qlen[i]], ts[i, :tlen[i]], w, int(h0[i]),
            OPT.o_del, OPT.e_del, OPT.o_ins, OPT.e_ins, OPT.zdrop,
            OPT.pen_clip5, MAT.flatten())
        for k in ("score", "qle", "tle", "gtle", "gscore", "max_off"):
            assert got[k][i] == ref[k], (i, k, got[k][i], ref[k],
                                         qlen[i], tlen[i], int(h0[i]))


def test_sw_extend_narrow_band(rng):
    """Small band width exercises band clamping + narrowing paths."""
    n, qmax, tmax = 48, 64, 80
    qs, ts, qlen, tlen = _random_pairs(rng, n, qmax, tmax, mut=0.15)
    h0 = np.full(n, 19, np.int32)
    for w in (3, 10):
        p = _params(OPT.pen_clip3)
        res = sw_extend(jnp.asarray(qs), jnp.asarray(qlen), jnp.asarray(ts),
                        jnp.asarray(tlen), jnp.asarray(h0), w,
                        jnp.asarray(MAT), p)
        got = {k: np.asarray(v) for k, v in res._asdict().items()}
        for i in range(n):
            ref = oracles.banded_swa_ref(
                qs[i, :qlen[i]], ts[i, :tlen[i]], w, int(h0[i]),
                OPT.o_del, OPT.e_del, OPT.o_ins, OPT.e_ins, OPT.zdrop,
                OPT.pen_clip3, MAT.flatten())
            for k in ("score", "qle", "tle", "gtle", "gscore", "max_off"):
                assert got[k][i] == ref[k], (i, k, w, got[k][i], ref[k])


def test_sw_extend_empty_lanes():
    qs = np.zeros((4, 16), np.int32)
    ts = np.zeros((4, 16), np.int32)
    res = sw_extend(jnp.asarray(qs), jnp.asarray([0, 4, 0, 4]),
                    jnp.asarray(ts), jnp.asarray([4, 0, 0, 4]),
                    jnp.asarray([10, 10, 10, 10]), 100, jnp.asarray(MAT),
                    _params(5))
    assert np.asarray(res.score)[0] == 10
    assert np.asarray(res.score)[1] == 10
    assert np.asarray(res.gscore)[2] == -1


def test_sw_pallas_matches_jnp(rng):
    """Pallas SW kernel (interpret mode on CPU) is bit-identical to the
    jnp row-loop across realistic extension shapes incl. empty lanes."""
    from fgdp_tpu.ops.sw_pallas import sw_extend_pallas

    n, qmax, tmax = 96, 96, 128
    qs, ts, qlen, tlen = _random_pairs(rng, n, qmax, tmax)
    qlen[3] = 0      # dead-lane path
    tlen[5] = 0
    h0 = rng.integers(1, 80, n).astype(np.int32)
    for w, bonus in ((100, OPT.pen_clip5), (33, OPT.pen_clip3)):
        p = _params(bonus)
        a = sw_extend(jnp.asarray(qs), jnp.asarray(qlen), jnp.asarray(ts),
                      jnp.asarray(tlen), jnp.asarray(h0), w,
                      jnp.asarray(MAT), p)
        b = sw_extend_pallas(jnp.asarray(qs), jnp.asarray(qlen),
                             jnp.asarray(ts), jnp.asarray(tlen),
                             jnp.asarray(h0), w, jnp.asarray(MAT), p,
                             interpret=True)
        for k in ("score", "qle", "tle", "gtle", "gscore", "max_off"):
            assert np.array_equal(np.asarray(getattr(a, k)),
                                  np.asarray(getattr(b, k))), (w, k)
