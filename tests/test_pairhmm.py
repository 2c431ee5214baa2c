"""PairHMM device kernel vs the float64 linear-space oracle."""

import numpy as np

from fgdp_tpu.ops import pairhmm
from fgdp_tpu.testing import oracles


def _random_cases(rng, n, rmax=48, hmax=80):
    R, H = rmax, hmax
    reads = np.zeros((n, R), np.int32)
    haps = np.zeros((n, H), np.int32)
    rlens = np.zeros(n, np.int32)
    hlens = np.zeros(n, np.int32)
    q = np.zeros((n, R), np.int32)
    iq = np.zeros((n, R), np.int32)
    dq = np.zeros((n, R), np.int32)
    cq = np.full((n, R), 10, np.int32)
    for k in range(n):
        hl = int(rng.integers(20, hmax + 1))
        rl = int(rng.integers(10, rmax + 1))
        hap = rng.integers(0, 4, hl)
        off = int(rng.integers(0, max(hl - rl, 1)))
        read = hap[off:off + rl].copy()
        rl = len(read)
        mut = rng.random(rl) < 0.08
        read = np.where(mut, rng.integers(0, 4, rl), read)
        reads[k, :rl] = read
        haps[k, :hl] = hap
        rlens[k], hlens[k] = rl, hl
        q[k, :rl] = rng.integers(10, 40, rl)
        iq[k, :rl] = rng.integers(30, 46, rl)
        dq[k, :rl] = rng.integers(30, 46, rl)
    return reads, rlens, q, iq, dq, cq, haps, hlens


def test_pairhmm_vs_oracle(rng):
    n = 24
    reads, rlens, q, iq, dq, cq, haps, hlens = _random_cases(rng, n)
    got = pairhmm.compute_log_likelihoods(reads, rlens, q, iq, dq, cq,
                                          haps, hlens)
    for k in range(n):
        exp = oracles.pairhmm_loglik(
            haps[k, :hlens[k]], reads[k, :rlens[k]], q[k, :rlens[k]],
            iq[k, :rlens[k]], dq[k, :rlens[k]], cq[k, :rlens[k]])
        assert abs(got[k] - exp) < 2e-3, (k, got[k], exp)


def test_pairhmm_perfect_match_high_lik(rng):
    reads, rlens, q, iq, dq, cq, haps, hlens = _random_cases(rng, 4)
    # perfect copies, high quals
    for k in range(4):
        reads[k, :rlens[k]] = haps[k, :rlens[k]]
        hlens[k] = max(hlens[k], rlens[k])
        q[k, :rlens[k]] = 40
    got = pairhmm.compute_log_likelihoods(reads, rlens, q, iq, dq, cq,
                                          haps, hlens)
    # log10 lik of a perfect match ~ log10(1/H) + small qual losses
    for k in range(4):
        assert got[k] > np.log10(1.0 / hlens[k]) - 1.0, (k, got[k])


def test_match_to_match_table():
    """Spot-check the Jacobian-table matchToMatch against direct math."""
    t = pairhmm._match_to_match_prob()
    for i, j in [(30, 30), (40, 35), (10, 2), (45, 45)]:
        mx, mn = max(i, j), min(i, j)
        got = t[(mx * (mx + 1)) // 2 + mn]
        exp = 1.0 - (10 ** (-0.1 * i) + 10 ** (-0.1 * j))
        assert abs(got - exp) < 1e-4, (i, j, got, exp)


def test_pallas_kernel_matches_jnp(rng):
    """Pallas kernel (interpret mode on CPU) is bit-identical to the jnp
    row-loop."""
    import jax.numpy as jnp

    from fgdp_tpu.ops import pairhmm_pallas

    n = 10
    reads, rlens, q, iq, dq, cq, haps, hlens = _random_cases(rng, n)
    ph = (10.0 ** (-np.arange(128) / 10.0)).astype(np.float32)
    pq = ph[np.clip(q, 0, 127)]
    tr = pairhmm.transitions(iq, dq, cq, np.float32)
    args = (jnp.asarray(reads), jnp.asarray(rlens), jnp.asarray(pq),
            jnp.asarray(tr), jnp.asarray(haps), jnp.asarray(hlens))
    o1, a1 = pairhmm.forward_f32(*args)
    o2, a2 = pairhmm_pallas.forward_f32_pallas(*args, interpret=True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_pairhmm_f64_fallback(rng):
    """A hopeless read (all mismatches, long) must route through the f64
    path and still return a finite, very low likelihood."""
    R, H = 120, 160
    hap = rng.integers(0, 4, H).astype(np.int32)
    read = ((hap[:R] + 1) % 4).astype(np.int32)
    reads = read[None, :]
    haps = hap[None, :]
    q = np.full((1, R), 40, np.int32)
    iq = np.full((1, R), 45, np.int32)
    dq = np.full((1, R), 45, np.int32)
    cq = np.full((1, R), 10, np.int32)
    got = pairhmm.compute_log_likelihoods(
        reads, np.array([R], np.int32), q, iq, dq, cq, haps,
        np.array([H], np.int32))
    assert np.isfinite(got[0])
    assert got[0] < -100


def _scalar_f64(reads, rlens, pq64, trans64, haps, hlens):
    """The pre-batching per-pair/per-column scalar loop, kept as the
    oracle for the vectorized forward_f64 (same recurrences as
    IntelPairHmm.cc double path)."""
    NP = reads.shape[0]
    out = np.zeros(NP)
    MM, GM, MX, XX, MY, YY = (pairhmm.MM, pairhmm.GM, pairhmm.MX,
                              pairhmm.XX, pairhmm.MY, pairhmm.YY)
    for p in range(NP):
        R, H = int(rlens[p]), int(hlens[p])
        hap = np.asarray(haps[p][:H], np.int64)
        tr = np.asarray(trans64[p], np.float64)
        pq = np.asarray(pq64[p], np.float64)
        M = np.zeros(H + 1)
        X = np.zeros(H + 1)
        Y = np.full(H + 1, (2.0 ** 1020) / H)
        for i in range(1, R + 1):
            rb = int(reads[p][i - 1])
            match = (hap == rb) | (hap >= 4) | (rb >= 4)
            prior = np.where(match, 1.0 - pq[i - 1], pq[i - 1] / 3.0)
            Mi = np.zeros(H + 1)
            Xi = np.zeros(H + 1)
            Mi[1:] = prior * (M[:-1] * tr[i - 1, MM] +
                              (X[:-1] + Y[:-1]) * tr[i - 1, GM])
            Xi[1:] = M[1:] * tr[i - 1, MX] + X[1:] * tr[i - 1, XX]
            Yi = np.zeros(H + 1)
            for j in range(1, H + 1):
                Yi[j] = Mi[j - 1] * tr[i - 1, MY] + \
                    Yi[j - 1] * tr[i - 1, YY]
            M, X, Y = Mi, Xi, Yi
        out[p] = np.log10(max((M[1:].sum() + X[1:].sum()),
                              np.finfo(np.float64).tiny)) - \
            pairhmm.LOG10_IC_F64
    return out


def test_f64_batched_matches_scalar(rng):
    """Vectorized forward_f64 vs the scalar loop it replaced: agreement
    to f64 summation-order tolerance on mixed-length cases."""
    reads, rlens, q, iq, dq, cq, haps, hlens = _random_cases(rng, 12)
    ph2pr = 10.0 ** (-np.arange(128) / 10.0)
    pq64 = ph2pr[np.clip(q, 0, 127)]
    tr64 = pairhmm.transitions(iq, dq, cq, np.float64)
    got = pairhmm.forward_f64(reads, rlens, pq64, tr64, haps, hlens)
    want = _scalar_f64(reads, rlens, pq64, tr64, haps, hlens)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_doubling_cap_is_exact(rng):
    """With gap-continuation quals >= 8, truncating the in-row scan at
    6 doublings is bit-exact: every later doubling multiplies by
    t_yy^(2^d) which rounds to f32 0.0 (pairhmm.doubling_cap)."""
    reads, rlens, q, iq, dq, cq, haps, hlens = _random_cases(
        rng, 8, rmax=40, hmax=200)    # H=200 -> 8 uncapped doublings
    assert pairhmm.doubling_cap(cq) == 6
    ph2pr = (10.0 ** (-np.arange(128) / 10.0)).astype(np.float32)
    pq = ph2pr[np.clip(q, 0, 127)]
    tr = pairhmm.transitions(iq, dq, cq, np.float32)
    import jax.numpy as jnp
    args = (jnp.asarray(reads), jnp.asarray(rlens), jnp.asarray(pq),
            jnp.asarray(tr), jnp.asarray(haps), jnp.asarray(hlens))
    o_full, a_full = pairhmm.forward_f32(*args)
    o_cap, a_cap = pairhmm.forward_f32(*args, n_doubling_cap=6)
    np.testing.assert_array_equal(np.asarray(a_full), np.asarray(a_cap))
    np.testing.assert_array_equal(np.asarray(o_full), np.asarray(o_cap))
    assert pairhmm.doubling_cap(np.full((2, 4), 5)) is None
