"""Batched PairHMM forward likelihoods (device side).

The reference computes striped-AVX forward DP per (read, haplotype) pair
with trie sharing and work stealing (deepmutect .../intel/pairhmm/
avx-pairhmm-template.h:204,475; IntelPairHmm.cc). The TPU design runs the
*whole pair batch* per step: one `lax.scan` over read rows, each step
vectorized over (pairs x haplotype columns) on the VPU. The in-row
deletion recurrence Y[i,j] = M[i,j-1]*tMY + Y[i,j-1]*tYY is a constant-
coefficient linear recurrence per row, computed with log-doubling
(associative), so every step is pure vector work. Trie prefix-sharing
maps poorly to SPMD and is replaced by plain batching + host-side read
dedup (VectorLoglessPairHMM.cpp:53-114 keeps dedup; we do too, in the
caller).

Numerics follow GKL: float32 with INITIAL_CONSTANT 2^120 and a float64
(2^1020) second pass for pairs whose result falls below MIN_ACCEPTED
(Context.h:183-189, pairhmm_common.h:41, IntelPairHmm.cc:340-349).
Transition probabilities (including the Jacobian-table matchToMatch
blend) are precomputed exactly on the host — see `transitions`.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

LOG10_IC_F32 = 120 * np.log10(2.0)
LOG10_IC_F64 = 1020 * np.log10(2.0)
MIN_ACCEPTED = 1e-28           # pairhmm_common.h:41
MAX_QUAL = 254

# match-state transition indices in the trans array
MM, GM, MX, XX, MY, YY = range(6)


@functools.lru_cache()
def _match_to_match_prob() -> np.ndarray:
    """Exact port of Context initializeMatchToMatchProb (Context.h:76-92):
    matchToMatch[i, j] for maxQual i, minQual j via the Jacobian table."""
    step = 0.0001
    k = np.arange(int(8.0 / step) + 1)
    jacobian = np.log10(1.0 + 10.0 ** (-k * step))
    out = np.zeros(((MAX_QUAL + 1) * (MAX_QUAL + 2)) // 2)
    idx = 0
    for i in range(MAX_QUAL + 1):
        for j in range(i + 1):
            small, big = -0.1 * i, -0.1 * j
            diff = big - small
            if diff >= 8.0:
                log10sum = big
            else:
                ind = int(diff / step + 0.5)
                log10sum = big + jacobian[ind]
            with np.errstate(divide="ignore"):
                m2m = np.log1p(-min(1.0, 10.0 ** log10sum)) * 0.434294
            out[idx] = 10.0 ** m2m
            idx += 1
    return out


def transitions(i_qual, d_qual, c_qual, dtype=np.float32) -> np.ndarray:
    """Per-base transition probs [..., 6] (Context set_mm_prob + ph2pr).
    i/d/c_qual: int arrays (insertion, deletion, gap-continuation quals).
    """
    i_qual = np.asarray(i_qual, np.int64)
    d_qual = np.asarray(d_qual, np.int64)
    c_qual = np.asarray(c_qual, np.int64)
    ph2pr = 10.0 ** (-np.arange(128) / 10.0)
    m2m = _match_to_match_prob()
    mx = np.maximum(i_qual, d_qual)
    mn = np.minimum(i_qual, d_qual)
    mm = m2m[(mx * (mx + 1)) // 2 + mn]
    gapc = ph2pr[np.clip(c_qual, 0, 127)]
    out = np.stack([
        mm.astype(dtype),
        (1.0 - gapc).astype(dtype),
        ph2pr[np.clip(i_qual, 0, 127)].astype(dtype),
        gapc.astype(dtype),
        ph2pr[np.clip(d_qual, 0, 127)].astype(dtype),
        gapc.astype(dtype),
    ], axis=-1)
    return out


def doubling_cap(c_quals) -> int | None:
    """Largest useful in-row scan depth for the f32 kernels, from the
    gap-continuation quals: iteration d of the log-doubling scan
    multiplies by t_yy^(2^d) = 10^(-cq/10 * 2^d); once that is below
    the smallest f32 denormal (~10^-44.85) the multiplier rounds to
    EXACTLY 0.0 and the iteration is a bit-exact no-op. For cq >= 8,
    d = 6 already gives 10^-51.2 -> 0, so 6 doublings (span 64 columns)
    suffice regardless of H. Returns None (no cap) when any cq < 8."""
    import numpy as _np
    cq = _np.asarray(c_quals)
    if cq.size and int(cq.min()) >= 8:
        return 6
    return None


def _forward(reads, rlens, pq, trans, haps, hlens, dtype, log10_ic,
             n_doubling_cap=None):
    """Core forward DP. reads int32[NP, R]; pq f[NP, R] = ph2pr[qual];
    trans f[NP, R, 6]; haps int32[NP, H]; rlens/hlens int32[NP].
    Returns log10 P(read | hap) f[NP]."""
    NP, R = reads.shape
    H = haps.shape[1]
    f = lambda x: jnp.asarray(x, dtype)
    one = jnp.asarray(1.0, dtype)
    init_const = jnp.asarray(2.0, dtype) ** jnp.asarray(
        120.0 if dtype == jnp.float32 else 1020.0, dtype)

    init_y = init_const / hlens.astype(dtype)              # [NP]
    jcol = jnp.arange(H + 1, dtype=jnp.int32)[None, :]
    col_valid = (jcol >= 1) & (jcol <= hlens[:, None])     # DP columns 1..H

    # hap base at column j (1-based)
    hap_at = jnp.concatenate(
        [jnp.full((NP, 1), 4, jnp.int32), haps], axis=1)   # [NP, H+1]

    M0 = jnp.zeros((NP, H + 1), dtype)
    X0 = jnp.zeros((NP, H + 1), dtype)
    Y0 = jnp.broadcast_to(init_y[:, None], (NP, H + 1)).astype(dtype)

    n_doubling = max(1, int(np.ceil(np.log2(max(H, 2)))))
    if n_doubling_cap is not None:
        n_doubling = min(n_doubling, n_doubling_cap)

    def shiftk(a, k):
        return jnp.pad(a, ((0, 0), (k, 0)))[:, :-k] if k else a

    reads_T = reads.T                                      # [R, NP]
    pq_T = jnp.asarray(pq, dtype).T
    trans_T = jnp.moveaxis(jnp.asarray(trans, dtype), 1, 0)  # [R, NP, 6]

    def body(i, carry):
        Mp, Xp, Yp, acc = carry
        rbase = reads_T[i]
        pq_i = pq_T[i]
        tr = trans_T[i]
        match = (hap_at == rbase[:, None]) | (hap_at >= 4) | \
            (rbase[:, None] >= 4)
        prior = jnp.where(match, one - pq_i[:, None],
                          pq_i[:, None] / jnp.asarray(3.0, dtype))
        Mi = prior * (shiftk(Mp, 1) * tr[:, MM, None] +
                      (shiftk(Xp, 1) + shiftk(Yp, 1)) * tr[:, GM, None])
        Mi = jnp.where(jcol >= 1, Mi, jnp.asarray(0.0, dtype))
        Xi = Mp * tr[:, MX, None] + Xp * tr[:, XX, None]
        Xi = jnp.where(jcol >= 1, Xi, jnp.asarray(0.0, dtype))
        # Y in-row recurrence y_j = u_j + c*y_{j-1} by log-doubling
        u = shiftk(Mi, 1) * tr[:, MY, None]
        cp = c = tr[:, YY, None]
        y = u
        k = 1
        for _ in range(n_doubling):
            y = y + cp * shiftk(y, k)
            cp = cp * cp
            k <<= 1
        Yi = jnp.where(jcol >= 1, y, jnp.asarray(0.0, dtype))
        rowsum = jnp.sum(jnp.where(col_valid, Mi + Xi, 0), axis=1)
        acc = jnp.where(i + 1 == rlens, rowsum, acc)
        live = (i < rlens)[:, None]
        return (jnp.where(live, Mi, Mp), jnp.where(live, Xi, Xp),
                jnp.where(live, Yi, Yp), acc)

    carry = (M0, X0, Y0, jnp.zeros(NP, dtype))
    _, _, _, acc = jax.lax.fori_loop(0, R, body, carry)
    return jnp.log10(jnp.maximum(acc, jnp.finfo(dtype).tiny)) - log10_ic, acc


@functools.partial(jax.jit, static_argnames=("n_doubling_cap",))
def forward_f32(reads, rlens, pq, trans, haps, hlens,
                n_doubling_cap=None):
    """float32 pass. Returns (log10_lik[NP], raw_sum[NP])."""
    return _forward(reads, rlens, pq, trans, haps, hlens, jnp.float32,
                    jnp.float32(LOG10_IC_F32),
                    n_doubling_cap=n_doubling_cap)


def forward_f64(reads, rlens, pq64, trans64, haps, hlens):
    """float64 fallback (GKL double path, IntelPairHmm.cc:340-349),
    batched: vectorized over pairs AND haplotype columns with one host
    iteration per read row; the in-row Y recurrence uses the same
    log-doubling form as the device kernels (f64). Replaces the
    per-pair/per-column scalar loop — on an exome-density region a
    64-pair fallback batch is one vectorized pass instead of
    ~NP*R*H Python iterations. Scalar-loop parity is tested in
    tests/test_pairhmm.py (test_f64_batched_matches_scalar)."""
    reads = np.asarray(reads)
    haps = np.asarray(haps)
    NP, _ = reads.shape
    Hm = haps.shape[1]
    if NP == 0:
        return np.zeros(0)
    rl = np.asarray(rlens, np.int64)
    hl = np.asarray(hlens, np.int64)
    tr = np.asarray(trans64, np.float64)        # [NP, R, 6]
    pq = np.asarray(pq64, np.float64)
    hap_at = np.concatenate(
        [np.full((NP, 1), 4, haps.dtype), haps], axis=1)   # [NP, Hm+1]
    jcol = np.arange(Hm + 1)[None, :]
    col_valid = (jcol >= 1) & (jcol <= hl[:, None])
    hap_ge4 = hap_at >= 4
    M = np.zeros((NP, Hm + 1))
    X = np.zeros((NP, Hm + 1))
    Y = np.broadcast_to((2.0 ** 1020) / hl[:, None],
                        (NP, Hm + 1)).copy()
    n_doubling = max(1, int(np.ceil(np.log2(max(Hm, 2)))))

    def shift1(a, k=1):
        out = np.zeros_like(a)
        out[:, k:] = a[:, :-k]
        return out

    for i in range(int(rl.max())):
        rb = reads[:, i][:, None]
        match = (hap_at == rb) | hap_ge4 | (rb >= 4)
        pqi = pq[:, i][:, None]
        prior = np.where(match, 1.0 - pqi, pqi / 3.0)
        t = tr[:, i]
        Mi = prior * (shift1(M) * t[:, MM, None] +
                      (shift1(X) + shift1(Y)) * t[:, GM, None])
        Xi = M * t[:, MX, None] + X * t[:, XX, None]
        u = shift1(Mi) * t[:, MY, None]
        cp = t[:, YY, None].copy()
        y = u
        k = 1
        for _ in range(n_doubling):
            y = y + cp * shift1(y, k)
            cp = cp * cp
            k <<= 1
        live = (i < rl)[:, None]
        M = np.where(live, Mi, M)
        X = np.where(live, Xi, X)
        Y = np.where(live, y, Y)
    acc = np.where(col_valid, M + X, 0.0).sum(axis=1)
    return np.log10(np.maximum(acc, np.finfo(np.float64).tiny)) \
        - LOG10_IC_F64


def _use_pallas() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # noqa: BLE001
        return False


def compute_log_likelihoods_async(reads, rlens, quals, i_quals, d_quals,
                                  c_quals, haps, hlens):
    """Dispatch the f32 device pass and return a collect() thunk that
    syncs, applies the f64 underflow fallback, and returns the numpy
    result — lets callers overlap host work (e.g. the next region's
    assembly) with the device computation."""
    import os
    if os.environ.get("FGDP_PAIRHMM_F64") == "1":
        # diagnosis knob (scripts/vcf_drift.py): run EVERY pair through
        # the f64 path to attribute golden-VCF LOD drift to f32
        # summation vs downstream pipeline order
        ph2pr64 = 10.0 ** (-np.arange(128) / 10.0)
        pq64 = ph2pr64[np.clip(quals, 0, 127)]
        tr64 = transitions(i_quals, d_quals, c_quals, np.float64)
        out = forward_f64(reads, rlens, pq64, tr64, haps, hlens)
        return lambda: out
    ph2pr32 = (10.0 ** (-np.arange(128) / 10.0)).astype(np.float32)
    pq32 = ph2pr32[np.clip(quals, 0, 127)]
    tr32 = transitions(i_quals, d_quals, c_quals, np.float32)
    cap = doubling_cap(c_quals)
    if _use_pallas():
        from .pairhmm_pallas import forward_f32_pallas as fwd
    else:
        fwd = forward_f32
    out_d, raw_d = fwd(jnp.asarray(reads, jnp.int32),
                       jnp.asarray(rlens, jnp.int32),
                       jnp.asarray(pq32), jnp.asarray(tr32),
                       jnp.asarray(haps, jnp.int32),
                       jnp.asarray(hlens, jnp.int32),
                       n_doubling_cap=cap)

    def collect():
        out = np.asarray(out_d).astype(np.float64)
        raw = np.asarray(raw_d)
        # unscaled result = raw / 2^120; fallback when < MIN_ACCEPTED
        bad = (raw.astype(np.float64) / (2.0 ** 120)) < MIN_ACCEPTED
        if bad.any():
            idx = np.flatnonzero(bad)
            ph2pr64 = 10.0 ** (-np.arange(128) / 10.0)
            pq64 = ph2pr64[np.clip(quals[idx], 0, 127)]
            tr64 = transitions(i_quals[idx], d_quals[idx], c_quals[idx],
                               np.float64)
            out[idx] = forward_f64(reads[idx], rlens[idx], pq64, tr64,
                                   haps[idx], hlens[idx])
        return out

    return collect


def compute_log_likelihoods(reads, rlens, quals, i_quals, d_quals, c_quals,
                            haps, hlens):
    """Full GKL semantics: f32 first, f64 rerun where the scaled result
    under-flowed (result < MIN_ACCEPTED after unscaling,
    IntelPairHmm.cc:340-349). Host-facing: numpy in/out. Uses the Pallas
    kernel on accelerators, the jnp row-loop on CPU (bit-identical)."""
    return compute_log_likelihoods_async(reads, rlens, quals, i_quals,
                                         d_quals, c_quals, haps, hlens)()
