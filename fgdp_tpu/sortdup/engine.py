"""Device coordinate sort + duplicate marking.

The reference streams records through 100 range partitions with per-
partition std::sort and run-scans (sortmardup/main.cpp:129-360) — a CPU
memory workaround. On TPU the whole batch lives in HBM: one multi-key
`lax.sort` replaces partition+sort, a shifted-compare replaces the run
scan, and the `double_pair_indicator` bitmap (4x genome bits) becomes a
sorted-membership lookup (same semantics, no giant bitmap).

64-bit coordinates are carried as (hi, lo) int32 pairs so the engine runs
with or without x64 enabled.

Key semantics (tbb/pair.cpp:52-110, main.cpp:236-346):
  * DoublePair key  = (p5_min << 2 | orient, p5_max); orient in
    {FF,FR,RF,RR} by (strand of left end, strand of right end), RF -> FR
    when positions equal
  * SinglePair key  = p5 << 2 | (FF fwd / RR rev)
  * runs of equal keys sorted by (score desc, tile, X, Y): all but the
    first are duplicates; a single whose (p5, strand) matches any double
    end is a duplicate too
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_LO_BITS = 30
_LO_MASK = (1 << _LO_BITS) - 1


def split64(x):
    """int64 numpy/jnp -> (hi, lo) int32 (values < 2^61)."""
    return (x >> _LO_BITS).astype(jnp.int32), (x & _LO_MASK).astype(jnp.int32)


class DupResult(NamedTuple):
    dup_pair: jax.Array   # bool[n_pairs] aligned to input pair order


def mark_doubles(dbl_p5a_hi, dbl_p5a_lo, dbl_orient, dbl_p5b_hi,
                 dbl_p5b_lo, dbl_score, dbl_tile, dbl_x, dbl_y, dbl_valid):
    """Doubles sort + equal-key run scan -> dup bool[ND] (input order)."""
    ND = dbl_p5a_hi.shape[0]
    big = jnp.int32(2**31 - 1)
    # sort keys: (valid, p5a, orient, p5b) then score desc, tile, x, y
    inval = ~dbl_valid
    keys = (
        inval.astype(jnp.int32),
        jnp.where(dbl_valid, dbl_p5a_hi, big),
        jnp.where(dbl_valid, dbl_p5a_lo, big),
        jnp.where(dbl_valid, dbl_orient, big),
        jnp.where(dbl_valid, dbl_p5b_hi, big),
        jnp.where(dbl_valid, dbl_p5b_lo, big),
        -dbl_score, dbl_tile, dbl_x, dbl_y,
        jnp.arange(ND, dtype=jnp.int32),
    )
    sorted_keys = jax.lax.sort(keys, dimension=0, num_keys=10)
    sidx = sorted_keys[10]
    same = jnp.ones(ND, bool)
    for k in range(1, 6):
        same = same & (sorted_keys[k] == jnp.roll(sorted_keys[k], 1))
    same = same.at[0].set(False)
    dup_sorted = same & ~sorted_keys[0].astype(bool)
    return jnp.zeros(ND, bool).at[sidx].set(dup_sorted)


def indicator_keys(dbl_p5a_hi, dbl_p5a_lo, dbl_orient, dbl_p5b_hi,
                   dbl_p5b_lo, dbl_valid, ref_len_hi, ref_len_lo):
    """(p5 + strand*L) keys of every double end (the reference's
    double_pair_indicator bitmap, main.cpp:180-192) -> unsorted
    (hi, lo) int32[2*ND]; invalid lanes pushed to INT32_MAX."""
    big = jnp.int32(2**31 - 1)
    # left end strand: orient in {RF, RR} -> reverse; right end: {FR, RR}
    lrev = (dbl_orient >= 2).astype(jnp.int32)
    rrev = (dbl_orient & 1)
    def plus_l(hi, lo, rev):
        lo2 = lo + jnp.where(rev == 1, ref_len_lo, 0)
        hi2 = hi + jnp.where(rev == 1, ref_len_hi, 0) + (lo2 >> _LO_BITS)
        return hi2, lo2 & _LO_MASK
    ia_hi, ia_lo = plus_l(dbl_p5a_hi, dbl_p5a_lo, lrev)
    ib_hi, ib_lo = plus_l(dbl_p5b_hi, dbl_p5b_lo, rrev)
    ind_hi = jnp.concatenate([jnp.where(dbl_valid, ia_hi, big),
                              jnp.where(dbl_valid, ib_hi, big)])
    ind_lo = jnp.concatenate([jnp.where(dbl_valid, ia_lo, big),
                              jnp.where(dbl_valid, ib_lo, big)])
    return ind_hi, ind_lo


def mark_singles(sgl_p5_hi, sgl_p5_lo, sgl_rev, sgl_score, sgl_tile,
                 sgl_x, sgl_y, sgl_valid, ind_hi, ind_lo,
                 ref_len_hi, ref_len_lo):
    """Singles sort + run scan + indicator membership -> dup bool[NS].
    ind_hi/ind_lo must be sorted ascending."""
    NS = sgl_p5_hi.shape[0]
    big = jnp.int32(2**31 - 1)
    skeys = (
        (~sgl_valid).astype(jnp.int32),
        jnp.where(sgl_valid, sgl_p5_hi, big),
        jnp.where(sgl_valid, sgl_p5_lo, big),
        jnp.where(sgl_valid, sgl_rev, big),      # FF=0 / RR=3 — order only
        -sgl_score, sgl_tile, sgl_x, sgl_y,
        jnp.arange(NS, dtype=jnp.int32),
    )
    ss = jax.lax.sort(skeys, dimension=0, num_keys=8)
    s_sidx = ss[8]
    same_s = jnp.ones(NS, bool)
    for k in range(1, 4):
        same_s = same_s & (ss[k] == jnp.roll(ss[k], 1))
    same_s = same_s.at[0].set(False)
    head = ~same_s & ~ss[0].astype(bool)

    # head duplicate if its (p5 + strand*L) hits the indicator set
    th_lo = ss[2] + jnp.where(ss[3] > 0, ref_len_lo, 0)
    th_hi = ss[1] + jnp.where(ss[3] > 0, ref_len_hi, 0) + (th_lo >> _LO_BITS)
    th_lo = th_lo & _LO_MASK
    # membership: searchsorted over (hi, lo) — combine into monotonic key
    # via hi * 2^30 + lo would overflow int32; use lexicographic search:
    # find first index with (hi, lo) >= target, then compare equality.
    n_ind = ind_hi.shape[0]
    def bsearch(hhi, llo):
        lo_i = jnp.zeros_like(hhi)
        hi_i = jnp.full_like(hhi, n_ind)
        def step(_, c):
            lo_i, hi_i = c
            mid = (lo_i + hi_i) // 2
            mh = jnp.take(ind_hi, jnp.clip(mid, 0, n_ind - 1))
            ml = jnp.take(ind_lo, jnp.clip(mid, 0, n_ind - 1))
            lt = (mh < hhi) | ((mh == hhi) & (ml < llo))
            return (jnp.where(lt, mid + 1, lo_i), jnp.where(lt, hi_i, mid))
        lo_i, _ = jax.lax.fori_loop(0, 32, step, (lo_i, hi_i))
        return lo_i
    fidx = bsearch(th_hi, th_lo)
    fh = jnp.take(ind_hi, jnp.clip(fidx, 0, n_ind - 1))
    flo = jnp.take(ind_lo, jnp.clip(fidx, 0, n_ind - 1))
    hit = (fidx < n_ind) & (fh == th_hi) & (flo == th_lo)
    dup_sorted_s = (same_s | (head & hit)) & ~ss[0].astype(bool)
    return jnp.zeros(NS, bool).at[s_sidx].set(dup_sorted_s)


@jax.jit
def mark_duplicates(
    dbl_p5a_hi, dbl_p5a_lo, dbl_orient, dbl_p5b_hi, dbl_p5b_lo,
    dbl_score, dbl_tile, dbl_x, dbl_y, dbl_valid,
    sgl_p5_hi, sgl_p5_lo, sgl_rev, sgl_score, sgl_tile, sgl_x, sgl_y,
    sgl_valid, ref_len_hi, ref_len_lo,
):
    """Returns (dup_dbl bool[ND], dup_sgl bool[NS]) aligned to inputs.

    All inputs int32 device arrays; *_valid masks padding lanes.
    """
    dup_dbl = mark_doubles(dbl_p5a_hi, dbl_p5a_lo, dbl_orient, dbl_p5b_hi,
                           dbl_p5b_lo, dbl_score, dbl_tile, dbl_x, dbl_y,
                           dbl_valid)
    ind_hi, ind_lo = indicator_keys(dbl_p5a_hi, dbl_p5a_lo, dbl_orient,
                                    dbl_p5b_hi, dbl_p5b_lo, dbl_valid,
                                    ref_len_hi, ref_len_lo)
    ind_hi, ind_lo = jax.lax.sort((ind_hi, ind_lo), dimension=0, num_keys=2)
    dup_sgl = mark_singles(sgl_p5_hi, sgl_p5_lo, sgl_rev, sgl_score,
                           sgl_tile, sgl_x, sgl_y, sgl_valid, ind_hi,
                           ind_lo, ref_len_hi, ref_len_lo)
    return dup_dbl, dup_sgl


@jax.jit
def coordinate_sort_order(uc_hi, uc_lo, valid):
    """Stable order of records by unified coordinate (invalid last).
    Matches the stable_sort at sortmardup/main.cpp:350-356."""
    n = uc_hi.shape[0]
    big = jnp.int32(2**31 - 1)
    keys = ((~valid).astype(jnp.int32),
            jnp.where(valid, uc_hi, big), jnp.where(valid, uc_lo, big),
            jnp.arange(n, dtype=jnp.int32))
    out = jax.lax.sort(keys, dimension=0, num_keys=4, is_stable=True)
    return out[3]
