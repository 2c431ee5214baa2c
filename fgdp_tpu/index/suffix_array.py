"""Suffix-array construction (host side).

Plays the role of the reference's index builder (bwa-mem2-lcp uses BWT-SW
``bwt_bwtgen2`` + inverse-CSA SA sampling, src/bwtindex.cpp:197-233,
src/bwt.cpp:166). We construct the full suffix array directly with a
vectorized prefix-doubling algorithm (O(n log^2 n) numpy sorts) — simple,
deterministic, and fast enough for chr-scale references; a native SA-IS
builder can be slotted in behind the same function signature for WGS scale.
"""

from __future__ import annotations

import numpy as np


def suffix_array(codes: np.ndarray) -> np.ndarray:
    """SA of `codes` (values >= 0) under sentinel-terminated comparison.

    Returns int64[n]: SA[r] = start of the r-th smallest suffix. The
    virtual terminator is smaller than any symbol, so a proper prefix
    sorts before its extensions (out-of-range rank key = -1).

    Uses the native linear-time SA-IS (native/fgdp_native.cc
    suffix_array_u8) when available — O(n) time/memory, the WGS-scale
    path — with this prefix-doubling construction as the fallback.
    """
    n = len(codes)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    if np.asarray(codes).max(initial=0) < 255:
        from ..io import native
        sa = native.suffix_array_u8(np.asarray(codes, np.uint8))
        if sa is not None:
            return sa
    rank = codes.astype(np.int64)
    k = 1
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        if k < n:
            key2[: n - k] = rank[k:]
        sa = np.lexsort((key2, rank))
        # recompute ranks over the pair keys
        pair_changed = np.ones(n, dtype=np.int64)
        pair_changed[1:] = (rank[sa[1:]] != rank[sa[:-1]]) | (
            key2[sa[1:]] != key2[sa[:-1]]
        )
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[sa] = np.cumsum(pair_changed) - 1
        rank = new_rank
        if rank[sa[-1]] == n - 1:
            return sa.astype(np.int64)
        k <<= 1


def bwt_from_sa(codes: np.ndarray, sa: np.ndarray):
    """BWT of codes + sentinel.

    The BWT is over the n+1 rotations of (codes, $). Row 0 is the sentinel
    suffix. Returns (bwt_codes uint8[n+1], sentinel_row): bwt_codes holds a
    0 placeholder at sentinel_row (the row whose rotation ends with $,
    i.e. SA == 0); occ lookups correct for it via sentinel_row.
    """
    n = len(codes)
    full_sa = np.empty(n + 1, dtype=np.int64)
    full_sa[0] = n
    full_sa[1:] = sa
    prev = full_sa - 1  # char preceding each suffix
    bwt = np.zeros(n + 1, dtype=np.uint8)
    valid = prev >= 0
    bwt[valid] = codes[prev[valid]]
    sentinel_row = int(np.nonzero(~valid)[0][0])
    return bwt, sentinel_row, full_sa
