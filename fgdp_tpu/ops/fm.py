"""Batched FM-index rank/extension ops (device side).

The reference extends ONE bi-interval per call with SSE popcounts
(bwa-mem2-lcp/src/bwt.cpp:278-1065, ext/TAL FMI_search.cpp backwardExt
:1841). The TPU design instead extends a whole batch of intervals per
step: each occ lookup is a 2-gather from the HBM-resident checkpoint
tables, and the within-block rank is a vectorized 2-bit compare +
`lax.population_count` on the VPU — every lane of the batch advances one
step per call. Seeding drivers in ops/smem.py chain these steps under
`lax.while_loop` with active-lane masking.

All interval coordinates are int32 (valid while text < 2^31; larger
references are sharded — see parallel/).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..index.fmindex import FMIndex, OCC_BLOCK

assert OCC_BLOCK == 16, "device kernels assume one uint32 word per block"

_EVEN = np.uint32(0x55555555)


class DeviceFMIndex(NamedTuple):
    """FM-index arrays resident in HBM. See index/fmindex.py for layout.

    The checkpoint counts and the packed BWT word of each block are fused
    into ONE row (cols 0-3 counts, col 4 word) so every rank query costs a
    single gather row — XLA/TPU gathers are row-count-bound, and random
    HBM gathers are the dominant cost of FM search (SURVEY §7.3 #1).
    """

    counts: jax.Array        # int32[5]   C array (sentinel rank 0)
    occ_fused: jax.Array     # int32[nblocks, 8]: [c0..c3, word, pad x3]
    sa: jax.Array            # int32[N]   full suffix array
    sentinel_row: jax.Array  # int32 scalar
    n_ref: jax.Array         # int32 scalar (forward reference length)
    text_len: jax.Array      # int32 scalar N = 2*n_ref + 1

    @classmethod
    def from_host(cls, fm: FMIndex) -> "DeviceFMIndex":
        import numpy as _np
        nblocks = fm.occ.shape[0]
        fused = _np.zeros((nblocks, 8), _np.int32)
        fused[:, :4] = fm.occ
        fused[:, 4] = fm.bwt_words.view(_np.int32)
        return cls(
            counts=jnp.asarray(fm.counts, jnp.int32),
            occ_fused=jnp.asarray(fused),
            sa=jnp.asarray(fm.sa, jnp.int32),
            sentinel_row=jnp.int32(fm.sentinel_row),
            n_ref=jnp.int32(fm.n_ref),
            text_len=jnp.int32(fm.text_len),
        )


def occ4(fm: DeviceFMIndex, i: jax.Array) -> jax.Array:
    """Occ(c, i) for all four bases at once; i int32[...] -> int32[..., 4].

    One fused checkpoint-row gather per position; the four per-base
    in-block ranks come from the row's word via masked popcounts.
    """
    i = i.astype(jnp.int32)
    blk = i >> 4
    rem = (i & 15).astype(jnp.uint32)
    row = jnp.take(fm.occ_fused, blk, axis=0, mode="clip")     # (..., 8)
    base = row[..., :4]
    word = row[..., 4].astype(jnp.uint32)
    b0 = word & _EVEN
    b1 = (word >> 1) & _EVEN
    prefix = (jnp.uint32(1) << (rem << 1)) - jnp.uint32(1)     # bits of codes < rem
    cnts = []
    for c in range(4):
        m0 = b0 if (c & 1) else ~b0
        m1 = b1 if (c & 2) else ~b1
        m = m0 & m1 & _EVEN & prefix
        cnts.append(jax.lax.population_count(m).astype(jnp.int32))
    inblock = jnp.stack(cnts, axis=-1)
    out = base + inblock
    # the sentinel is packed as code 0; uncount it left of position i
    sent_fix = (i > fm.sentinel_row).astype(jnp.int32)
    return out.at[..., 0].add(-sent_fix)


def backward_extend(fm: DeviceFMIndex, k, l, s, c):
    """Prepend base c to the pattern of bi-interval (k, l, s); batched.

    bwa bwt_extend(is_back=1) semantics (reference src/bwt.cpp; TAL
    FMI_search.cpp backwardExt:1841). c int32[...] in 0..3; lanes with
    s <= 0 or invalid c must be masked by the caller (outputs are then
    meaningless but finite).
    """
    k = k.astype(jnp.int32)
    s = s.astype(jnp.int32)
    occ_lo = occ4(fm, k)
    occ_hi = occ4(fm, k + s)
    sizes = occ_hi - occ_lo                                    # (..., 4)
    sent_in = ((k <= fm.sentinel_row) & (fm.sentinel_row < k + s)).astype(jnp.int32)
    l3 = l + sent_in
    l2 = l3 + sizes[..., 3]
    l1 = l2 + sizes[..., 2]
    l0 = l1 + sizes[..., 1]
    ls = jnp.stack([l0, l1, l2, l3], axis=-1)
    cc = jnp.clip(c, 0, 3).astype(jnp.int32)
    new_k = jnp.take(fm.counts, cc) + jnp.take_along_axis(
        occ_lo, cc[..., None], axis=-1)[..., 0]
    new_l = jnp.take_along_axis(ls, cc[..., None], axis=-1)[..., 0]
    new_s = jnp.take_along_axis(sizes, cc[..., None], axis=-1)[..., 0]
    return new_k, new_l, new_s


def forward_extend(fm: DeviceFMIndex, k, l, s, c):
    """Append base c to the pattern: backward extension of the
    reverse-complement interval with k/l swapped (FMI_search.cpp:1218-1227)."""
    bk, bl, bs = backward_extend(fm, l, k, s, 3 - jnp.clip(c, 0, 3))
    return bl, bk, bs


def init_interval(fm: DeviceFMIndex, c):
    """Bi-interval of the single-base pattern c (batched)."""
    cc = jnp.clip(c, 0, 3).astype(jnp.int32)
    k = jnp.take(fm.counts, cc)
    s = jnp.take(fm.counts, cc + 1) - k
    l = jnp.take(fm.counts, 3 - cc)
    return k, l, s


def sa_lookup(fm: DeviceFMIndex, idx):
    """SA[idx] gather — single hop thanks to the full int32 SA (the
    reference walks sampled SA or uses packed 34-bit entries, bwt.h:72)."""
    return jnp.take(fm.sa, idx, axis=0, mode="clip")
