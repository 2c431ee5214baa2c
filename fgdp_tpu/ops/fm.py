"""Batched FM-index rank/extension ops (device side).

The reference extends ONE bi-interval per call with SSE popcounts
(bwa-mem2-lcp/src/bwt.cpp:278-1065, ext/TAL FMI_search.cpp backwardExt
:1841). The TPU design instead extends a whole batch of intervals per
step: each occ lookup is a gather from the HBM-resident fused checkpoint
rows, and the within-block rank is a vectorized 2-bit compare +
`lax.population_count` on the VPU — every lane of the batch advances per
call. Seeding drivers in ops/smem.py chain these steps under
`lax.while_loop` with active-lane masking.

Two-step ("lambert") extension: one fused row holds single-char AND
dinucleotide checkpoints plus both packed BWT columns (B, B1), so the
same two gathers that answer a 1-step extension also answer the 2-step
extension — the TPU analogue of the fork's Occline + forward/
backwardExtensionTwoStep kernels (src/bwt.h:64-67, src/bwt.cpp:278-1065).
The dependent-gather chain of SMEM search halves.

All interval coordinates are int32 (valid while text < 2^31; larger
references are sharded — see parallel/).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..index.fmindex import FMIndex, OCC_BLOCK

assert OCC_BLOCK == 32, "device kernels assume two uint32 words per block"

_EVEN = np.uint32(0x55555555)
_FULL = np.uint32(0xFFFFFFFF)


class DeviceFMIndex(NamedTuple):
    """FM-index arrays resident in HBM. See index/fmindex.py for layout.

    occ_fused row (24 x int32 per 32-suffix block): cols 0-3 single-char
    cumulative counts, 4-19 dinucleotide cumulative counts, 20-21 packed
    B words, 22-23 packed B1 words. One gather row answers every rank
    query an extension needs — XLA/TPU gathers are row-count-bound, and
    random HBM gathers are the dominant cost of FM search (SURVEY §7.3).
    """

    counts: jax.Array        # int32[5]   C array (sentinel rank 0)
    c2: jax.Array            # int32[17]  dinucleotide first-row array
    occ_fused: jax.Array     # int32[nblocks, 24]
    sa: jax.Array            # int32[N]   full suffix array
    sentinel_row: jax.Array  # int32 scalar (r0: B packs $ as code 0)
    r1_row: jax.Array        # int32 scalar (B1 packs $ as code 0)
    cc_r0: jax.Array         # int32 scalar: spurious pair code at r0
    cc_r1: jax.Array         # int32 scalar: spurious pair code at r1
    n_ref: jax.Array         # int32 scalar (forward reference length)
    text_len: jax.Array      # int32 scalar N = 2*n_ref + 1

    @classmethod
    def from_host(cls, fm: FMIndex) -> "DeviceFMIndex":
        nblocks = fm.occ.shape[0]
        fused = np.zeros((nblocks, 24), np.int32)
        fused[:, :4] = fm.occ
        fused[:, 4:20] = fm.occ2
        fused[:, 20:22] = fm.bwt_words.view(np.int32)
        fused[:, 22:24] = fm.bwt1_words.view(np.int32)
        return cls(
            counts=jnp.asarray(fm.counts, jnp.int32),
            c2=jnp.asarray(fm.c2, jnp.int32),
            occ_fused=jnp.asarray(fused),
            sa=jnp.asarray(fm.sa, jnp.int32),
            sentinel_row=jnp.int32(fm.sentinel_row),
            r1_row=jnp.int32(fm.r1_row),
            cc_r0=jnp.int32(fm.cc_r0),
            cc_r1=jnp.int32(fm.cc_r1),
            n_ref=jnp.int32(fm.n_ref),
            text_len=jnp.int32(fm.text_len),
        )


def _sel(b0, b1, c):
    """Bit mask (even positions) of codes == c in a packed word, from its
    precomputed low/high bitplanes."""
    m0 = b0 if (c & 1) else ~b0
    m1 = b1 if (c & 2) else ~b1
    return m0 & m1 & _EVEN


def _prefix_masks(rem):
    """Per-word in-block prefix masks for rem in [0, 32]: bits of code
    slots < rem. Returns (mask_w0, mask_w1) uint32."""
    rem = rem.astype(jnp.int32)
    b0 = jnp.clip(rem, 0, 16).astype(jnp.uint32)
    b1 = jnp.clip(rem - 16, 0, 16).astype(jnp.uint32)

    def mk(bits):
        return jnp.where(bits >= 16, _FULL,
                         (jnp.uint32(1) << (bits << 1)) - jnp.uint32(1))

    return mk(b0), mk(b1)


class _RowRanks(NamedTuple):
    """Decoded fused checkpoint row at position i (everything an
    extension needs from one gather)."""

    occ1: jax.Array          # int32[..., 4]  sentinel-corrected
    occ2c: jax.Array         # int32[..., 4]  pairs (c1, c2fix), c1 = 0..3
    i: jax.Array


def _fetch(fm: DeviceFMIndex, i, c2fix):
    """Gather + decode the checkpoint row at i. occ1 for all 4 chars;
    occ2 for the 4 dinucleotides whose SECOND char is c2fix (the only
    column a 2-step extension ever needs: backward fixes c2 = the first
    prepended char, forward fixes c2 = 3 - first appended char)."""
    i = i.astype(jnp.int32)
    blk = i >> 5
    rem = (i & 31).astype(jnp.uint32)
    row = jnp.take(fm.occ_fused, blk, axis=0, mode="clip")     # (..., 24)
    base1 = row[..., :4]
    base2 = row[..., 4:20]
    words = row[..., 20:24].astype(jnp.uint32)
    p0, p1 = _prefix_masks(rem)
    planes = []
    for w in range(4):
        ww = words[..., w]
        planes.append((ww & _EVEN, (ww >> 1) & _EVEN))
    pref = (p0, p1)

    def popc2(mask_fn):
        tot = jnp.zeros(i.shape, jnp.int32)
        for w in range(2):
            m = mask_fn(w) & pref[w]
            tot = tot + jax.lax.population_count(m).astype(jnp.int32)
        return tot

    # occ1: rank of each char in B
    cnts = [popc2(lambda w, c=c: _sel(planes[w][0], planes[w][1], c))
            for c in range(4)]
    occ1 = base1 + jnp.stack(cnts, axis=-1)
    sent_fix = (i > fm.sentinel_row).astype(jnp.int32)
    occ1 = occ1.at[..., 0].add(-sent_fix)

    # occ2: pairs (c1, c2fix) — B mask for c2fix AND B1 mask for c1
    c2fix = jnp.clip(c2fix, 0, 3).astype(jnp.int32)
    oh2 = (jnp.arange(4, dtype=jnp.int32) == c2fix[..., None])
    mB = []
    for w in range(2):
        opts = jnp.stack(
            [_sel(planes[w][0], planes[w][1], c) for c in range(4)],
            axis=-1)
        mB.append(jnp.sum(jnp.where(oh2, opts, jnp.uint32(0)), axis=-1))
    cnts2 = [popc2(lambda w, c1=c1: mB[w]
                   & _sel(planes[w + 2][0], planes[w + 2][1], c1))
             for c1 in range(4)]
    ccs = jnp.arange(4, dtype=jnp.int32)[None, :] * 4 + c2fix[..., None]
    base2sel = jnp.sum(
        jnp.where(ccs[..., None] == jnp.arange(16, dtype=jnp.int32),
                  base2[..., None, :], 0), axis=-1)
    occ2c = base2sel + jnp.stack(cnts2, axis=-1)
    # subtract the spurious sentinel pairs (r0: B=$ packed 0; r1: B1=$)
    fix0 = ((ccs == fm.cc_r0) & (i > fm.sentinel_row)[..., None])
    fix1 = ((ccs == fm.cc_r1) & (i > fm.r1_row)[..., None])
    occ2c = occ2c - fix0.astype(jnp.int32) - fix1.astype(jnp.int32)
    return _RowRanks(occ1=occ1, occ2c=occ2c, i=i)


def occ4(fm: DeviceFMIndex, i: jax.Array) -> jax.Array:
    """Occ(c, i) for all four bases at once; i int32[...] -> int32[..., 4]."""
    return _fetch(fm, i, jnp.zeros(jnp.shape(i), jnp.int32)).occ1


def _pick(v, c):
    """v[..., c] for dynamic c via one-hot select (no gather)."""
    oh = jnp.arange(v.shape[-1], dtype=jnp.int32) == c[..., None]
    return jnp.sum(jnp.where(oh, v, 0), axis=-1)


def _bwd_from_ranks(fm, lo: _RowRanks, hi: _RowRanks, l, c):
    """backward_extend given decoded rows at k and k+s."""
    sizes = hi.occ1 - lo.occ1
    sent_in = ((lo.i <= fm.sentinel_row)
               & (fm.sentinel_row < hi.i)).astype(jnp.int32)
    l3 = l + sent_in
    l2 = l3 + sizes[..., 3]
    l1 = l2 + sizes[..., 2]
    l0 = l1 + sizes[..., 1]
    ls = jnp.stack([l0, l1, l2, l3], axis=-1)
    cc = jnp.clip(c, 0, 3).astype(jnp.int32)
    new_k = jnp.take(fm.counts, cc) + _pick(lo.occ1, cc)
    return new_k, _pick(ls, cc), _pick(sizes, cc)


def backward_extend(fm: DeviceFMIndex, k, l, s, c):
    """Prepend base c to the pattern of bi-interval (k, l, s); batched.

    bwa bwt_extend(is_back=1) semantics (reference src/bwt.cpp; TAL
    FMI_search.cpp backwardExt:1841). c int32[...] in 0..3; lanes with
    s <= 0 or invalid c must be masked by the caller (outputs are then
    meaningless but finite).
    """
    k = k.astype(jnp.int32)
    s = s.astype(jnp.int32)
    cc = jnp.clip(c, 0, 3).astype(jnp.int32)
    lo = _fetch(fm, k, cc)
    hi = _fetch(fm, k + s, cc)
    return _bwd_from_ranks(fm, lo, hi, l, cc)


def _sel_dyn(b0, b1, c):
    """Bit mask (even positions) of codes == c for a DYNAMIC char c
    (broadcast against the bitplanes): XOR flips planes where the target
    bit is 0, so matches become set bits."""
    e0 = jnp.where((c & 1) == 1, jnp.uint32(0), _EVEN)
    e1 = jnp.where((c & 2) == 2, jnp.uint32(0), _EVEN)
    return (b0 ^ e0) & (b1 ^ e1) & _EVEN


def _fetch_pair(fm: DeviceFMIndex, i, c2, pair):
    """Lean row decode for the backward direction: only Occ(c2, i) and
    Occ2((c1, c2), i) — four masked popcounts per position instead of
    the full 16 of _fetch. Returns (occ1_c2, occ2_pair)."""
    i = i.astype(jnp.int32)
    blk = i >> 5
    rem = (i & 31).astype(jnp.uint32)
    row = jnp.take(fm.occ_fused, blk, axis=0, mode="clip")
    base1 = _pick(row[..., :4], c2)
    base2 = _pick(row[..., 4:20], pair)
    words = row[..., 20:24].astype(jnp.uint32)
    p0, p1 = _prefix_masks(rem)
    pref = (p0, p1)
    c1 = pair >> 2
    n1 = jnp.zeros(i.shape, jnp.int32)
    n2 = jnp.zeros(i.shape, jnp.int32)
    for w in range(2):
        ww = words[..., w]
        mB = _sel_dyn(ww & _EVEN, (ww >> 1) & _EVEN, c2)
        w1 = words[..., w + 2]
        mB1 = _sel_dyn(w1 & _EVEN, (w1 >> 1) & _EVEN, c1)
        n1 = n1 + jax.lax.population_count(mB & pref[w]).astype(jnp.int32)
        n2 = n2 + jax.lax.population_count(mB & mB1
                                           & pref[w]).astype(jnp.int32)
    occ1 = base1 + n1 - ((c2 == 0) & (i > fm.sentinel_row)).astype(jnp.int32)
    occ2 = base2 + n2 \
        - ((pair == fm.cc_r0) & (i > fm.sentinel_row)).astype(jnp.int32) \
        - ((pair == fm.cc_r1) & (i > fm.r1_row)).astype(jnp.int32)
    return occ1, occ2


def backward_extend2(fm: DeviceFMIndex, k, s, c2, c1):
    """Prepend base c2, then base c1 (pattern P -> c1 c2 P), from the
    same two gathers — the fork's backwardExtensionTwoStepFs
    (src/bwt.cpp:822-1065). No RC bound is produced (dead in the
    backward SMEM phase). Returns (k1, s1, k2, s2): the intermediate
    interval after c2 and the final after c1 c2.
    """
    k = k.astype(jnp.int32)
    s = s.astype(jnp.int32)
    cc2 = jnp.clip(c2, 0, 3).astype(jnp.int32)
    cc1 = jnp.clip(c1, 0, 3).astype(jnp.int32)
    pair = cc1 * 4 + cc2
    o1lo, o2lo = _fetch_pair(fm, k, cc2, pair)
    o1hi, o2hi = _fetch_pair(fm, k + s, cc2, pair)
    k1 = jnp.take(fm.counts, cc2) + o1lo
    s1 = o1hi - o1lo
    k2 = jnp.take(fm.c2, pair) + o2lo
    s2 = o2hi - o2lo
    return k1, s1, k2, s2


def forward_extend(fm: DeviceFMIndex, k, l, s, c):
    """Append base c to the pattern: backward extension of the
    reverse-complement interval with k/l swapped (FMI_search.cpp:1218-1227)."""
    bk, bl, bs = backward_extend(fm, l, k, s, 3 - jnp.clip(c, 0, 3))
    return bl, bk, bs


def forward_extend2(fm: DeviceFMIndex, k, l, s, ca, cb):
    """Append base ca, then cb (pattern P -> P·ca·cb), from the same two
    gathers — the fork's forwardExtensionTwoStepFsRs (src/bwt.cpp:278-649).
    Returns ((k1, l1, s1), (k2, l2, s2)): intermediate and final
    bi-intervals."""
    k = k.astype(jnp.int32)
    l = l.astype(jnp.int32)
    s = s.astype(jnp.int32)
    ca3 = 3 - jnp.clip(ca, 0, 3).astype(jnp.int32)   # RC of first char
    cb3 = 3 - jnp.clip(cb, 0, 3).astype(jnp.int32)
    lo = _fetch(fm, l, ca3)
    hi = _fetch(fm, l + s, ca3)
    # intermediate: backward extension on the RC side by 3-ca
    bl1, bk1, s1 = _bwd_from_ranks(fm, lo, hi, k, ca3)
    # (bl1 = new l-coordinate start, bk1 = new k) after the swap:
    k1, l1 = bk1, bl1
    # final: 2-step prepend (3-cb)(3-ca) on the RC side
    pair = cb3 * 4 + ca3
    l2 = jnp.take(fm.c2, pair) + _pick(lo.occ2c, cb3)
    s2fwd_rc = hi.occ2c - lo.occ2c        # indexed by c1 = 3-d'
    s2 = _pick(s2fwd_rc, cb3)
    # forward sub-partition of [k1, k1+s1): '$' continuation first, then
    # increasing continuation char d' (= reversed c1 order)
    s2fwd = s2fwd_rc[..., ::-1]           # indexed by d'
    end2 = s1 - jnp.sum(s2fwd, axis=-1)
    cbc = jnp.clip(cb, 0, 3).astype(jnp.int32)
    before = jnp.sum(
        jnp.where(jnp.arange(4, dtype=jnp.int32) < cbc[..., None],
                  s2fwd, 0), axis=-1)
    k2 = k1 + end2 + before
    return (k1, l1, s1), (k2, l2, s2)


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
