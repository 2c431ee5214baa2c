"""Single-pass SMEM enumeration: backward search + LCP-tree shrink.

The TPU redesign of the LISA fork's SMEM engine (reference ext/TAL/src/
LISA-FMI/LISA_search.h all_SMEMs :365-385, forward_shrink_phase
:297-333). Where bwa-mem's K1 restarts a forward+backward pivot machine
for every anchor (ops/smem.py smem_all_pos — the reference's
mem_collect_intv), this enumerates a read's SMEMs right-to-left in ONE
pass: backward-extend until the interval empties, emit, ascend the
suffix tree via the LCP-interval arrays (index/lcptree.py) to the
deepest ancestor that CAN be prepended with the failing character, and
continue. Total work per read is O(read_len) extension steps plus a few
shrink steps per SMEM — against O(read_len x pivots) for the pivot
machine — and each lane is one read, so a [B]-lane machine replaces the
[B x anchors] frontier.

The loop alternates two inner waves so each wave's body carries only
its own gathers (occ rows for extension, tree rows for shrinking):
lanes out of phase idle for the tail of a wave, which costs far less
than issuing both gather sets every step.

SMEM-set parity with the pivot machine is tested in
tests/test_smem_lcp.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import fm as fmops
from .smem import SeedBatch, _append_seed, _empty_seeds

MODE_EXT = 0     # backward-extending
MODE_SHR = 1     # ascending the lcp tree
MODE_DEAD = 2


def smem_all_lcp(fm: fmops.DeviceFMIndex, tree, codes, lens, active,
                 min_seed_len: int, max_seeds: int) -> SeedBatch:
    """tree: int32[nrows+1, 4] (lcp, left, right, mask) from
    index/lcptree.py; codes int32[B, L]; lens int32[B]. Returns the
    read's SMEMs of length >= min_seed_len as a SeedBatch (m, n
    inclusive, k, s), unordered."""
    B, L = codes.shape
    N = tree.shape[0] - 1            # SA rows
    lens = lens.astype(jnp.int32)
    msl = jnp.int32(min_seed_len)

    st = dict(
        l=lens, r=lens,
        lo=jnp.zeros(B, jnp.int32), hi=jnp.full(B, N, jnp.int32),
        mode=jnp.where(active & (lens > 0), MODE_EXT, MODE_DEAD)
             .astype(jnp.int32),
        seeds=_empty_seeds(B, max_seeds),
    )
    zeros = jnp.zeros(B, jnp.int32)

    def ext_cond(st):
        return jnp.any(st["mode"] == MODE_EXT)

    def ext_body(st):
        l, r, lo, hi = st["l"], st["r"], st["lo"], st["hi"]
        act = st["mode"] == MODE_EXT
        at_end = act & (l == 0)
        lm1 = jnp.maximum(l - 1, 0)
        a = jnp.take_along_axis(codes, lm1[:, None], axis=1)[:, 0]
        valid_char = (a >= 0) & (a < 4)
        try_ext = act & ~at_end & valid_char
        k2, _, s2 = fmops.backward_extend(fm, lo, zeros, hi - lo, a)
        ok = try_ext & (s2 > 0)
        stuck = try_ext & ~(s2 > 0)
        badchar = act & ~at_end & ~valid_char
        # emit at every maximal point (end-of-read, interval-empty,
        # ambiguous char)
        emit = (at_end | stuck | badchar) & (r - l >= msl)
        seeds = st["seeds"]
        ovf = seeds.overflow | (emit & (seeds.count >= seeds.m.shape[1]))
        seeds = _append_seed(seeds, emit, l, r - 1, lo, hi - lo)
        seeds = seeds._replace(overflow=ovf)
        # skip-char: ambiguous base, or empty match that cannot extend
        # (character absent from the text) — restart just left of it
        empty = r == l
        skip = badchar | (stuck & empty)
        mode = jnp.where(at_end, MODE_DEAD,
                         jnp.where(stuck & ~empty, MODE_SHR, st["mode"]))
        new_l = jnp.where(ok | skip, l - 1, l)
        new_r = jnp.where(skip, l - 1, r)
        new_lo = jnp.where(ok, k2, jnp.where(skip, 0, lo))
        new_hi = jnp.where(ok, k2 + s2, jnp.where(skip, N, hi))
        return dict(l=new_l, r=new_r, lo=new_lo, hi=new_hi,
                    mode=mode.astype(jnp.int32), seeds=seeds)

    def shr_cond(st):
        return jnp.any(st["mode"] == MODE_SHR)

    def shr_body(st):
        act = st["mode"] == MODE_SHR
        l, lo, hi = st["l"], st["lo"], st["hi"]
        t_lo = jnp.take(tree, jnp.clip(lo, 0, N), axis=0)
        t_hi = jnp.take(tree, jnp.clip(hi, 0, N), axis=0)
        # ascend to the parent: dissolve the deeper endpoint
        pick_lo = t_lo[:, 0] >= t_hi[:, 0]
        e = jnp.where(pick_lo[:, None], t_lo, t_hi)
        d = jnp.maximum(e[:, 0], 0)
        a = jnp.take_along_axis(codes,
                                jnp.maximum(l - 1, 0)[:, None],
                                axis=1)[:, 0]
        can = ((e[:, 3] >> jnp.clip(a, 0, 3)) & 1) == 1
        new_lo = jnp.where(act, e[:, 1], lo)
        new_hi = jnp.where(act, e[:, 2], hi)
        new_r = jnp.where(act, l + d, st["r"])
        # d == 0 hands an unextendable root back to the extend wave,
        # whose empty-match path skips the character
        mode = jnp.where(act & (can | (d == 0)), MODE_EXT, st["mode"])
        return dict(l=l, r=new_r, lo=new_lo, hi=new_hi,
                    mode=mode.astype(jnp.int32), seeds=st["seeds"])

    def outer_cond(st):
        return jnp.any(st["mode"] != MODE_DEAD)

    def outer_body(st):
        st = jax.lax.while_loop(ext_cond, ext_body, st)
        st = jax.lax.while_loop(shr_cond, shr_body, st)
        return st

    st = jax.lax.while_loop(outer_cond, outer_body, st)
    return st["seeds"]
