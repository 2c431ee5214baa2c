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
[B x anchors x entries] frontier of ops/smem_sweep.py.

Three alternating waves so each wave's body carries only its own
gathers (the fwd_sweep lesson: a fused body pays every branch's gather
rows every step):
  EXT   two-chars-per-step backward extension (backward_extend2, the
        lbwt dinucleotide rows — 2 gather rows per step)
  WALK  single-suffix lanes (s == 1): the interval is pinned to one
        text position, so extension is a packed-word text compare,
        WALK_T chars per step (the smem_sweep text-walk idea applied
        backward); re-entering the row space after a mismatch costs
        one inverse-SA gather
  SHR   LCP-tree ascent to the deepest extendable ancestor

SMEM-set parity with the pivot machine and the scalar oracle is tested
in tests/test_smem_lcp.py. Walk-resolved seeds carry the direct
position encoding k = -pos - 2 (consumers treat k < -1 as a position),
like ops/smem_sweep.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import fm as fmops
from .smem import SeedBatch, _append_seed, _empty_seeds
from .smem_sweep import WALK_T, pack_reads, read_window, _read_base_at
from ..index.reference import packed_window

MODE_EXT = 0     # backward-extending (s > 1)
MODE_SHR = 1     # ascending the lcp tree
MODE_DEAD = 2
MODE_WALK = 3    # single-suffix text walk (s == 1)


def smem_all_lcp(fm: fmops.DeviceFMIndex, tree, isa, codes, lens, active,
                 min_seed_len: int, max_seeds: int,
                 ref_codes16, max_rounds: int = 24) -> SeedBatch:
    """tree: int32[nrows+1, 4] (lcp, left, right, mask) and isa:
    int32[nrows] inverse SA from index/lcptree.py; codes int32[B, L];
    ref_codes16 the packed reference words (DeviceReference.codes16).
    Returns the read's SMEMs of length >= min_seed_len as a SeedBatch
    (m, n inclusive, k, s), unordered.

    Straggler control: each wave exits once its mode's population drops
    to 1/8 of the live lanes (leftovers ride the next round — a lone
    deep read must not hold 4k lanes' full-width gathers), and reads
    still live after `max_rounds` rounds flag overflow and are re-run
    by the host escalation ladder (pipeline._retry_overflow) with a
    doubled round budget."""
    B, L = codes.shape
    N = tree.shape[0] - 1            # SA rows
    lens = lens.astype(jnp.int32)
    msl = jnp.int32(min_seed_len)
    rid = jnp.arange(B, dtype=jnp.int32)
    rpacked = pack_reads(codes)
    l2ref = 2 * fm.n_ref             # text length (excl. sentinel)

    st = dict(
        l=lens, r=lens,
        lo=jnp.zeros(B, jnp.int32), hi=jnp.full(B, N, jnp.int32),
        pos=jnp.full(B, -1, jnp.int32),
        mode=jnp.where(active & (lens > 0), MODE_EXT, MODE_DEAD)
             .astype(jnp.int32),
        seeds=_empty_seeds(B, max_seeds),
    )

    def make_phase(rid, lens_l, round_cap):
        return _lcp_phase(fm, tree, isa, codes, rpacked, ref_codes16,
                          rid, lens_l, msl, N, l2ref, round_cap)

    # Straggler-compaction cascade: the bulk of reads finishes in a few
    # rounds; the tail (reads with many mismatch-shrink event cycles)
    # must not keep paying full-B-width gathers per wave step. After
    # each bounded phase, live lanes compact (stable) into a machine a
    # quarter the width, seeds rows riding along.
    rounds = (10, 14, max_rounds)
    st = make_phase(rid, lens, rounds[0])(st)
    cur_rid = rid
    dropped = jnp.zeros(B, bool)
    for level, rcap in enumerate(rounds[1:], start=1):
        NC = max(B >> (2 * level - 1), 8)   # B/2, then B/8
        live = st["mode"] != MODE_DEAD
        if int(live.shape[0]) <= NC:
            st = make_phase(cur_rid, lens[cur_rid], rcap)(st)
            continue
        perm = jnp.argsort(~live, stable=True).astype(jnp.int32)
        keep, rest = perm[:NC], perm[NC:]
        dropped = dropped.at[cur_rid[rest]].max(live[rest], mode="drop")
        sub = {f: st[f][keep] for f in ("l", "r", "lo", "hi", "pos",
                                        "mode")}
        sub["mode"] = jnp.where(live[keep], sub["mode"], MODE_DEAD)
        sub["seeds"] = jax.tree_util.tree_map(lambda a: a[keep],
                                              st["seeds"])
        sub_rid = cur_rid[keep]
        sub = make_phase(sub_rid, lens[sub_rid], rcap)(sub)
        nst = {f: st[f].at[keep].set(sub[f])
               for f in ("l", "r", "lo", "hi", "pos", "mode")}
        nst["seeds"] = jax.tree_util.tree_map(
            lambda a, b: a.at[keep].set(b), st["seeds"], sub["seeds"])
        # lanes dropped from the sub machine keep their old (live) mode
        nst["mode"] = nst["mode"].at[rest].set(
            jnp.where(live[rest], st["mode"][rest], MODE_DEAD))
        st = nst

    # reads still live at the cascade end flag for the host escalation
    # ladder (pipeline._retry_overflow), which re-runs them with a
    # scaled round budget
    unfinished = jnp.zeros(B, bool).at[cur_rid].max(
        st["mode"] != MODE_DEAD, mode="drop")
    seeds = st["seeds"]
    return seeds._replace(
        overflow=seeds.overflow | unfinished | dropped)


def _lcp_phase(fm, tree, isa, codes, rpacked, ref_codes16, rid, lens_l,
               msl, N, l2ref, round_cap):
    """One bounded run of the EXT/WALK/SHR wave alternation over the
    lanes `rid` (reads rid[i]; per-lane state arrays index i)."""

    def ext_body(st):
        l, r, lo, hi = st["l"], st["r"], st["lo"], st["hi"]
        s = hi - lo
        act = st["mode"] == MODE_EXT
        at_end = act & (l == 0)
        a = _read_base_at(codes, rid, l - 1)
        b = _read_base_at(codes, rid, l - 2)
        k1, s1, k2, s2 = fmops.backward_extend2(fm, lo, s, a, b)
        va = a < 4
        try1 = act & ~at_end & va
        ok1 = try1 & (s1 > 0)
        stuck1 = try1 & ~(s1 > 0)
        bad1 = act & ~at_end & ~va
        # emit at step-1 maximal points (end-of-read, interval-empty,
        # ambiguous char): pre-state [l, r) with interval [lo, hi)
        emit1 = (at_end | stuck1 | bad1) & (r - l >= msl)
        seeds = st["seeds"]
        empty1 = r == l
        skip1 = bad1 | (stuck1 & empty1)       # restart left of the char
        to_shr1 = stuck1 & ~empty1
        l1x = jnp.where(ok1 | skip1, l - 1, l)
        r1x = jnp.where(skip1, l - 1, r)
        lo1x = jnp.where(ok1, k1, jnp.where(skip1, 0, lo))
        hi1x = jnp.where(ok1, k1 + s1, jnp.where(skip1, N, hi))
        to_walk1 = ok1 & (s1 == 1)
        cont = ok1 & (s1 > 1)

        # ---- step 2 (only lanes that took step 1 with s1 > 1) ----
        at_end2 = cont & (l1x == 0)
        vb = b < 4
        bad2 = cont & ~at_end2 & ~vb
        try2 = cont & ~at_end2 & vb
        ok2 = try2 & (s2 > 0)
        stuck2 = try2 & ~(s2 > 0)
        emit2 = (at_end2 | stuck2 | bad2) & (r - l1x >= msl)
        # step-1 and step-2 emissions are mutually exclusive (emit2
        # requires ok1, emit1 requires not): one fused append
        seeds = _append_seed(seeds, emit1 | emit2,
                             jnp.where(emit2, l1x, l), r - 1,
                             jnp.where(emit2, k1, lo),
                             jnp.where(emit2, s1, s))
        skip2 = bad2
        to_shr2 = stuck2
        l2x = jnp.where(ok2 | skip2, l1x - 1, l1x)
        r2x = jnp.where(skip2, l1x - 1, r1x)
        lo2x = jnp.where(ok2, k2, jnp.where(skip2, 0, lo1x))
        hi2x = jnp.where(ok2, k2 + s2, jnp.where(skip2, N, hi1x))
        to_walk2 = ok2 & (s2 == 1)

        dead = at_end | at_end2
        to_shr = to_shr1 | to_shr2
        to_walk = to_walk1 | to_walk2
        mode = jnp.where(dead, MODE_DEAD,
                jnp.where(to_shr, MODE_SHR,
                 jnp.where(to_walk, MODE_WALK, st["mode"])))
        # walk lanes init pos lazily (pos < 0) in the walk wave
        pos = jnp.where(to_walk, -1, st["pos"])
        return dict(l=l2x, r=r2x, lo=lo2x, hi=hi2x, pos=pos,
                    mode=mode.astype(jnp.int32), seeds=seeds)

    def walk_body(st):
        act = st["mode"] == MODE_WALK
        l, r, lo = st["l"], st["r"], st["lo"]
        pos = jnp.where(act & (st["pos"] < 0),
                        fmops.sa_lookup(fm, st["lo"]), st["pos"])
        # compare q[l-1-j] vs text[pos-1-j], j = 0..WALK_T-1
        rb = read_window(rpacked, rid, l - WALK_T, lens_l,
                         WALK_T)[:, ::-1]
        tb = packed_window(ref_codes16, l2ref, pos - WALK_T, WALK_T,
                           reverse=True)
        okw = (rb == tb) & (rb < 4) & (tb < 4)
        hasbad = jnp.any(~okw, axis=1)
        d = jnp.where(hasbad, jnp.argmax(~okw, axis=1),
                      WALK_T).astype(jnp.int32)
        l2 = l - d
        pos2 = pos - d
        stop = act & hasbad
        at_start = stop & (l2 == 0)
        rb_d = jnp.take_along_axis(
            rb, jnp.clip(d, 0, WALK_T - 1)[:, None], axis=1)[:, 0]
        badchar = stop & ~at_start & (rb_d >= 4)   # read N at q[l2-1]
        mism = stop & ~at_start & ~badchar         # mismatch / text end
        emit = stop & (r - l2 >= msl)
        seeds = _append_seed(st["seeds"], emit, l2, r - 1, -pos2 - 2,
                             jnp.ones_like(l2))
        # mism lanes re-enter row space at the single suffix's SA row
        loI = jnp.take(isa, jnp.clip(pos2, 0, N - 1), mode="clip")
        new_l = jnp.where(act, jnp.where(badchar, l2 - 1, l2), l)
        new_r = jnp.where(badchar, l2 - 1, r)
        new_lo = jnp.where(mism, loI, jnp.where(badchar, 0, lo))
        new_hi = jnp.where(mism, loI + 1,
                           jnp.where(badchar, N, st["hi"]))
        mode = jnp.where(at_start, MODE_DEAD,
                jnp.where(mism, MODE_SHR,
                 jnp.where(badchar, MODE_EXT, st["mode"])))
        new_pos = jnp.where(act, jnp.where(stop, -1, pos2), st["pos"])
        return dict(l=new_l, r=new_r, lo=new_lo, hi=new_hi, pos=new_pos,
                    mode=mode.astype(jnp.int32), seeds=seeds)

    def shr_body(st):
        act = st["mode"] == MODE_SHR
        l, lo, hi = st["l"], st["lo"], st["hi"]
        t_lo = jnp.take(tree, jnp.clip(lo, 0, N), axis=0)
        t_hi = jnp.take(tree, jnp.clip(hi, 0, N), axis=0)
        # ascend to the parent: dissolve the deeper endpoint
        pick_lo = t_lo[:, 0] >= t_hi[:, 0]
        e = jnp.where(pick_lo[:, None], t_lo, t_hi)
        d = jnp.maximum(e[:, 0], 0)
        a = _read_base_at(codes, rid, l - 1)
        can = ((e[:, 3] >> jnp.clip(a, 0, 3)) & 1) == 1
        new_lo = jnp.where(act, e[:, 1], lo)
        new_hi = jnp.where(act, e[:, 2], hi)
        new_r = jnp.where(act, l + d, st["r"])
        # d == 0 hands an unextendable root back to the extend wave,
        # whose empty-match path skips the character
        mode = jnp.where(act & (can | (d == 0)), MODE_EXT, st["mode"])
        return dict(l=l, r=new_r, lo=new_lo, hi=new_hi, pos=st["pos"],
                    mode=mode.astype(jnp.int32), seeds=st["seeds"])

    def wave(m, body):
        def run(st):
            def cond(s_):
                cm = jnp.sum((s_["mode"] == m).astype(jnp.int32))
                live = jnp.sum((s_["mode"] != MODE_DEAD)
                               .astype(jnp.int32))
                return cm > (live >> 3)
            return jax.lax.while_loop(cond, body, st)
        return run

    ext_w, walk_w, shr_w = (wave(MODE_EXT, ext_body),
                            wave(MODE_WALK, walk_body),
                            wave(MODE_SHR, shr_body))

    def outer_cond(c):
        rnd, st = c
        return (rnd < round_cap) & jnp.any(st["mode"] != MODE_DEAD)

    def outer_body(c):
        rnd, st = c
        return rnd + 1, shr_w(walk_w(ext_w(st)))

    def run(st):
        return jax.lax.while_loop(outer_cond, outer_body,
                                  (jnp.int32(0), st))[1]
    return run
