"""K2 re-seeding via ISA jump + LCP-tree ascent — the fmi_shrink analogue.

The reference's K2 stage re-seeds long low-occurrence K1 SMEMs at their
midpoint x with min_intv = occ+1 (mem_collect_smem, reference
src/bwamem.cpp:1016-1040). Its LISA path implements the forward half
with `fmi_shrink` (ext/TAL/src/LISA-FMI/LISA_search.h:177,1345): rather
than re-running forward extension character by character, it SHRINKS the
already-known interval along the LCP structure until the occurrence
constraint is met.

This module is the full TPU generalization of that idea. A K2 job knows
an occurrence position of its parent K1 SMEM (the seed's SA entry), so
the interval of q[x..n] needs NO forward search at all:

  1. ISA jump: row = isa[pos_x] — the SA row of the text suffix at the
     occurrence of q[x..]; one gather.
  2. Tree ascent: walk up the LCP-interval tree (index/lcptree.py) to
     the minimal-depth ancestor with depth >= |q[x..n]|; that node's
     span IS the interval of q[x..n]. If its size is still < min_intv,
     keep ascending to the deepest ancestor with size >= min_intv —
     exactly fmi_shrink, 2 gather rows per step.
  3. Only jobs whose interval at q[x..n] already satisfies min_intv can
     extend FURTHER right than the parent SMEM; those few lanes run a
     short forward_extend2 machine (the doubled text is its own reverse
     complement, so the RC side of the bi-interval comes from a second
     ISA jump at the mirrored position 2*n_ref - pos - len).
  4. Backward pass: the K1 single-pass engine (ops/smem_lcp.py) with
     the death threshold generalized from s >= 1 to s >= min_intv and a
     stop when the match no longer covers x. Each job is ONE lane.

This replaces the round-4 design (forward sweep + per-entry independent
backward lanes, ops/smem_sweep.py smem_lanes_sweep) whose NK*bwd_mult
backward lane pool dominated K2 device time (README round-4 phase
split: ~50 ms of a 185 ms batch at B=4096, 131k lanes at bwd_mult=16).
Here the lane count is NK = B*k2_per_read (16x fewer), and the per-job
work is O(bwd span) instead of O(entries x bwd span).

Set parity with the sweep/wave machines (which are parity-tested
against the scalar transcription of FMI_search::getSMEMsOnePosOneThread)
is asserted in tests/test_smem_k2lcp.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import fm as fmops
from .smem import LaneSeeds, merge_lane_seeds
from .smem_sweep import _read_base_at

MODE_EXT = 0
MODE_SHR = 1
MODE_DEAD = 2

INT32_MAX = 2**31 - 1  # python int: literal, not a shared captured Array


def _lane_append(seeds: LaneSeeds, mask, m, n, k, s):
    SA = seeds.m.shape[1]
    can = mask & (seeds.count < SA)
    oh = (jnp.arange(SA, dtype=jnp.int32)[None, :]
          == seeds.count[:, None]) & can[:, None]
    upd = lambda dst, v: jnp.where(oh, v[:, None], dst)
    return LaneSeeds(
        m=upd(seeds.m, m), n=upd(seeds.n, n),
        k=upd(seeds.k, k), s=upd(seeds.s, s),
        count=seeds.count + can.astype(jnp.int32),
        overflow=seeds.overflow | (mask & (seeds.count >= SA)))


def _ascend(tree, N, row, on, depth_floor, size_goal, cap: int):
    """Walk up the LCP-interval tree from leaf [row, row+1).

    Ascends while the parent's depth >= depth_floor (locating the
    pattern's own interval) OR the current size < size_goal (the
    fmi_shrink relaxation). Returns (lo, hi, depth, ovf): the final
    node span, its effective depth (clipped to depth_floor), and a
    step-cap overflow flag."""
    st = dict(lo=row, hi=row + 1, dpt=jnp.full_like(row, INT32_MAX),
              go=on, steps=jnp.int32(0))

    def cond(st):
        return jnp.any(st["go"]) & (st["steps"] < cap)

    def body(st):
        t_lo = jnp.take(tree, jnp.clip(st["lo"], 0, N), axis=0)
        t_hi = jnp.take(tree, jnp.clip(st["hi"], 0, N), axis=0)
        pick_lo = t_lo[:, 0] >= t_hi[:, 0]
        e = jnp.where(pick_lo[:, None], t_lo, t_hi)
        pd = e[:, 0]
        s_cur = st["hi"] - st["lo"]
        accept = st["go"] & ((pd >= depth_floor) | (s_cur < size_goal))
        return dict(
            lo=jnp.where(accept, e[:, 1], st["lo"]),
            hi=jnp.where(accept, e[:, 2], st["hi"]),
            dpt=jnp.where(accept, pd, st["dpt"]),
            go=accept, steps=st["steps"] + 1)

    st = jax.lax.while_loop(cond, body, st)
    dpt = jnp.minimum(st["dpt"], depth_floor)
    return st["lo"], st["hi"], dpt, st["go"]


def k2_reseed_lcp(fm: fmops.DeviceFMIndex, tree, isa, codes, lens,
                  k_read, job_x, job_mi, job_pos, job_d0, k_on,
                  min_seed_len: int, B: int, max_seeds: int,
                  into=None, sj_cap: int = 16, ascent_cap: int = 64,
                  max_rounds: int = 48):
    """One K2 job per lane. job_pos: text position of the occurrence of
    q[job_x ..] backing the job (from the parent K1 seed's SA entry);
    job_d0 = parent_n - job_x + 1 (trusted match length from x).
    Returns the merged per-read SeedBatch (into=K1 seeds)."""
    NK = k_read.shape[0]
    N = tree.shape[0] - 1
    lens_l = lens[k_read]
    msl = jnp.int32(min_seed_len)
    l2ref = 2 * fm.n_ref

    # ---- 1+2. ISA jump + ascent to the interval of q[x..n] ----
    row = jnp.take(isa, jnp.clip(job_pos, 0, N - 1), mode="clip")
    lo, hi, dpt, asc_ovf = _ascend(tree, N, row, k_on, job_d0,
                                   job_mi, ascent_cap)

    # ---- 3. forward extension past the parent SMEM's right end ----
    # Only lanes whose q[x..n] interval meets min_intv can grow right of
    # n (dpt == d0 after the min() in _ascend); the RC-side interval
    # comes from the mirrored ISA jump (the fwd+rc doubled text is its
    # own reverse complement, so rc(q[x..n]) occurs at l2ref - pos - d0).
    n0 = job_x + dpt - 1
    fwd_need = k_on & (dpt >= job_d0) & (n0 + 1 < lens_l)
    mrow = jnp.take(isa, jnp.clip(l2ref - job_pos - job_d0, 0, N - 1),
                    mode="clip")
    mlo, _, _, masc_ovf = _ascend(
        tree, N, mrow, fwd_need, job_d0, jnp.ones_like(job_mi),
        ascent_cap)

    fst = dict(k=lo, l=mlo, s=hi - lo, n=n0, alive=fwd_need)

    def fcond(st):
        return jnp.any(st["alive"])

    def fbody(st):
        j = st["n"] + 1
        a = _read_base_at(codes, k_read, j)
        b = _read_base_at(codes, k_read, j + 1)
        (k1, l1, s1), (k2, l2, s2) = fmops.forward_extend2(
            fm, st["k"], st["l"], st["s"], a, b)
        ok0 = st["alive"] & (j < lens_l) & (a < 4) & (s1 >= job_mi)
        kA = jnp.where(ok0, k1, st["k"])
        lA = jnp.where(ok0, l1, st["l"])
        sA = jnp.where(ok0, s1, st["s"])
        nA = jnp.where(ok0, j, st["n"])
        j1 = j + 1
        ok1 = ok0 & (j1 < lens_l) & (b < 4) & (s2 >= job_mi)
        return dict(k=jnp.where(ok1, k2, kA),
                    l=jnp.where(ok1, l2, lA),
                    s=jnp.where(ok1, s2, sA),
                    n=jnp.where(ok1, j1, nA),
                    alive=ok1)

    fst = jax.lax.while_loop(fcond, fbody, fst)

    # ---- 4. backward single-pass with threshold min_intv ----
    l0 = job_x
    r0 = jnp.where(fwd_need, fst["n"] + 1, job_x + dpt)
    lo0 = jnp.where(fwd_need, fst["k"], lo)
    hi0 = jnp.where(fwd_need, fst["k"] + fst["s"], hi)
    zL = jnp.zeros((NK, sj_cap), jnp.int32)
    st = dict(
        l=l0, r=r0, lo=lo0, hi=hi0,
        lastl=jnp.full(NK, INT32_MAX, jnp.int32),
        mode=jnp.where(k_on, MODE_EXT, MODE_DEAD).astype(jnp.int32),
        seeds=LaneSeeds(m=zL, n=zL, k=zL, s=zL,
                        count=jnp.zeros(NK, jnp.int32),
                        overflow=jnp.zeros(NK, bool)),
    )

    def ext_body(st):
        l, r, lo_, hi_ = st["l"], st["r"], st["lo"], st["hi"]
        s = hi_ - lo_
        act = st["mode"] == MODE_EXT
        at_end = act & (l == 0)
        a = _read_base_at(codes, k_read, l - 1)
        b = _read_base_at(codes, k_read, l - 2)
        k1, s1, k2, s2 = fmops.backward_extend2(fm, lo_, s, a, b)
        va = a < 4
        try1 = act & ~at_end & va
        ok1 = try1 & (s1 >= job_mi)
        stuck1 = try1 & ~(s1 >= job_mi)
        bad1 = act & ~at_end & ~va          # N char: job cannot cross
        emit1 = (at_end | stuck1 | bad1) & (r - l >= msl) \
            & (l < st["lastl"])
        l1x = jnp.where(ok1, l - 1, l)
        lo1x = jnp.where(ok1, k1, lo_)
        hi1x = jnp.where(ok1, k1 + s1, hi_)

        # ---- step 2 (lanes that took step 1) ----
        at_end2 = ok1 & (l1x == 0)
        vb = b < 4
        bad2 = ok1 & ~at_end2 & ~vb
        try2 = ok1 & ~at_end2 & vb
        ok2 = try2 & (s2 >= job_mi)
        stuck2 = try2 & ~(s2 >= job_mi)
        emit2 = (at_end2 | stuck2 | bad2) & (r - l1x >= msl) \
            & (l1x < st["lastl"])
        seeds = _lane_append(st["seeds"], emit1 | emit2,
                             jnp.where(emit2, l1x, l), r - 1,
                             jnp.where(emit2, k1, lo_),
                             jnp.where(emit2, s1, s))
        lastl = jnp.where(emit1, l, jnp.where(emit2, l1x, st["lastl"]))
        l2x = jnp.where(ok2, l1x - 1, l1x)
        lo2x = jnp.where(ok2, k2, lo1x)
        hi2x = jnp.where(ok2, k2 + s2, hi1x)

        dead = at_end | bad1 | at_end2 | bad2
        to_shr = stuck1 | stuck2
        mode = jnp.where(dead, MODE_DEAD,
                         jnp.where(to_shr, MODE_SHR, st["mode"]))
        return dict(l=l2x, r=r, lo=lo2x, hi=hi2x, lastl=lastl,
                    mode=mode.astype(jnp.int32), seeds=seeds)

    def shr_body(st):
        act = st["mode"] == MODE_SHR
        l, lo_, hi_ = st["l"], st["lo"], st["hi"]
        t_lo = jnp.take(tree, jnp.clip(lo_, 0, N), axis=0)
        t_hi = jnp.take(tree, jnp.clip(hi_, 0, N), axis=0)
        pick_lo = t_lo[:, 0] >= t_hi[:, 0]
        e = jnp.where(pick_lo[:, None], t_lo, t_hi)
        d = jnp.maximum(e[:, 0], 0)
        new_r = l + d
        covers = new_r > job_x              # match must still contain x
        a = _read_base_at(codes, k_read, l - 1)
        can = ((e[:, 3] >> jnp.clip(a, 0, 3)) & 1) == 1
        mode = jnp.where(act & ~covers, MODE_DEAD,
                         jnp.where(act & can, MODE_EXT, st["mode"]))
        return dict(l=l,
                    r=jnp.where(act, new_r, st["r"]),
                    lo=jnp.where(act, e[:, 1], lo_),
                    hi=jnp.where(act, e[:, 2], hi_),
                    lastl=st["lastl"],
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

    ext_w, shr_w = wave(MODE_EXT, ext_body), wave(MODE_SHR, shr_body)

    def outer_cond(c):
        rnd, st = c
        return (rnd < max_rounds) & jnp.any(st["mode"] != MODE_DEAD)

    def outer_body(c):
        rnd, st = c
        return rnd + 1, shr_w(ext_w(st))

    rnd, st = jax.lax.while_loop(outer_cond, outer_body,
                                 (jnp.int32(0), st))
    unfinished = st["mode"] != MODE_DEAD

    lanes = st["seeds"]
    lane_ovf = lanes.overflow | asc_ovf | masc_ovf | unfinished
    seeds = merge_lane_seeds(lanes, k_read, jnp.zeros(NK, jnp.int32),
                             k_on, B, max_seeds, into=into)
    ovf = jnp.zeros(B, bool).at[k_read].max(lane_ovf & k_on, mode="drop")
    return seeds._replace(overflow=seeds.overflow | ovf)
