"""Batched SMEM seeding — SPMD state machines over whole read batches.

The reference computes SMEMs one read at a time with data-dependent loops
and early exits (FMI_search::getSMEMsOnePosOneThread /
getSMEMsAllPosOneThread / bwtSeedStrategyAllPosOneThread, reference
ext/TAL/src/FMI/FMI_search.cpp:1170-1488; driver mem_collect_smem
src/bwamem.cpp:771-869). The TPU design runs the *same* per-read state
machine simultaneously on every lane of a read batch under
`lax.while_loop`, with active-lane masking; every step issues one batched
FM-extension (two HBM checkpoint gathers per interval) for all lanes at
once. Semantics are transcription-exact: tests compare against the scalar
port in testing/oracles.py lane for lane.

Seed output layout (fixed shape, per read): (start m, end n inclusive,
SA-interval k, interval size s) + per-read count. Overflow beyond the
buffer capacity is dropped and flagged (the reference's arrays are sized
to worst case; ours trade capacity for static shape).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import fm as fmops
from .fm import DeviceFMIndex

class SeedBatch(NamedTuple):
    """Fixed-shape per-read seed buffers."""

    m: jax.Array        # int32[B, S] query start
    n: jax.Array        # int32[B, S] query end (inclusive)
    k: jax.Array        # int32[B, S] SA interval start
    s: jax.Array        # int32[B, S] SA interval size
    count: jax.Array    # int32[B]
    overflow: jax.Array  # bool[B]


def _empty_seeds(B, S):
    z = jnp.zeros((B, S), jnp.int32)
    return SeedBatch(m=z, n=z, k=z, s=z, count=jnp.zeros(B, jnp.int32),
                     overflow=jnp.zeros(B, bool))


def _append_seed(seeds: SeedBatch, mask, m, n, k, s):
    """Masked per-lane append into the seed buffers.

    One-hot select instead of scatter: row scatters serialize on TPU and
    dominate loop-body cost; a [B, S] select vectorizes on the VPU."""
    B, S = seeds.m.shape
    can = mask & (seeds.count < S)
    oh = (jnp.arange(S)[None, :] == seeds.count[:, None]) & can[:, None]
    upd = lambda dst, v: jnp.where(oh, v[:, None], dst)
    return SeedBatch(
        m=upd(seeds.m, m),
        n=upd(seeds.n, n),
        k=upd(seeds.k, k),
        s=upd(seeds.s, s),
        count=seeds.count + can.astype(jnp.int32),
        overflow=seeds.overflow | (mask & (seeds.count >= S)),
    )


def _prev_push(pm, pn, pk, ps, num_prev, push, P, m, n, k, s):
    """Masked push of (m, n, k, s) onto each lane's prev stack via a
    one-hot select (scatters serialize on TPU). Returns updated arrays +
    num_prev. The RC-interval bound l is NOT stacked: the backward phase
    only ever extends backward, so l is dead there."""
    can = push & (num_prev < P)
    oh = (jnp.arange(P)[None, :] == num_prev[:, None]) & can[:, None]
    upd = lambda dst, v: jnp.where(oh, v[:, None], dst)
    return (upd(pm, m), upd(pn, n), upd(pk, k), upd(ps, s),
            jnp.minimum(num_prev + push.astype(jnp.int32), P))


def _read_base(codes, j):
    """codes[b, j_b] with out-of-range -> 4 (ambiguous sentinel)."""
    B, L = codes.shape
    jj = jnp.clip(j, 0, L - 1)
    a = jnp.take_along_axis(codes, jj[:, None], axis=1)[:, 0].astype(jnp.int32)
    return jnp.where((j >= 0) & (j < L), a, 4)


def _text_window(ref_codes, ref_codes16, l_pac, start, T: int,
                 reverse: bool = False):
    """Contiguous text window [NL, T]: packed-word fetch (16 codes per
    gather row) when the caller supplies the packed doubled-space words,
    else elementwise _text_base."""
    if ref_codes16 is not None:
        from ..index.reference import packed_window
        return packed_window(ref_codes16, 2 * l_pac, start, T, reverse)
    tgrid = jnp.arange(T, dtype=jnp.int32)[None, :]
    tp = start[:, None] + ((T - 1) - tgrid if reverse else tgrid)
    return _text_base(ref_codes, l_pac, tp)


def _text_base(ref_codes, l_pac, p):
    """Char at position p of the FM text (fwd reference + revcomp;
    sentinel / out of range -> 4). Lets s==1 intervals extend by direct
    text comparison instead of occ lookups."""
    fwd = p < l_pac
    idx = jnp.where(fwd, p, 2 * l_pac - 1 - p)
    c = jnp.take(ref_codes, jnp.clip(idx, 0, l_pac - 1),
                 mode="clip").astype(jnp.int32)
    c = jnp.where(fwd, c, 3 - c)
    return jnp.where((p >= 0) & (p < 2 * l_pac), c, jnp.int32(4))


def _fwd_phase(fm: DeviceFMIndex, ref_codes, l_pac, L, x, lens_l, min_intv,
               read_base, read_grid, started, P, two_step: bool = True,
               ref_codes16=None):
    """Forward phase of getSMEMsOnePosOneThread (FMI_search.cpp:1201-1260)
    over independent lanes, with a single-suffix fast path.

    Once an interval narrows to s == 1, (k, s) are invariant under
    further matching forward extensions (the interval is one fixed
    suffix), and no prev pushes occur until the match ends — so the lane
    pauses in the occ-lookup loop and its full remaining extension is
    resolved afterwards by ONE SA lookup + vectorized text comparison.
    Push/next_x semantics are bit-identical to the plain loop.

    read_base(j) -> int32[NL]; read_grid(jt int32[NL, T]) -> int32[NL, T]
    (both with 4 = out-of-buffer/ambiguous). Returns dict(pm, pn, pk, ps,
    num_prev, povf, next_x) with prev reversed (longest match first).
    """
    NL = x.shape[0]
    a0 = read_base(x)
    k0, l0, s0 = fmops.init_interval(fm, a0)
    pz = jnp.zeros((NL, P), jnp.int32)
    fwd0 = dict(
        t=jnp.int32(0),
        k=k0, l=l0, s=jnp.where(started, s0, 0), n=x,
        num_prev=jnp.zeros(NL, jnp.int32),
        pm=pz, pn=pz, pk=pz, ps=pz,
        next_x=x + 1,
        alive=started,
        povf=jnp.zeros(NL, bool),
    )

    def fwd_cond(st):
        return jnp.any(st["alive"] & (st["s"] > 1)) & (st["t"] < L)

    def fwd_body_1step(st):
        j = x + 1 + st["t"]
        stepping = st["alive"] & (st["s"] > 1)
        in_range = stepping & (j < lens_l)
        a = read_base(j)
        ext = in_range & (a < 4)
        nk, nl, ns = fmops.forward_extend(fm, st["k"], st["l"], st["s"], a)
        push = ext & (ns != st["s"])
        povf = st["povf"] | (push & (st["num_prev"] >= P))
        pm, pn, pk, ps, num_prev = _prev_push(
            st["pm"], st["pn"], st["pk"], st["ps"],
            st["num_prev"], push, P, x, st["n"], st["k"], st["s"])
        die = ext & (ns < min_intv)
        take = ext & ~die
        next_x = jnp.where(in_range, j + 1, st["next_x"])
        next_x = jnp.where(die, j, next_x)
        return dict(
            t=st["t"] + 1,
            k=jnp.where(take, nk, st["k"]),
            l=jnp.where(take, nl, st["l"]),
            s=jnp.where(take, ns, st["s"]),
            n=jnp.where(take, j, st["n"]),
            num_prev=num_prev, pm=pm, pn=pn, pk=pk, ps=ps,
            next_x=next_x,
            alive=jnp.where(stepping, take, st["alive"]),
            povf=povf,
        )

    def fwd_body(st):
        # two-step ("lambert") extension: chars j0, j1 resolve from the
        # same two checkpoint gathers (fm.forward_extend2); the two
        # sequential sub-steps are replayed exactly on the results
        j0 = x + 1 + st["t"]
        j1 = j0 + 1
        stepping = st["alive"] & (st["s"] > 1)
        a0 = read_base(j0)
        a1 = read_base(j1)
        (k1, l1, s1), (k2, l2, s2) = fmops.forward_extend2(
            fm, st["k"], st["l"], st["s"], a0, a1)

        # ---- sub-step 0: char a0 at j0 ----
        in_range0 = stepping & (j0 < lens_l)
        ext0 = in_range0 & (a0 < 4)
        push0 = ext0 & (s1 != st["s"])
        povf = st["povf"] | (push0 & (st["num_prev"] >= P))
        pm, pn, pk, ps, num_prev = _prev_push(
            st["pm"], st["pn"], st["pk"], st["ps"],
            st["num_prev"], push0, P, x, st["n"], st["k"], st["s"])
        die0 = ext0 & (s1 < min_intv)
        take0 = ext0 & ~die0
        next_x = jnp.where(in_range0, j0 + 1, st["next_x"])
        next_x = jnp.where(die0, j0, next_x)
        kA = jnp.where(take0, k1, st["k"])
        lA = jnp.where(take0, l1, st["l"])
        sA = jnp.where(take0, s1, st["s"])
        nA = jnp.where(take0, j0, st["n"])
        aliveA = jnp.where(stepping, take0, st["alive"])

        # ---- sub-step 1: char a1 at j1 (only lanes that took a0) ----
        in_range1 = take0 & (j1 < lens_l)
        ext1 = in_range1 & (a1 < 4)
        push1 = ext1 & (s2 != sA)
        povf = povf | (push1 & (num_prev >= P))
        pm, pn, pk, ps, num_prev = _prev_push(
            pm, pn, pk, ps, num_prev, push1, P, x, nA, kA, sA)
        die1 = ext1 & (s2 < min_intv)
        take1 = ext1 & ~die1
        next_x = jnp.where(in_range1, j1 + 1, next_x)
        next_x = jnp.where(die1, j1, next_x)
        return dict(
            t=st["t"] + 2,
            k=jnp.where(take1, k2, kA),
            l=jnp.where(take1, l2, lA),
            s=jnp.where(take1, s2, sA),
            n=jnp.where(take1, j1, nA),
            num_prev=num_prev, pm=pm, pn=pn, pk=pk, ps=ps,
            next_x=next_x,
            alive=jnp.where(take0, take1, aliveA),
            povf=povf,
        )

    st = jax.lax.while_loop(fwd_cond,
                            fwd_body if two_step else fwd_body_1step, fwd0)

    # ---- fast-path epilogue: resolve paused single-suffix lanes ----
    paused = st["alive"] & (st["s"] == 1) & started
    pos = fmops.sa_lookup(fm, st["k"])
    depth = st["n"] - x + 1
    tgrid = jnp.arange(L, dtype=jnp.int32)[None, :]
    jt = (st["n"] + 1)[:, None] + tgrid
    rb = read_grid(jt)
    rb = jnp.where(jt < lens_l[:, None], rb, 4)
    tb = _text_window(ref_codes, ref_codes16, l_pac, pos + depth, L)
    ok = (rb == tb) & (rb < 4) & (tb < 4)
    stop_t = jnp.argmax(~ok, axis=1).astype(jnp.int32)
    n_new = st["n"] + stop_t
    jd = n_new + 1
    rb_stop = jnp.take_along_axis(rb, stop_t[:, None], axis=1)[:, 0]
    is_end = jd >= lens_l                 # ran off the read
    is_amb = ~is_end & (rb_stop >= 4)     # ambiguous read base: no push
    nx_fast = jnp.where(is_end, lens_l, jnp.where(is_amb, jd + 1, jd))
    n_fin = jnp.where(paused, n_new, st["n"])
    next_x = jnp.where(paused, nx_fast, st["next_x"])
    # interval-death push (mismatch): pre-state (x, n, k, s=1), exactly
    # the in-loop push the paused lane would have made
    push_c = paused & ~is_end & ~is_amb
    povf = st["povf"] | (push_c & (st["num_prev"] >= P))
    pm, pn, pk, ps, num_prev = _prev_push(
        st["pm"], st["pn"], st["pk"], st["ps"],
        st["num_prev"], push_c, P, x, n_fin, st["k"], st["s"])

    # final push of the last interval (FMI_search.cpp:1249-1254)
    push = started & (st["s"] >= min_intv)
    pm, pn, pk, ps, num_prev = _prev_push(
        pm, pn, pk, ps, num_prev, push, P, x, n_fin, st["k"], st["s"])

    # reverse prev so longest matches (smallest intervals) come first
    ridx = jnp.clip(num_prev[:, None] - 1 - jnp.arange(P)[None, :], 0, P - 1)
    rev = lambda a: jnp.take_along_axis(a, ridx, axis=1)
    return dict(pm=rev(pm), pn=rev(pn), pk=rev(pk), ps=rev(ps),
                num_prev=num_prev, povf=povf, next_x=next_x)


# --------------------------------------------------------------------------
# Shared backward-phase engine (pyramid widths)
# --------------------------------------------------------------------------
#
# The prev stack starts deep (~one entry per distinct interval size seen
# during forward extension, typically 10-12) but collapses within a few
# backward steps: intervals that shrink to the same size are deduped and
# the smallest die. Extending all `prev_cap` lanes every step wastes HBM
# gather rows (the dominant cost — see ops/fm.py). So the backward loop
# runs as a pyramid: full width until every live lane's stack fits the
# next width, then the arrays are sliced and a narrower loop continues.
# Results are bit-identical to a single full-width loop.

_BWD_TIERS = (8, 3)


def _bwd_eligible(st, min_intv):
    """Lanes whose stack collapsed to one single-suffix entry: all
    remaining backward steps are a text comparison (the stack collapses
    quickly — once every entry's pattern is unique, the s==1 run dedups
    to one entry)."""
    return st["alive"] & (st["num_prev"] == 1) & \
        (st["ps"][:, 0] == 1) & (min_intv == 1)


def _bwd_pyramid(fm: DeviceFMIndex, ref_codes, l_pac, L, x, min_intv,
                 min_seed_len, read_base, read_grid, st, emit,
                 prev_cap: int, two_step: bool = True, ref_codes16=None):
    """Run the backward phase of getSMEMsOnePosOneThread
    (FMI_search.cpp:1262-1339) over independent lanes.

    read_base(j) -> int32[NL] base codes (4 = out of range / ambiguous);
    read_grid(jt int32[NL, T]) -> int32[NL, T] likewise;
    st: dict(t, num_prev, pm, pn, pk, ps, alive, seeds);
    emit(seeds, mask, m, n, k, s) -> seeds. Returns the final st.
    The RC bound l is not tracked: the backward phase never forward-
    extends, so l is write-only here.

    Lanes whose stack collapses to a single s==1 entry leave the loop
    and finish analytically (single-suffix fast path): the emitted seed
    carries the text position directly, encoded as k = -pos - 2
    (consumers treat k < -1 as a direct position; the true rank would
    need an inverse SA).
    """
    NL = st["num_prev"].shape[0]

    def make_body(P):
        parange = jnp.arange(P)[None, :]

        def emit_round(seeds, proc, cand, die_ok, em_m, em_n, em_k, em_s):
            """Emission for one backward char: the first entry that
            either survives or dies-with-output decides it."""
            has_cand = jnp.any(cand, axis=1)
            pstar = jnp.argmax(cand, axis=1)
            pstar_die = jnp.take_along_axis(
                die_ok, pstar[:, None], axis=1)[:, 0]
            do_emit = proc & has_cand & pstar_die
            take1 = lambda v: jnp.take_along_axis(
                v, pstar[:, None], axis=1)[:, 0]
            return emit(seeds, do_emit, take1(em_m), take1(em_n),
                        take1(em_k), take1(em_s))

        def body_1step(st):
            j = x - 1 - st["t"]
            stepping = st["alive"] & ~_bwd_eligible(st, min_intv)
            in_range = stepping & (j >= 0)
            a = read_base(j)
            proc = in_range & (a < 4)

            c = jnp.broadcast_to(a[:, None], (NL, P))
            nk, _, ns = fmops.backward_extend(
                fm, st["pk"], st["ps"], st["ps"], c)   # l input is dead
            validp = parange < st["num_prev"][:, None]
            survive = validp & (ns >= min_intv[:, None])
            plen = st["pn"] - st["pm"] + 1
            die_ok = validp & ~survive & (plen >= min_seed_len)
            seeds2 = emit_round(st["seeds"], proc, survive | die_ok,
                                die_ok, st["pm"], st["pn"], st["pk"],
                                st["ps"])
            first_surv = survive & (jnp.cumsum(survive.astype(jnp.int32),
                                               axis=1) == 1)
            prev_ns = jnp.concatenate(
                [jnp.full((NL, 1), -1, jnp.int32), ns[:, :-1]], axis=1)
            keep = survive & (first_surv | (ns != prev_ns))
            perm = jnp.argsort(
                jnp.where(keep, parange, P + parange), axis=1)
            compact = lambda src: jnp.take_along_axis(src, perm, axis=1)
            npm = jnp.broadcast_to(j[:, None], (NL, P))
            ncount = jnp.sum(keep, axis=1).astype(jnp.int32)
            return dict(
                t=st["t"] + 1,
                num_prev=jnp.where(proc, ncount, st["num_prev"]),
                pm=jnp.where(proc[:, None], npm, st["pm"]),
                pn=jnp.where(proc[:, None], compact(st["pn"]), st["pn"]),
                pk=jnp.where(proc[:, None], compact(nk), st["pk"]),
                ps=jnp.where(proc[:, None], compact(ns), st["ps"]),
                alive=jnp.where(stepping, proc & (ncount > 0),
                                st["alive"]),
                seeds=seeds2,
            )

        if not two_step:
            return body_1step

        def body(st):
            # two backward chars per gather pair: prepend q[j] (occ1 of
            # the fused rows), then q[j-1] (occ2) — backward_extend2.
            # Both rounds run on the UNCOMPACTED entry axis; sizes are
            # monotone along the nested stack, so adjacent-slot dedup is
            # exact without an intermediate compaction, and one argsort
            # per pair of chars suffices.
            j = x - 1 - st["t"]
            stepping = st["alive"] & ~_bwd_eligible(st, min_intv)
            in_range = stepping & (j >= 0)
            a = read_base(j)
            b = read_base(j - 1)
            proc0 = in_range & (a < 4)

            ca = jnp.broadcast_to(a[:, None], (NL, P))
            cb = jnp.broadcast_to(b[:, None], (NL, P))
            nk1, ns1, nk2, ns2 = fmops.backward_extend2(
                fm, st["pk"], st["ps"], ca, cb)

            # ---- round 1: char a at j ----
            validp = parange < st["num_prev"][:, None]
            survive1 = validp & (ns1 >= min_intv[:, None])
            plen = st["pn"] - st["pm"] + 1
            die_ok1 = validp & ~survive1 & (plen >= min_seed_len)
            seeds2 = emit_round(st["seeds"], proc0, survive1 | die_ok1,
                                die_ok1, st["pm"], st["pn"], st["pk"],
                                st["ps"])
            first1 = survive1 & (jnp.cumsum(survive1.astype(jnp.int32),
                                            axis=1) == 1)
            shift = lambda v: jnp.concatenate(
                [jnp.full((NL, 1), -1, jnp.int32), v[:, :-1]], axis=1)
            keep1 = survive1 & (first1 | (ns1 != shift(ns1)))
            ncount1 = jnp.sum(keep1, axis=1).astype(jnp.int32)
            alive0 = jnp.where(stepping, proc0 & (ncount1 > 0),
                               st["alive"])

            # ---- round 2: char b at j-1, on round-1 keepers ----
            proc1 = alive0 & stepping & (j - 1 >= 0) & (b < 4)
            survive2 = keep1 & (ns2 >= min_intv[:, None])
            plen2 = st["pn"] - j[:, None] + 1   # pm after round 1 is j
            die_ok2 = keep1 & ~survive2 & (plen2 >= min_seed_len)
            jb = jnp.broadcast_to(j[:, None], (NL, P))
            seeds2 = emit_round(seeds2, proc1, survive2 | die_ok2,
                                die_ok2, jb, st["pn"], nk1, ns1)
            first2 = survive2 & (jnp.cumsum(survive2.astype(jnp.int32),
                                            axis=1) == 1)
            keep2 = survive2 & (first2 | (ns2 != shift(ns2)))
            ncount2 = jnp.sum(keep2, axis=1).astype(jnp.int32)
            # an ambiguous second char KILLS the lane (the one-step body
            # and the reference break on N); without this the next
            # iteration would skip the N and extend across it
            amb_kill = alive0 & stepping & (j - 1 >= 0) & (b >= 4)
            alive1 = jnp.where(proc1, ncount2 > 0, alive0 & ~amb_kill)

            # ---- one compaction for both rounds ----
            two = proc1
            keepF = jnp.where(two[:, None], keep2, keep1)
            pkF = jnp.where(two[:, None], nk2, nk1)
            psF = jnp.where(two[:, None], ns2, ns1)
            pmF = jnp.where(two, j - 1, j)
            perm = jnp.argsort(
                jnp.where(keepF, parange, P + parange), axis=1)
            compact = lambda src: jnp.take_along_axis(src, perm, axis=1)
            proc = proc0
            sel = lambda new, old: jnp.where(proc[:, None], new, old)
            ncountF = jnp.where(two, ncount2, ncount1)

            return dict(
                t=st["t"] + 2,
                num_prev=jnp.where(proc, ncountF, st["num_prev"]),
                pm=jnp.where(proc[:, None],
                             jnp.broadcast_to(pmF[:, None], (NL, P)),
                             st["pm"]),
                pn=sel(compact(st["pn"]), st["pn"]),
                pk=sel(compact(pkF), st["pk"]),
                ps=sel(compact(psF), st["ps"]),
                alive=alive1,
                seeds=seeds2,
            )

        return body

    widths = [prev_cap] + [w for w in _BWD_TIERS if w < prev_cap]
    for i, P in enumerate(widths):
        nxt = widths[i + 1] if i + 1 < len(widths) else 0

        def cond(st, nxt=nxt):
            active = st["alive"] & ~_bwd_eligible(st, min_intv)
            go = jnp.any(active) & (st["t"] < L)
            if nxt:
                depth = jnp.max(jnp.where(active, st["num_prev"], 0))
                go &= depth > nxt
            return go

        st = jax.lax.while_loop(cond, make_body(P), st)
        if nxt:
            # every live lane's stack now fits in `nxt` entries; dead
            # lanes only ever contribute pm/pn/pk/ps[:, 0] afterwards
            for f in ("pm", "pn", "pk", "ps"):
                st[f] = st[f][:, :nxt]

    # ---- single-suffix epilogue: finish eligible lanes by direct
    # leftward text comparison, one emission each ----
    elig = _bwd_eligible(st, min_intv)
    pm0 = st["pm"][:, 0]
    pn0 = st["pn"][:, 0]
    pos = fmops.sa_lookup(fm, st["pk"][:, 0])
    tgrid = jnp.arange(L, dtype=jnp.int32)[None, :]
    jt = pm0[:, None] - 1 - tgrid
    rb = read_grid(jt)
    tb = _text_window(ref_codes, ref_codes16, l_pac, pos - L, L,
                      reverse=True)
    ok = (rb == tb) & (rb < 4) & (tb < 4)
    lcp = jnp.argmax(~ok, axis=1).astype(jnp.int32)
    pm_new = pm0 - lcp
    do_emit = elig & (pn0 - pm_new + 1 >= min_seed_len)
    k_enc = -(pos - lcp) - 2
    st["seeds"] = emit(st["seeds"], do_emit, pm_new, pn0, k_enc,
                       jnp.ones(NL, jnp.int32))
    st["num_prev"] = jnp.where(elig, 0, st["num_prev"])
    st["alive"] = st["alive"] & ~elig
    return st


# --------------------------------------------------------------------------
# One-anchor SMEM pass (getSMEMsOnePosOneThread parity)
# --------------------------------------------------------------------------

def smem_one_pos(fm: DeviceFMIndex, ref_codes, l_pac, codes, lens, x,
                 min_intv, active, min_seed_len: int, seeds: SeedBatch,
                 prev_cap: int, two_step: bool = True, ref_codes16=None):
    """Run one anchor pass for every active lane.

    codes: int32[B, L]; lens, x, min_intv: int32[B]; active: bool[B];
    ref_codes/l_pac: the packed forward reference (for the single-suffix
    fast path). Returns (seeds', next_x int32[B]).
    """
    B, L = codes.shape
    P = prev_cap

    a0 = _read_base(codes, x)
    started = active & (a0 < 4) & (x < lens)

    def read_grid(jt):
        a = jnp.take_along_axis(codes, jnp.clip(jt, 0, L - 1),
                                axis=1).astype(jnp.int32)
        return jnp.where((jt >= 0) & (jt < L), a, 4)

    fw = _fwd_phase(fm, ref_codes, l_pac, L, x, lens, min_intv,
                    lambda j: _read_base(codes, j), read_grid, started, P,
                    two_step=two_step, ref_codes16=ref_codes16)
    next_x = fw["next_x"]

    # ---- backward phase (pyramid widths) ----
    bwd0 = dict(
        t=jnp.int32(0),
        num_prev=fw["num_prev"], pm=fw["pm"], pn=fw["pn"], pk=fw["pk"],
        ps=fw["ps"],
        alive=started & (fw["num_prev"] > 0),
        seeds=seeds._replace(overflow=seeds.overflow | fw["povf"]),
    )
    st = _bwd_pyramid(fm, ref_codes, l_pac, L, x, min_intv, min_seed_len,
                      lambda j: _read_base(codes, j), read_grid, bwd0,
                      _append_seed, P, two_step=two_step,
                      ref_codes16=ref_codes16)

    # final emission: surviving prev[0] (FMI_search.cpp:1330-1339)
    final = started & (st["num_prev"] > 0)
    fl = st["pn"][:, 0] - st["pm"][:, 0] + 1
    emit = final & (fl >= min_seed_len)
    seeds = _append_seed(st["seeds"], emit, st["pm"][:, 0], st["pn"][:, 0],
                         st["pk"][:, 0], st["ps"][:, 0])
    return seeds, next_x


# --------------------------------------------------------------------------
# Anchor-parallel K1: anchor discovery + flattened one-pos lanes
# --------------------------------------------------------------------------
#
# getSMEMsAllPosOneThread walks anchors sequentially (x' = next_x from the
# forward pass). That serial chain is the throughput killer on SPMD: ~20
# anchors x ~300 lockstep steps each. Instead: (1) a light forward machine
# computes next_x(x) for EVERY position at once, (2) pointer doubling
# extracts the anchor chain from x=0, (3) the full one-pos machine runs
# with one lane per (read, anchor) — ~300 lockstep steps total.


def anchor_next_x(fm: DeviceFMIndex, codes, lens):
    """next_x(x) for all positions: int32[B, L+1] (entry L = terminator).
    Matches the forward-phase next_x of getSMEMsOnePosOneThread
    (FMI_search.cpp:1170-1260) with min_intv=1."""
    B, L = codes.shape
    xs = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None, :], (B, L))
    flat = lambda a: a.reshape(-1)
    x = flat(xs)
    ridx = flat(jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None],
                                 (B, L)))
    lens_l = lens[ridx]
    a0 = _read_base_at(codes, ridx, x)
    k0, l0, s0 = fmops.init_interval(fm, a0)
    started = (a0 < 4) & (x < lens_l)

    st = dict(t=jnp.int32(0), k=k0, l=l0,
              s=jnp.where(started, s0, 0),
              next_x=x + 1, alive=started)

    def cond(st):
        return jnp.any(st["alive"]) & (st["t"] < L)

    def body(st):
        # two chars per step from the same gathers (forward_extend2)
        j0 = x + 1 + st["t"]
        j1 = j0 + 1
        a0 = _read_base_at(codes, ridx, j0)
        a1 = _read_base_at(codes, ridx, j1)
        (_, l1, s1), (k2, l2, s2) = fmops.forward_extend2(
            fm, st["k"], st["l"], st["s"], a0, a1)
        k1 = jnp.zeros_like(st["k"])  # k unused by next_x; keep l, s
        in_range0 = st["alive"] & (j0 < lens_l)
        ext0 = in_range0 & (a0 < 4)
        die0 = ext0 & (s1 < 1)
        take0 = ext0 & ~die0
        next_x = jnp.where(in_range0, j0 + 1, st["next_x"])
        next_x = jnp.where(die0, j0, next_x)
        lA = jnp.where(take0, l1, st["l"])
        sA = jnp.where(take0, s1, st["s"])

        in_range1 = take0 & (j1 < lens_l)
        ext1 = in_range1 & (a1 < 4)
        die1 = ext1 & (s2 < 1)
        take1 = ext1 & ~die1
        next_x = jnp.where(in_range1, j1 + 1, next_x)
        next_x = jnp.where(die1, j1, next_x)
        return dict(t=st["t"] + 2,
                    k=k1,
                    l=jnp.where(take1, l2, lA),
                    s=jnp.where(take1, s2, sA),
                    next_x=next_x, alive=take1)

    st = jax.lax.while_loop(cond, body, st)
    nxt = st["next_x"].reshape(B, L)
    nxt = jnp.clip(nxt, 0, L)
    return jnp.concatenate([nxt, jnp.full((B, 1), L, jnp.int32)], axis=1)


def anchor_chain(nxt, lens, B, L):
    """Mark positions on the chain x0=0, x_{k+1}=nxt[x_k] by pointer
    doubling; also caps at per-read length. Returns bool[B, L]."""
    term = jnp.minimum(lens, L)[:, None]
    ptr = jnp.where(nxt >= term, L, nxt)       # clamp to terminator slot L
    visited = jnp.zeros((B, L + 1), bool).at[:, 0].set(True)
    bidx = jnp.arange(B)[:, None]
    ptr = jnp.concatenate([ptr, jnp.full((B, 1), L, jnp.int32)], axis=1)
    steps = max(1, int(np.ceil(np.log2(max(L, 2)))) + 1)
    for _ in range(steps):
        tgt = jnp.where(visited, ptr[:, :L + 1], L)
        visited = visited.at[bidx, tgt].max(visited)
        ptr = jnp.take_along_axis(ptr, jnp.minimum(ptr, L), axis=1)
    vis = visited[:, :L]
    pos_ok = jnp.arange(L)[None, :] < lens[:, None]
    return vis & pos_ok


def _read_base_at(codes, ridx, j):
    """codes[ridx, j] with out-of-range -> 4; ridx/j int32[NL]."""
    B, L = codes.shape
    jj = jnp.clip(j, 0, L - 1)
    a = codes[ridx, jj].astype(jnp.int32)
    return jnp.where((j >= 0) & (j < L), a, 4)


class LaneSeeds(NamedTuple):
    """Per-lane emission buffers for the flattened one-pos machine."""

    m: jax.Array        # int32[NL, SA]
    n: jax.Array
    k: jax.Array
    s: jax.Array
    count: jax.Array    # int32[NL]
    overflow: jax.Array  # bool[NL]


def smem_one_pos_lanes(fm: DeviceFMIndex, ref_codes, l_pac, codes, lens,
                       ridx, x, min_intv, active, min_seed_len: int,
                       prev_cap: int, max_out: int,
                       two_step: bool = True, into: LaneSeeds | None = None,
                       ref_codes16=None):
    """getSMEMsOnePosOneThread over NL independent (read, anchor) lanes.
    codes int32[B, L]; ridx/x/min_intv int32[NL]; active bool[NL].
    Emissions land in per-lane buffers in machine order (appended to
    `into` when given). Returns (LaneSeeds, next_x int32[NL])."""
    NL = ridx.shape[0]
    B, L = codes.shape
    P = prev_cap
    SA = max_out

    lens_l = lens[ridx]

    a0 = _read_base_at(codes, ridx, x)
    started = active & (a0 < 4) & (x < lens_l)

    lane_codes = codes[ridx]      # [NL, L]

    def read_grid(jt):
        a = jnp.take_along_axis(lane_codes, jnp.clip(jt, 0, L - 1),
                                axis=1).astype(jnp.int32)
        return jnp.where((jt >= 0) & (jt < L), a, 4)

    fw = _fwd_phase(fm, ref_codes, l_pac, L, x, lens_l, min_intv,
                    lambda j: _read_base_at(codes, ridx, j), read_grid,
                    started, P, two_step=two_step,
                    ref_codes16=ref_codes16)
    num_prev = fw["num_prev"]
    pm, pn, pk, ps = fw["pm"], fw["pn"], fw["pk"], fw["ps"]

    if into is None:
        into = LaneSeeds(m=jnp.zeros((NL, SA), jnp.int32),
                         n=jnp.zeros((NL, SA), jnp.int32),
                         k=jnp.zeros((NL, SA), jnp.int32),
                         s=jnp.zeros((NL, SA), jnp.int32),
                         count=jnp.zeros(NL, jnp.int32),
                         overflow=jnp.zeros(NL, bool))
    out0 = into._replace(overflow=into.overflow | fw["povf"])

    def emit(seeds: LaneSeeds, mask, em, en, ek, es):
        can = mask & (seeds.count < SA)
        oh = (jnp.arange(SA)[None, :] == seeds.count[:, None]) & can[:, None]
        upd = lambda dst, v: jnp.where(oh, v[:, None], dst)
        return LaneSeeds(
            m=upd(seeds.m, em), n=upd(seeds.n, en),
            k=upd(seeds.k, ek), s=upd(seeds.s, es),
            count=seeds.count + can.astype(jnp.int32),
            overflow=seeds.overflow | (mask & (seeds.count >= SA)),
        )

    bwd0 = dict(
        t=jnp.int32(0),
        num_prev=num_prev, pm=pm, pn=pn, pk=pk, ps=ps,
        alive=started & (num_prev > 0),
        seeds=out0,
    )
    st = _bwd_pyramid(fm, ref_codes, l_pac, L, x, min_intv, min_seed_len,
                      lambda j: _read_base_at(codes, ridx, j), read_grid,
                      bwd0, emit, P, two_step=two_step,
                      ref_codes16=ref_codes16)

    final = started & (st["num_prev"] > 0)
    fl = st["pn"][:, 0] - st["pm"][:, 0] + 1
    do_emit = final & (fl >= min_seed_len)
    out = emit(st["seeds"], do_emit, st["pm"][:, 0], st["pn"][:, 0],
               st["pk"][:, 0], st["ps"][:, 0])
    return out, fw["next_x"]


def merge_lane_seeds(lanes: LaneSeeds, lane_read, lane_order, lane_valid,
                     B: int, max_seeds: int,
                     into: SeedBatch | None = None) -> SeedBatch:
    """Concatenate per-lane emissions into per-read SeedBatch buffers.
    PRECONDITION: lanes arrive segment-contiguous and already sorted by
    (read, desired order) — the segmented scan below derives per-read
    offsets from that order (lane_order is accepted for call-site
    documentation only). Reproduces the sequential matchArray append
    order. lane_read/lane_order int32[NL]."""
    NL, SA = lanes.m.shape
    S = max_seeds
    cnt = jnp.where(lane_valid, lanes.count, 0)

    # per-read exclusive prefix of counts in lane_order: lanes are given
    # already ordered (caller sorts by (read, order)), so a segmented scan
    # over the flat lane array suffices.
    seg_start = jnp.concatenate(
        [jnp.ones(1, bool), lane_read[1:] != lane_read[:-1]])
    csum = jnp.cumsum(cnt)
    seg_base = jnp.where(seg_start, csum - cnt, 0)
    seg_base = jax.lax.associative_scan(jnp.maximum, seg_base)
    lane_base = csum - cnt - seg_base            # offset within the read
    base0 = into.count[lane_read] if into is not None else 0
    lane_base = lane_base + base0

    ar = jnp.arange(SA, dtype=jnp.int32)[None, :]
    valid = lane_valid[:, None] & (ar < cnt[:, None])
    tgt = lane_base[:, None] + ar
    ovf_lane = jnp.any(valid & (tgt >= S), axis=1)
    tgt = jnp.where(valid & (tgt < S), tgt, S)
    rexp = jnp.broadcast_to(lane_read[:, None], (NL, SA))

    if into is None:
        into = SeedBatch(m=jnp.zeros((B, S), jnp.int32),
                         n=jnp.zeros((B, S), jnp.int32),
                         k=jnp.zeros((B, S), jnp.int32),
                         s=jnp.zeros((B, S), jnp.int32),
                         count=jnp.zeros(B, jnp.int32),
                         overflow=jnp.zeros(B, bool))

    def scat(dst, src):
        return dst.at[rexp, tgt].set(src, mode="drop")

    new_count = jnp.zeros(B, jnp.int32).at[lane_read].add(cnt) + into.count
    ovf = jnp.zeros(B, bool).at[lane_read].max(
        ovf_lane | (lane_valid & lanes.overflow))
    return SeedBatch(
        m=scat(into.m, lanes.m), n=scat(into.n, lanes.n),
        k=scat(into.k, lanes.k), s=scat(into.s, lanes.s),
        count=jnp.minimum(new_count, S),
        overflow=into.overflow | ovf | (new_count > S),
    )


# --------------------------------------------------------------------------
# All-position SMEM driver (getSMEMsAllPosOneThread parity)
# --------------------------------------------------------------------------

def smem_all_pos(fm: DeviceFMIndex, ref_codes, l_pac, codes, lens, min_intv,
                 active, min_seed_len: int, max_seeds: int, prev_cap: int,
                 two_step: bool = True, tail_frac: int = 4,
                 lane_emit_cap: int | None = None, ref_codes16=None):
    """K1: anchors sweep left to right until every lane is exhausted.

    two_step selects the lambert 2-chars-per-gather-pair bodies. Measured
    on v5e: the K1 frontier (short backward walks, while-step bound) is
    ~15% FASTER one-step; the K2 re-seed lanes (long walks) are ~3x
    faster two-step — callers pick per kernel.

    Straggler tiering: per-step cost scales with lane width, and anchor
    waves 4+ run at <25% occupancy (1024/602/280/209/87/... live lanes
    per wave on 151bp 1%-err reads) — once <= B/tail_frac reads still
    have anchors, the frontier compacts them into a B/tail_frac-wide
    machine whose emissions merge back per read. tail_frac=1 disables."""
    B, L = codes.shape
    seeds0 = _empty_seeds(B, max_seeds)
    NT = max(B // tail_frac, 1) if tail_frac > 1 else 0
    # a straggler read gets the SAME per-read budget as the main loop —
    # a smaller cap would drop seeds the untiered path keeps
    if lane_emit_cap is None:
        lane_emit_cap = max_seeds

    def live(x):
        return active & (x < lens)

    def cond(st):
        x, seeds = st
        n_live = jnp.sum(live(x).astype(jnp.int32))
        return (n_live > NT) if NT else (n_live > 0)

    def body(st):
        x, seeds = st
        lane_on = live(x)
        seeds, next_x = smem_one_pos(fm, ref_codes, l_pac, codes, lens, x,
                                     min_intv, lane_on, min_seed_len, seeds,
                                     prev_cap, two_step=two_step,
                                     ref_codes16=ref_codes16)
        x = jnp.where(lane_on, next_x, x)
        return (x, seeds)

    x, seeds = jax.lax.while_loop(cond, body,
                                  (jnp.zeros(B, jnp.int32), seeds0))
    if not NT:
        return seeds

    # ---- tail tier: compact remaining reads into NT lanes ----
    rem = live(x)
    order = jnp.argsort(jnp.where(rem, jnp.arange(B, dtype=jnp.int32),
                                  B + jnp.arange(B, dtype=jnp.int32)))
    ridx = order[:NT]                            # ascending read ids first
    lane_on0 = rem[ridx]
    x_l = x[ridx]
    mi_l = min_intv[ridx]
    lens_l = lens[ridx]

    SA = lane_emit_cap
    lanes0 = LaneSeeds(m=jnp.zeros((NT, SA), jnp.int32),
                       n=jnp.zeros((NT, SA), jnp.int32),
                       k=jnp.zeros((NT, SA), jnp.int32),
                       s=jnp.zeros((NT, SA), jnp.int32),
                       count=jnp.zeros(NT, jnp.int32),
                       overflow=jnp.zeros(NT, bool))

    def tcond(st):
        x_l, lanes = st
        return jnp.any(lane_on0 & (x_l < lens_l))

    def tbody(st):
        x_l, lanes = st
        on = lane_on0 & (x_l < lens_l)
        lanes, nx = smem_one_pos_lanes(
            fm, ref_codes, l_pac, codes, lens, ridx, x_l, mi_l, on,
            min_seed_len, prev_cap, SA, two_step=two_step, into=lanes,
            ref_codes16=ref_codes16)
        return (jnp.where(on, nx, x_l), lanes)

    _, lanes = jax.lax.while_loop(tcond, tbody, (x_l, lanes0))
    return merge_lane_seeds(lanes, ridx, jnp.zeros(NT, jnp.int32),
                            lane_on0, B, max_seeds, into=seeds)


# --------------------------------------------------------------------------
# K3 forward-only interval-capped seeding (bwtSeedStrategy parity)
# --------------------------------------------------------------------------

def seed_strategy(fm: DeviceFMIndex, codes, lens, active, max_intv: int,
                  min_seed_len: int, max_seeds: int, tail_frac: int = 1):
    """Flattened state machine: each step is either an anchor restart or
    one forward extension per lane (bwtSeedStrategyAllPosOneThread,
    FMI_search.cpp:1400-1488). Straggler tiering like smem_all_pos is
    available via tail_frac but OFF by default: K3 sweeps every
    position of every read, so lanes finish near-simultaneously and
    the compaction never pays (measured neutral-to-negative)."""
    B, L = codes.shape
    seeds0 = _empty_seeds(B, max_seeds)
    NT = max(B // tail_frac, 1) if tail_frac > 1 else 0

    st = _seed_strategy_loop(fm, codes, lens, active,
                             max_intv, min_seed_len, seeds0, _append_seed,
                             None, NT)
    seeds, x, j, kk, ll, ss, mm, nn, started = st
    if not NT:
        return seeds

    rem = active & (x < lens)
    order = jnp.argsort(jnp.where(rem, jnp.arange(B, dtype=jnp.int32),
                                  B + jnp.arange(B, dtype=jnp.int32)))
    ridx = order[:NT]
    on = rem[ridx]
    SA = max_seeds       # same per-read budget as the untiered path
    lanes0 = LaneSeeds(m=jnp.zeros((NT, SA), jnp.int32),
                       n=jnp.zeros((NT, SA), jnp.int32),
                       k=jnp.zeros((NT, SA), jnp.int32),
                       s=jnp.zeros((NT, SA), jnp.int32),
                       count=jnp.zeros(NT, jnp.int32),
                       overflow=jnp.zeros(NT, bool))

    def lane_emit(seeds_l, mask, em, en, ek, es):
        can = mask & (seeds_l.count < SA)
        oh = (jnp.arange(SA)[None, :] == seeds_l.count[:, None]) \
            & can[:, None]
        upd = lambda dst, v: jnp.where(oh, v[:, None], dst)
        return LaneSeeds(
            m=upd(seeds_l.m, em), n=upd(seeds_l.n, en),
            k=upd(seeds_l.k, ek), s=upd(seeds_l.s, es),
            count=seeds_l.count + can.astype(jnp.int32),
            overflow=seeds_l.overflow | (mask & (seeds_l.count >= SA)))

    carry = (x[ridx], j[ridx], kk[ridx], ll[ridx], ss[ridx], mm[ridx],
             nn[ridx], started[ridx])
    st2 = _seed_strategy_loop(fm, codes[ridx], lens[ridx],
                              on, max_intv, min_seed_len, lanes0,
                              lane_emit, carry, 0)
    lanes = st2[0]
    return merge_lane_seeds(lanes, ridx, jnp.zeros(NT, jnp.int32), on, B,
                            max_seeds, into=seeds)


def _seed_strategy_loop(fm, codes, lens, active,
                        max_intv, min_seed_len, seeds0, append, carry,
                        stop_at: int):
    """Shared K3 machine over read-space or compacted lanes. Exits when
    live lanes <= stop_at. Returns (seeds, x, j, k, l, s, m, n,
    started)."""
    B, L = codes.shape
    z = jnp.zeros(B, jnp.int32)

    if carry is None:
        st0 = dict(x=z, j=z, k=z, l=z, s=z, m=z, n=z,
                   started=jnp.zeros(B, bool), seeds=seeds0,
                   steps=jnp.int32(0))
    else:
        x0, j0, k0, l0, s0, m0, n0, sd0 = carry
        st0 = dict(x=x0, j=j0, k=k0, l=l0, s=s0, m=m0, n=n0,
                   started=sd0, seeds=seeds0, steps=jnp.int32(0))

    def cond(st):
        n_live = jnp.sum((active & (st["x"] < lens)).astype(jnp.int32))
        return (n_live > stop_at) & (st["steps"] < 2 * L * L)

    def body(st):
        lane_on = active & (st["x"] < lens)
        # anchor restart lanes
        fresh = lane_on & ~st["started"]
        a0 = _read_base(codes, st["x"])
        k0, l0, s0 = fmops.init_interval(fm, a0)
        start_ok = fresh & (a0 < 4)
        x = jnp.where(fresh & (a0 >= 4), st["x"] + 1, st["x"])
        k = jnp.where(start_ok, k0, st["k"])
        l = jnp.where(start_ok, l0, st["l"])
        s = jnp.where(start_ok, s0, st["s"])
        m = jnp.where(start_ok, st["x"], st["m"])
        n = jnp.where(start_ok, st["x"], st["n"])
        j = jnp.where(start_ok, st["x"] + 1, st["j"])
        started = st["started"] | start_ok

        # extension lanes: two chars per iteration from one gather pair
        # (forward_extend2 — the path the reference routes through
        # bwtSeedStrategyAllPosOneThreadTwoSteps, FMI_search.cpp:1571)
        extl = lane_on & st["started"]
        a = _read_base(codes, j)
        b = _read_base(codes, j + 1)
        (k1, l1, s1), (k2, l2, s2) = fmops.forward_extend2(fm, k, l, s, a, b)

        # ---- char 0 at j ----
        over0 = extl & (j >= lens)           # inner loop exhausted
        x = jnp.where(over0, j, x)
        started = started & ~over0
        step0 = extl & ~over0
        amb0 = step0 & (a >= 4)
        x = jnp.where(amb0, j + 1, x)
        started = started & ~amb0
        go0 = step0 & ~amb0
        k = jnp.where(go0, k1, k)
        l = jnp.where(go0, l1, l)
        s = jnp.where(go0, s1, s)
        n = jnp.where(go0, j, n)
        hit0 = go0 & (s1 < max_intv) & ((j - m + 1) >= min_seed_len)
        emit0 = hit0 & (s1 > 0)
        seeds = append(st["seeds"], emit0, m, n, k, s)
        x = jnp.where(hit0, j + 1, x)
        started = started & ~hit0
        j = jnp.where(go0 & ~hit0, j + 1, j)

        # ---- char 1 at (old) j+1 ----
        cont = go0 & ~hit0
        over1 = cont & (j >= lens)
        x = jnp.where(over1, j, x)
        started = started & ~over1
        step1 = cont & ~over1
        amb1 = step1 & (b >= 4)
        x = jnp.where(amb1, j + 1, x)
        started = started & ~amb1
        go1 = step1 & ~amb1
        k = jnp.where(go1, k2, k)
        l = jnp.where(go1, l2, l)
        s = jnp.where(go1, s2, s)
        n = jnp.where(go1, j, n)
        hit1 = go1 & (s2 < max_intv) & ((j - m + 1) >= min_seed_len)
        emit1 = hit1 & (s2 > 0)
        seeds = append(seeds, emit1, m, n, k, s)
        x = jnp.where(hit1, j + 1, x)
        started = started & ~hit1
        j = jnp.where(go1 & ~hit1, j + 1, j)

        return dict(x=x, j=j, k=k, l=l, s=s, m=m, n=n, started=started,
                    seeds=seeds, steps=st["steps"] + 1)

    st = jax.lax.while_loop(cond, body, st0)
    return (st["seeds"], st["x"], st["j"], st["k"], st["l"], st["s"],
            st["m"], st["n"], st["started"])
