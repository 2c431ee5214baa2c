"""Self-restarting SMEM machines (K1/K2 v2) — occupancy-first redesign.

The wave-structured machines in ops/smem.py run one anchor per lane
between barriers: every lane waits for the batch's slowest anchor, and
the backward phase extends a padded prev-stack (prev_cap wide) every
step. Measured on v5e that burns ~12x more HBM gather rows than useful
work. This module restructures K1/K2 with two ideas:

1. **Self-restarting forward sweep** (like ops/smem.py seed_strategy,
   the K3 machine): one while_loop; a lane whose anchor ends restarts
   at next_x immediately, so occupancy stays near-full until a lane
   exhausts its read. Stack entries are appended to per-lane entry
   buffers instead of being processed in-wave. Lanes whose interval
   narrows to a single suffix (s == 1) switch to a text-walk branch
   that advances WALK_T chars per step from packed words (the interval
   is pinned to one text position; matching forward extensions cannot
   push), instead of 2 chars per occ-gather pair.

2. **Independent backward lanes.** Stack entries of one anchor are
   NESTED SA intervals (patterns q[x..n_i] share the prefix q[x..n_i+1]
   ... they are suffix-extensions of each other), so under backward
   extension sizes stay ordered and deaths form a PREFIX of the stack:
   the emission rule of the wave machine ("at each backward char the
   first surviving-or-emittable entry decides; adjacent equal sizes
   dedup") reduces to a per-entry rule on the final left reach
   m_i = leftmost start of q[.. n_i]:

       emit entry i  <=>  n_i - m_i + 1 >= min_seed_len
                          AND (i == 0 OR m_i < m_{i-1})

   (m is monotone non-increasing along the stack: a superset interval
   survives at least as long. Entries that die at the same char have
   equal m, and only the longest emits — exactly the wave machine's
   one-emission-per-char + dedup behavior, including the final
   emission where all survivors stop at the same barrier with equal m.)
   Every entry therefore extends ONE interval independently: 2 gather
   rows per step instead of 2*prev_cap, across (reads x anchors x
   entries) flattened lanes — wide enough to reach the large-N gather
   throughput plateau.

Semantics are transcription-equal to ops/smem.py smem_all_pos /
smem_one_pos_lanes (which are themselves parity-tested against the
scalar port of FMI_search::getSMEMsOnePosOneThread, reference
ext/TAL/src/FMI/FMI_search.cpp:1170-1339); tests/test_smem_sweep.py
asserts bit-equality of the merged SeedBatch against the wave machines.
Like the wave machines, seeds resolved by text-walk carry the direct
position encoding k = -pos - 2 (consumers treat k < -1 as a position).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import fm as fmops
from .fm import DeviceFMIndex
from .smem import SeedBatch
from ..index.reference import packed_window

WALK_T = 64          # chars per text-walk step (phase A and epilogue)


# --------------------------------------------------------------------------
# Packed read words
# --------------------------------------------------------------------------

def pack_reads(codes):
    """Pack int32[B, L] base codes into 2-bit words + N-flag words.

    Returns (words uint32[B, W], nwords uint32[B, W]) with W = ceil(L/16)
    + 1 (one slack word so window fetches never index out of range).
    Codes >= 4 pack as 0 with the N flag set."""
    B, L = codes.shape
    W = (L + 15) // 16 + 1
    pad = W * 16 - L
    c = jnp.pad(codes, ((0, 0), (0, pad)))
    isn = (c >= 4) | (c < 0)
    c2 = jnp.where(isn, 0, c).astype(jnp.uint32)
    c2 = c2.reshape(B, W, 16)
    sh = (2 * jnp.arange(16, dtype=jnp.uint32))[None, None, :]
    words = jnp.sum(c2 << sh, axis=2, dtype=jnp.uint32)
    nbits = jnp.where(isn, jnp.uint32(1), jnp.uint32(0)).reshape(B, W, 16)
    nwords = jnp.sum(nbits << sh, axis=2, dtype=jnp.uint32)
    # stacked so a window fetch gathers ONE 2-wide row per word (gather
    # cost on TPU is per row, not per element)
    return jnp.stack([words, nwords], axis=-1)


def read_window(packed, rid, start, lens_l, T: int):
    """Read codes [NL, T] at positions start..start+T-1 of read rid
    (4 = N / out of [0, len)). Fetches ceil(T/16)+1 two-wide rows."""
    Wf = (T + 15) // 16 + 1
    w0 = jnp.right_shift(start, 4)
    widx = jnp.clip(w0[:, None] + jnp.arange(Wf, dtype=jnp.int32)[None, :],
                    0, packed.shape[1] - 1)
    rows = packed[rid[:, None], widx]            # [NL, Wf, 2]
    wrows, nrows = rows[..., 0], rows[..., 1]
    off = (start & 15).astype(jnp.uint32)
    sh = 2 * off[:, None]

    def align(ws):
        return jnp.where(off[:, None] == 0, ws[:, :-1],
                         (ws[:, :-1] >> sh) |
                         (ws[:, 1:] << (jnp.uint32(32) - sh)))

    aw, an = align(wrows), align(nrows)
    cols = jnp.arange(T, dtype=jnp.int32)
    wi = jnp.minimum(cols >> 4, Wf - 2)
    bi = (2 * (cols & 15)).astype(jnp.uint32)
    c = ((aw[:, wi] >> bi[None, :]) & jnp.uint32(3)).astype(jnp.int32)
    nf = ((an[:, wi] >> bi[None, :]) & jnp.uint32(1)).astype(jnp.int32)
    pos = start[:, None] + cols[None, :]
    ok = (pos >= 0) & (pos < lens_l[:, None]) & (nf == 0)
    return jnp.where(ok, c, 4)


def _read_base_at(codes, rid, j):
    B, L = codes.shape
    jj = jnp.clip(j, 0, L - 1)
    a = codes[rid, jj].astype(jnp.int32)
    return jnp.where((j >= 0) & (j < L), a, 4)


# --------------------------------------------------------------------------
# Phase A: self-restarting forward sweep
# --------------------------------------------------------------------------

def fwd_sweep(fm: DeviceFMIndex, codes, lens, rid, x0, min_intv, active,
              prev_cap: int, entry_cap: int, ref_codes16,
              restart: bool = True, walk: bool = True):
    """Forward phase of getSMEMsOnePosOneThread over NL lanes, anchors
    self-restarting (restart=True: K1 sweeps every anchor of the read;
    False: one anchor per lane — the K2 shape).

    Per lane, entries are the reversed prev-stack of each anchor laid
    out anchor-major: [anchor0 entries..., anchor1 entries, ...] in PUSH
    order (reversal to longest-first happens in the caller). Entry
    payload (em=anchor x, en, ek, es). Per-anchor pushes cap at prev_cap
    (dropping the LAST pushes, exactly like the wave machine); per-lane
    entries cap at entry_cap (overflow flagged).

    Returns dict(em, en, ek, es [NL, E], ecount, povf, eovf [NL]).
    """
    NL = x0.shape[0]
    B, L = codes.shape
    E = entry_cap
    lens_l = lens[rid]
    rpacked = pack_reads(codes)
    z = jnp.zeros(NL, jnp.int32)
    zE = jnp.zeros((NL, E), jnp.int32)

    st0 = dict(x=x0, n=z, k=z, l=z, s=z,
               started=jnp.zeros(NL, bool),
               done=~active,
               cur_np=z, ecount=z,
               em=zE, en=zE, ek=zE, es=zE,
               povf=jnp.zeros(NL, bool), eovf=jnp.zeros(NL, bool))

    earange = jnp.arange(E, dtype=jnp.int32)[None, :]

    def push(st, mask, pm, pn, pk, ps):
        """One masked entry append with per-anchor + per-lane caps."""
        can_p = mask & (st["cur_np"] < prev_cap)
        povf = st["povf"] | (mask & (st["cur_np"] >= prev_cap))
        can = can_p & (st["ecount"] < E)
        eovf = st["eovf"] | (can_p & (st["ecount"] >= E))
        oh = (earange == st["ecount"][:, None]) & can[:, None]
        upd = lambda dst, v: jnp.where(oh, v[:, None], dst)
        st = dict(st)
        st["em"] = upd(st["em"], pm)
        st["en"] = upd(st["en"], pn)
        st["ek"] = upd(st["ek"], pk)
        st["es"] = upd(st["es"], ps)
        st["ecount"] = st["ecount"] + can.astype(jnp.int32)
        st["cur_np"] = jnp.minimum(
            st["cur_np"] + mask.astype(jnp.int32), prev_cap)
        st["povf"] = povf
        st["eovf"] = eovf
        return st

    def cond(st):
        return jnp.any(~st["done"] & (st["started"] | (st["x"] < lens_l)))

    def body(st):
        live = ~st["done"] & (st["x"] < lens_l)
        # ---- restart: lanes with no anchor in progress ----
        fresh = live & ~st["started"]
        a0 = _read_base_at(codes, rid, st["x"])
        start_ok = fresh & (a0 < 4)
        skipn = fresh & (a0 >= 4)
        k0, l0, s0 = fmops.init_interval(fm, a0)
        x = jnp.where(skipn, st["x"] + 1, st["x"])
        k = jnp.where(start_ok, k0, st["k"])
        l = jnp.where(start_ok, l0, st["l"])
        s = jnp.where(start_ok, s0, st["s"])
        n = jnp.where(start_ok, x, st["n"])
        st = dict(st, x=x, k=k, l=l, s=s, n=n,
                  cur_np=jnp.where(start_ok, 0, st["cur_np"]),
                  started=st["started"] | start_ok)
        run = st["started"] & live & ~skipn
        j = st["n"] + 1                     # next char to match

        # ================= text-walk branch (s == 1) =================
        # a single-suffix interval is invariant under matching forward
        # extension (no pushes until the match ends) — resolve by direct
        # text comparison, WALK_T chars per step (smem.py _fwd_phase
        # epilogue semantics, moved in-loop so the lane can restart).
        # Callers whose min_intv is always >= 2 (K2: min_intv = occ + 1)
        # pass walk=False: intervals die before reaching s == 1, so the
        # branch's ~11 gather rows/lane/step are dead weight there.
        if walk:
            walkm = run & (st["s"] == 1)
            pos = fmops.sa_lookup(fm, st["k"])       # q[x] text position
            tb = packed_window(ref_codes16, 2 * fm.n_ref,
                               pos + (j - st["x"]), WALK_T)
            rb = read_window(rpacked, rid, j, lens_l, WALK_T)
            okw = (rb == tb) & (rb < 4) & (tb < 4)
            hasbad = jnp.any(~okw, axis=1)
            d = jnp.where(hasbad, jnp.argmax(~okw, axis=1), WALK_T)\
                .astype(jnp.int32)
            jd = j + d
            n_w = jd - 1                             # last matched char
            w_stop = walkm & hasbad
            rb_d = jnp.take_along_axis(
                rb, jnp.clip(d, 0, WALK_T - 1)[:, None], axis=1)[:, 0]
            w_end = w_stop & (jd >= lens_l)          # ran off the read
            w_amb = w_stop & ~w_end & (rb_d >= 4)    # read N: no push
            w_mis = w_stop & ~w_end & ~w_amb         # mismatch/text end
            # in-loop death push of the pre-state (x, n, k, 1) — the
            # wave machine's push_c (smem.py _fwd_phase epilogue)
            st = push(st, w_mis, st["x"], n_w, st["k"], st["s"])
            n2 = jnp.where(walkm, n_w, st["n"])
        else:
            walkm = jnp.zeros_like(run)
            jd = j
            w_stop = w_end = w_amb = w_mis = walkm
            n2 = st["n"]

        # ================= occ branch (s > 1): two-step ==============
        occ = run & (st["s"] > 1)
        a = _read_base_at(codes, rid, j)
        b = _read_base_at(codes, rid, j + 1)
        (k1, l1, s1), (k2, l2, s2) = fmops.forward_extend2(
            fm, st["k"], st["l"], st["s"], a, b)
        off0 = occ & (j >= lens_l)
        in0 = occ & ~off0
        amb0 = in0 & (a >= 4)
        ext0 = in0 & (a < 4)
        push0 = ext0 & (s1 != st["s"])
        st = push(st, push0, st["x"], st["n"], st["k"], st["s"])
        die0 = ext0 & (s1 < min_intv)
        take0 = ext0 & ~die0
        kA = jnp.where(take0, k1, st["k"])
        lA = jnp.where(take0, l1, st["l"])
        sA = jnp.where(take0, s1, st["s"])
        nA = jnp.where(take0, j, n2)

        j1 = j + 1
        off1 = take0 & (j1 >= lens_l)
        in1 = take0 & ~off1
        amb1 = in1 & (b >= 4)
        ext1 = in1 & (b < 4)
        push1 = ext1 & (s2 != sA)
        st = push(st, push1, st["x"], nA, kA, sA)
        die1 = ext1 & (s2 < min_intv)
        take1 = ext1 & ~die1
        kB = jnp.where(take1, k2, kA)
        lB = jnp.where(take1, l2, lA)
        sB = jnp.where(take1, s2, sA)
        nB = jnp.where(take1, j1, nA)

        # ---- anchor end: final push + restart at next_x ----
        end0 = off0 | amb0 | die0
        end1 = off1 | amb1 | die1
        ended = end0 | end1 | w_stop
        nxt = jnp.where(die0, j,
              jnp.where(amb0, j + 1,
              jnp.where(off0, j,
              jnp.where(die1, j1,
              jnp.where(amb1, j1 + 1,
              jnp.where(off1, j1,
              jnp.where(w_mis, jd,
              jnp.where(w_amb, jd + 1,
                        lens_l))))))))      # w_end
        # final push of the last interval (FMI_search.cpp:1249-1254)
        st = push(st, ended & (sB >= min_intv), st["x"], nB, kB, sB)

        if restart:
            x_new = jnp.where(ended, nxt, st["x"])
            done_new = st["done"]
        else:
            x_new = st["x"]
            done_new = st["done"] | ended | skipn
        return dict(st, x=x_new, n=nB, k=kB, l=lB, s=sB,
                    started=jnp.where(run | start_ok,
                                      run & ~ended, st["started"]),
                    done=done_new)

    st = jax.lax.while_loop(cond, body, st0)
    return dict(em=st["em"], en=st["en"], ek=st["ek"], es=st["es"],
                ecount=st["ecount"], povf=st["povf"], eovf=st["eovf"])


# --------------------------------------------------------------------------
# Entry reorder (longest-first within anchor) + global flatten
# --------------------------------------------------------------------------

def flatten_entries(fw, rid, min_intv, E: int, NL_OUT: int):
    """Compact valid entries of [NL, E] buffers into NL_OUT backward
    lanes, order-preserving. Entries stay in PUSH order (shortest match
    of each anchor first) — emit_merge applies the longest-first
    emission rule via next-lane adjacency and reversed in-group offsets,
    so no physical reversal (131k-element take_along_axis) is needed.
    Returns per-lane arrays + per-source-lane drop overflow."""
    em, ecount = fw["em"], fw["ecount"]
    NL = em.shape[0]
    idxE = jnp.arange(E, dtype=jnp.int32)[None, :]
    valid = idxE < ecount[:, None]
    # drop exact adjacent duplicates within an anchor group (a dying
    # anchor's in-loop death push + final push coincide): the
    # duplicate's m equals its twin's, so it can never emit
    same_prev = jnp.concatenate(
        [jnp.zeros((NL, 1), bool),
         (fw["em"][:, 1:] == fw["em"][:, :-1]) &
         (fw["en"][:, 1:] == fw["en"][:, :-1]) &
         (fw["ek"][:, 1:] == fw["ek"][:, :-1]) &
         (fw["es"][:, 1:] == fw["es"][:, :-1])], axis=1)
    valid = valid & ~same_prev
    fv = valid.reshape(-1)
    srcidx = jnp.arange(NL * E, dtype=jnp.int32)
    # order-preserving compaction via one ascending sort of masked
    # indices (a 131k-element scatter costs ~10ms on v5e; sort is ~1ms)
    key = jnp.where(fv, srcidx, jnp.int32(NL * E))
    l_src = jax.lax.sort(key)[:NL_OUT]
    l_on = l_src < NL * E
    l_src = jnp.where(l_on, l_src, 0)
    l_lane = l_src // E
    ent4 = jnp.stack([fw["em"], fw["en"], fw["ek"], fw["es"]],
                     axis=-1).reshape(NL * E, 4)
    rows = ent4[l_src]                       # one 4-wide gather
    lanes = dict(
        rid=rid[l_lane], lane=l_lane,
        anc=rows[:, 0], n=rows[:, 1], k=rows[:, 2], s=rows[:, 3],
        mi=min_intv[l_lane], on=l_on,
    )
    # compaction is order-preserving, so dropped entries (global rank >=
    # NL_OUT) belong to the trailing source lanes: flag a lane when its
    # cumulative valid-entry count crosses the cap
    vcnt = jnp.sum(valid.astype(jnp.int32), axis=1)
    drop_ovf = jnp.cumsum(vcnt) > NL_OUT
    return lanes, drop_ovf


# --------------------------------------------------------------------------
# Phase B: independent backward extension per entry lane
# --------------------------------------------------------------------------

def bwd_entries(fm: DeviceFMIndex, codes, lens, lanes, ref_codes16):
    """Extend each entry's single interval leftward to its maximal reach.

    lanes: dict(rid, anc, n, k, s, mi, on). Returns (m, kf, sf): final
    match start, and the pre-death interval (kf < -1 encodes a direct
    text position for single-suffix lanes, like smem.py's epilogue).
    2 gather rows per lane per 2-char step; lanes pausing at s == 1
    leave the loop and finish in a WALK_T-chunked packed text compare.

    Stragglers dominate SPMD loops (most entries die or pause within a
    few steps), so both loops compact: the occ loop re-packs live lanes
    into a quarter-width machine once occupancy allows, and the walk
    runs on a half-width compaction of the paused lanes.
    """
    NL = lanes["n"].shape[0]
    rid = lanes["rid"]
    mi = lanes["mi"]
    rpacked = pack_reads(codes)

    def make_body(rid_l, mi_l):
        def body(st):
            jb = st["m"] - 1
            a = _read_base_at(codes, rid_l, jb)
            b = _read_base_at(codes, rid_l, jb - 1)
            k1, s1, k2, s2 = fmops.backward_extend2(
                fm, st["k"], st["s"], a, b)
            al = st["alive"]
            proc0 = al & (jb >= 0) & (a < 4)
            die0 = proc0 & (s1 < mi_l)
            surv0 = proc0 & ~die0
            m1 = jnp.where(surv0, jb, st["m"])
            kA = jnp.where(surv0, k1, st["k"])
            sA = jnp.where(surv0, s1, st["s"])
            pz0 = surv0 & (s1 == 1)

            cont = surv0 & ~pz0
            proc1 = cont & (jb - 1 >= 0) & (b < 4)
            die1 = proc1 & (s2 < mi_l)
            surv1 = proc1 & ~die1
            m2 = jnp.where(surv1, jb - 1, m1)
            kB = jnp.where(surv1, k2, kA)
            sB = jnp.where(surv1, s2, sA)
            pz1 = surv1 & (s2 == 1)

            return dict(m=m2, k=kB, s=sB,
                        alive=surv1 & ~pz1,
                        paused=st["paused"] | pz0 | pz1)
        return body

    pause0 = lanes["on"] & (lanes["s"] == 1)     # mi==1 whenever s==1
    st = dict(m=lanes["anc"], k=lanes["k"], s=lanes["s"],
              alive=lanes["on"] & (lanes["s"] > 1) & (lanes["anc"] > 0),
              paused=pause0)

    NC = max(NL // 4, 8)
    st = jax.lax.while_loop(
        lambda s_: jnp.sum(s_["alive"].astype(jnp.int32)) > NC,
        make_body(rid, mi), st)
    # compact survivors into a quarter-width machine (stable order;
    # results scatter back by origin)
    perm = jnp.argsort(~st["alive"])[:NC]
    sub = {f: st[f][perm] for f in st}
    sub = jax.lax.while_loop(
        lambda s_: jnp.any(s_["alive"]),
        make_body(rid[perm], mi[perm]), sub)
    for f in ("m", "k", "s", "paused"):
        st[f] = st[f].at[perm].set(sub[f])

    # ---- single-suffix walk epilogue (chunked leftward compare) ----
    pos0 = fmops.sa_lookup(fm, st["k"]) - st["m"]   # text pos of q[0]
    going0 = st["paused"] & (st["m"] > 0)

    def make_wbody(rid_l, lens_l, pos0_l):
        def wbody(ws):
            start_r = ws["m"] - WALK_T           # read window, reversed
            rb = read_window(rpacked, rid_l, start_r, lens_l,
                             WALK_T)[:, ::-1]
            tb = packed_window(ref_codes16, 2 * fm.n_ref,
                               pos0_l + ws["m"] - WALK_T, WALK_T,
                               reverse=True)
            okw = (rb == tb) & (rb < 4) & (tb < 4) & ws["going"][:, None]
            hasbad = jnp.any(~okw, axis=1)
            lcp = jnp.where(hasbad, jnp.argmax(~okw, axis=1),
                            WALK_T).astype(jnp.int32)
            m = jnp.where(ws["going"], ws["m"] - lcp, ws["m"])
            return dict(m=m, going=ws["going"] & ~hasbad & (m > 0))
        return wbody

    lens_all = lens[rid]
    NW = max(NL // 2, 8)
    ws = dict(m=st["m"], going=going0)
    ws = jax.lax.while_loop(
        lambda s_: jnp.sum(s_["going"].astype(jnp.int32)) > NW,
        make_wbody(rid, lens_all, pos0), ws)
    wperm = jnp.argsort(~ws["going"])[:NW]
    wsub = dict(m=ws["m"][wperm], going=ws["going"][wperm])
    wsub = jax.lax.while_loop(
        lambda s_: jnp.any(s_["going"]),
        make_wbody(rid[wperm], lens_all[wperm], pos0[wperm]), wsub)
    m = ws["m"].at[wperm].set(wsub["m"])

    kf = jnp.where(st["paused"], -(pos0 + m) - 2, st["k"])
    return m, kf, st["s"]


# --------------------------------------------------------------------------
# Emission + merge
# --------------------------------------------------------------------------

def emit_merge(lanes, m, kf, sf, min_seed_len, B: int, max_seeds: int,
               into: SeedBatch | None = None) -> SeedBatch:
    """Apply the per-entry emission rule and scatter seeds into per-read
    buffers in machine order.

    Lanes arrive in (read, anchor, PUSH order) — shortest match of each
    anchor first, m non-decreasing within a group. The longest-first
    rule "emit iff m strictly below every longer entry's m" is the
    next-lane compare m_i < m_{i+1} (last of group always passes); the
    machine emission ORDER within a group is reversed push order, so
    the in-read offset is group_base + (group_total - 1 - emits_before)."""
    NL = m.shape[0]
    on = lanes["on"]
    same_next = jnp.concatenate(
        [(lanes["rid"][1:] == lanes["rid"][:-1]) &
         (lanes["anc"][1:] == lanes["anc"][:-1]) &
         (lanes["lane"][1:] == lanes["lane"][:-1]) &
         on[1:] & on[:-1],
         jnp.zeros(1, bool)])
    m_next = jnp.concatenate([m[1:], jnp.zeros(1, jnp.int32)])
    emit = on & (lanes["n"] - m + 1 >= min_seed_len) & \
        (~same_next | (m < m_next))

    rid = lanes["rid"]
    rid_eff = jnp.where(on, rid, B)           # padding tail sorts last
    seg = jnp.concatenate(
        [jnp.ones(1, bool), rid_eff[1:] != rid_eff[:-1]])
    gseg = seg | jnp.concatenate(
        [jnp.ones(1, bool), ~same_next[:-1]])  # anchor-group boundaries
    cnt = emit.astype(jnp.int32)
    csum = jnp.cumsum(cnt)
    seg_base = jax.lax.associative_scan(
        jnp.maximum, jnp.where(seg, csum - cnt, 0))
    gbase = jax.lax.associative_scan(
        jnp.maximum, jnp.where(gseg, csum - cnt, 0))
    # group emit total, broadcast back over the group (reverse max scan
    # of the inclusive csum at each group's last lane)
    glast = jnp.concatenate([gseg[1:], jnp.ones(1, bool)])
    gtot_end = jax.lax.associative_scan(
        jnp.minimum, jnp.where(glast, csum, jnp.int32(2**30)),
        reverse=True)
    gtot = gtot_end - gbase
    off = (gbase - seg_base) + (gtot - 1 - (csum - cnt - gbase))
    base0 = into.count[rid] if into is not None else 0
    tgt = off + base0
    S = max_seeds
    ovf_l = emit & (tgt >= S)
    tgt = jnp.where(emit & (tgt < S), tgt, S)

    if into is None:
        zB = jnp.zeros((B, S), jnp.int32)
        into = SeedBatch(m=zB, n=zB, k=zB, s=zB,
                         count=jnp.zeros(B, jnp.int32),
                         overflow=jnp.zeros(B, bool))

    # one fused scatter for all four seed fields (scatter cost on TPU is
    # per-row, not per-element)
    payload = jnp.stack([m, lanes["n"], kf, sf], axis=1)
    dst = jnp.stack([into.m, into.n, into.k, into.s], axis=2)
    dst = dst.at[rid, tgt].set(payload, mode="drop")

    # per-read totals from the sorted-by-read lane layout: csum gathered
    # at each read's last lane (scatter-adds over NL rows are slow)
    barange = jnp.arange(B, dtype=jnp.int32)
    ends = jnp.searchsorted(rid_eff, barange, side="right")
    tot = jnp.where(ends > 0, csum[jnp.maximum(ends - 1, 0)], 0)
    per_read = tot - jnp.concatenate([jnp.zeros(1, jnp.int32), tot[:-1]])
    ocsum = jnp.cumsum(ovf_l.astype(jnp.int32))
    otot = jnp.where(ends > 0, ocsum[jnp.maximum(ends - 1, 0)], 0)
    ovf = (otot - jnp.concatenate(
        [jnp.zeros(1, jnp.int32), otot[:-1]])) > 0

    new_count = per_read + into.count
    return SeedBatch(
        m=dst[..., 0], n=dst[..., 1], k=dst[..., 2], s=dst[..., 3],
        count=jnp.minimum(new_count, S),
        overflow=into.overflow | ovf | (new_count > S))


# --------------------------------------------------------------------------
# Drivers
# --------------------------------------------------------------------------

def smem_all_pos_sweep(fm: DeviceFMIndex, dref_codes16, codes, lens,
                       min_intv, active, min_seed_len: int, max_seeds: int,
                       prev_cap: int, entry_cap: int = 0,
                       bwd_mult: int = 0) -> SeedBatch:
    """K1 v2: smem_all_pos semantics via the self-restarting sweep +
    independent backward lanes. entry_cap 0 = auto (generous); bwd_mult
    0 = no lane compaction cap (NL_OUT = B * entry_cap)."""
    B, L = codes.shape
    E = entry_cap or 2 * L + 16
    rid = jnp.arange(B, dtype=jnp.int32)
    fw = fwd_sweep(fm, codes, lens, rid, jnp.zeros(B, jnp.int32),
                   min_intv, active, prev_cap, E, dref_codes16,
                   restart=True)
    NL_OUT = B * (bwd_mult or E)
    lanes, drop_ovf = flatten_entries(fw, rid, min_intv, E, NL_OUT)
    m, kf, sf = bwd_entries(fm, codes, lens, lanes, dref_codes16)
    seeds = emit_merge(lanes, m, kf, sf, min_seed_len, B, max_seeds)
    return seeds._replace(
        overflow=seeds.overflow | fw["povf"] | fw["eovf"] | drop_ovf)


def smem_lanes_sweep(fm: DeviceFMIndex, dref_codes16, codes, lens, ridx,
                     x, min_intv, active, min_seed_len: int,
                     prev_cap: int, B: int, max_seeds: int,
                     into: SeedBatch | None = None,
                     entry_cap: int = 0, bwd_mult: int = 0,
                     walk: bool = True):
    """K2 v2: one anchor per lane (smem_one_pos_lanes semantics), merged
    straight into per-read SeedBatch buffers in (read, lane) order.
    Lanes must arrive sorted by (read, job order). Returns SeedBatch.
    Pass walk=False when every lane's min_intv >= 2 (intervals then die
    before s == 1, so the fwd text-walk branch is dead weight)."""
    NJ = ridx.shape[0]
    E = entry_cap or (prev_cap + 2)
    fw = fwd_sweep(fm, codes, lens, ridx, x, min_intv, active,
                   prev_cap, E, dref_codes16, restart=False, walk=walk)
    NL_OUT = NJ * (bwd_mult or E)
    lanes, drop_ovf = flatten_entries(fw, ridx, min_intv, E, NL_OUT)
    # remap: flatten gives rid per source LANE; group key must separate
    # jobs of the same read — lanes["lane"] (the job index) does that
    # via the `lane` field already included in the adjacency key.
    m, kf, sf = bwd_entries(fm, codes, lens, lanes, dref_codes16)
    seeds = emit_merge(lanes, m, kf, sf, min_seed_len, B, max_seeds,
                       into=into)
    povf = jnp.zeros(B, bool).at[ridx].max(
        fw["povf"] | fw["eovf"], mode="drop")
    dovf = jnp.zeros(B, bool).at[ridx].max(drop_ovf, mode="drop")
    return seeds._replace(overflow=seeds.overflow | povf | dovf)
