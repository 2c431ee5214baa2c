"""Batched seed-extension driver (mem_chain2aln_across_reads_V2 parity).

The reference gathers left/right extension SeqPairs across a read batch
and runs AVX banded-SW with band-doubling retries
(src/bwamem.cpp:2531-3283). The TPU design does the same gathering into
fixed-shape job tensors and runs the whole batch through the vectorized
SW kernel twice per side (band w and 2w), selecting per the reference's
retry rule (accept when max_off < (w>>1)+(w>>2), src/bwamem.cpp:2950).
Every seed of every surviving chain becomes one alignment region — V2
performs no containment pre-test; redundancy is removed afterwards by
mem_sort_dedup_patch (host side, align/finalize.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import AlignConfig
from ..index.reference import DeviceReference
from ..ops import sw as swops
from ..ops.smem_sweep import pack_reads, read_window
from .chain import ChainBatch

NEG1 = -1  # python int: traced as a literal, not a shared captured Array (see BASELINE.md "device-program isolation")


class AlnRegBatch(NamedTuple):
    """mem_alnreg_t fields, fixed shape [B, E]."""

    rid: jax.Array
    qb: jax.Array
    qe: jax.Array
    rb: jax.Array
    re: jax.Array
    score: jax.Array
    truesc: jax.Array
    sw_w: jax.Array      # a->w after band retries
    seedcov: jax.Array
    seedlen0: jax.Array
    frac_rep: jax.Array  # float32[B] (per read)
    valid: jax.Array     # bool[B, E]
    overflow: jax.Array  # bool[B] any-stage overflow
    ovf_seed: jax.Array  # bool[B] seed-stage overflow (see ChainBatch)


def _cal_max_gap(opt: AlignConfig, qlen):
    """cal_max_gap (src/bwamem.cpp:65-76); qlen int32[...]"""
    qf = qlen.astype(jnp.float32)
    l_del = jnp.trunc((qf * opt.a - opt.o_del) / opt.e_del + 1.0)
    l_ins = jnp.trunc((qf * opt.a - opt.o_ins) / opt.e_ins + 1.0)
    l = jnp.maximum(jnp.maximum(l_del, l_ins), 1.0)
    return jnp.minimum(l, float(opt.w * 2)).astype(jnp.int32)


def extend_chains(cb: ChainBatch, codes, lens, dref: DeviceReference,
                  opt: AlignConfig, max_regs: int, t_max: int,
                  jobs_per_read: int = 6) -> AlnRegBatch:
    """codes int32[B, L] read codes; lens int32[B]. Returns regs [B, E].

    SW work is globally compacted: valid (read, seed) extension jobs
    across the whole batch are gathered into J = B * jobs_per_read lanes
    (typical reads have ~2-6 jobs; the reference sizes per-thread SeqPair
    arrays the same way, mem_cache wsize). Jobs beyond J are dropped with
    the read's overflow flag set.
    """
    B, P = cb.seed_qbeg.shape
    C = cb.pos.shape[1]
    E = max_regs
    L = codes.shape[1]
    J = B * jobs_per_read
    bidx = jnp.arange(B)
    l_pac = dref.l_pac

    # ---- flat job list from the chain batch's [NJ] seed lanes ----
    # (fread is non-decreasing; all index work below is NJ-row gathers
    # and J-row scatters — no [B, P]-wide scatter appears anywhere)
    NJ = cb.fread.shape[0]
    fread = cb.fread
    fchain = jnp.where(cb.fon, cb.seed_chain[
        jnp.clip(fread, 0, B - 1), cb.fslot], -1)
    fkept = jnp.take(cb.kept.reshape(-1),
                     jnp.clip(fread, 0, B - 1) * C +
                     jnp.clip(fchain, 0, C - 1), mode="clip")
    job = cb.fon & (fchain >= 0) & (fkept > 0)

    # ---- per-chain ref window rmax (bwamem.cpp:2608-2630) ----
    flens = jnp.take(lens, fread, mode="clip")
    gap_l = _cal_max_gap(opt, cb.fqbeg)
    rem = flens - cb.fqbeg - cb.fslen
    gap_r = _cal_max_gap(opt, rem)
    b_t = cb.frbeg - (cb.fqbeg + gap_l)
    e_t = cb.frbeg + cb.fslen + rem + gap_r
    cidx = jnp.where(job, jnp.clip(fread, 0, B - 1) * C + fchain,
                     B * C)
    big = jnp.int32(2**31 - 1)
    rmax0 = jnp.full(B * C + 1, 2 * l_pac, jnp.int32).at[cidx].min(
        jnp.where(job, b_t, big), mode="drop")[:B * C].reshape(B, C)
    rmax1 = jnp.zeros(B * C + 1, jnp.int32).at[cidx].max(
        jnp.where(job, e_t, -big), mode="drop")[:B * C].reshape(B, C)
    rmax0 = jnp.maximum(rmax0, 0)
    rmax1 = jnp.minimum(rmax1, 2 * l_pac)
    straddle = (rmax0 < l_pac) & (l_pac < rmax1)
    fwd_first = cb.first_r < l_pac
    rmax1 = jnp.where(straddle & fwd_first, l_pac, rmax1)
    rmax0 = jnp.where(straddle & ~fwd_first, l_pac, rmax0)
    far_beg, far_end, _ = dref.contig_window(cb.first_r)
    rmax0 = jnp.maximum(rmax0, far_beg)
    rmax1 = jnp.minimum(rmax1, far_end)

    # ---- reg slot within the read (order = flat order) ----
    cj = jnp.cumsum(job.astype(jnp.int32))
    start_idx = jnp.searchsorted(fread, jnp.arange(B, dtype=jnp.int32),
                                 side="left").astype(jnp.int32)
    base_r = jnp.where(start_idx > 0,
                       jnp.take(cj, jnp.maximum(start_idx - 1, 0),
                                mode="clip"), 0)
    eslot = cj - 1 - jnp.take(base_r, fread, mode="clip")
    keepE = job & (eslot < E)
    over_mask = job & (eslot >= E)
    overflow = jnp.zeros(B + 1, bool).at[
        jnp.where(over_mask, fread, B)].max(over_mask, mode="drop")[:B]

    # ---- global compaction to J SW lanes ----
    g2 = jnp.cumsum(keepE.astype(jnp.int32)) - 1
    glive_m = keepE & (g2 < J)
    dropJ = keepE & (g2 >= J)
    overflow = overflow | jnp.zeros(B + 1, bool).at[
        jnp.where(dropJ, fread, B)].max(dropJ, mode="drop")[:B]
    gsl = jnp.where(glive_m, g2, J)
    lane_tbl = jnp.stack(
        [cb.fqbeg, cb.frbeg, cb.fslen, fread, eslot, fchain], axis=1)
    lanes = jnp.zeros((J + 1, 6), jnp.int32).at[gsl].set(
        lane_tbl, mode="drop")[:J]
    glive = jnp.zeros(J + 1, bool).at[gsl].set(glive_m, mode="drop")[:J]
    gqb, grb, glen = lanes[:, 0], lanes[:, 1], lanes[:, 2]
    gread, geslot, gchain = lanes[:, 3], lanes[:, 4], lanes[:, 5]
    ctbl = jnp.stack([rmax0, rmax1, cb.rid], axis=-1).reshape(B * C, 3)
    crow = ctbl[jnp.clip(gread * C + gchain, 0, B * C - 1)]
    gr0, gr1, grid = crow[:, 0], crow[:, 1], crow[:, 2]
    glens = lens[gread]


    TP = t_max
    jj = jnp.arange(L, dtype=jnp.int32)[None, :]
    tt = jnp.arange(TP, dtype=jnp.int32)[None, :]

    mat = None
    pl = swops.SWParams(opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                        opt.zdrop, opt.pen_clip5, opt.a, opt.b)
    pr = swops.SWParams(opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                        opt.zdrop, opt.pen_clip3, opt.a, opt.b)

    def run_retry(q, qn, t, tn, h0v, prev, params):
        """Band-doubling: w then 2w; accept try1 iff the score repeats the
        caller's previous score or max_off is small
        (MAX_BAND_TRY=2, bwamem.cpp:49,2927-2950)."""
        r1 = swops.sw_extend_auto(q, qn, t, tn, h0v, opt.w, mat, params,
                             t_max=TP)
        take1 = (r1.score == prev) | \
            (r1.max_off < ((opt.w >> 1) + (opt.w >> 2)))
        # rerun only lanes that need the doubled band
        r2 = swops.sw_extend_auto(q, jnp.where(take1, 0, qn), t,
                             jnp.where(take1, 0, tn), h0v, opt.w * 2, mat,
                             params, t_max=TP)
        sel = lambda a, b: jnp.where(take1, a, b)
        res = swops.SWResult(*(sel(x1, x2) for x1, x2 in zip(r1, r2)))
        w_used = jnp.where(take1, opt.w, opt.w * 2)
        return res, w_used

    # ---- left extension: reversed prefixes ----
    # Lanes are run in ascending-extension-length order: the Pallas
    # kernel's per-256-lane tile exits once every lane is dead (~qlen +
    # band rows), so one long lane holds its whole tile — sorting makes
    # tiles homogeneous (most extensions are a few bp; tiles of those
    # exit in tens of rows instead of ~250). Results scatter back.
    h0 = glen * opt.a
    do_left = jnp.asarray(glive & (gqb > 0))
    qn_l = jnp.where(do_left, gqb, 0)
    perm_l = jnp.argsort(qn_l).astype(jnp.int32)
    inv_l = jnp.argsort(perm_l).astype(jnp.int32)
    gqb_s, grb_s = gqb[perm_l], grb[perm_l]
    # query windows from packed read words (16 codes per gather row; a
    # [J, L] take_along_axis is an elementwise gather — J*L rows)
    rpacked = pack_reads(codes)
    q_left = read_window(rpacked, gread[perm_l], gqb_s - L,
                         glens[perm_l], L)[:, ::-1]
    t_left = dref.fetch_window(grb_s - TP, TP, reverse=True)
    rl_s, wl_s = run_retry(q_left, qn_l[perm_l],
                           t_left, jnp.where(do_left, grb - gr0, 0)[perm_l],
                           h0[perm_l], jnp.full(J, -1, jnp.int32), pl)
    rl = swops.SWResult(*(x[inv_l] for x in rl_s))
    wl = wl_s[inv_l]

    # apply left results (bwamem.cpp:2952-2961)
    gs_ok = (rl.gscore <= 0) | (rl.gscore <= rl.score - opt.pen_clip5)
    g_qb = jnp.where(do_left, jnp.where(gs_ok, gqb - rl.qle, 0), 0)
    g_rb = jnp.where(do_left,
                     jnp.where(gs_ok, grb - rl.tle, grb - rl.gtle), grb)
    # a->score after left = sp->score (not gscore); truesc differs
    score_mid = jnp.where(do_left, rl.score, glen * opt.a)
    g_truesc = jnp.where(do_left & ~gs_ok, rl.gscore, score_mid)
    g_w = jnp.where(do_left, jnp.maximum(opt.w, wl), opt.w)

    # ---- right extension: suffixes (same sorted-lane scheme) ----
    gqe = gqb + glen
    re0 = grb + glen
    do_right = jnp.asarray(glive & (gqe < glens))
    qn_r = jnp.where(do_right, glens - gqe, 0)
    perm_r = jnp.argsort(qn_r).astype(jnp.int32)
    inv_r = jnp.argsort(perm_r).astype(jnp.int32)
    gqe_s = gqe[perm_r]
    q_right = read_window(rpacked, gread[perm_r], gqe_s,
                          glens[perm_r], L)
    t_right = dref.fetch_window(re0[perm_r], TP)
    rr_s, wr_s = run_retry(q_right, qn_r[perm_r],
                           t_right, jnp.where(do_right, gr1 - re0, 0)[perm_r],
                           score_mid[perm_r], score_mid[perm_r], pr)
    rr = swops.SWResult(*(x[inv_r] for x in rr_s))
    wr = wr_s[inv_r]

    gs_ok_r = (rr.gscore <= 0) | (rr.gscore <= rr.score - opt.pen_clip3)
    g_qe = jnp.where(do_right,
                     jnp.where(gs_ok_r, gqe + rr.qle, glens), glens)
    g_re = jnp.where(do_right,
                     jnp.where(gs_ok_r, re0 + rr.tle, re0 + rr.gtle), re0)
    g_score = jnp.where(do_right, rr.score, score_mid)
    g_truesc = jnp.where(
        do_right,
        g_truesc + jnp.where(gs_ok_r, rr.score, rr.gscore) - score_mid,
        g_truesc)
    g_w = jnp.where(do_right, jnp.maximum(g_w, wr), g_w)

    # scatter back to the [B, E] reg layout: one fused J-row scatter
    greg = jnp.where(glive, gread * E + geslot, B * E)
    payload = jnp.stack([g_qb, g_rb, g_qe, g_re, g_score, g_truesc,
                         g_w, grid, glen, gchain,
                         glive.astype(jnp.int32)], axis=1)
    fills = jnp.array([0, 0, 0, 0, -1, -1, opt.w, -1, 0, -1, 0],
                      jnp.int32)
    out = jnp.broadcast_to(fills, (B * E + 1, 11)).at[greg].set(
        payload, mode="drop")[:B * E].reshape(B, E, 11)
    qb, rb, qe, re = (out[..., i] for i in range(4))
    score, truesc, sw_w, jrid, jlen, jchain = (
        out[..., i] for i in range(4, 10))
    jvalid = out[..., 10] != 0

    # ---- seedcov (bwamem.cpp:2962-2972): chain seeds inside the region ----
    sc_q = cb.seed_qbeg[:, None, :]
    sc_r = cb.seed_rbeg[:, None, :]
    sc_l = cb.seed_len[:, None, :]
    same_chain = (cb.seed_chain[:, None, :] == jchain[:, :, None]) & \
        (cb.seed_chain[:, None, :] >= 0)
    inside = same_chain & (sc_q >= qb[:, :, None]) & \
        (sc_q + sc_l <= qe[:, :, None]) & (sc_r >= rb[:, :, None]) & \
        (sc_r + sc_l <= re[:, :, None])
    seedcov = jnp.sum(jnp.where(inside, sc_l, 0), axis=2)

    return AlnRegBatch(
        rid=jnp.where(jvalid, jrid, -1), qb=qb, qe=qe, rb=rb, re=re,
        score=jnp.where(jvalid, score, -1),
        truesc=jnp.where(jvalid, truesc, -1),
        sw_w=sw_w, seedcov=seedcov, seedlen0=jlen,
        frac_rep=cb.frac_rep, valid=jvalid,
        # seed- and chain-stage overflow must ride to the host
        # escalation ladder too (round 4: these flags were
        # silently dropped here — repeat-dense reads lost seeds
        # without retry; tests/test_e2e_align.py::test_overflow_propagates)
        overflow=overflow | cb.overflow,
        ovf_seed=cb.ovf_seed,
    )
