"""Banded-SW extension kernel in Pallas (TPU).

The jnp row-loop (ops/sw.sw_extend) pays a fixed per-row dispatch cost
(~0.3 ms at J≈6k lanes) and round-trips the eh band state through HBM
every target row; this kernel keeps a job tile's whole DP state in VMEM
and runs all rows in one launch — the TPU analogue of the reference's
AVX512 inter-task batch (BandedPairWiseSW::smithWaterman512_16,
ext/TAL/src/alignment/BSW/bandedSWA.cpp), same move that took PairHMM
from 14 to 69 GCUPS (ops/pairhmm_pallas.py).

Layout: JOBS on the lane dimension (TILE_J per grid step), query
positions on sublanes — per-target-row input is a dynamic slice of the
leading dimension (Mosaic allows that; never the lane dim), and the
in-row F (gap-in-target) cummax recurrence is log-doubling sublane-shift
maxes. Integer ops and select order mirror ops/sw.sw_extend exactly;
tests compare lane-for-lane (bit-identical).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sw import SWParams, SWResult

TILE_J = 256


def _kernel(q_ref, t_ref, qlen_ref, tlen_ref, h0_ref,
            score_ref, qle_ref, tle_ref, gtle_ref, gscore_ref, moff_ref,
            eh_h, eh_e, st_ref,
            *, QP, TP, T_LOOP, w, p: SWParams, n_doubling):
    J = q_ref.shape[1]
    qlen = qlen_ref[:]                                   # (1, J) int32
    tlen = tlen_ref[:]
    h0 = h0_ref[:]
    NEG_INF = jnp.int32(-(1 << 30))
    oe_del = p.o_del + p.e_del
    oe_ins = p.o_ins + p.e_ins

    jr = jax.lax.broadcasted_iota(jnp.int32, (QP + 2, J), 0)
    jq = jax.lax.broadcasted_iota(jnp.int32, (QP, J), 0)

    max_ins = (qlen * p.mat_max + p.end_bonus - p.o_ins) // p.e_ins + 1
    max_del = (qlen * p.mat_max + p.end_bonus - p.o_del) // p.e_del + 1
    weff = jnp.minimum(jnp.int32(w),
                       jnp.maximum(jnp.minimum(max_ins, max_del), 1))

    ramp = h0 - oe_ins - (jr - 1) * p.e_ins
    eh_h[:] = jnp.where(jr == 0, jnp.broadcast_to(h0, (QP + 2, J)),
                        jnp.where(jr <= qlen, jnp.maximum(ramp, 0), 0))
    eh_e[:] = jnp.zeros((QP + 2, J), jnp.int32)

    qcl = jnp.clip(q_ref[:], 0, 4)                       # (QP, J)

    def shift_down(a, k, fill):
        f = jnp.full((k, J), fill, a.dtype)
        return jnp.concatenate([f, a[:a.shape[0] - k]], axis=0)

    # per-lane loop state lives in a scratch ref (Mosaic rejects
    # loop-carried (1, J) vectors in fori_loop): rows are
    # 0 beg, 1 end, 2 mx, 3 max_i, 4 max_j, 5 max_ie, 6 gscore,
    # 7 max_off, 8 dead (int 0/1)
    m1 = jnp.full((1, J), -1, jnp.int32)
    st_ref[:] = jnp.concatenate([
        jnp.zeros((1, J), jnp.int32), qlen, h0, m1, m1, m1, m1,
        jnp.zeros((1, J), jnp.int32),
        ((qlen <= 0) | (tlen <= 0)).astype(jnp.int32)], axis=0)

    def row(i, _):
        ld = lambda r: st_ref[pl.ds(r, 1), :]
        st = dict(beg=ld(0), end=ld(1), mx=ld(2), max_i=ld(3),
                  max_j=ld(4), max_ie=ld(5), gscore=ld(6),
                  max_off=ld(7), dead=ld(8) != 0)
        active = ~st["dead"] & (i < tlen)
        beg = jnp.maximum(st["beg"], i - weff)
        end = jnp.minimum(jnp.minimum(st["end"], i + weff + 1), qlen)
        h1_init = jnp.where(beg == 0,
                            jnp.maximum(h0 - (p.o_del + p.e_del * (i + 1)),
                                        0), 0)
        tb = t_ref[pl.ds(jnp.minimum(i, TP - 1), 1), :]  # (1, J)
        q = jnp.where((tb >= 4) | (qcl >= 4), jnp.int32(p.mat_amb),
                      jnp.where(qcl == tb, jnp.int32(p.mat_max),
                                jnp.int32(-p.mat_mis)))  # (QP, J)

        in_band = (jq >= beg) & (jq < end)
        Hprev = eh_h[:][:QP]
        E = eh_e[:][:QP]
        M = jnp.where(Hprev != 0, Hprev + q, 0)
        t_ins = jnp.where(in_band, jnp.maximum(M - oe_ins, 0), NEG_INF)
        v = t_ins + jq * p.e_ins
        cm = v
        k = 1
        for _ in range(n_doubling):
            cm = jnp.maximum(cm, shift_down(cm, k, NEG_INF))
            k <<= 1
        cm_shift = shift_down(cm, 1, NEG_INF)
        F = jnp.maximum(cm_shift - (jq - 1) * p.e_ins, 0)
        H = jnp.maximum(jnp.maximum(M, E), F)
        H = jnp.where(in_band, H, 0)

        mrow = jnp.max(jnp.where(in_band, H, 0), axis=0, keepdims=True)
        is_max = in_band & (H == mrow) & (mrow > 0)
        mj = jnp.max(jnp.where(is_max, jq, -1), axis=0, keepdims=True)

        Hsh = jnp.concatenate([jnp.zeros((1, J), jnp.int32), H,
                               jnp.zeros((1, J), jnp.int32)], axis=0)
        wr_h = (jr > beg) & (jr <= end)
        new_h = jnp.where(wr_h, Hsh, eh_h[:])
        new_h = jnp.where(jr == beg, jnp.broadcast_to(h1_init, (QP + 2, J)),
                          new_h)
        Epad = jnp.concatenate(
            [jnp.where(in_band,
                       jnp.maximum(jnp.maximum(M - oe_del, 0),
                                   E - p.e_del), 0),
             jnp.zeros((2, J), jnp.int32)], axis=0)
        wr_e = (jr >= beg) & (jr < end)
        new_e = jnp.where(wr_e, Epad, eh_e[:])
        new_e = jnp.where(jr == end, 0, new_e)
        h1_last = jnp.sum(jnp.where(jr == jnp.maximum(end, 0), Hsh, 0),
                          axis=0, keepdims=True)
        h1_last = jnp.where(end > beg, h1_last, h1_init)

        upd = active
        eh_h[:] = jnp.where(upd, new_h, eh_h[:])
        eh_e[:] = jnp.where(upd, new_e, eh_e[:])

        at_qend = upd & (end == qlen)
        max_ie = jnp.where(at_qend & (h1_last >= st["gscore"]), i,
                           st["max_ie"])
        gscore = jnp.where(at_qend & (h1_last > st["gscore"]), h1_last,
                           st["gscore"])

        died_zero = upd & (mrow == 0)
        still = upd & ~died_zero
        improved = still & (mrow > st["mx"])
        mx = jnp.where(improved, mrow, st["mx"])
        max_i = jnp.where(improved, i, st["max_i"])
        max_j = jnp.where(improved, mj, st["max_j"])
        max_off = jnp.where(improved,
                            jnp.maximum(st["max_off"],
                                        jnp.abs(mj - i)), st["max_off"])
        ddiag = jnp.where(i - st["max_i"] > mj - st["max_j"],
                          (i - st["max_i"]) - (mj - st["max_j"]),
                          (mj - st["max_j"]) - (i - st["max_i"]))
        epen = jnp.where(i - st["max_i"] > mj - st["max_j"],
                         p.e_del, p.e_ins)
        zdie = still & ~improved & (p.zdrop > 0) & \
            (st["mx"] - mrow - ddiag * epen > p.zdrop)
        alive = still & ~zdie

        nz = (new_h != 0) | (new_e != 0)
        cand_b = nz & (jr >= beg) & (jr < end)
        first_nz = jnp.min(jnp.where(cand_b, jr, end), axis=0,
                           keepdims=True)
        nbeg = first_nz
        cand_e = nz & (jr >= nbeg) & (jr <= end)
        last_nz = jnp.max(jnp.where(cand_e, jr, nbeg - 1), axis=0,
                          keepdims=True)
        nend = jnp.minimum(last_nz + 2, qlen)

        st_ref[:] = jnp.concatenate([
            jnp.where(alive, nbeg, beg),
            jnp.where(alive, nend, end),
            mx, max_i, max_j, max_ie, gscore, max_off,
            (st["dead"] | died_zero | zdie).astype(jnp.int32)], axis=0)
        return 0

    # early exit once every lane is dead or past its target length —
    # makes the band-doubling retry call (~all lanes qn=0) near-free
    def cond(i):
        live = (st_ref[pl.ds(8, 1), :] == 0) & (i < tlen)
        return (i < T_LOOP) & jnp.any(live)

    jax.lax.while_loop(cond, lambda i: (row(i, 0), i + 1)[1], jnp.int32(0))
    ld = lambda r: st_ref[pl.ds(r, 1), :]
    score_ref[:] = ld(2)
    qle_ref[:] = ld(4) + 1
    tle_ref[:] = ld(3) + 1
    gtle_ref[:] = ld(5) + 1
    gscore_ref[:] = ld(6)
    moff_ref[:] = ld(7)


@functools.partial(jax.jit,
                   static_argnames=("w", "p", "t_max", "interpret"))
def sw_extend_pallas(query, qlen, target, tlen, h0, w, mat,
                     p: SWParams, t_max: int | None = None,
                     interpret: bool = False) -> SWResult:
    """Drop-in for ops/sw.sw_extend (same contract, bit-identical)."""
    del mat
    B, QP = query.shape
    TPc = target.shape[1]
    TP = TPc if t_max is None else t_max
    pad = (-B) % TILE_J
    if pad:
        zi = lambda a: jnp.pad(a, ((0, pad), (0, 0)))
        query, target = zi(query), zi(target)
        qlen = jnp.pad(qlen, (0, pad))
        tlen = jnp.pad(tlen, (0, pad))
        h0 = jnp.pad(h0, (0, pad))
    BP = query.shape[0]
    q_T = query.T.astype(jnp.int32)                      # [QP, BP]
    t_T = target.T.astype(jnp.int32)                     # [TPc, BP]
    row1 = lambda a: a.reshape(1, BP).astype(jnp.int32)
    grid = (BP // TILE_J,)
    tile = lambda rows: pl.BlockSpec((rows, TILE_J), lambda g: (0, g),
                                     memory_space=pltpu.VMEM)
    n_doubling = max(1, int(np.ceil(np.log2(max(QP, 2)))))
    outs = pl.pallas_call(
        functools.partial(_kernel, QP=QP, TP=TPc, T_LOOP=min(TP, TPc),
                          w=int(w), p=p, n_doubling=n_doubling),
        grid=grid,
        in_specs=[tile(QP), tile(TPc), tile(1), tile(1), tile(1)],
        out_specs=[tile(1)] * 6,
        out_shape=[jax.ShapeDtypeStruct((1, BP), jnp.int32)] * 6,
        scratch_shapes=[pltpu.VMEM((QP + 2, TILE_J), jnp.int32),
                        pltpu.VMEM((QP + 2, TILE_J), jnp.int32),
                        pltpu.VMEM((9, TILE_J), jnp.int32)],
        interpret=interpret,
    )(q_T, t_T, row1(qlen), row1(tlen), row1(h0))
    cut = lambda a: a[0, :B]
    return SWResult(score=cut(outs[0]), qle=cut(outs[1]), tle=cut(outs[2]),
                    gtle=cut(outs[3]), gscore=cut(outs[4]),
                    max_off=cut(outs[5]))
