"""Batched local Smith-Waterman (kswv / ksw_align2 analogue).

The reference rescues mates with horizontal-SIMD local SW over job
batches (src/kswv.cpp:126, dispatched from mem_matesw
src/bwamem_pair.cpp:150-285). This module is the TPU-native equivalent:
one jitted program computes the full local-alignment DP for J jobs at
once — jobs on the batch axis, query positions vectorized, target rows
scanned with lax.fori_loop (compiled: no per-row dispatch).

Exactness of the single-pass in-row F recurrence: the true lazy-F
fixpoint lets a gap-in-target open from an F-derived H cell, but with
o_ins >= 0 re-opening from an F cell is never better than extending the
original gap (oe >= e), so
    F[j] = max_{k<j} (max(M[k], E[k], 0) - oe_ins - (j-1-k) e_ins)
is exact and is one cummax. align/pair.ksw_align_local (the scalar
transcription, 30-iteration fixpoint) stays as the test oracle.

Semantics mirrored bit-for-bit (tests/test_kswv.py):
  * best = max H; te = FIRST target row achieving it (strict improve)
  * qe   = first argmax of the H row at te
  * score2 = max row-max outside te +- ceil(best/a)  (ksw.cpp:331-345)
  * qb/tb from a second (reversed-prefix) batched pass
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AlignConfig

NEG = -(1 << 30)  # python int: literal, not a shared captured Array


@functools.partial(jax.jit, static_argnames=("a", "b", "o_del", "e_del",
                                             "o_ins", "e_ins"))
def _forward(q, qlen, t, tlen, *, a, b, o_del, e_del, o_ins, e_ins):
    """Local-SW forward pass over a job batch.

    q int32[J, QP], t int32[J, TP] (codes 0..4; anything vs 4 scores
    -1 per bwa_fill_scmat), qlen/tlen int32[J].
    Returns (best[J], te[J], best_row[J, QP], row_max[J, TP])."""
    J, QP = q.shape
    TP = t.shape[1]
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    jq = jnp.arange(QP, dtype=jnp.int32)[None, :]
    qmask = jq < qlen[:, None]
    qc = jnp.clip(q, 0, 4)

    def row(i, st):
        H, E, best, te, best_row, row_max = st
        tc = jax.lax.dynamic_index_in_dim(t, i, axis=1, keepdims=False)
        tc = jnp.clip(tc, 0, 4)[:, None]                      # [J, 1]
        s = jnp.where((qc >= 4) | (tc >= 4), jnp.int32(-1),
                      jnp.where(qc == tc, jnp.int32(a), jnp.int32(-b)))
        s = jnp.where(qmask, s, NEG)
        M = H[:, :QP] + s                   # H prev row, boundary col 0
        G = jnp.maximum(jnp.maximum(M, E), 0)
        v = (G - oe_ins) + jq * e_ins
        cm = jax.lax.cummax(v, axis=1)
        F = jnp.concatenate([jnp.full((J, 1), NEG), cm[:, :-1]],
                            axis=1) - (jq - 1) * e_ins
        h2 = jnp.maximum(jnp.maximum(M, E), jnp.maximum(F, 0))
        h2 = jnp.where(qmask, h2, 0)
        E2 = jnp.maximum(jnp.maximum(E - e_del, h2 - oe_del), 0)
        Hn = jnp.concatenate([jnp.zeros((J, 1), jnp.int32), h2], axis=1)
        rm = jnp.max(h2, axis=1)
        act = i < tlen
        rm = jnp.where(act, rm, 0)
        row_max = jax.lax.dynamic_update_slice(row_max, rm[:, None],
                                               (0, i))
        imp = act & (rm > best)
        best = jnp.where(imp, rm, best)
        te = jnp.where(imp, i, te)
        best_row = jnp.where(imp[:, None], h2, best_row)
        return Hn, jnp.where(act[:, None], E2, E), best, te, best_row, \
            row_max

    H0 = jnp.zeros((J, QP + 1), jnp.int32)
    E0 = jnp.zeros((J, QP), jnp.int32)
    st = (H0, E0, jnp.zeros(J, jnp.int32), jnp.full(J, -1, jnp.int32),
          jnp.zeros((J, QP), jnp.int32), jnp.zeros((J, TP), jnp.int32))
    _, _, best, te, best_row, row_max = jax.lax.fori_loop(0, TP, row, st)
    return best, te, best_row, row_max


def _bucket(n: int, quantum: int) -> int:
    return max(-(-n // quantum) * quantum, quantum)


def ksw_align_local_batch(jobs, opt: AlignConfig):
    """Batched ksw_align2: jobs = [(query_codes, target_codes)], returns
    a list of dicts {score, qb, qe, tb, te, score2} or None (best <
    min_seed_len * a), each identical to align/pair.ksw_align_local."""
    if not jobs:
        return []
    min_sc = opt.min_seed_len * opt.a
    J = len(jobs)
    # bucket the JOB dimension too: J varies per batch, and an
    # unbucketed leading dim means one fresh jit compile per distinct
    # rescue-job count (measured as the dominant PE finalize cost in
    # the CPU workers); padded lanes have qlen=tlen=0 and die in row 0
    JP = _bucket(J, 64)
    QP = _bucket(max(len(q) for q, _ in jobs), 32)
    TP = _bucket(max(len(t) for _, t in jobs), 128)
    q = np.full((JP, QP), 4, np.int32)
    t = np.full((JP, TP), 4, np.int32)
    qlen = np.zeros(JP, np.int32)
    tlen = np.zeros(JP, np.int32)
    for i, (qi, ti) in enumerate(jobs):
        q[i, :len(qi)] = qi
        t[i, :len(ti)] = ti
        qlen[i] = len(qi)
        tlen[i] = len(ti)
    kw = dict(a=opt.a, b=opt.b, o_del=opt.o_del, e_del=opt.e_del,
              o_ins=opt.o_ins, e_ins=opt.e_ins)
    best, te, best_row, row_max = (np.asarray(x) for x in _forward(
        jnp.asarray(q), jnp.asarray(qlen), jnp.asarray(t),
        jnp.asarray(tlen), **kw))

    # second pass: start positions via reversed prefixes of the hits
    hit = [i for i in range(J) if best[i] >= min_sc and te[i] >= 0]
    qe = np.zeros(J, np.int64)
    score2 = np.zeros(J, np.int64)
    rev_jobs = []
    for i in hit:
        qe[i] = int(np.argmax(best_row[i]))     # first index at max
        w = (int(best[i]) + opt.a - 1) // opt.a
        lo, hi = int(te[i]) - w, int(te[i]) + w
        tr = np.arange(int(tlen[i]))
        m = (tr < lo) | (tr > hi)
        score2[i] = int(row_max[i, :int(tlen[i])][m].max()) if m.any() \
            else 0
        rev_jobs.append((jobs[i][0][:qe[i] + 1][::-1],
                         jobs[i][1][:int(te[i]) + 1][::-1]))
    out = [None] * J
    if hit:
        J2 = len(rev_jobs)
        JP2 = _bucket(J2, 64)
        QP2 = _bucket(max(len(q2) for q2, _ in rev_jobs), 32)
        TP2 = _bucket(max(len(t2) for _, t2 in rev_jobs), 128)
        q2 = np.full((JP2, QP2), 4, np.int32)
        t2 = np.full((JP2, TP2), 4, np.int32)
        ql2 = np.zeros(JP2, np.int32)
        tl2 = np.zeros(JP2, np.int32)
        for k, (qk, tk) in enumerate(rev_jobs):
            q2[k, :len(qk)] = qk
            t2[k, :len(tk)] = tk
            ql2[k] = len(qk)
            tl2[k] = len(tk)
        b2, te2, br2, _ = (np.asarray(x) for x in _forward(
            jnp.asarray(q2), jnp.asarray(ql2), jnp.asarray(t2),
            jnp.asarray(tl2), **kw))
        for k, i in enumerate(hit):
            if b2[k] == best[i] and te2[k] >= 0:
                tb = int(te[i]) - int(te2[k])
                qb = int(qe[i]) - int(np.argmax(br2[k]))
            else:
                tb, qb = 0, 0
            out[i] = dict(score=int(best[i]), qb=qb, qe=int(qe[i]),
                          tb=tb, te=int(te[i]), score2=int(score2[i]))
    return out
