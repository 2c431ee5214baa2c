"""Batched banded Smith-Waterman extension (device side).

The reference runs per-pair banded SW in 8/16-bit AVX512 lanes
(BandedPairWiseSW::getScores8/16, ext/TAL/src/alignment/BSW/bandedSWA.cpp;
scalar contract scalarBandedSWA :116-234 == bwa ksw_extend2). The TPU
design vectorizes differently: one fori_loop over target rows, every
*query column of every pair in the batch* on VPU lanes. The in-row F
(gap-in-target) recurrence — the classic SW loop-carried dependency — is
an associative max-plus scan, computed with `lax.cummax`, so each row is
pure vector work. Early exits (z-drop, zero row, band narrowing) become
per-lane dead masks / beg-end registers, preserving the scalar contract
exactly (tests: lane-for-lane parity with testing/oracles.banded_swa_ref).

All arithmetic is int32; the reference's 8/16-bit precision classes
(sort_classify, src/bwamem.cpp:1677) are a CPU SIMD-width concern that
does not apply to int32 VPU lanes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

NEG_INF = -(1 << 30)  # python int: literal, not a shared captured Array


class SWParams(NamedTuple):
    o_del: int
    e_del: int
    o_ins: int
    e_ins: int
    zdrop: int
    end_bonus: int  # pen_clip of the extension side (w-cap term only)
    mat_max: int    # match score a (also the max entry of the matrix)
    mat_mis: int = 4   # mismatch penalty b (positive)
    mat_amb: int = -1  # score vs N (bwa_fill_scmat: -1)


class SWResult(NamedTuple):
    score: jax.Array    # int32[B]
    qle: jax.Array      # int32[B] query consumed at local max
    tle: jax.Array      # int32[B] target consumed at local max
    gtle: jax.Array     # int32[B] target consumed at best to-query-end score
    gscore: jax.Array   # int32[B] best to-query-end score (-1 if none)
    max_off: jax.Array  # int32[B] max diagonal offset at improvements


def sw_extend_auto(query, qlen, target, tlen, h0, w, mat, p: SWParams,
                   t_max: int | None = None) -> SWResult:
    """sw_extend via the Pallas kernel on accelerators (bit-identical;
    ~4x at extension shapes), the jnp row-loop on CPU."""
    try:
        # honor jax.default_device(cpu) contexts: the escalation ladder
        # routes to the in-process CPU backend under the axon relay
        # (pipeline.Aligner._esc_ctx) while the process default stays
        # the accelerator
        d = jax.config.jax_default_device
        plat = d.platform if d is not None else jax.default_backend()
        on_tpu = plat not in ("cpu",)
    except Exception:  # noqa: BLE001
        on_tpu = False
    if on_tpu:
        from .sw_pallas import sw_extend_pallas
        return sw_extend_pallas(query, qlen, target, tlen, h0, int(w),
                                None, p, t_max=t_max)
    return sw_extend(query, qlen, target, tlen, h0, w, mat, p, t_max=t_max)


def sw_extend(query, qlen, target, tlen, h0, w, mat, p: SWParams,
              t_max: int | None = None) -> SWResult:
    """Batched extension SW. query int32[B, QP], target int32[B, TP]
    (codes 0..4), qlen/tlen/h0 int32[B], w python int (band width before
    per-lane clamping). `mat` is accepted for signature stability but the
    score is computed arithmetically (bwa_fill_scmat is structural: match
    a / mismatch -b / anything-vs-N -1) — no [5, B, QP] profile gather.
    Lanes with qlen<=0 or tlen<=0 return (h0, 0, 0, 0, -1, 0) like the
    caller's skip path.
    """
    B, QP = query.shape
    TP = target.shape[1] if t_max is None else t_max
    oe_del = p.o_del + p.e_del
    oe_ins = p.o_ins + p.e_ins
    jr = jnp.arange(QP + 2, dtype=jnp.int32)[None, :]   # eh index space
    jq = jnp.arange(QP, dtype=jnp.int32)[None, :]       # column index space

    qlen = qlen.astype(jnp.int32)
    tlen = tlen.astype(jnp.int32)
    h0 = h0.astype(jnp.int32)

    # per-lane band clamp (scalarBandedSWA:146-157)
    max_ins = ((qlen * p.mat_max + p.end_bonus - p.o_ins) // p.e_ins + 1)
    max_del = ((qlen * p.mat_max + p.end_bonus - p.o_del) // p.e_del + 1)
    weff = jnp.minimum(jnp.int32(w),
                       jnp.maximum(jnp.minimum(max_ins, max_del), 1))

    # first row: eh_h[0]=h0, eh_h[j>=1] = max(h0 - oe_ins - (j-1)e_ins, 0)
    ramp = h0[:, None] - oe_ins - (jr - 1) * p.e_ins
    eh_h = jnp.where(jr == 0, h0[:, None],
                     jnp.where(jr <= qlen[:, None], jnp.maximum(ramp, 0), 0))
    eh_e = jnp.zeros((B, QP + 2), jnp.int32)

    qcl = jnp.clip(query, 0, 4).astype(jnp.int32)

    st = dict(
        eh_h=eh_h, eh_e=eh_e,
        beg=jnp.zeros(B, jnp.int32), end=qlen,
        mx=h0, max_i=jnp.full(B, -1, jnp.int32),
        max_j=jnp.full(B, -1, jnp.int32), max_ie=jnp.full(B, -1, jnp.int32),
        gscore=jnp.full(B, -1, jnp.int32), max_off=jnp.zeros(B, jnp.int32),
        dead=(qlen <= 0) | (tlen <= 0),
    )
    def row(i, st):
        i = jnp.int32(i)
        active = ~st["dead"] & (i < tlen)
        beg = jnp.maximum(st["beg"], i - weff)
        end = jnp.minimum(jnp.minimum(st["end"], i + weff + 1), qlen)
        h1_init = jnp.where(beg == 0,
                            jnp.maximum(h0 - (p.o_del + p.e_del * (i + 1)), 0),
                            0)

        tbase = jax.lax.dynamic_index_in_dim(
            target, jnp.minimum(i, target.shape[1] - 1), axis=1,
            keepdims=False)
        tb = tbase[:, None]
        q = jnp.where((tb >= 4) | (qcl >= 4), jnp.int32(p.mat_amb),
                      jnp.where(qcl == tb, jnp.int32(p.mat_max),
                                jnp.int32(-p.mat_mis)))     # [B, QP]

        in_band = (jq >= beg[:, None]) & (jq < end[:, None])
        Hprev = st["eh_h"][:, :QP]                          # H(i-1, j-1)
        E = st["eh_e"][:, :QP]                              # E(i, j)
        M = jnp.where(Hprev != 0, Hprev + q, 0)
        # F scan: f[beg]=0; f[j] = max_{k<j}(t_k - (j-1-k)e_ins), t>=0
        t_ins = jnp.where(in_band, jnp.maximum(M - oe_ins, 0), NEG_INF)
        v = t_ins + jq * p.e_ins
        cm = jax.lax.cummax(v, axis=1)
        cm_shift = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF), cm[:, :-1]], axis=1)
        F = jnp.maximum(cm_shift - (jq - 1) * p.e_ins, 0)
        H = jnp.maximum(jnp.maximum(M, E), F)
        H = jnp.where(in_band, H, 0)

        # row max: last argmax (mj = m > h ? mj : j)
        mrow = jnp.max(jnp.where(in_band, H, 0), axis=1)
        is_max = in_band & (H == mrow[:, None]) & (mrow[:, None] > 0)
        mj = jnp.max(jnp.where(is_max, jq, -1), axis=1)

        # eh updates: eh_h[j] = H(i, j-1) for j in (beg, end]; eh_h[beg]=h1_init
        Hsh = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), H,
                               jnp.zeros((B, 1), jnp.int32)], axis=1)
        wr_h = (jr > beg[:, None]) & (jr <= end[:, None])
        new_h = jnp.where(wr_h, Hsh, st["eh_h"])
        new_h = jnp.where(jr == beg[:, None], h1_init[:, None], new_h)
        Epad = jnp.concatenate(
            [jnp.where(in_band,
                       jnp.maximum(jnp.maximum(M - oe_del, 0), E - p.e_del), 0),
             jnp.zeros((B, 2), jnp.int32)], axis=1)
        wr_e = (jr >= beg[:, None]) & (jr < end[:, None])
        new_e = jnp.where(wr_e, Epad, st["eh_e"])
        new_e = jnp.where(jr == end[:, None], 0, new_e)
        # h1 after the loop = H(i, end-1) (or h1_init when band empty)
        h1_last = jnp.where(
            end > beg,
            jnp.take_along_axis(Hsh, jnp.maximum(end, 0)[:, None], axis=1)[:, 0],
            h1_init)

        upd = active
        eh_h2 = jnp.where(upd[:, None], new_h, st["eh_h"])
        eh_e2 = jnp.where(upd[:, None], new_e, st["eh_e"])

        at_qend = upd & (end == qlen)
        # ties move max_ie forward (max_ie = gscore > h1 ? max_ie : i)
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
                            jnp.maximum(st["max_off"], jnp.abs(mj - i)),
                            st["max_off"])
        # z-drop (scalarBandedSWA:215-221)
        ddiag = jnp.where(i - st["max_i"] > mj - st["max_j"],
                          (i - st["max_i"]) - (mj - st["max_j"]),
                          (mj - st["max_j"]) - (i - st["max_i"]))
        epen = jnp.where(i - st["max_i"] > mj - st["max_j"], p.e_del, p.e_ins)
        zdie = still & ~improved & (p.zdrop > 0) & \
            (st["mx"] - mrow - ddiag * epen > p.zdrop)
        alive = still & ~zdie

        # band narrowing over the updated eh arrays
        nz = (eh_h2 != 0) | (eh_e2 != 0)
        cand_b = nz & (jr >= beg[:, None]) & (jr < end[:, None])
        first_nz = jnp.min(jnp.where(cand_b, jr, end[:, None]), axis=1)
        nbeg = first_nz
        cand_e = nz & (jr >= nbeg[:, None]) & (jr <= end[:, None])
        last_nz = jnp.max(jnp.where(cand_e, jr, nbeg[:, None] - 1), axis=1)
        nend = jnp.minimum(last_nz + 2, qlen)

        return dict(
            eh_h=eh_h2, eh_e=eh_e2,
            beg=jnp.where(alive, nbeg, beg),
            end=jnp.where(alive, nend, end),
            mx=mx, max_i=max_i, max_j=max_j, max_ie=max_ie,
            gscore=gscore, max_off=max_off,
            dead=st["dead"] | died_zero | zdie,
        )

    # early exit once every lane is dead or past its target length
    def cond(c):
        i, st = c
        return (i < TP) & jnp.any(~st["dead"] & (i < tlen))

    def body(c):
        i, st = c
        return (i + 1, row(i, st))

    _, st = jax.lax.while_loop(cond, body, (jnp.int32(0), st))
    return SWResult(score=st["mx"], qle=st["max_j"] + 1, tle=st["max_i"] + 1,
                    gtle=st["max_ie"] + 1, gscore=st["gscore"],
                    max_off=st["max_off"])
