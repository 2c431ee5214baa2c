"""Seed-chaining state machine in Pallas (TPU).

The jnp chain loop (align/chain.chain_seeds) is a lax.while_loop over
seed slots whose body is pure [B, C] VPU work — its cost is per-STEP
dispatch (~0.3 ms floor at B=1024) times up to P steps, and the state
round-trips HBM every step. This kernel keeps a read tile's whole chain
table in VMEM and runs all seed steps in one launch — the same move
that took PairHMM from 14 to 69 GCUPS (ops/pairhmm_pallas.py) and
banded SW 54.9 -> 14.1 ms (ops/sw_pallas.py).

Semantics are a slot-for-slot transcription of the chain_seeds body
(itself transcribing the reference's B-tree chaining,
mem_chain_seeds_new src/bwamem.cpp:1163-1237): integer arithmetic only,
so parity with the jnp loop is bit-identical (tested).

Layout: READS on the lane dimension (TILE_B per grid step), chain slots
C on sublanes; per-seed-step inputs are dynamic slices of the leading
(seed slot) dimension. Each tile loops only to its own last occupied
seed slot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 256

# scratch field rows (each C tall): insertion-order chain table
(_POS, _CRID, _FQ, _FR, _LQ, _LR, _LL, _NS, _WQ, _WR,
 _QEND, _REND) = range(12)
N_FIELDS = 12
N_OUT = 10  # pos..wr are returned; qend/rend are loop-internal


def _kernel(qbeg_ref, rbeg_ref, slen_ref, rid_ref, valid_ref,
            lpac_ref, ovf_in_ref,
            state_ref, n_ref, ovf_ref, chain_of_ref,
            st, sc,
            *, C, P, w, max_chain_gap):
    B = qbeg_ref.shape[1]
    ciota = jax.lax.broadcasted_iota(jnp.int32, (C, B), 0)
    piota = jax.lax.broadcasted_iota(jnp.int32, (P, B), 0)
    l_pac = lpac_ref[:]                                   # (1, B)

    st[:] = jnp.zeros((N_FIELDS * C, B), jnp.int32)
    # scalar rows: 0 = n_chains, 1 = overflow flag
    sc[:] = jnp.concatenate(
        [jnp.zeros((1, B), jnp.int32), ovf_in_ref[:]], axis=0)
    chain_of_ref[:] = jnp.full((P, B), -1, jnp.int32)

    vmask = valid_ref[:] != 0                             # (P, B)
    t_max = jnp.max(jnp.where(vmask, piota + 1, 0))

    def fld(f):
        return st[pl.ds(f * C, C), :]

    def step(t, _):
        row = lambda r: r[pl.ds(t, 1), :]                 # (1, B)
        v = row(valid_ref) != 0
        qb, rb, ln, rd = (row(qbeg_ref), row(rbeg_ref),
                          row(slen_ref), row(rid_ref))
        n = sc[pl.ds(0, 1), :]
        ovf = sc[pl.ds(1, 1), :]

        pos, crid = fld(_POS), fld(_CRID)
        fq, fr = fld(_FQ), fld(_FR)
        lq, lr, ll, ns = fld(_LQ), fld(_LR), fld(_LL), fld(_NS)
        wq, wr, qend, rend = fld(_WQ), fld(_WR), fld(_QEND), fld(_REND)

        have = ciota < n
        elig = have & (pos <= rb)
        maxpos = jnp.max(jnp.where(elig, pos, -1), axis=0, keepdims=True)
        tie = elig & (pos == maxpos)
        lo = jnp.max(jnp.where(tie, ciota, 0), axis=0, keepdims=True)
        has_lo = jnp.max(jnp.where(elig, 1, 0), axis=0, keepdims=True) != 0

        oh_lo = ciota == lo
        g = lambda a: jnp.sum(jnp.where(oh_lo, a, 0), axis=0, keepdims=True)
        g_lq, g_lr, g_ll = g(lq), g(lr), g(ll)
        g_fq, g_fr = g(fq), g(fr)
        g_qend, g_rend = g(qend), g(rend)
        same_rid = g(crid) == rd
        contained = (qb >= g_fq) & (qb + ln <= g_lq + g_ll) & \
            (rb >= g_fr) & (rb + ln <= g_lr + g_ll)
        diff_strand = ((g_lr < l_pac) | (g_fr < l_pac)) & (rb >= l_pac)
        x = qb - g_lq
        y = rb - g_lr
        growable = (y >= 0) & (x - y <= w) & (y - x <= w) & \
            (x - g_ll < max_chain_gap) & (y - g_ll < max_chain_gap)

        merged_contained = v & has_lo & same_rid & contained
        appended = v & has_lo & same_rid & ~contained & ~diff_strand & \
            growable
        new_chain = v & ~(merged_contained | appended)

        # --- append to chain `lo` ---
        app_m = oh_lo & appended
        dq = jnp.where(qb >= g_qend, ln, jnp.maximum(qb + ln - g_qend, 0))
        dr = jnp.where(rb >= g_rend, ln, jnp.maximum(rb + ln - g_rend, 0))
        lq2 = jnp.where(app_m, qb, lq)
        lr2 = jnp.where(app_m, rb, lr)
        ll2 = jnp.where(app_m, ln, ll)
        ns2 = jnp.where(app_m, g(ns) + 1, ns)
        wq2 = jnp.where(app_m, g(wq) + dq, wq)
        wr2 = jnp.where(app_m, g(wr) + dr, wr)
        qend2 = jnp.where(app_m, jnp.maximum(g_qend, qb + ln), qend)
        rend2 = jnp.where(app_m, jnp.maximum(g_rend, rb + ln), rend)

        # --- new chain in slot n ---
        room = n < C
        slot = jnp.where(new_chain & room, n, C)
        oh_slot = ciota == slot
        put = lambda a, val: jnp.where(oh_slot, val, a)
        one = jnp.ones((1, B), jnp.int32)
        st[pl.ds(_POS * C, C), :] = put(pos, rb)
        st[pl.ds(_CRID * C, C), :] = put(crid, rd)
        st[pl.ds(_FQ * C, C), :] = put(fq, qb)
        st[pl.ds(_FR * C, C), :] = put(fr, rb)
        st[pl.ds(_LQ * C, C), :] = put(lq2, qb)
        st[pl.ds(_LR * C, C), :] = put(lr2, rb)
        st[pl.ds(_LL * C, C), :] = put(ll2, ln)
        st[pl.ds(_NS * C, C), :] = put(ns2, one)
        st[pl.ds(_WQ * C, C), :] = put(wq2, ln)
        st[pl.ds(_WR * C, C), :] = put(wr2, ln)
        st[pl.ds(_QEND * C, C), :] = put(qend2, qb + ln)
        st[pl.ds(_REND * C, C), :] = put(rend2, rb + ln)
        sc[pl.ds(0, 1), :] = n + (new_chain & room).astype(jnp.int32)
        sc[pl.ds(1, 1), :] = ovf | (new_chain & (n >= C)).astype(jnp.int32)

        cid = jnp.where(appended | merged_contained, lo,
                        jnp.where(new_chain & (slot < C), slot, -1))
        cid = jnp.where(merged_contained, -1, cid)
        chain_of_ref[pl.ds(t, 1), :] = jnp.where(v, cid, -1)
        return 0

    jax.lax.while_loop(lambda i: i < t_max,
                       lambda i: (step(i, 0), i + 1)[1], jnp.int32(0))
    state_ref[:] = st[pl.ds(0, N_OUT * C), :]
    n_ref[:] = sc[pl.ds(0, 1), :]
    ovf_ref[:] = sc[pl.ds(1, 1), :]


def _fit_tile(P: int, C: int):
    """Widest lane tile (>=128, Pallas' lane-dim minimum) whose modeled
    VMEM stays under 6 MB — Mosaic double-buffers grid inputs/outputs,
    so actual scoped use is ~2x the model (P=1024/C=128 OOMed at
    16.01M against the 16M budget with a 12 MB model). Returns None
    when even 128 lanes do not fit (extreme escalated shapes): the
    caller then uses the jnp while-loop path."""
    tile_b = TILE_B
    while (5 * P + N_OUT * C + P) * tile_b * 4 \
            + (N_FIELDS * C + 2) * tile_b * 4 > 6 * 2**20:
        if tile_b <= 128:
            return None
        tile_b //= 2
    return tile_b


def fits_vmem(P: int, C: int) -> bool:
    return _fit_tile(P, C) is not None


@functools.partial(jax.jit,
                   static_argnames=("C", "w", "max_chain_gap",
                                    "interpret"))
def chain_loop_pallas(qbeg, rbeg, slen, rid, valid, overflow, l_pac,
                      C: int, w: int, max_chain_gap: int,
                      interpret: bool = False):
    """Runs the chain-table construction loop; same state dict as the
    jnp while_loop in align/chain.chain_seeds (bit-identical).

    qbeg/rbeg/slen/rid int32[B, P]; valid bool[B, P]; overflow bool[B];
    l_pac int32 scalar. Returns dict with pos/crid/fq/fr/lq/lr/ll/ns/
    wq/wr int32[B, C], n int32[B], chain_of int32[B, P], ovf bool[B].
    """
    B, P = qbeg.shape
    # VMEM per grid step scales with P and C; the escalation ladder's
    # widened shapes (P=1024, C=256) need a narrower lane tile to stay
    # under the ~16 MB scoped budget (measured 20 MB at TILE_B=256)
    tile_b = _fit_tile(P, C)
    if tile_b is None:
        raise ValueError("chain tile cannot fit VMEM at these shapes")
    pad = (-B) % tile_b
    if pad:
        zi = lambda a: jnp.pad(a, ((0, pad), (0, 0)))
        qbeg, rbeg, slen = zi(qbeg), zi(rbeg), zi(slen)
        rid, valid = zi(rid), zi(valid)
        overflow = jnp.pad(overflow, (0, pad))
    BP = qbeg.shape[0]
    tr = lambda a: a.T.astype(jnp.int32)
    lpac_row = jnp.broadcast_to(jnp.int32(l_pac), (1, BP))
    ovf_row = overflow.astype(jnp.int32).reshape(1, BP)

    grid = (BP // tile_b,)
    tile = lambda rows: pl.BlockSpec((rows, tile_b), lambda g: (0, g),
                                     memory_space=pltpu.VMEM)
    state, n, ovf, chain_of = pl.pallas_call(
        functools.partial(_kernel, C=C, P=P, w=int(w),
                          max_chain_gap=int(max_chain_gap)),
        grid=grid,
        in_specs=[tile(P)] * 5 + [tile(1), tile(1)],
        out_specs=[tile(N_OUT * C), tile(1), tile(1), tile(P)],
        out_shape=[jax.ShapeDtypeStruct((N_OUT * C, BP), jnp.int32),
                   jax.ShapeDtypeStruct((1, BP), jnp.int32),
                   jax.ShapeDtypeStruct((1, BP), jnp.int32),
                   jax.ShapeDtypeStruct((P, BP), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((N_FIELDS * C, tile_b), jnp.int32),
                        pltpu.VMEM((2, tile_b), jnp.int32)],
        interpret=interpret,
    )(tr(qbeg), tr(rbeg), tr(slen), tr(rid), tr(valid),
      lpac_row, ovf_row)

    f = lambda i: state[i * C:(i + 1) * C, :B].T
    return dict(pos=f(_POS), crid=f(_CRID), fq=f(_FQ), fr=f(_FR),
                lq=f(_LQ), lr=f(_LR), ll=f(_LL), ns=f(_NS),
                wq=f(_WQ), wr=f(_WR),
                n=n[0, :B], chain_of=chain_of[:, :B].T,
                ovf=ovf[0, :B] != 0)
