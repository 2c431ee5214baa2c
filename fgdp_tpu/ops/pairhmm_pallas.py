"""PairHMM forward kernel in Pallas (TPU).

The jnp row-loop (ops/pairhmm.py) round-trips the M/X/Y state through HBM
on every read row; this kernel keeps the whole DP state of a pair tile in
VMEM and streams only the inputs — the TPU analogue of the reference's
register-striped AVX kernel (deepmutect .../intel/pairhmm/
avx-pairhmm-template.h:204).

Layout: PAIRS on the lane dimension (TILE_P pairs per grid step),
haplotype columns on sublanes — so per-read-row inputs are dynamic slices
of the leading (sublane) dimension, which Mosaic supports, and per-pair
scalars broadcast naturally as [1, TILE_P] rows. The in-row deletion
recurrence is computed by log-doubling sublane shifts (associative).

Numerics match ops/pairhmm._forward (same op order); tests compare the
two lane-for-lane.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pairhmm import GM, MM, MX, MY, XX, YY

TILE_P = 256    # pairs per grid step (2 lane tiles; measured optimum)


def _kernel(reads_ref, pq_ref, trans_ref, haps_ref, rlens_ref, hlens_ref,
            acc_ref, m_ref, x_ref, y_ref, *, R, H, n_doubling):
    P = reads_ref.shape[1]
    init_const = jnp.float32(2.0) ** 120
    hlens = hlens_ref[:]                               # (1, P) int32
    rlens = rlens_ref[:]                               # (1, P)

    jrow = jax.lax.broadcasted_iota(jnp.int32, (H + 1, P), 0)
    col_valid = (jrow >= 1) & (jrow <= hlens)
    hap_at = jnp.concatenate(
        [jnp.full((1, P), 4, jnp.int32), haps_ref[:]], axis=0)
    hap_ge4 = hap_at >= 4        # hoisted out of the row loop

    m_ref[:] = jnp.zeros((H + 1, P), jnp.float32)
    x_ref[:] = jnp.zeros((H + 1, P), jnp.float32)
    y_ref[:] = jnp.broadcast_to(init_const / hlens.astype(jnp.float32),
                                (H + 1, P))
    acc_ref[:] = jnp.zeros((1, P), jnp.float32)

    def shiftk(a, k):
        z = jnp.zeros((k, P), jnp.float32)
        return jnp.concatenate([z, a[:H + 1 - k]], axis=0)

    def row(i, _):
        rbase = reads_ref[pl.ds(i, 1), :]              # (1, P)
        pq_i = pq_ref[pl.ds(i, 1), :]
        t_mm = trans_ref[pl.ds(i * 6 + MM, 1), :]
        t_gm = trans_ref[pl.ds(i * 6 + GM, 1), :]
        t_mx = trans_ref[pl.ds(i * 6 + MX, 1), :]
        t_xx = trans_ref[pl.ds(i * 6 + XX, 1), :]
        t_my = trans_ref[pl.ds(i * 6 + MY, 1), :]
        t_yy = trans_ref[pl.ds(i * 6 + YY, 1), :]
        Mp, Xp, Yp = m_ref[:], x_ref[:], y_ref[:]
        match = (hap_at == rbase) | hap_ge4 | (rbase >= 4)
        prior = jnp.where(match, 1.0 - pq_i, pq_i / 3.0)
        # j == 0 boundary rows need no masks: the row-1 shifts insert 0,
        # so Mi[0] = Xi[0] = 0 inductively and the scan's y[0] = u[0] = 0
        Mi = prior * (shiftk(Mp, 1) * t_mm +
                      shiftk(Xp + Yp, 1) * t_gm)
        Xi = Mp * t_mx + Xp * t_xx
        u = shiftk(Mi, 1) * t_my
        cp = t_yy
        y = u
        k = 1
        for _ in range(n_doubling):
            y = y + cp * shiftk(y, k)
            cp = cp * cp
            k <<= 1
        Yi = y
        # select, not arithmetic blend: x*1 + y*0 equals where(live,x,y)
        # bit-for-bit for finite values but turns inf/nan in the dead
        # branch into nan; where() is also 1 op/state vs 3
        live = i < rlens
        m_ref[:] = jnp.where(live, Mi, Mp)
        x_ref[:] = jnp.where(live, Xi, Xp)
        y_ref[:] = jnp.where(live, Yi, Yp)
        return 0

    # rows beyond every lane's read length are frozen by the live
    # blend — stop at the tile's max rlen instead of the padded R
    r_hi = jnp.minimum(jnp.max(rlens), R)
    jax.lax.while_loop(lambda i: i < r_hi,
                       lambda i: (row(i, 0), i + 1)[1], jnp.int32(0))
    # the live blend freezes each lane's state at its rlens-th row, so
    # the final-row sum (the GKL kernel's result accumulation) needs no
    # per-row latch — one reduction after the loop replaces an [H, P]
    # masked rowsum in every row (~20% of loop ops)
    acc_ref[:] = jnp.sum(jnp.where(col_valid, m_ref[:] + x_ref[:], 0.0),
                         axis=0, keepdims=True)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "n_doubling_cap"))
def forward_f32_pallas(reads, rlens, pq, trans, haps, hlens,
                       interpret=False, n_doubling_cap=None):
    """Same contract as pairhmm.forward_f32 (log10 lik, raw sums).
    reads int32[NP, R], pq f32[NP, R], trans f32[NP, R, 6],
    haps int32[NP, H], rlens/hlens int32[NP]. n_doubling_cap: see
    pairhmm.doubling_cap — truncates the in-row scan where extra
    doublings are bit-exact no-ops (t_yy^(2^d) rounds to 0)."""
    NP, R = reads.shape
    H = haps.shape[1]
    pad = (-NP) % TILE_P
    if pad:
        z = lambda a: jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        reads, pq, trans, haps = map(z, (reads, pq, trans, haps))
        rlens = jnp.pad(rlens, (0, pad), constant_values=1)
        hlens = jnp.pad(hlens, (0, pad), constant_values=1)
    NPP = reads.shape[0]
    # transpose: rows/components leading, pairs on lanes
    reads_T = reads.T.astype(jnp.int32)                  # [R, NPP]
    pq_T = pq.T.astype(jnp.float32)
    trans_T = jnp.moveaxis(trans, 0, 2).reshape(R * 6, NPP) \
        .astype(jnp.float32)                             # [(i,c) -> i*6+c]
    haps_T = haps.T.astype(jnp.int32)                    # [H, NPP]
    rlens_T = rlens.reshape(1, NPP).astype(jnp.int32)
    hlens_T = hlens.reshape(1, NPP).astype(jnp.int32)

    n_doubling = max(1, int(np.ceil(np.log2(max(H, 2)))))
    if n_doubling_cap is not None:
        n_doubling = min(n_doubling, n_doubling_cap)
    grid = (NPP // TILE_P,)
    tile = lambda rows: pl.BlockSpec((rows, TILE_P), lambda g: (0, g),
                                     memory_space=pltpu.VMEM)
    acc = pl.pallas_call(
        functools.partial(_kernel, R=R, H=H, n_doubling=n_doubling),
        grid=grid,
        in_specs=[tile(R), tile(R), tile(R * 6), tile(H), tile(1), tile(1)],
        out_specs=tile(1),
        out_shape=jax.ShapeDtypeStruct((1, NPP), jnp.float32),
        scratch_shapes=[pltpu.VMEM((H + 1, TILE_P), jnp.float32)
                        for _ in range(3)],
        interpret=interpret,
    )(reads_T, pq_T, trans_T, haps_T, rlens_T, hlens_T)
    acc = acc[0, :NP]
    log10_ic = jnp.float32(120 * np.log10(2.0))
    out = jnp.log10(jnp.maximum(acc, jnp.finfo(jnp.float32).tiny)) - log10_ic
    return out, acc
