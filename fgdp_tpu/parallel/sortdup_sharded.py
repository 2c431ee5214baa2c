"""Contig-range-sharded sort + duplicate marking over a device mesh.

The SP/context-parallel analogue from SURVEY §2.4: the reference
partitions the unified 64-bit coordinate space into 100 host-memory
ranges (sortmardup/main.cpp:106-115, RangePartitioner
tbb/range_partitioner.h:34); here the ranges are mesh shards. Records
land on devices in arbitrary (aligner-output) order; a capacity-bounded
`all_to_all` routes each record to the shard owning its coordinate
range, each shard runs the single-device sort/scan kernels
(sortdup/engine.py) on its range, and flags ride the reverse
`all_to_all` back to the producers.

Range partitioning preserves the reference's key invariant: records
with equal duplicate keys share a 5' coordinate, so equal-key runs
never straddle shards and the per-shard run scans are exact. The one
cross-shard data flow is the doubles' end indicator (a pair owned by
shard(p5a) may have its p5b end inside another shard's range): those
(p5+strand*L) keys are routed by their own coordinate, mirroring the
reference's single shared `double_pair_indicator` bitmap.

Everything is static-shaped: per-(source, dest) routing capacity is a
parameter; exceeding it sets an overflow flag (the driver can re-run
with a larger capacity), never silently drops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..sortdup import engine

_LO_BITS = engine._LO_BITS
_LO_MASK = engine._LO_MASK
_BIG = 2**31 - 1  # python int: literal, not a shared captured Array


def make_splitters(total_hi: int, total_lo: int, n_shards: int):
    """Range split points over [0, total): (hi, lo) int32[n_shards-1].
    total = the doubled coordinate domain 2*L (strand offset included)."""
    total = (int(total_hi) << _LO_BITS) | int(total_lo)
    pts = [(total * i) // n_shards for i in range(1, n_shards)]
    hi = np.asarray([p >> _LO_BITS for p in pts], np.int32)
    lo = np.asarray([p & _LO_MASK for p in pts], np.int32)
    return hi, lo


def _dest_of(hi, lo, split_hi, split_lo):
    """Shard index by lexicographic (hi, lo) against the splitters."""
    ge = (hi[:, None] > split_hi[None, :]) | \
        ((hi[:, None] == split_hi[None, :]) & (lo[:, None] >= split_lo[None, :]))
    return jnp.sum(ge, axis=1).astype(jnp.int32)


def _route_out(arrs, dest, valid, n: int, cap: int):
    """Group each device's records into [n, cap] per-destination send
    buffers (argsort grouping — no serialized scatters on the hot path).
    Returns (routed list, send_valid [n, cap], slot [N], overflow)."""
    N = dest.shape[0]
    dest = jnp.where(valid, dest, n)          # invalid -> virtual dest n
    order = jnp.argsort(dest, stable=True)
    dsorted = jnp.take(dest, order)
    start = jnp.searchsorted(dsorted, jnp.arange(n + 1, dtype=jnp.int32))
    pos = jnp.arange(N, dtype=jnp.int32) - jnp.take(start, dsorted)
    overflow = jnp.any((pos >= cap) & (dsorted < n))
    idx = start[:n, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
    send_valid = idx < start[1:n + 1, None]
    take = jnp.take(order, jnp.clip(idx, 0, N - 1))
    routed = [jnp.where(send_valid, jnp.take(a, take), _BIG) for a in arrs]
    slot = jnp.zeros(N, jnp.int32).at[order].set(pos)
    return routed, send_valid, slot, overflow


def _exchange(x, axis: str):
    return jax.lax.all_to_all(x, axis, split_axis=0, concat_axis=0,
                              tiled=True)


def _sharded_markdup_body(
    axis, n, cap, ind_cap,
    dbl_p5a_hi, dbl_p5a_lo, dbl_orient, dbl_p5b_hi, dbl_p5b_lo,
    dbl_score, dbl_tile, dbl_x, dbl_y, dbl_valid,
    sgl_p5_hi, sgl_p5_lo, sgl_rev, sgl_score, sgl_tile, sgl_x, sgl_y,
    sgl_valid, split_hi, split_lo, ref_len_hi, ref_len_lo,
):
    """shard_map body: per-device [N] record slices in, dup flags out."""
    # ---- doubles: route by p5a ----
    d_dest = _dest_of(dbl_p5a_hi, dbl_p5a_lo, split_hi, split_lo)
    d_arrs = [dbl_p5a_hi, dbl_p5a_lo, dbl_orient, dbl_p5b_hi, dbl_p5b_lo,
              dbl_score, dbl_tile, dbl_x, dbl_y]
    d_routed, d_sv, d_slot, ovf1 = _route_out(d_arrs, d_dest, dbl_valid,
                                              n, cap)
    d_rx = [_exchange(a, axis) for a in d_routed]
    d_rxv = _exchange(d_sv, axis)
    flat = lambda a: a.reshape(-1)
    lv = flat(d_rxv)
    dup_d_local = engine.mark_doubles(*(flat(a) for a in d_rx), lv)

    # ---- indicator ends: route by their own (p5 + strand*L) key ----
    ih, il = engine.indicator_keys(dbl_p5a_hi, dbl_p5a_lo, dbl_orient,
                                   dbl_p5b_hi, dbl_p5b_lo, dbl_valid,
                                   ref_len_hi, ref_len_lo)
    iv = jnp.concatenate([dbl_valid, dbl_valid])
    i_dest = _dest_of(ih, il, split_hi, split_lo)
    i_routed, i_sv, _, ovf2 = _route_out([ih, il], i_dest, iv, n, ind_cap)
    i_rx = [_exchange(a, axis) for a in i_routed]
    i_rxv = _exchange(i_sv, axis)
    ind_hi = jnp.where(flat(i_rxv), flat(i_rx[0]), _BIG)
    ind_lo = jnp.where(flat(i_rxv), flat(i_rx[1]), _BIG)
    ind_hi, ind_lo = jax.lax.sort((ind_hi, ind_lo), dimension=0, num_keys=2)

    # ---- singles: route by (p5 + strand*L) so the indicator lookup and
    # the (p5, rev) run key live on the same shard ----
    s_lo2 = sgl_p5_lo + jnp.where(sgl_rev > 0, ref_len_lo, 0)
    s_hi2 = sgl_p5_hi + jnp.where(sgl_rev > 0, ref_len_hi, 0) \
        + (s_lo2 >> _LO_BITS)
    s_lo2 = s_lo2 & _LO_MASK
    s_dest = _dest_of(s_hi2, s_lo2, split_hi, split_lo)
    s_arrs = [sgl_p5_hi, sgl_p5_lo, sgl_rev, sgl_score, sgl_tile, sgl_x,
              sgl_y]
    s_routed, s_sv, s_slot, ovf3 = _route_out(s_arrs, s_dest, sgl_valid,
                                              n, cap)
    s_rx = [_exchange(a, axis) for a in s_routed]
    s_rxv = _exchange(s_sv, axis)
    sv = flat(s_rxv)
    dup_s_local = engine.mark_singles(*(flat(a) for a in s_rx), sv,
                                      ind_hi, ind_lo, ref_len_hi,
                                      ref_len_lo)

    # ---- flags back to producers ----
    back_d = _exchange(dup_d_local.reshape(n, cap), axis)
    back_s = _exchange(dup_s_local.reshape(n, cap), axis)
    pick = lambda b, d, s: b[jnp.clip(d, 0, n - 1),
                             jnp.clip(s, 0, cap - 1)]
    dup_dbl = pick(back_d, d_dest, d_slot) & dbl_valid
    dup_sgl = pick(back_s, s_dest, s_slot) & sgl_valid
    overflow = ovf1 | ovf2 | ovf3
    return dup_dbl, dup_sgl, overflow[None]


def sharded_mark_duplicates(mesh: Mesh, args: dict, total_hi, total_lo,
                            per_dest_cap: int | None = None,
                            axis: str = "sp"):
    """Run duplicate marking over the mesh. `args` carries the same
    arrays as engine.mark_duplicates (global leading dim divisible by
    the mesh size). Returns (dup_dbl, dup_sgl, overflow bool)."""
    from jax import shard_map

    n = mesh.shape[axis]
    nd = args["dbl_p5a_hi"].shape[0]
    ns = args["sgl_p5_hi"].shape[0]
    if per_dest_cap is None:
        per_dest_cap = max(nd, ns) // n     # = full local slice
    ind_cap = 2 * per_dest_cap
    split_hi, split_lo = make_splitters(total_hi, total_lo, n)

    names = ["dbl_p5a_hi", "dbl_p5a_lo", "dbl_orient", "dbl_p5b_hi",
             "dbl_p5b_lo", "dbl_score", "dbl_tile", "dbl_x", "dbl_y",
             "dbl_valid", "sgl_p5_hi", "sgl_p5_lo", "sgl_rev",
             "sgl_score", "sgl_tile", "sgl_x", "sgl_y", "sgl_valid"]
    body = functools.partial(_sharded_markdup_body, axis, n,
                             per_dest_cap, ind_cap)
    sharded = P(axis)
    rep = P()
    fn = shard_map(
        body, mesh=mesh,
        in_specs=tuple([sharded] * 18 + [rep] * 4),
        out_specs=(sharded, sharded, sharded),
        )
    fn = jax.jit(fn)
    dup_dbl, dup_sgl, ovf = fn(
        *[jnp.asarray(args[k]) for k in names],
        jnp.asarray(split_hi), jnp.asarray(split_lo),
        jnp.asarray(args["ref_len_hi"]), jnp.asarray(args["ref_len_lo"]))
    return dup_dbl, dup_sgl, bool(np.asarray(ovf).any())


# ------------------------------------------------------------------
# Sharded coordinate sort
# ------------------------------------------------------------------

def _sharded_sort_body(axis, n, cap, uc_hi, uc_lo, valid, gidx,
                       split_hi, split_lo):
    dest = _dest_of(uc_hi, uc_lo, split_hi, split_lo)
    routed, sv, _, ovf = _route_out([uc_hi, uc_lo, gidx], dest, valid,
                                    n, cap)
    rx = [_exchange(a, axis) for a in routed]
    rxv = _exchange(sv, axis)
    v = rxv.reshape(-1)
    keys = ((~v).astype(jnp.int32),
            jnp.where(v, rx[0].reshape(-1), _BIG),
            jnp.where(v, rx[1].reshape(-1), _BIG),
            jnp.where(v, rx[2].reshape(-1), _BIG))
    out = jax.lax.sort(keys, dimension=0, num_keys=4)
    count = jnp.sum(v.astype(jnp.int32))
    return out[3], count[None], ovf[None]


def sharded_coordinate_sort(mesh: Mesh, uc_hi, uc_lo, valid,
                            total_hi, total_lo,
                            per_dest_cap: int | None = None,
                            axis: str = "sp"):
    """Globally sort records by unified coordinate across the mesh.
    Returns (order int64[N_valid] of global indices — the concatenation
    of per-shard sorted ranges, equal to the single-device
    coordinate_sort_order — and an overflow flag)."""
    from jax import shard_map

    n = mesh.shape[axis]
    N = uc_hi.shape[0]
    if per_dest_cap is None:
        per_dest_cap = N // n
    split_hi, split_lo = make_splitters(total_hi, total_lo, n)
    gidx = jnp.arange(N, dtype=jnp.int32)
    body = functools.partial(_sharded_sort_body, axis, n, per_dest_cap)
    fn = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(axis), P(axis), P(axis))))
    order, counts, ovf = fn(jnp.asarray(uc_hi), jnp.asarray(uc_lo),
                            jnp.asarray(valid), gidx,
                            jnp.asarray(split_hi), jnp.asarray(split_lo))
    order = np.asarray(order).reshape(n, -1)
    counts = np.asarray(counts).reshape(-1)
    out = np.concatenate([order[i, :counts[i]] for i in range(n)])
    return out, bool(np.asarray(ovf).any())
