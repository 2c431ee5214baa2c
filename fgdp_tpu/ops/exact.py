"""Device RMI lookup + chunked exact search.

The TPU half of the LISA analogue (index/rmi.py): one f32 model
prediction + a bounded lockstep bisection resolves the SA interval of a
13-char chunk (vs 13 dependent occ gathers); the remaining pattern
chars extend backward 2-per-gather-pair through the lambert FM bank.
Mirrors FMI_search::exact_search (ext/TAL/src/FMI/FMI_search.cpp:2374)
and LISA exact_search_rmi_batched_k3 (LISA-FMI/LISA_search.h:180).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..index.rmi import RMIndex
from . import fm as fmops


class DeviceRMI(NamedTuple):
    keys: jax.Array        # int32[N] sorted
    slope: jax.Array       # f32[n_leaves]
    intercept: jax.Array   # f32[n_leaves]
    err_lo: jax.Array      # int32[n_leaves]
    err_hi: jax.Array      # int32[n_leaves]
    starts: jax.Array      # int32[n_leaves+1]
    shift: int             # static
    k: int                 # static

    @classmethod
    def from_host(cls, r: RMIndex) -> "DeviceRMI":
        return cls(keys=jnp.asarray(r.keys),
                   slope=jnp.asarray(r.slope),
                   intercept=jnp.asarray(r.intercept),
                   err_lo=jnp.asarray(r.err_lo),
                   err_hi=jnp.asarray(r.err_hi),
                   starts=jnp.asarray(r.starts),
                   shift=int(r.shift), k=int(r.k))


# register as pytree with static tail
jax.tree_util.register_pytree_node(
    DeviceRMI,
    lambda r: ((r.keys, r.slope, r.intercept, r.err_lo, r.err_hi,
                r.starts), (r.shift, r.k)),
    lambda aux, ch: DeviceRMI(*ch, shift=aux[0], k=aux[1]))


def _searchsorted_left(rmi: DeviceRMI, q):
    """Lockstep searchsorted-left for int32 queries q[B]: radix leaf ->
    model window intersected with the leaf row range -> bisection."""
    n_leaves = rmi.slope.shape[0]
    N = rmi.keys.shape[0]
    leaf = jnp.clip(q >> rmi.shift, 0, n_leaves - 1)
    pred = (q.astype(jnp.float32) * jnp.take(rmi.slope, leaf)
            + jnp.take(rmi.intercept, leaf)).astype(jnp.int32)
    lo = jnp.maximum(pred - jnp.take(rmi.err_lo, leaf),
                     jnp.take(rmi.starts, leaf))
    hi = jnp.minimum(pred + jnp.take(rmi.err_hi, leaf) + 1,
                     jnp.take(rmi.starts, leaf + 1))
    lo = jnp.clip(lo, 0, N)
    hi = jnp.clip(hi, lo, N)

    def step(_, c):
        lo, hi = c
        mid = (lo + hi) >> 1
        kv = jnp.take(rmi.keys, jnp.clip(mid, 0, N - 1))
        lt = (kv < q) & (lo < hi)      # converged lanes must not drift
        return (jnp.where(lt, mid + 1, lo), jnp.where(lt, hi, mid))

    lo, _ = jax.lax.fori_loop(0, 32, step, (lo, hi))
    return lo


def rmi_interval(rmi: DeviceRMI, qkeys):
    """(k, s) SA interval of packed 13-char patterns qkeys int32[B]."""
    lo = _searchsorted_left(rmi, qkeys)
    hi = _searchsorted_left(rmi, qkeys + 1)
    return lo, hi - lo


def pack_patterns(codes, start, k: int):
    """Pack k chars codes[B, L] from per-lane offsets start[B] base-5
    (+1 digit). Returns (qkeys int32[B], ok bool[B] — all chars ACGT)."""
    B, L = codes.shape
    key = jnp.zeros(B, jnp.int32)
    ok = jnp.ones(B, bool)
    for j in range(k):
        p = start + j
        a = jnp.take_along_axis(codes, jnp.clip(p, 0, L - 1)[:, None],
                                axis=1)[:, 0]
        ok = ok & (a < 4) & (p < L)
        key = key * 5 + jnp.clip(a, 0, 3).astype(jnp.int32) + 1
    return key, ok


def exact_search(fm: fmops.DeviceFMIndex, rmi: DeviceRMI, codes, lens):
    """Full-pattern exact search: interval of the whole read.

    codes int32[B, L] (0-3, >=4 ambiguous), lens int32[B]. Returns
    (k, s) int32[B]; s == 0 when the pattern does not occur. Patterns
    shorter than the RMI chunk use a pure FM backward walk.
    """
    B, L = codes.shape
    K = rmi.k
    lens = lens.astype(jnp.int32)

    # chunk start: the LAST K chars (backward search prepends leftward)
    cstart = jnp.maximum(lens - K, 0)
    qkeys, okq = pack_patterns(codes, cstart, K)
    k0, s0 = rmi_interval(rmi, qkeys)
    long_lane = lens >= K
    # short lanes: init from the last char
    last = jnp.take_along_axis(codes, jnp.maximum(lens - 1, 0)[:, None],
                               axis=1)[:, 0]
    ik, il, is_ = fmops.init_interval(fm, last)
    k = jnp.where(long_lane, k0, ik)
    s = jnp.where(long_lane, jnp.where(okq, s0, 0),
                  jnp.where((last < 4) & (lens > 0), is_, 0))
    # remaining chars to prepend: positions rem-1 .. 0
    rem = jnp.where(long_lane, cstart, jnp.maximum(lens - 1, 0))

    def cond(st):
        return jnp.any((st["t"] < st["rem"]) & (st["s"] > 0))

    def body(st):
        # prepend chars at rem-1-t (c2) then rem-2-t (c1): one gather pair
        j2 = st["rem"] - 1 - st["t"]
        j1 = j2 - 1
        a2 = jnp.take_along_axis(codes, jnp.clip(j2, 0, L - 1)[:, None],
                                 axis=1)[:, 0]
        a1 = jnp.take_along_axis(codes, jnp.clip(j1, 0, L - 1)[:, None],
                                 axis=1)[:, 0]
        k1, s1, k2, s2 = fmops.backward_extend2(fm, st["k"], st["s"],
                                                a2, a1)
        go2 = (j2 >= 0) & (st["t"] < st["rem"]) & (st["s"] > 0)
        ok2 = go2 & (a2 < 4)
        kA = jnp.where(ok2, k1, st["k"])
        sA = jnp.where(go2, jnp.where(ok2, s1, 0), st["s"])
        go1 = ok2 & (j1 >= 0) & (sA > 0)
        ok1 = go1 & (a1 < 4)
        kB = jnp.where(ok1, k2, kA)
        sB = jnp.where(go1, jnp.where(ok1, s2, 0), sA)
        return dict(t=st["t"] + 2, k=kB, s=sB, rem=st["rem"])

    st = jax.lax.while_loop(
        cond, body, dict(t=jnp.zeros(B, jnp.int32), k=k, s=s, rem=rem))
    return st["k"], jnp.where(lens > 0, st["s"], 0)


def inexact_search(fm: fmops.DeviceFMIndex, codes, lens, z: int,
                   max_out: int, fifo_cap: int | None = None):
    """Backtracking search with up to z mismatches — FMI_search::
    inexact_search (ext/TAL/src/FMI/FMI_search.cpp:2494-2660): BFS over
    (k, l, i, z) states from (0, N, L-1, z); z == 0 states extend with
    the query char only, z > 0 states branch over all four bases
    (mismatches decrement z); states that consume the whole query emit
    their (k, s) range.

    Intended for short probes like the reference's exact/inexact-search
    benches (the FIFO is O(L^2 z) worst case). codes int32[B, L],
    lens int32[B]. Returns (k int32[B, max_out], s int32[B, max_out],
    count int32[B], overflow bool[B]).
    """
    B, L = codes.shape
    F = fifo_cap if fifo_cap is not None else 4 * L * max(z, 1) + 8
    N = fm.text_len
    farange = jnp.arange(F, dtype=jnp.int32)[None, :]
    oarange = jnp.arange(max_out, dtype=jnp.int32)[None, :]

    st = dict(
        fk=jnp.zeros((B, F), jnp.int32),
        fl=jnp.broadcast_to(jnp.where(farange == 0, jnp.int32(N), 0),
                            (B, F)).astype(jnp.int32),
        fi=jnp.where(farange == 0, lens[:, None] - 1, 0).astype(jnp.int32),
        fz=jnp.broadcast_to(jnp.where(farange == 0, jnp.int32(z), 0),
                            (B, F)),
        head=jnp.zeros(B, jnp.int32),
        size=jnp.ones(B, jnp.int32),
        ok=jnp.zeros((B, max_out), jnp.int32),
        os=jnp.zeros((B, max_out), jnp.int32),
        n=jnp.zeros(B, jnp.int32),
        ovf=jnp.zeros(B, bool),
    )

    def cond(st):
        return jnp.any(st["head"] < st["size"])

    def body(st):
        live = st["head"] < st["size"]
        take = lambda a: jnp.take_along_axis(
            a, st["head"][:, None] % F, axis=1)[:, 0]
        k, l, i, zz = take(st["fk"]), take(st["fl"]), take(st["fi"]), \
            take(st["fz"])

        # emission: i < 0 -> output (k, s)
        emit = live & (i < 0)
        can = emit & (st["n"] < max_out)
        oh = (oarange == st["n"][:, None]) & can[:, None]
        ok2 = jnp.where(oh, k[:, None], st["ok"])
        os2 = jnp.where(oh, (l - k)[:, None], st["os"])
        n2 = st["n"] + can.astype(jnp.int32)
        ovf = st["ovf"] | (emit & ~can)

        # extension: all four branch intervals from two gathers
        o_k = fmops.occ4(fm, k)
        o_l = fmops.occ4(fm, l)
        sp = fm.counts[None, :4].astype(jnp.int32) + o_k      # [B, 4]
        ep = fm.counts[None, :4].astype(jnp.int32) + o_l
        qc = jnp.take_along_axis(codes, jnp.clip(i, 0, L - 1)[:, None],
                                 axis=1)[:, 0]
        carange = jnp.arange(4, dtype=jnp.int32)[None, :]
        branch_ok = (sp < ep) & live[:, None] & (i >= 0)[:, None]
        is_q = carange == qc[:, None]
        # z == 0: only the query char; z > 0: all four
        branch_ok = branch_ok & ((zz > 0)[:, None] | is_q)
        nz = jnp.where(is_q, zz[:, None], zz[:, None] - 1)
        # push surviving branches at size, size+1, ... (c ascending,
        # matching the reference's FIFO order); the popped head slot is
        # already free, hence the +1 in the ring-capacity check
        bslot = jnp.cumsum(branch_ok.astype(jnp.int32), axis=1) - 1
        tails = (st["size"][:, None] + bslot) % F
        room = st["size"] - st["head"] + \
            jnp.sum(branch_ok, axis=1).astype(jnp.int32) <= F + 1
        ovf = ovf | (live & ~room)
        push = branch_ok & room[:, None]

        def put(dst, vals):
            upd = dst
            for c in range(4):
                ohp = (farange == tails[:, c:c + 1]) & push[:, c:c + 1]
                upd = jnp.where(ohp, vals[:, c:c + 1], upd)
            return upd

        fk2 = put(st["fk"], sp)
        fl2 = put(st["fl"], ep)
        fi2 = put(st["fi"], jnp.broadcast_to((i - 1)[:, None], (B, 4)))
        fz2 = put(st["fz"], nz)
        size2 = st["size"] + jnp.sum(push, axis=1).astype(jnp.int32)
        return dict(
            fk=fk2, fl=fl2, fi=fi2, fz=fz2,
            head=st["head"] + live.astype(jnp.int32),
            size=jnp.where(live, size2, st["size"]),
            ok=ok2, os=os2, n=n2, ovf=ovf,
        )

    st = jax.lax.while_loop(cond, body, st)
    return st["ok"], st["os"], st["n"], st["ovf"]
