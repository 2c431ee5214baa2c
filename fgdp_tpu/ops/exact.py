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
        lt = kv < q
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
