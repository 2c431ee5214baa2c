"""Micro-breakdown of extend_chains at pipeline shapes: compaction
scatters, rmax segmented min/max, window fetches, SW calls, seedcov."""

import functools
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fgdp_tpu.align import chain as chainmod
    from fgdp_tpu.align import extend as extendmod
    from fgdp_tpu.align.seeding import collect_seeds
    from fgdp_tpu.config import AlignConfig, BatchShapes
    from fgdp_tpu.index.fmindex import FMIndex
    from fgdp_tpu.index.reference import DeviceReference, PackedReference
    from fgdp_tpu.ops.fm import DeviceFMIndex
    from fgdp_tpu.ops import sw as swops

    rng = np.random.default_rng(0)
    n_ref = 2_000_000
    L, B = 151, int(os.environ.get('PROF_B', 1024))
    pref = PackedReference.from_contigs(
        ["chr1"], [rng.integers(0, 4, n_ref).astype(np.uint8)])
    fm = FMIndex.build(pref.codes)
    dfm = DeviceFMIndex.from_host(fm)
    dref = DeviceReference(pref)
    shapes = BatchShapes(read_len=L, batch_reads=B)
    opt = AlignConfig()
    P, C, E = shapes.max_seeds, shapes.max_chains, shapes.max_regs
    TP = shapes.max_ext_ref
    J = B * 6

    def make_batch():
        pos = rng.integers(0, n_ref - L, B)
        codes = np.stack([pref.codes[p:p + L] for p in pos]).astype(np.int32)
        m = rng.random(codes.shape) < 0.01
        codes = np.where(m, rng.integers(0, 4, codes.shape), codes)
        return jnp.asarray(codes)

    n_iter = 4
    batches = [make_batch() for _ in range(n_iter + 1)]
    lens = jnp.asarray(np.full(B, L, np.int32))
    active = jnp.ones(B, bool)
    seedfn = jax.jit(functools.partial(
        collect_seeds, opt=opt, max_seeds=shapes.max_smems))
    chainfn = jax.jit(functools.partial(
        chainmod.chain_seeds, opt=opt, max_seedpos=P, max_chains=C))
    cbs = [chainfn(dfm, dref, seedfn(dfm, dref, c, lens, active), lens)
           for c in batches]
    jax.block_until_ready(cbs)

    def timed(name, call, inputs):
        out = call(inputs[-1])
        jax.block_until_ready(jax.tree_util.tree_leaves(out))
        t0 = time.perf_counter()
        outs = [call(x) for x in inputs[:n_iter]]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / n_iter
        print(f"{name:18s} {dt*1000:8.2f} ms", file=sys.stderr)

    bidx = jnp.arange(B)

    # compaction scatters (jqb/jrb/jlen/jchain as in extend_chains)
    def compacts(cb):
        job = (cb.seed_chain >= 0)
        slot = jnp.cumsum(job.astype(jnp.int32), axis=1) - 1
        slot = jnp.where(job & (slot < E), slot, E)

        def compact(a, fill=0):
            out = jnp.full((B, E + 1), fill, a.dtype)
            return out.at[bidx[:, None], slot].set(a, mode="drop")[:, :E]
        return (compact(cb.seed_qbeg), compact(cb.seed_rbeg),
                compact(cb.seed_len), compact(cb.seed_chain, -1))

    timed("compact_scatter4", jax.jit(compacts), cbs)

    def compacts_sort(cb):
        job = (cb.seed_chain >= 0)
        perm = jnp.argsort(~job, axis=1, stable=True)[:, :E].astype(jnp.int32)
        tbl = jnp.stack([cb.seed_qbeg, cb.seed_rbeg, cb.seed_len,
                         cb.seed_chain], axis=-1).reshape(B * P, 4)
        rows = jnp.take(tbl, (bidx[:, None] * P + perm).reshape(-1),
                        axis=0, mode="clip").reshape(B, E, 4)
        ok = jnp.take_along_axis(job, perm, axis=1)
        return rows, ok

    timed("compact_sort", jax.jit(compacts_sort), cbs)

    # rmax segmented min/max scatters
    def rmaxes(cb):
        job = (cb.seed_chain >= 0)
        gap = 100
        b_t = cb.seed_rbeg - (cb.seed_qbeg + gap)
        e_t = cb.seed_rbeg + cb.seed_len + gap
        cidx = jnp.where(job, cb.seed_chain, C)
        big = jnp.int32(2**31 - 1)
        rmax0 = jnp.full((B, C + 1), 0, jnp.int32).at[
            bidx[:, None], cidx].min(jnp.where(job, b_t, big))[:, :C]
        rmax1 = jnp.zeros((B, C + 1), jnp.int32).at[
            bidx[:, None], cidx].max(jnp.where(job, e_t, -big))[:, :C]
        return rmax0, rmax1

    timed("rmax_scatters", jax.jit(rmaxes), cbs)

    # window fetches
    def windows(cb):
        grb = cb.seed_rbeg[:, :6].reshape(-1)
        return (dref.fetch_window(grb - TP, TP, reverse=True),
                dref.fetch_window(grb, TP))

    timed("fetch_windows", jax.jit(windows), cbs)

    # one full-J SW call (band w)
    params = swops.SWParams(opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                            opt.zdrop, opt.pen_clip5, opt.a, opt.b)

    def swrun(args):
        cb, codes = args
        q = codes[:, :L].repeat(6, axis=0)[:J]
        qn = jnp.full(J, L, jnp.int32)
        t = dref.fetch_window(cb.seed_rbeg[:, :6].reshape(-1)[:J], TP)
        tn = jnp.full(J, TP, jnp.int32)
        h0 = jnp.full(J, 19 * opt.a, jnp.int32)
        return swops.sw_extend_auto(q, qn, t, tn, h0, opt.w, None, params,
                                    t_max=TP)

    timed("sw_full_J", jax.jit(swrun), list(zip(cbs, batches)))

    # seedcov [B, E, P] reduction
    def seedcov(cb):
        jchain = cb.seed_chain[:, :E]
        qb = jnp.zeros((B, E), jnp.int32)
        qe = jnp.full((B, E), L, jnp.int32)
        rb = cb.seed_rbeg[:, :E]
        re = rb + 300
        sc_q = cb.seed_qbeg[:, None, :]
        sc_r = cb.seed_rbeg[:, None, :]
        sc_l = cb.seed_len[:, None, :]
        same_chain = (cb.seed_chain[:, None, :] == jchain[:, :, None]) & \
            (cb.seed_chain[:, None, :] >= 0)
        inside = same_chain & (sc_q >= qb[:, :, None]) & \
            (sc_q + sc_l <= qe[:, :, None]) & (sc_r >= rb[:, :, None]) & \
            (sc_r + sc_l <= re[:, :, None])
        return jnp.sum(jnp.where(inside, sc_l, 0), axis=2)

    timed("seedcov_BEP", jax.jit(seedcov), cbs)

    extfn = jax.jit(functools.partial(
        extendmod.extend_chains, opt=opt, max_regs=E, t_max=TP))
    timed("extend_full", lambda t: extfn(t[0], t[1], lens, dref),
          list(zip(cbs, batches)))


if __name__ == "__main__":
    main()
