"""Staged timing inside extend_chains: job build, window fetches, SW
kernel calls. Uses jit DCE — each staged function returns only the
intermediates it needs, so later stages are not compiled in.

Run: python scripts/profile_r3c.py
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from fgdp_tpu.align import chain as chainmod
    from fgdp_tpu.align.seeding import collect_seeds
    from fgdp_tpu.config import AlignConfig, BatchShapes
    from fgdp_tpu.index.fmindex import FMIndex
    from fgdp_tpu.index.reference import DeviceReference, PackedReference
    from fgdp_tpu.ops import sw as swops
    from fgdp_tpu.ops.fm import DeviceFMIndex

    rng = np.random.default_rng(0)
    n_ref = 500_000
    L, B = 151, 1024
    pref = PackedReference.from_contigs(
        ["chr1"], [rng.integers(0, 4, n_ref).astype(np.uint8)])
    fm = FMIndex.build(pref.codes)
    dfm = DeviceFMIndex.from_host(fm)
    dref = DeviceReference(pref)
    shapes = BatchShapes(read_len=L, batch_reads=B)
    opt = AlignConfig()

    def mk():
        pos = rng.integers(0, n_ref - L, B)
        c = np.stack([pref.codes[p:p + L] for p in pos]).astype(np.int32)
        m = rng.random(c.shape) < 0.01
        c = np.where(m, rng.integers(0, 4, c.shape), c)
        rc = rng.random(B) < 0.5
        c = np.where(rc[:, None], 3 - c[:, ::-1], c)
        return jnp.asarray(c)

    n_iter = 4
    batches = [mk() for _ in range(n_iter + 1)]
    lens = jnp.full(B, L, jnp.int32)
    active = jnp.ones(B, bool)
    seedfn = jax.jit(functools.partial(
        collect_seeds, opt=opt, max_seeds=shapes.max_smems))
    chainfn = jax.jit(functools.partial(
        chainmod.chain_seeds, opt=opt, max_seedpos=shapes.max_seeds,
        max_chains=shapes.max_chains))
    cbs = [chainfn(dfm, dref, seedfn(dfm, dref, c, lens, active), lens)
           for c in batches]

    E = shapes.max_regs
    J = B * 6
    TP = shapes.max_ext_ref
    C = shapes.max_chains

    def jobs(cb, codes):
        """Replica of extend_chains job build, up to SW inputs."""
        from fgdp_tpu.align.extend import _cal_max_gap
        bidx = jnp.arange(B)
        l_pac = dref.l_pac
        kept_of_seed = jnp.take_along_axis(
            cb.kept, jnp.clip(cb.seed_chain, 0, C - 1), axis=1)
        job = (cb.seed_chain >= 0) & (kept_of_seed > 0)
        gap_l = _cal_max_gap(opt, cb.seed_qbeg)
        gap_r = _cal_max_gap(opt, lens[:, None] - cb.seed_qbeg -
                             cb.seed_len)
        b_t = cb.seed_rbeg - (cb.seed_qbeg + gap_l)
        e_t = cb.seed_rbeg + cb.seed_len + \
            (lens[:, None] - cb.seed_qbeg - cb.seed_len) + gap_r
        cidx = jnp.where(job, cb.seed_chain, C)
        big = jnp.int32(2**31 - 1)
        rmax0 = jnp.full((B, C + 1), 2 * l_pac, jnp.int32).at[
            bidx[:, None], cidx].min(jnp.where(job, b_t, big))[:, :C]
        rmax1 = jnp.zeros((B, C + 1), jnp.int32).at[
            bidx[:, None], cidx].max(jnp.where(job, e_t, -big))[:, :C]
        rmax0 = jnp.maximum(rmax0, 0)
        rmax1 = jnp.minimum(rmax1, 2 * l_pac)
        straddle = (rmax0 < l_pac) & (l_pac < rmax1)
        fwd_first = cb.first_r < l_pac
        rmax1 = jnp.where(straddle & fwd_first, l_pac, rmax1)
        rmax0 = jnp.where(straddle & ~fwd_first, l_pac, rmax0)
        far_beg, far_end, _ = dref.contig_window(cb.first_r)
        rmax0 = jnp.maximum(rmax0, far_beg)
        rmax1 = jnp.minimum(rmax1, far_end)
        slot = jnp.cumsum(job.astype(jnp.int32), axis=1) - 1
        slot = jnp.where(job & (slot < E), slot, E)

        def compact(a, fill=0):
            out = jnp.full((B, E + 1), fill, a.dtype)
            return out.at[bidx[:, None], slot].set(a, mode="drop")[:, :E]

        jqb = compact(cb.seed_qbeg)
        jrb = compact(cb.seed_rbeg)
        jlen = compact(cb.seed_len)
        jchain = compact(cb.seed_chain, fill=-1)
        jvalid = jchain >= 0
        jr0 = jnp.take_along_axis(rmax0, jnp.clip(jchain, 0, C - 1), axis=1)
        jr1 = jnp.take_along_axis(rmax1, jnp.clip(jchain, 0, C - 1), axis=1)
        fvalid = jvalid.reshape(-1)
        gslot = jnp.cumsum(fvalid.astype(jnp.int32)) - 1
        gslot = jnp.where(fvalid & (gslot < J), gslot, J)
        gidx = jnp.zeros(J + 1, jnp.int32).at[gslot].set(
            jnp.arange(B * E, dtype=jnp.int32), mode="drop")[:J]
        glive = jnp.zeros(J + 1, bool).at[gslot].set(fvalid,
                                                     mode="drop")[:J]
        g = lambda a: a.reshape(-1)[gidx]
        gread = gidx // E
        return dict(gqb=g(jqb), grb=g(jrb), glen=g(jlen), gr0=g(jr0),
                    gr1=g(jr1), glens=lens[gread], gread=gread,
                    glive=glive)

    def fetches(cb, codes):
        jb = jobs(cb, codes)
        jj = jnp.arange(L, dtype=jnp.int32)[None, :]
        gcodes = codes[jb["gread"]]
        q_left = jnp.take_along_axis(
            gcodes, jnp.clip(jb["gqb"][:, None] - 1 - jj, 0, L - 1), axis=1)
        t_left = dref.fetch_window(jb["grb"] - TP, TP, reverse=True)
        gqe = jb["gqb"] + jb["glen"]
        q_right = jnp.take_along_axis(
            gcodes, jnp.clip(gqe[:, None] + jj, 0, L - 1), axis=1)
        t_right = dref.fetch_window(jb["grb"] + jb["glen"], TP)
        return q_left, t_left, q_right, t_right

    pl_ = swops.SWParams(opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                         opt.zdrop, opt.pen_clip5, opt.a, opt.b)

    def left1(cb, codes):
        jb = jobs(cb, codes)
        jj = jnp.arange(L, dtype=jnp.int32)[None, :]
        gcodes = codes[jb["gread"]]
        q_left = jnp.take_along_axis(
            gcodes, jnp.clip(jb["gqb"][:, None] - 1 - jj, 0, L - 1), axis=1)
        t_left = dref.fetch_window(jb["grb"] - TP, TP, reverse=True)
        do_left = jb["glive"] & (jb["gqb"] > 0)
        h0 = jb["glen"] * opt.a
        r1 = swops.sw_extend_auto(
            q_left, jnp.where(do_left, jb["gqb"], 0), t_left,
            jnp.where(do_left, jb["grb"] - jb["gr0"], 0), h0, opt.w,
            None, pl_, t_max=TP)
        return r1

    f_jobs = jax.jit(jobs)
    f_fetch = jax.jit(fetches)
    f_left1 = jax.jit(left1)

    def bench(name, call, inputs):
        t0 = time.perf_counter()
        out = call(inputs[-1])
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [call(x) for x in inputs[:n_iter]]
        for o in outs:
            jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
        dt = (time.perf_counter() - t0) / n_iter
        print(f"{name:12s} {dt*1000:8.1f} ms  [c {tc:.0f}s]",
              file=sys.stderr)
        return outs

    pairs = list(zip(cbs, batches))
    bench("jobs", lambda t: f_jobs(*t), pairs)
    bench("jobs+fetch", lambda t: f_fetch(*t), pairs)
    bench("jobs+f+left1", lambda t: f_left1(*t), pairs)


if __name__ == "__main__":
    main()
