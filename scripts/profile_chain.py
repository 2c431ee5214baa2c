"""Sub-stage breakdown of the chaining stage: SA expansion, the chain
table loop (jnp vs pallas), and mem_chain_flt."""

import functools
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fgdp_tpu.align import chain as chainmod
    from fgdp_tpu.align.seeding import collect_seeds
    from fgdp_tpu.config import AlignConfig, BatchShapes
    from fgdp_tpu.index.fmindex import FMIndex
    from fgdp_tpu.index.reference import DeviceReference, PackedReference
    from fgdp_tpu.ops.fm import DeviceFMIndex
    from fgdp_tpu.ops.chain_pallas import chain_loop_pallas

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
    P, C = shapes.max_seeds, shapes.max_chains

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
    all_seeds = [seedfn(dfm, dref, c, lens, active) for c in batches]
    jax.block_until_ready(all_seeds)

    expandfn = jax.jit(lambda sm: chainmod.expand_seeds(
        dfm, dref, sm, opt, P))
    jobs = [expandfn(sm) for sm in all_seeds]
    jax.block_until_ready(jobs)

    loop_p = jax.jit(lambda jb: chain_loop_pallas(
        jb[0], jb[1], jb[2], jb[3], jb[4], jb[5], dref.l_pac,
        C, opt.w, opt.max_chain_gap))
    chainfull_p = jax.jit(functools.partial(
        chainmod.chain_seeds, opt=opt, max_seedpos=P, max_chains=C,
        use_pallas=True))
    chainfull_j = jax.jit(functools.partial(
        chainmod.chain_seeds, opt=opt, max_seedpos=P, max_chains=C,
        use_pallas=False))

    def timed(name, call, inputs):
        out = call(inputs[-1])
        jax.block_until_ready(jax.tree_util.tree_leaves(out))
        t0 = time.perf_counter()
        outs = [call(x) for x in inputs[:n_iter]]
        jax.block_until_ready(jax.tree_util.tree_leaves(outs))
        dt = (time.perf_counter() - t0) / n_iter
        print(f"{name:16s} {dt*1000:9.1f} ms  ({B/dt:.0f} reads/s)",
              file=sys.stderr)
        return outs

    timed("expand_seeds", expandfn, all_seeds)
    timed("loop_pallas", loop_p, jobs)
    timed("chain_full_pl", lambda sm: chainfull_p(dfm, dref, sm, lens),
          all_seeds)
    timed("chain_full_jnp", lambda sm: chainfull_j(dfm, dref, sm, lens),
          all_seeds)


if __name__ == "__main__":
    main()
