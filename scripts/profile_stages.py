"""Per-stage wall-time breakdown of the device alignment pipeline.

Honest timing on the axon relay: the relay caches identical
(executable, inputs) runs, so every timed iteration uses a distinct
read batch; dispatches are pipelined and synced once.
"""

import functools
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
    from fgdp_tpu.ops import smem as smemops

    rng = np.random.default_rng(0)
    n_ref = 2_000_000
    import os
    L, B = 151, int(os.environ.get('PROF_B', 1024))
    pref = PackedReference.from_contigs(
        ["chr1"], [rng.integers(0, 4, n_ref).astype(np.uint8)])
    fm = FMIndex.build(pref.codes)
    dfm = DeviceFMIndex.from_host(fm)
    dref = DeviceReference(pref)
    shapes = BatchShapes(read_len=L, batch_reads=B)
    opt = AlignConfig()

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

    k1 = jax.jit(lambda c, l, a: smemops.smem_all_pos(
        dfm, dref.codes, dref.l_pac, c, l, jnp.ones(B, jnp.int32), a,
        opt.min_seed_len, shapes.max_smems, 20))
    k3 = jax.jit(lambda c, l, a: smemops.seed_strategy(
        dfm, c, l, a, opt.max_mem_intv, opt.min_seed_len + 1,
        shapes.max_smems))
    seedfn = jax.jit(functools.partial(
        collect_seeds, opt=opt, max_seeds=shapes.max_smems))
    chainfn = jax.jit(functools.partial(
        chainmod.chain_seeds, opt=opt, max_seedpos=shapes.max_seeds,
        max_chains=shapes.max_chains))
    extfn = jax.jit(functools.partial(
        extendmod.extend_chains, opt=opt, max_regs=shapes.max_regs,
        t_max=shapes.max_ext_ref))

    def bench(name, f, *extra, codes_pos=0):
        def call(c):
            args = list(extra)
            args.insert(codes_pos, c)
            return f(*args)

        out = call(batches[-1])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [call(batches[i]) for i in range(n_iter)]
        for o in outs:
            jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
        dt = (time.perf_counter() - t0) / n_iter
        print(f"{name:12s} {dt*1000:9.1f} ms  ({B/dt:.0f} reads/s)",
              file=sys.stderr)
        return out

    bench("k1_smem", k1, lens, active)
    bench("k3_seed", k3, lens, active)
    bench("seeding_all", seedfn, dfm, dref, lens, active, codes_pos=2)

    def timed(name, call, inputs):
        out = call(inputs[-1])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [call(x) for x in inputs[:n_iter]]
        for o in outs:
            jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
        dt = (time.perf_counter() - t0) / n_iter
        print(f"{name:12s} {dt*1000:9.1f} ms  ({B/dt:.0f} reads/s)",
              file=sys.stderr)
        return outs

    all_seeds = [seedfn(dfm, dref, c, lens, active) for c in batches]
    cbs = timed("chaining",
                lambda sd: chainfn(dfm, dref, sd, lens), all_seeds)
    cbs = cbs + [chainfn(dfm, dref, all_seeds[-1], lens)]
    timed("extension",
          lambda t: extfn(t[0], t[1], lens, dref), list(zip(cbs, batches)))


if __name__ == "__main__":
    main()
# (B override via argv for scaling probes)
