"""Per-stage wall-time breakdown of the device alignment pipeline."""

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
    L, B = 151, 1024
    pref = PackedReference.from_contigs(
        ["chr1"], [rng.integers(0, 4, n_ref).astype(np.uint8)])
    fm = FMIndex.build(pref.codes)
    dfm = DeviceFMIndex.from_host(fm)
    dref = DeviceReference(pref)
    shapes = BatchShapes(read_len=L, batch_reads=B)
    opt = AlignConfig()

    pos = rng.integers(0, n_ref - L, B)
    codes = np.stack([pref.codes[p:p + L] for p in pos]).astype(np.int32)
    m = rng.random(codes.shape) < 0.01
    codes = np.where(m, rng.integers(0, 4, codes.shape), codes)
    lens = np.full(B, L, np.int32)
    codes, lens = jnp.asarray(codes), jnp.asarray(lens)
    active = jnp.ones(B, bool)

    k1 = jax.jit(lambda c, l, a: smemops.smem_all_pos(
        dfm, c, l, jnp.ones(B, jnp.int32), a, opt.min_seed_len,
        shapes.max_smems, 64))
    k3 = jax.jit(lambda c, l, a: smemops.seed_strategy(
        dfm, c, l, a, opt.max_mem_intv, opt.min_seed_len + 1,
        shapes.max_smems))
    seedfn = jax.jit(functools.partial(
        collect_seeds, opt=opt, max_seeds=shapes.max_smems, prev_cap=64))
    chainfn = jax.jit(functools.partial(
        chainmod.chain_seeds, opt=opt, max_seedpos=shapes.max_seeds,
        max_chains=shapes.max_chains))
    extfn = jax.jit(functools.partial(
        extendmod.extend_chains, opt=opt, max_regs=shapes.max_regs,
        t_max=shapes.max_ext_ref))

    def bench(name, f, *args):
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = f(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3
        print(f"{name:12s} {dt*1000:9.1f} ms  ({B/dt:.0f} reads/s)",
              file=sys.stderr)
        return out

    bench("k1_smem", k1, codes, lens, active)
    bench("k3_seed", k3, codes, lens, active)
    seeds = bench("seeding_all", seedfn, dfm, codes, lens, active)
    cb = bench("chaining", chainfn, dfm, dref, seeds, lens)
    bench("extension", extfn, cb, codes, lens, dref)


if __name__ == "__main__":
    main()
