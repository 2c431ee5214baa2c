"""Ablated-program phase split: times device_align prefixes (seeding
only / +chain / +extend / full with compact) as complete jitted
programs, so each phase's cost is measured inside fused context. Fresh
random inputs every run defeat the relay's cross-process result cache;
sync is a 1-element host fetch.

Run: python scripts/profile_r3d.py
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
    from fgdp_tpu.align import extend as extendmod
    from fgdp_tpu.align.seeding import collect_seeds
    from fgdp_tpu.config import AlignConfig, BatchShapes
    from fgdp_tpu.index.fmindex import FMIndex
    from fgdp_tpu.index.reference import DeviceReference, PackedReference
    from fgdp_tpu.ops import smem_sweep as sweepops
    from fgdp_tpu.ops.fm import DeviceFMIndex
    from fgdp_tpu.pipeline import compact_regs, device_align

    seed = int(time.time() * 1000) % (1 << 31)
    rng = np.random.default_rng(seed)
    print(f"rng seed {seed}", file=sys.stderr)
    n_ref = int(os.environ.get("PROF_NREF", 500_000))
    L = 151
    B = int(os.environ.get("PROF_B", 1024))
    # reference must stay fixed across runs for compile-cache hits on
    # the index shapes; reads vary per run
    ref_rng = np.random.default_rng(0)
    pref = PackedReference.from_contigs(
        ["chr1"], [ref_rng.integers(0, 4, n_ref).astype(np.uint8)])
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

    lens = jnp.full(B, L, jnp.int32)
    active = jnp.ones(B, bool)
    ones = jnp.ones(B, jnp.int32)

    def seed_only(c):
        sd = collect_seeds(dfm, dref, c, lens, active, opt,
                           max_seeds=shapes.max_smems,
                           scale=shapes.seed_scale)
        return sd.count.sum() + sd.m.sum() + sd.k.sum()

    def k1_only(c):
        sd = sweepops.smem_all_pos_sweep(
            dfm, dref.codes16, c, lens, ones, active, opt.min_seed_len,
            shapes.max_smems, 20, entry_cap=min(2 * L + 16, 192),
            bwd_mult=44)
        return sd.count.sum() + sd.m.sum() + sd.k.sum()

    def to_chain(c):
        sd = collect_seeds(dfm, dref, c, lens, active, opt,
                           max_seeds=shapes.max_smems,
                           scale=shapes.seed_scale)
        cb = chainmod.chain_seeds(dfm, dref, sd, lens, opt,
                                  max_seedpos=shapes.max_seeds,
                                  max_chains=shapes.max_chains)
        return cb.weight.sum() + cb.kept.sum() + cb.fon.sum()

    def to_extend(c):
        sd = collect_seeds(dfm, dref, c, lens, active, opt,
                           max_seeds=shapes.max_smems,
                           scale=shapes.seed_scale)
        cb = chainmod.chain_seeds(dfm, dref, sd, lens, opt,
                                  max_seedpos=shapes.max_seeds,
                                  max_chains=shapes.max_chains)
        regs = extendmod.extend_chains(cb, c, lens, dref, opt,
                                       max_regs=shapes.max_regs,
                                       t_max=shapes.max_ext_ref,
                                       jobs_per_read=6)
        return regs.score.sum() + regs.valid.sum()

    def full(c):
        regs = device_align(dfm, dref, c, lens, active, opt, shapes)
        return regs.score.sum() + regs.valid.sum()

    n_iter = 6
    for name, f in (("k1_only", k1_only), ("seed_only", seed_only),
                    ("to_chain", to_chain), ("to_extend", to_extend),
                    ("full", full)):
        jf = jax.jit(f)
        t0 = time.perf_counter()
        _ = np.asarray(jf(mk()))
        tc = time.perf_counter() - t0
        batches = [mk() for _ in range(n_iter)]
        t0 = time.perf_counter()
        outs = [jf(c) for c in batches]
        got = [np.asarray(o) for o in outs]
        dt = (time.perf_counter() - t0) / n_iter
        print(f"{name:10s} {dt*1000:8.1f} ms  ({B/dt:8.0f} reads/s)"
              f"  [c {tc:.0f}s]", file=sys.stderr)


if __name__ == "__main__":
    main()
