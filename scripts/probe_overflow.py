"""Which static cap drives escalation on the chr20-scale genome?
Reports per-cap overflow counts on a few 4096-read batches: K1/K2/K3
seed-buffer overflow, chain-stage overflow, extension-slot overflow,
and the transfer-compaction count>k flag.

Run: python scripts/probe_overflow.py [/tmp/scale/idx]
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
    from fgdp_tpu.index.lcptree import LcpTree
    from fgdp_tpu.index.reference import DeviceReference, PackedReference
    from fgdp_tpu.ops.fm import DeviceFMIndex

    prefix = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale/idx"
    pref = PackedReference.load(prefix + ".ref")
    fm = FMIndex.load(prefix + ".fmi")
    lt = LcpTree.load(prefix + ".lcp.npz")
    dfm = DeviceFMIndex.from_host(fm)
    dref = DeviceReference(pref)
    tree_d, isa_d = jnp.asarray(lt.tree), jnp.asarray(lt.isa)
    opt = AlignConfig()
    L, B = 151, 4096
    shapes = BatchShapes(read_len=L, batch_reads=B)
    rng = np.random.default_rng(99)
    n_ref = pref.l_pac

    def mk():
        pos = rng.integers(0, n_ref - L, B)
        c = np.stack([pref.codes[p:p + L] for p in pos]).astype(np.int32)
        m = rng.random(c.shape) < 0.01
        c = np.where(m, rng.integers(0, 4, c.shape), c)
        rc = rng.random(B) < 0.5
        c = np.where(rc[:, None], 3 - c[:, ::-1], c)
        return jnp.asarray(c)

    def probe(dfm, dref, codes, lens, active, tree, isa):
        from fgdp_tpu.ops import smem_lcp as lcpops
        k1 = lcpops.smem_all_lcp(dfm, tree, isa, codes, lens, active,
                                 opt.min_seed_len, shapes.max_smems,
                                 ref_codes16=dref.codes16, max_rounds=24)
        # K2 qualifying-job census (seeding.py:90-111)
        S = k1.m.shape[1]
        split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
        slot_valid = jnp.arange(S)[None, :] < k1.count[:, None]
        qual = slot_valid & ((k1.n + 1 - k1.m) >= split_len) & \
            (k1.s <= opt.split_width)
        nqual = qual.sum()
        ends = jnp.cumsum(qual.reshape(-1).astype(jnp.int32)) \
            .reshape(B, S)[:, -1]
        starts = jnp.concatenate([jnp.zeros(1, jnp.int32), ends[:-1]])
        k2_ovf = ((ends > B * 2) & (ends > starts)).sum()
        # K3 standalone overflow at the generous cap
        from fgdp_tpu.ops import smem as smemops
        k3 = smemops.seed_strategy(dfm, codes, lens, active,
                                   opt.max_mem_intv,
                                   opt.min_seed_len + 1,
                                   shapes.max_smems)
        k3_ovf = k3.overflow.sum()
        seeds = collect_seeds(dfm, dref, codes, lens, active, opt,
                              max_seeds=shapes.max_smems, prev_cap=20,
                              scale=shapes.seed_scale,
                              lcp_tree=tree, lcp_isa=isa)
        cb = chainmod.chain_seeds(dfm, dref, seeds, lens, opt,
                                  max_seedpos=shapes.max_seeds,
                                  max_chains=shapes.max_chains,
                                  jobs_cap=B * 32)
        regs = extendmod.extend_chains(cb, codes, lens, dref, opt,
                                       max_regs=shapes.max_regs,
                                       t_max=shapes.max_ext_ref,
                                       jobs_per_read=6)
        counts = regs.valid.sum(axis=1)
        return (k1.overflow.sum(),
                jnp.percentile(k1.count,
                               jnp.array([50., 90., 99., 100.])),
                nqual, k2_ovf, k3_ovf,
                seeds.overflow.sum(), cb.overflow.sum(),
                regs.overflow.sum(),
                (counts > shapes.transfer_regs).sum(),
                (seeds.overflow | cb.overflow | regs.overflow
                 | (counts > shapes.transfer_regs)).sum(),
                jnp.percentile(counts, jnp.array([50., 90., 99., 100.])))

    fn = jax.jit(probe)
    lens = jnp.full(B, L, jnp.int32)
    act = jnp.ones(B, bool)
    for it in range(3):
        t0 = time.perf_counter()
        k1o, k1pct, nq, k2o, k3o, sd, ch, ex, tr, tot, pct = fn(
            dfm, dref, mk(), lens, act, tree_d, isa_d)
        print(f"batch {it}: k1_ovf={int(k1o)} "
              f"k1-count p50/90/99/max={np.asarray(k1pct).round(0)} "
              f"k2_jobs={int(nq)} k2_ovf={int(k2o)} k3_ovf={int(k3o)} "
              f"seeds_ovf={int(sd)} chain_ovf={int(ch)} "
              f"ext_ovf={int(ex)} regs>16={int(tr)} TOTAL={int(tot)}"
              f"/{B}  reg-count p50/90/99/max="
              f"{np.asarray(pct).round(1)}  ({time.perf_counter()-t0:.1f}s)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
