"""Ablated-prefix phase split of device_align with the LCP K1 engine
(the round-4 default path): each stage measured inside fused context by
compiling device_align prefixes that return scalar reductions (jit DCE
drops later stages). Fresh random reads per run defeat the relay cache.

Run: [PROF_B=4096] python scripts/profile_r4b.py
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
    from fgdp_tpu.ops import smem_lcp as lcpops
    from fgdp_tpu.ops.fm import DeviceFMIndex
    from fgdp_tpu.pipeline import compact_regs
    from fgdp_tpu.utils import dna

    seed = int(time.time() * 1000) % (1 << 31)
    rng = np.random.default_rng(seed)
    print(f"rng seed {seed}", file=sys.stderr)
    n_ref = int(os.environ.get("PROF_NREF", 500_000))
    L = 151
    B = int(os.environ.get("PROF_B", 4096))
    ref_rng = np.random.default_rng(0)
    pref = PackedReference.from_contigs(
        ["chr1"], [ref_rng.integers(0, 4, n_ref).astype(np.uint8)])
    fm = FMIndex.build(pref.codes)
    dfm = DeviceFMIndex.from_host(fm)
    dref = DeviceReference(pref)
    lt = LcpTree.build(
        np.concatenate([pref.codes, dna.revcomp(pref.codes)])
        .astype(np.uint8), fm.sa)
    tree_d, isa_d = jnp.asarray(lt.tree), jnp.asarray(lt.isa)
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

    def seeds_of(c):
        return collect_seeds(dfm, dref, c, lens, active, opt,
                             max_seeds=shapes.max_smems,
                             scale=shapes.seed_scale,
                             lcp_tree=tree_d, lcp_isa=isa_d)

    def k1_only(c):
        sd = lcpops.smem_all_lcp(
            dfm, tree_d, isa_d, c, lens, active, opt.min_seed_len,
            shapes.max_smems, ref_codes16=dref.codes16, max_rounds=24)
        return sd.count.sum() + sd.m.sum() + sd.k.sum()

    def seed_only(c):
        sd = seeds_of(c)
        return sd.count.sum() + sd.m.sum() + sd.n.sum()

    import dataclasses as _dc
    opt_nok3 = _dc.replace(opt, max_mem_intv=0)

    def seed_no_k3(c):
        sd = collect_seeds(dfm, dref, c, lens, active, opt_nok3,
                           max_seeds=shapes.max_smems,
                           scale=shapes.seed_scale,
                           lcp_tree=tree_d, lcp_isa=isa_d)
        return sd.count.sum() + sd.m.sum() + sd.k.sum()

    def chain_of(c):
        sd = seeds_of(c)
        return chainmod.chain_seeds(dfm, dref, sd, lens, opt,
                                    max_seedpos=shapes.max_seeds,
                                    max_chains=shapes.max_chains,
                                    jobs_cap=B * 32)

    def to_chain(c):
        cb = chain_of(c)
        return cb.weight.sum() + cb.kept.sum() + cb.fon.sum()

    def regs_of(c):
        cb = chain_of(c)
        return extendmod.extend_chains(cb, c, lens, dref, opt,
                                       max_regs=shapes.max_regs,
                                       t_max=shapes.max_ext_ref,
                                       jobs_per_read=6)

    def to_extend(c):
        regs = regs_of(c)
        return regs.score.sum() + regs.valid.sum()

    def full(c):
        regs = compact_regs(regs_of(c), shapes.transfer_regs)
        return regs.score.sum() + regs.valid.sum()

    n_iter = 6
    stages = (("k1_only", k1_only), ("seed_no_k3", seed_no_k3),
              ("seed_only", seed_only),
              ("to_chain", to_chain), ("to_extend", to_extend),
              ("full", full))
    # PROF_STAGE=name runs one stage per process (several jitted
    # device_align prefixes in one process exhaust relay HBM)
    only = os.environ.get("PROF_STAGE")
    if only:
        stages = [st for st in stages if st[0] == only]
    for name, f in stages:
        jf = jax.jit(f)
        t0 = time.perf_counter()
        _ = np.asarray(jf(mk()))
        tc = time.perf_counter() - t0
        batches = [mk() for _ in range(n_iter)]
        t0 = time.perf_counter()
        outs = [jf(c) for c in batches]
        got = [np.asarray(o) for o in outs]
        dt = (time.perf_counter() - t0) / n_iter
        print(f"{name:10s} {dt*1000:8.1f} ms  ({B/dt:8.0f} reads/s)  "
              f"[compile+first {tc:.1f}s]", file=sys.stderr)


if __name__ == "__main__":
    main()
