"""Round-3 device phase profile at the exact bench config.

Times, on the real chip with distinct inputs per iteration (the axon
relay caches identical (executable, inputs) runs):
  k1_sweep   production K1 (ops/smem_sweep.smem_all_pos_sweep)
  k1_lcp     single-pass LCP-tree engine (ops/smem_lcp.smem_all_lcp)
  seeding    full collect_seeds (K1+K2+K3+sort)
  chain      chain_seeds
  extend     extend_chains
  full       device_align (seed+chain+extend+compact)

Env: PROF_B batch (default 1024), PROF_NREF ref size (default 500_000).
Run: python scripts/profile_r3.py
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
    from fgdp_tpu.ops import smem_lcp
    from fgdp_tpu.ops import smem_sweep as sweepops
    from fgdp_tpu.ops.fm import DeviceFMIndex
    from fgdp_tpu.pipeline import device_align
    from fgdp_tpu.utils import dna

    rng = np.random.default_rng(0)
    n_ref = int(os.environ.get("PROF_NREF", 500_000))
    L = 151
    B = int(os.environ.get("PROF_B", 1024))
    pref = PackedReference.from_contigs(
        ["chr1"], [rng.integers(0, 4, n_ref).astype(np.uint8)])
    fm = FMIndex.build(pref.codes)
    dfm = DeviceFMIndex.from_host(fm)
    dref = DeviceReference(pref)
    x = np.concatenate([pref.codes, dna.revcomp(pref.codes)]).astype(
        np.uint8)
    t0 = time.perf_counter()
    lt = LcpTree.build(x, fm.sa)
    print(f"lcp tree build: {time.perf_counter()-t0:.1f}s "
          f"({lt.tree.nbytes/1e6:.0f} MB)", file=sys.stderr)
    tree = jnp.asarray(lt.tree)
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
    ones = jnp.ones(B, jnp.int32)

    k1_sweep = jax.jit(lambda c: sweepops.smem_all_pos_sweep(
        dfm, dref.codes16, c, lens, ones, active, opt.min_seed_len,
        shapes.max_smems, 20, entry_cap=min(2 * L + 16, 192),
        bwd_mult=44))
    k1_lcp = jax.jit(lambda c: smem_lcp.smem_all_lcp(
        dfm, tree, c, lens, active, opt.min_seed_len, shapes.max_smems))
    seedfn = jax.jit(functools.partial(
        collect_seeds, opt=opt, max_seeds=shapes.max_smems,
        scale=shapes.seed_scale))
    chainfn = jax.jit(functools.partial(
        chainmod.chain_seeds, opt=opt, max_seedpos=shapes.max_seeds,
        max_chains=shapes.max_chains))
    extfn = jax.jit(functools.partial(
        extendmod.extend_chains, opt=opt, max_regs=shapes.max_regs,
        t_max=shapes.max_ext_ref, jobs_per_read=6))
    fullfn = jax.jit(functools.partial(
        device_align, opt=opt, shapes=shapes))

    def bench(name, call, inputs=batches):
        t0 = time.perf_counter()
        out = call(inputs[-1])
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [call(x) for x in inputs[:n_iter]]
        for o in outs:
            jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
        dt = (time.perf_counter() - t0) / n_iter
        print(f"{name:10s} {dt*1000:9.1f} ms  ({B/dt:8.0f} reads/s)"
              f"   [compile+1st {tc:.1f}s]", file=sys.stderr)
        return outs + [out]

    bench("k1_sweep", k1_sweep)
    k1s = bench("k1_lcp", k1_lcp)
    # sanity: lcp overflow rate
    ovf = np.asarray(k1s[0].overflow).sum()
    print(f"  k1_lcp overflow: {ovf}/{B}", file=sys.stderr)
    all_seeds = bench("seeding", lambda c: seedfn(dfm, dref, c, lens,
                                                  active))
    cbs = bench("chain", lambda sd: chainfn(dfm, dref, sd, lens),
                all_seeds)
    bench("extend", lambda t: extfn(t[0], t[1], lens, dref),
          list(zip(cbs, batches)))
    bench("full", lambda c: fullfn(dfm, dref, c, lens, active))


if __name__ == "__main__":
    main()
