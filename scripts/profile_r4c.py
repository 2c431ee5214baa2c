"""Interleaved min-of-trials K1/K3 variant comparison (relay noise is
+-25%; alternating trials + min cancels it). Variants: seed-buffer
width S, batch B.

Run: python scripts/profile_r4c.py
"""

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

    from fgdp_tpu.config import AlignConfig
    from fgdp_tpu.index.fmindex import FMIndex
    from fgdp_tpu.index.lcptree import LcpTree
    from fgdp_tpu.index.reference import DeviceReference, PackedReference
    from fgdp_tpu.ops import smem_lcp as lcpops
    from fgdp_tpu.ops import smem as smemops
    from fgdp_tpu.ops.fm import DeviceFMIndex
    from fgdp_tpu.utils import dna

    rng = np.random.default_rng(int(time.time()) % (1 << 31))
    n_ref = 500_000
    L = 151
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
    opt = AlignConfig()

    def mk(B):
        pos = rng.integers(0, n_ref - L, B)
        c = np.stack([pref.codes[p:p + L] for p in pos]).astype(np.int32)
        m = rng.random(c.shape) < 0.01
        c = np.where(m, rng.integers(0, 4, c.shape), c)
        rc = rng.random(B) < 0.5
        c = np.where(rc[:, None], 3 - c[:, ::-1], c)
        return jnp.asarray(c)

    variants = []

    def k1_var(name, B, S):
        lens = jnp.full(B, L, jnp.int32)
        act = jnp.ones(B, bool)
        f = jax.jit(lambda c: (lambda sd: sd.count.sum() + sd.m.sum()
                               + sd.k.sum())(
            lcpops.smem_all_lcp(dfm, tree_d, isa_d, c, lens, act,
                                opt.min_seed_len, S,
                                ref_codes16=dref.codes16,
                                max_rounds=24)))
        variants.append((name, B, f))

    def k3_var(name, B, S):
        lens = jnp.full(B, L, jnp.int32)
        act = jnp.ones(B, bool)
        f = jax.jit(lambda c: (lambda sd: sd.count.sum() + sd.m.sum()
                               + sd.k.sum())(
            smemops.seed_strategy(dfm, c, lens, act, opt.max_mem_intv,
                                  opt.min_seed_len + 1, S)))
        variants.append((name, B, f))

    k1_var("k1 B4096 S160", 4096, 160)
    k1_var("k1 B4096 S64", 4096, 64)
    k1_var("k1 B16384 S64", 16384, 64)
    k3_var("k3 B4096 S160", 4096, 160)
    k3_var("k3 B4096 S64", 4096, 64)
    k3_var("k3 B16384 S64", 16384, 64)

    # warmup/compile
    for name, B, f in variants:
        _ = np.asarray(f(mk(B)))
    best = {name: 1e9 for name, _, _ in variants}
    TRIALS = 4
    GROUP = 4          # batches per timed group: pipelined dispatches
    for t in range(TRIALS):
        for name, B, f in variants:
            cs = [mk(B) for _ in range(GROUP)]
            t0 = time.perf_counter()
            outs = [f(c) for c in cs]
            for o in outs:
                _ = np.asarray(o)
            dt = (time.perf_counter() - t0) / GROUP
            best[name] = min(best[name], dt)
    for name, B, f in variants:
        dt = best[name]
        print(f"{name:18s} {dt*1e3:8.1f} ms  {B/dt:9.0f} reads/s",
              file=sys.stderr)


if __name__ == "__main__":
    main()
