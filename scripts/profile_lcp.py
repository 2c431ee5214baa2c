"""A/B: K1 via smem_all_pos_sweep vs smem_all_lcp at bench shapes.

Run: PROF_B=4096 python scripts/profile_lcp.py
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

    from fgdp_tpu.config import AlignConfig, BatchShapes
    from fgdp_tpu.index.fmindex import FMIndex
    from fgdp_tpu.index.lcptree import LcpTree
    from fgdp_tpu.index.reference import DeviceReference, PackedReference
    from fgdp_tpu.ops import smem_lcp as lcpops
    from fgdp_tpu.ops import smem_sweep as sweepops
    from fgdp_tpu.ops.fm import DeviceFMIndex
    from fgdp_tpu.utils import dna

    seed = int(time.time() * 1000) % (1 << 31)
    rng = np.random.default_rng(seed)
    n_ref = int(os.environ.get("PROF_NREF", 500_000))
    L = 151
    B = int(os.environ.get("PROF_B", 4096))
    ref_rng = np.random.default_rng(0)
    pref = PackedReference.from_contigs(
        ["chr1"], [ref_rng.integers(0, 4, n_ref).astype(np.uint8)])
    fm = FMIndex.build(pref.codes)
    dfm = DeviceFMIndex.from_host(fm)
    dref = DeviceReference(pref)
    x = np.concatenate([pref.codes, dna.revcomp(pref.codes)]
                       ).astype(np.uint8)
    t0 = time.perf_counter()
    lt = LcpTree.build(x, fm.sa)
    print(f"lcp tree build: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    tree_d = jnp.asarray(lt.tree)
    isa_d = jnp.asarray(lt.isa)
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
    E = min(2 * L + 16, 192)

    def f_sweep(c):
        sd = sweepops.smem_all_pos_sweep(
            dfm, dref.codes16, c, lens, ones, active, opt.min_seed_len,
            shapes.max_smems, 20, entry_cap=E, bwd_mult=44)
        return sd.count.sum() + sd.m.sum() + sd.k.sum()

    def f_lcp(c):
        sd = lcpops.smem_all_lcp(
            dfm, tree_d, isa_d, c, lens, active, opt.min_seed_len,
            shapes.max_smems, ref_codes16=dref.codes16)
        return sd.count.sum() + sd.m.sum() + sd.k.sum()

    n_iter = 6
    for name, f in (("k1_sweep", f_sweep), ("k1_lcp", f_lcp)):
        jf = jax.jit(f)
        t0 = time.perf_counter()
        _ = np.asarray(jf(mk()))
        tc = time.perf_counter() - t0
        batches = [mk() for _ in range(n_iter)]
        t0 = time.perf_counter()
        outs = [jf(c) for c in batches]
        _ = [np.asarray(o) for o in outs]
        dt = (time.perf_counter() - t0) / n_iter
        print(f"{name:10s} {dt*1000:8.1f} ms  ({B/dt:8.0f} reads/s)"
              f"  [c {tc:.0f}s]", file=sys.stderr)


# overflow-rate check (run via PROF_OVF=1)
def ovf_check():
    import jax, jax.numpy as jnp
    from fgdp_tpu.config import AlignConfig, BatchShapes
    from fgdp_tpu.index.fmindex import FMIndex
    from fgdp_tpu.index.lcptree import LcpTree
    from fgdp_tpu.index.reference import DeviceReference, PackedReference
    from fgdp_tpu.ops import smem_lcp as lcpops
    from fgdp_tpu.ops.fm import DeviceFMIndex
    from fgdp_tpu.utils import dna
    rng = np.random.default_rng(7)
    n_ref = int(os.environ.get("PROF_NREF", 500_000))
    L, B = 151, int(os.environ.get("PROF_B", 4096))
    ref_rng = np.random.default_rng(0)
    pref = PackedReference.from_contigs(
        ["chr1"], [ref_rng.integers(0, 4, n_ref).astype(np.uint8)])
    fm = FMIndex.build(pref.codes)
    dfm = DeviceFMIndex.from_host(fm)
    dref = DeviceReference(pref)
    x = np.concatenate([pref.codes, dna.revcomp(pref.codes)]).astype(np.uint8)
    lt = LcpTree.build(x, fm.sa)
    opt = AlignConfig()
    pos = rng.integers(0, n_ref - L, B)
    c = np.stack([pref.codes[p:p + L] for p in pos]).astype(np.int32)
    m = rng.random(c.shape) < 0.01
    c = np.where(m, rng.integers(0, 4, c.shape), c)
    rc = rng.random(B) < 0.5
    c = np.where(rc[:, None], 3 - c[:, ::-1], c)
    for rounds in (12, 16, 24, 32):
        sd = lcpops.smem_all_lcp(
            dfm, jnp.asarray(lt.tree), jnp.asarray(lt.isa),
            jnp.asarray(c), jnp.full(B, L, jnp.int32), jnp.ones(B, bool),
            opt.min_seed_len, 160, ref_codes16=dref.codes16,
            max_rounds=rounds)
        print(f"rounds={rounds}: overflow {int(np.asarray(sd.overflow).sum())}/{B}",
              file=sys.stderr)

if __name__ == "__main__":
    if os.environ.get("PROF_OVF") == "1":
        ovf_check()
    else:
        main()
