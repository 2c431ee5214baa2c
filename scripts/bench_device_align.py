"""Device-align-only throughput at the bench config (500 kb, B=4096 by
default, env FGDP_B to override). Median of 3 timed passes of 8 async
dispatches each. Use for quick A/B of device-program changes.

Run: python scripts/bench_device_align.py
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

    from fgdp_tpu.config import AlignConfig, BatchShapes
    from fgdp_tpu.index.fmindex import FMIndex
    from fgdp_tpu.index.lcptree import LcpTree
    from fgdp_tpu.index.reference import DeviceReference, PackedReference
    from fgdp_tpu.ops.fm import DeviceFMIndex
    from fgdp_tpu.pipeline import device_align
    from fgdp_tpu.utils import dna

    rng = np.random.default_rng(0)
    n_ref, L = 500_000, 151
    B = int(os.environ.get("FGDP_B", 4096))
    pref = PackedReference.from_contigs(
        ["chr1"], [rng.integers(0, 4, n_ref).astype(np.uint8)])
    fm = FMIndex.build(pref.codes)
    dfm = DeviceFMIndex.from_host(fm)
    dref = DeviceReference(pref)
    lt = LcpTree.build(
        np.concatenate([pref.codes, dna.revcomp(pref.codes)])
        .astype(np.uint8), fm.sa)
    shapes = BatchShapes(read_len=L, batch_reads=B)
    opt = AlignConfig()
    fn0 = jax.jit(functools.partial(device_align, opt=opt, shapes=shapes))
    tree_d, isa_d = jnp.asarray(lt.tree), jnp.asarray(lt.isa)
    fn = lambda c, lens, act: fn0(dfm, dref, c, lens, act,
                                  lcp_tree=tree_d, lcp_isa=isa_d)
    n_iter = 8
    batches = []
    for it in range(3 * n_iter + 1):
        pos = rng.integers(0, n_ref - L, B)
        c = np.stack([pref.codes[p:p + L] for p in pos]).astype(np.int32)
        m = rng.random(c.shape) < 0.01
        c = np.where(m, rng.integers(0, 4, c.shape), c)
        batches.append(jnp.asarray(c))
    lens_d = jnp.asarray(np.full(B, L, np.int32))
    act = jnp.ones(B, bool)
    t0 = time.perf_counter()
    out = fn(batches[0], lens_d, act)
    novf = int(np.asarray(out.overflow).sum())
    print(f"compile+first: {time.perf_counter()-t0:.1f}s "
          f"(overflow {novf}/{B})", file=sys.stderr)
    vals = []
    for trial in range(3):
        t0 = time.perf_counter()
        outs = [fn(batches[1 + trial * n_iter + i], lens_d, act)
                for i in range(n_iter)]
        for o in outs:
            _ = np.asarray(o.score[:1, :1])
        dt = (time.perf_counter() - t0) / n_iter
        vals.append(B / dt)
    vals.sort()
    print(f"device align B={B}: median {vals[1]:.0f} reads/s "
          f"(min {vals[0]:.0f}, max {vals[2]:.0f})")


if __name__ == "__main__":
    main()
