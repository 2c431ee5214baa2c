"""Device-align diagnosis at the chr20-scale repeat-rich index:
per-batch time, overflow rate (escalation pressure), and K1-LCP
overflow at each cascade budget.

Run: python scripts/profile_scale.py /tmp/scale/idx [B]
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
    import functools

    import jax
    import jax.numpy as jnp

    from fgdp_tpu.config import AlignConfig, BatchShapes
    from fgdp_tpu.index.fmindex import FMIndex
    from fgdp_tpu.index.lcptree import LcpTree
    from fgdp_tpu.index.reference import DeviceReference, PackedReference
    from fgdp_tpu.ops import smem_lcp as lcpops
    from fgdp_tpu.ops.fm import DeviceFMIndex
    from fgdp_tpu.pipeline import device_align

    prefix = sys.argv[1]
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    L = 151
    pref = PackedReference.load(prefix + ".ref")
    fm = FMIndex.load(prefix + ".fmi")
    lt = LcpTree.load(prefix + ".lcp.npz")
    dfm = DeviceFMIndex.from_host(fm)
    dref = DeviceReference(pref)
    tree_d = jnp.asarray(lt.tree)
    isa_d = jnp.asarray(lt.isa)
    shapes = BatchShapes(read_len=L, batch_reads=B)
    opt = AlignConfig()
    n_ref = pref.l_pac
    rng = np.random.default_rng(3)

    def mk():
        pos = rng.integers(0, n_ref - L, B)
        c = np.stack([pref.codes[p:p + L] for p in pos]).astype(np.int32)
        m = rng.random(c.shape) < 0.01
        c = np.where(m, rng.integers(0, 4, c.shape), c)
        rc = rng.random(B) < 0.5
        c = np.where(rc[:, None], 3 - c[:, ::-1], c)
        return jnp.asarray(c)

    lens = jnp.full(B, L, jnp.int32)
    act = jnp.ones(B, bool)

    # K1 overflow per cascade budget
    c0 = mk()
    for rounds in (24, 48, 96):
        sd = lcpops.smem_all_lcp(dfm, tree_d, isa_d, c0, lens, act,
                                 opt.min_seed_len, shapes.max_smems,
                                 ref_codes16=dref.codes16,
                                 max_rounds=rounds)
        ovf = int(np.asarray(sd.overflow).sum())
        cnt = np.asarray(sd.count)
        print(f"K1 rounds={rounds}: overflow {ovf}/{B}, smems/read "
              f"p50={np.percentile(cnt,50):.0f} p99="
              f"{np.percentile(cnt,99):.0f} max={cnt.max()}",
              file=sys.stderr)

    fn = jax.jit(functools.partial(device_align, opt=opt, shapes=shapes))
    t0 = time.perf_counter()
    out = fn(dfm, dref, c0, lens, act, lcp_tree=tree_d, lcp_isa=isa_d)
    ovf = np.asarray(out.overflow)
    print(f"compile+first: {time.perf_counter()-t0:.0f}s; "
          f"reg overflow {int(ovf.sum())}/{B}", file=sys.stderr)
    n_iter = 4
    batches = [mk() for _ in range(n_iter)]
    t0 = time.perf_counter()
    outs = [fn(dfm, dref, c, lens, act, lcp_tree=tree_d, lcp_isa=isa_d)
            for c in batches]
    ovfs = [int(np.asarray(o.overflow).sum()) for o in outs]
    dt = (time.perf_counter() - t0) / n_iter
    print(f"device align: {dt*1000:.0f} ms/batch ({B/dt:.0f} reads/s), "
          f"overflow per batch {ovfs}", file=sys.stderr)


if __name__ == "__main__":
    main()
