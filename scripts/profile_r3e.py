"""K1 sweep internal split: fwd_sweep / +flatten / +bwd / full K1,
measured as complete jitted programs with fresh inputs per run.

Run: python scripts/profile_r3e.py
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
    from fgdp_tpu.index.reference import DeviceReference, PackedReference
    from fgdp_tpu.ops import smem_sweep as sweepops
    from fgdp_tpu.ops.fm import DeviceFMIndex

    seed = int(time.time() * 1000) % (1 << 31)
    rng = np.random.default_rng(seed)
    n_ref = int(os.environ.get("PROF_NREF", 500_000))
    L = 151
    B = int(os.environ.get("PROF_B", 1024))
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
    rid = jnp.arange(B, dtype=jnp.int32)
    E = min(2 * L + 16, 192)
    NL_OUT = B * 44

    def f_fwd(c):
        fw = sweepops.fwd_sweep(dfm, c, lens, rid, jnp.zeros(B, jnp.int32),
                                ones, active, 20, E, dref.codes16,
                                restart=True)
        return fw["ecount"].sum() + fw["em"].sum() + fw["ek"].sum()

    def f_flat(c):
        fw = sweepops.fwd_sweep(dfm, c, lens, rid, jnp.zeros(B, jnp.int32),
                                ones, active, 20, E, dref.codes16,
                                restart=True)
        lanes, dovf = sweepops.flatten_entries(fw, rid, ones, E, NL_OUT)
        return lanes["n"].sum() + lanes["k"].sum() + dovf.sum()

    def f_bwd(c):
        fw = sweepops.fwd_sweep(dfm, c, lens, rid, jnp.zeros(B, jnp.int32),
                                ones, active, 20, E, dref.codes16,
                                restart=True)
        lanes, dovf = sweepops.flatten_entries(fw, rid, ones, E, NL_OUT)
        m, kf, sf = sweepops.bwd_entries(dfm, c, lens, lanes, dref.codes16)
        return m.sum() + kf.sum() + sf.sum()

    def f_k1(c):
        sd = sweepops.smem_all_pos_sweep(
            dfm, dref.codes16, c, lens, ones, active, opt.min_seed_len,
            shapes.max_smems, 20, entry_cap=E, bwd_mult=44)
        return sd.count.sum() + sd.m.sum() + sd.k.sum()

    # entry-count stats
    fw = jax.jit(lambda c: sweepops.fwd_sweep(
        dfm, c, lens, rid, jnp.zeros(B, jnp.int32), ones, active, 20, E,
        dref.codes16, restart=True))(mk())
    ec = np.asarray(fw["ecount"])
    print(f"entries/read: mean {ec.mean():.1f} p50 "
          f"{np.percentile(ec,50):.0f} p99 {np.percentile(ec,99):.0f} "
          f"max {ec.max()} total {ec.sum()} (NL_OUT {NL_OUT})",
          file=sys.stderr)

    n_iter = 6
    for name, f in (("fwd_sweep", f_fwd), ("+flatten", f_flat),
                    ("+bwd", f_bwd), ("k1_full", f_k1)):
        jf = jax.jit(f)
        t0 = time.perf_counter()
        _ = np.asarray(jf(mk()))
        tc = time.perf_counter() - t0
        batches = [mk() for _ in range(n_iter)]
        t0 = time.perf_counter()
        outs = [jf(c) for c in batches]
        _ = [np.asarray(o) for o in outs]
        dt = (time.perf_counter() - t0) / n_iter
        print(f"{name:10s} {dt*1000:8.1f} ms  [c {tc:.0f}s]",
              file=sys.stderr)


if __name__ == "__main__":
    main()
