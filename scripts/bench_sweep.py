"""K1 sweep vs wave machine on the profile_stages workload (TPU)."""

import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fgdp_tpu.config import AlignConfig
    from fgdp_tpu.index.fmindex import FMIndex
    from fgdp_tpu.index.reference import DeviceReference, PackedReference
    from fgdp_tpu.ops.fm import DeviceFMIndex
    from fgdp_tpu.ops import smem as smemops
    from fgdp_tpu.ops import smem_sweep as sweep

    rng = np.random.default_rng(0)
    n_ref = 2_000_000
    L = 151
    B = int(os.environ.get("PROF_B", 1024))
    E = int(os.environ.get("PROF_E", 128))
    BM = int(os.environ.get("PROF_BM", 0))
    pref = PackedReference.from_contigs(
        ["chr1"], [rng.integers(0, 4, n_ref).astype(np.uint8)])
    fm = FMIndex.build(pref.codes)
    dfm = DeviceFMIndex.from_host(fm)
    dref = DeviceReference(pref)
    opt = AlignConfig()

    pos = rng.integers(0, n_ref - L, B)
    codes = np.stack([pref.codes[p:p + L] for p in pos]).astype(np.int32)
    m = rng.random(codes.shape) < 0.01
    codes = jnp.asarray(np.where(m, rng.integers(0, 4, codes.shape), codes))
    lens = jnp.full(B, L, jnp.int32)
    active = jnp.ones(B, bool)
    mi = jnp.ones(B, jnp.int32)

    # --- entry count stats ---
    fw = jax.jit(lambda c: sweep.fwd_sweep(
        dfm, c, lens, jnp.arange(B, dtype=jnp.int32),
        jnp.zeros(B, jnp.int32), mi, active, 20, 2 * L + 16,
        dref.codes16, restart=True))(codes)
    ec = np.asarray(fw["ecount"])
    print(f"entries/read: mean {ec.mean():.1f} p50 {np.percentile(ec,50):.0f}"
          f" p99 {np.percentile(ec,99):.0f} max {ec.max()}"
          f"  total {ec.sum()}", file=sys.stderr)

    def timeit(f, *a):
        r = f(*a)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(5):
            r = f(*a)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / 5

    prev_cap = 20
    f_wave = jax.jit(lambda c: smemops.smem_all_pos(
        dfm, dref.codes, dref.l_pac, c, lens, mi, active,
        opt.min_seed_len, 64, prev_cap, ref_codes16=dref.codes16))
    f_sweep = jax.jit(lambda c: sweep.smem_all_pos_sweep(
        dfm, dref.codes16, c, lens, mi, active, opt.min_seed_len, 64,
        prev_cap, entry_cap=E, bwd_mult=BM))

    tw = timeit(f_wave, codes)
    ts = timeit(f_sweep, codes)

    # --- phase breakdown ---
    rid = jnp.arange(B, dtype=jnp.int32)
    x0 = jnp.zeros(B, jnp.int32)
    fA = jax.jit(lambda c: sweep.fwd_sweep(
        dfm, c, lens, rid, x0, mi, active, prev_cap, E, dref.codes16,
        restart=True))
    tA = timeit(fA, codes)
    fwr = fA(codes)
    NL_OUT = B * (BM or E)
    fF = jax.jit(lambda f: sweep.flatten_entries(f, rid, mi, E, NL_OUT))
    tF = timeit(fF, fwr)
    lanes, _ = fF(fwr)
    fB = jax.jit(lambda ln: sweep.bwd_entries(dfm, codes, lens, ln,
                                              dref.codes16))
    tB = timeit(fB, lanes)
    mm, kf, sf = fB(lanes)
    fE = jax.jit(lambda ln, m_, k_, s_: sweep.emit_merge(
        ln, m_, k_, s_, opt.min_seed_len, B, 64))
    tE = timeit(fE, lanes, mm, kf, sf)
    print(f"  fwd {tA*1e3:6.1f}  flatten {tF*1e3:6.1f}  "
          f"bwd {tB*1e3:6.1f}  emit {tE*1e3:6.1f}", file=sys.stderr)
    a = f_wave(codes)
    b = f_sweep(codes)
    eq = (np.array_equal(np.asarray(a.count), np.asarray(b.count)) and
          np.array_equal(np.asarray(a.m)[np.asarray(a.m) != 0],
                         np.asarray(b.m)[np.asarray(b.m) != 0]))
    ovf = int(np.asarray(b.overflow).sum())
    print(f"B={B} E={E} BM={BM}  wave {tw*1e3:7.1f} ms   "
          f"sweep {ts*1e3:7.1f} ms   ({tw/ts:.2f}x)  counts_eq={eq} "
          f"sweep_ovf={ovf}", file=sys.stderr)


if __name__ == "__main__":
    main()
