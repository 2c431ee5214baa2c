"""Finer split inside chain + extend at the bench config, plus job-size
stats that size the optimization (how much of the fixed-shape SW kernel
is real work).

Run: python scripts/profile_r3b.py
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
    from fgdp_tpu.ops.fm import DeviceFMIndex
    from fgdp_tpu.ops.chain_pallas import chain_loop_pallas

    rng = np.random.default_rng(0)
    n_ref = int(os.environ.get("PROF_NREF", 500_000))
    L = 151
    B = int(os.environ.get("PROF_B", 1024))
    pref = PackedReference.from_contigs(
        ["chr1"], [rng.integers(0, 4, n_ref).astype(np.uint8)])
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

    n_iter = 4
    batches = [mk() for _ in range(n_iter + 1)]
    lens = jnp.full(B, L, jnp.int32)
    active = jnp.ones(B, bool)

    seedfn = jax.jit(functools.partial(
        collect_seeds, opt=opt, max_seeds=shapes.max_smems,
        scale=shapes.seed_scale))
    all_seeds = [seedfn(dfm, dref, c, lens, active) for c in batches]

    P, C = shapes.max_seeds, shapes.max_chains

    expfn = jax.jit(functools.partial(
        chainmod.expand_seeds, opt=opt, max_seedpos=P))

    def chain_core(sd):
        qbeg, rbeg, slen, rid, valid, overflow, _flat = chainmod.expand_seeds(
            dfm, dref, sd, opt, P)
        return chain_loop_pallas(qbeg, rbeg, slen, rid, valid, overflow,
                                 dref.l_pac, C, opt.w, opt.max_chain_gap)

    corefn = jax.jit(chain_core)
    chainfn = jax.jit(functools.partial(
        chainmod.chain_seeds, opt=opt, max_seedpos=P, max_chains=C))
    extfn = jax.jit(functools.partial(
        extendmod.extend_chains, opt=opt, max_regs=shapes.max_regs,
        t_max=shapes.max_ext_ref, jobs_per_read=6))

    def bench(name, call, inputs):
        t0 = time.perf_counter()
        out = call(inputs[-1])
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs = [call(x) for x in inputs[:n_iter]]
        for o in outs:
            jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
        dt = (time.perf_counter() - t0) / n_iter
        print(f"{name:14s} {dt*1000:8.1f} ms  ({B/dt:8.0f} reads/s)"
              f"  [c {tc:.0f}s]", file=sys.stderr)
        return outs + [out]

    bench("expand_seeds", lambda sd: expfn(dfm, dref, sd), all_seeds)
    bench("exp+chainloop", corefn, all_seeds)
    cbs = bench("chain_full", lambda sd: chainfn(dfm, dref, sd, lens),
                all_seeds)
    bench("extend", lambda t: extfn(t[0], t[1], lens, dref),
          list(zip(cbs, batches)))

    # ---- job-size statistics (design input) ----
    cb = cbs[0]
    sd = all_seeds[0]
    cnt = np.asarray(sd.count)
    print(f"smems/read: mean {cnt.mean():.1f} p50 "
          f"{np.percentile(cnt,50):.0f} p99 {np.percentile(cnt,99):.0f} "
          f"max {cnt.max()}", file=sys.stderr)
    seed_valid = np.asarray(cb.seed_chain) >= 0
    spr = seed_valid.sum(1)
    print(f"exp seeds/read: mean {spr.mean():.1f} p50 "
          f"{np.percentile(spr,50):.0f} p99 {np.percentile(spr,99):.0f} "
          f"max {spr.max()}", file=sys.stderr)
    nch = np.asarray(cb.n_chains)
    print(f"chains/read: mean {nch.mean():.1f} max {nch.max()}",
          file=sys.stderr)
    kept = np.asarray(cb.kept)
    kept_of_seed = np.take_along_axis(
        kept, np.clip(np.asarray(cb.seed_chain), 0, C - 1), axis=1)
    job = seed_valid & (kept_of_seed > 0)
    jpr = job.sum(1)
    print(f"ext jobs/read: mean {jpr.mean():.1f} p50 "
          f"{np.percentile(jpr,50):.0f} p99 {np.percentile(jpr,99):.0f} "
          f"max {jpr.max()}  total {job.sum()} (J cap {B*6})",
          file=sys.stderr)
    # left/right extension sizes
    qb = np.asarray(cb.seed_qbeg)[job]
    ln = np.asarray(cb.seed_len)[job]
    qlen_l = qb
    qlen_r = L - (qb + ln)
    for nm, q in (("left qlen", qlen_l), ("right qlen", qlen_r)):
        nz = q[q > 0]
        print(f"{nm}: {100*len(nz)/max(len(q),1):.0f}% nonzero, "
              f"nz mean {nz.mean() if len(nz) else 0:.1f} "
              f"p90 {np.percentile(nz,90) if len(nz) else 0:.0f} "
              f"p99 {np.percentile(nz,99) if len(nz) else 0:.0f} "
              f"max {nz.max() if len(nz) else 0}", file=sys.stderr)
    print(f"seed_len: mean {ln.mean():.1f} p10 {np.percentile(ln,10):.0f}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
