"""Round-4 stage breakdown of device_align at the bench config
(500 kb ref, B=4096, LCP K1 engine) — where do the ~170 ms/batch go?

Run: python scripts/profile_r4.py [B]
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
    from fgdp_tpu.ops import smem as smemops
    from fgdp_tpu.ops.fm import DeviceFMIndex
    from fgdp_tpu.pipeline import device_align, compact_regs
    from fgdp_tpu.utils import dna

    rng = np.random.default_rng(7)
    n_ref = 500_000
    L = 151
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    pref = PackedReference.from_contigs(
        ["chr1"], [rng.integers(0, 4, n_ref).astype(np.uint8)])
    fm = FMIndex.build(pref.codes)
    dfm = DeviceFMIndex.from_host(fm)
    dref = DeviceReference(pref)
    lt = LcpTree.build(
        np.concatenate([pref.codes, dna.revcomp(pref.codes)])
        .astype(np.uint8), fm.sa)
    tree_d, isa_d = jnp.asarray(lt.tree), jnp.asarray(lt.isa)
    shapes = BatchShapes(read_len=L, batch_reads=B)
    opt = AlignConfig()

    def make_batch():
        pos = rng.integers(0, n_ref - L, B)
        codes = np.stack([pref.codes[p:p + L] for p in pos]).astype(np.int32)
        m = rng.random(codes.shape) < 0.01
        codes = np.where(m, rng.integers(0, 4, codes.shape), codes)
        rc = rng.random(B) < 0.5
        codes = np.where(rc[:, None], 3 - codes[:, ::-1], codes)
        return jnp.asarray(codes)

    n_iter = 6
    batches = [make_batch() for _ in range(n_iter + 1)]
    lens = jnp.asarray(np.full(B, L, np.int32))
    active = jnp.ones(B, bool)

    def sync(o):
        # the axon relay executes lazily: block_until_ready is not a
        # barrier; a 1-element host fetch is (see profile_r3d.py)
        leaf = jax.tree_util.tree_leaves(o)[0]
        _ = np.asarray(leaf.reshape(-1)[:1])

    def timed(name, call, inputs):
        out = call(inputs[-1])
        sync(out)
        t0 = time.perf_counter()
        outs = [call(x) for x in inputs[:n_iter]]
        for o in outs:
            sync(o)
        dt = (time.perf_counter() - t0) / n_iter
        print(f"{name:16s} {dt*1000:9.2f} ms  ({B/dt:>8.0f} reads/s)",
              file=sys.stderr)
        return outs + [out]

    # full device program (what bench.py times)
    full = jax.jit(functools.partial(device_align, opt=opt, shapes=shapes))
    timed("device_align", lambda c: full(
        dfm, dref, c, lens, active, lcp_tree=tree_d, lcp_isa=isa_d),
        batches)

    # K1 alone (LCP engine)
    k1 = jax.jit(lambda c: lcpops.smem_all_lcp(
        dfm, tree_d, isa_d, c, lens, active, opt.min_seed_len,
        shapes.max_smems, ref_codes16=dref.codes16, max_rounds=24))
    timed("k1_lcp", k1, batches)

    # K3 alone
    k3 = jax.jit(lambda c: smemops.seed_strategy(
        dfm, c, lens, active, opt.max_mem_intv, opt.min_seed_len + 1,
        shapes.max_smems))
    timed("k3_seed", k3, batches)

    # full seeding (K1+K2+K3+sort)
    seedfn = jax.jit(lambda c: collect_seeds(
        dfm, dref, c, lens, active, opt, max_seeds=shapes.max_smems,
        prev_cap=20, scale=1, lcp_tree=tree_d, lcp_isa=isa_d))
    all_seeds = timed("seeding_all", seedfn, batches)

    # chaining
    jobs_cap = B * 32
    chainfn = jax.jit(functools.partial(
        chainmod.chain_seeds, opt=opt, max_seedpos=shapes.max_seeds,
        max_chains=shapes.max_chains, jobs_cap=jobs_cap))
    cbs = timed("chaining", lambda sd: chainfn(dfm, dref, sd, lens),
                all_seeds)

    # extension
    extfn = jax.jit(functools.partial(
        extendmod.extend_chains, opt=opt, max_regs=shapes.max_regs,
        t_max=shapes.max_ext_ref, jobs_per_read=6))
    regs = timed("extension",
                 lambda t: extfn(t[0], t[1], lens, dref),
                 list(zip(cbs, batches)))

    # compaction
    compfn = jax.jit(functools.partial(compact_regs, k=shapes.transfer_regs))
    timed("compact", compfn, regs)


if __name__ == "__main__":
    main()
