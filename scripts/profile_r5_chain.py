"""Chain-stage decomposition at the bench config: expand_seeds alone vs
+pallas chain loop vs +chain_flt (env PROF_STAGE selects; one stage per
process — several resident device_align-sized programs exhaust relay
HBM). Run: for s in expand chain flt; do PROF_STAGE=$s python
scripts/profile_r5_chain.py; done
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

    from fgdp_tpu.align import chain as chainmod
    from fgdp_tpu.align.seeding import collect_seeds
    from fgdp_tpu.config import AlignConfig, BatchShapes
    from fgdp_tpu.index.fmindex import FMIndex
    from fgdp_tpu.index.lcptree import LcpTree
    from fgdp_tpu.index.reference import DeviceReference, PackedReference
    from fgdp_tpu.ops.fm import DeviceFMIndex
    from fgdp_tpu.utils import dna

    rng = np.random.default_rng(int(time.time()) % 10000)
    n_ref, L, B = 500_000, 151, 4096
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
    lens = jnp.full(B, L, jnp.int32)
    active = jnp.ones(B, bool)

    def mk():
        pos = rng.integers(0, n_ref - L, B)
        c = np.stack([pref.codes[p:p + L] for p in pos]).astype(np.int32)
        m = rng.random(c.shape) < 0.01
        c = np.where(m, rng.integers(0, 4, c.shape), c)
        rc = rng.random(B) < 0.5
        return jnp.asarray(np.where(rc[:, None], 3 - c[:, ::-1], c))

    def seeds_of(c):
        return collect_seeds(dfm, dref, c, lens, active, opt,
                             max_seeds=shapes.max_smems,
                             lcp_tree=tree_d, lcp_isa=isa_d)

    def seed_only(c):
        sd = seeds_of(c)
        return sd.count.sum() + sd.m.sum() + sd.n.sum()

    def expand(c):
        sd = seeds_of(c)
        qbeg, rbeg, slen, rid, valid, ovf, flat = chainmod.expand_seeds(
            dfm, dref, sd, opt, shapes.max_seeds, jobs_cap=B * 32)
        return qbeg.sum() + rbeg.sum() + slen.sum() + flat["qbeg"].sum()

    def full_chain(c):
        sd = seeds_of(c)
        cb = chainmod.chain_seeds(dfm, dref, sd, lens, opt,
                                  max_seedpos=shapes.max_seeds,
                                  max_chains=shapes.max_chains,
                                  jobs_cap=B * 32)
        return cb.weight.sum() + cb.kept.sum() + cb.fon.sum()

    def chain_noflt(c):
        sd = seeds_of(c)
        cb = chainmod.chain_seeds(dfm, dref, sd, lens, opt,
                                  max_seedpos=shapes.max_seeds,
                                  max_chains=shapes.max_chains,
                                  jobs_cap=B * 32)
        # depends on the loop outputs but not on _chain_flt's kept
        return cb.weight.sum() + cb.pos.sum() + cb.n_chains.sum()

    stages = dict(seed=seed_only, expand=expand, loop=chain_noflt,
                  flt=full_chain)
    name = os.environ.get("PROF_STAGE", "expand")
    f = stages[name]
    jf = jax.jit(f)
    t0 = time.perf_counter()
    _ = np.asarray(jf(mk()))
    tc = time.perf_counter() - t0
    bs = [mk() for _ in range(6)]
    t0 = time.perf_counter()
    outs = [jf(c) for c in bs]
    _ = [np.asarray(o) for o in outs]
    dt = (time.perf_counter() - t0) / 6
    print(f"{name:8s} {dt*1000:8.1f} ms ({B/dt:8.0f} r/s) "
          f"[compile {tc:.0f}s]")


if __name__ == "__main__":
    main()
