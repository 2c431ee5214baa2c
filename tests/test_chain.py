"""Parity: batched device chaining vs scalar transcription of
mem_chain_seeds_new / mem_chain_weight / mem_chain_flt."""

import numpy as np
import pytest
import jax.numpy as jnp

from fgdp_tpu.align import chain as chainmod
from fgdp_tpu.align.seeding import collect_seeds
from fgdp_tpu.config import AlignConfig
from fgdp_tpu.index.fmindex import FMIndex
from fgdp_tpu.index.reference import DeviceReference, PackedReference
from fgdp_tpu.ops.fm import DeviceFMIndex
from fgdp_tpu.testing import oracles
from fgdp_tpu.utils import dna


def _setup(rng, n_contigs=2, contig_len=1200):
    seqs = [rng.integers(0, 4, contig_len).astype(np.uint8)
            for _ in range(n_contigs)]
    pref = PackedReference.from_contigs([f"c{i}" for i in range(n_contigs)],
                                        seqs)
    fm = FMIndex.build(pref.codes)
    return pref, fm


def _reads(rng, pref, n, L=101, mut=0.03):
    codes = np.zeros((n, L), np.int32)
    for i in range(n):
        pos = int(rng.integers(0, pref.l_pac - L))
        r = pref.codes[pos:pos + L].astype(np.int32)
        m = rng.random(L) < mut
        r = np.where(m, rng.integers(0, 4, L), r)
        if rng.random() < 0.5:
            r = dna.revcomp(r.astype(np.uint8)).astype(np.int32)
        codes[i] = r
    return codes


@pytest.mark.slow
def test_chain_parity(rng):
    pref, fm = _setup(rng)
    dref = DeviceReference(pref)
    dfm = DeviceFMIndex.from_host(fm)
    opt = AlignConfig()
    B, L = 16, 101
    codes = _reads(rng, pref, B, L)
    lens = np.full(B, L, np.int32)
    active = np.ones(B, bool)

    seeds = collect_seeds(dfm, dref, jnp.asarray(codes), jnp.asarray(lens),
                          jnp.asarray(active), opt, max_seeds=128,
                          prev_cap=64)
    cb = chainmod.chain_seeds(dfm, dref, seeds, jnp.asarray(lens), opt,
                              max_seedpos=256, max_chains=32)
    got = {k: np.asarray(v) for k, v in cb._asdict().items()}
    sm = {k: np.asarray(v) for k, v in seeds._asdict().items()}

    # k < -1 encodes a direct position (single-suffix fast path); the
    # scalar oracle wants true SA ranks — recover them via host ISA
    isa = np.argsort(fm.sa, kind="stable")

    def true_k(ki):
        return int(isa[-ki - 2]) if ki < -1 else ki

    assert not got["overflow"].any()
    for b in range(B):
        smems = [(int(sm["m"][b, i]), int(sm["n"][b, i]),
                  true_k(int(sm["k"][b, i])),
                  0, int(sm["s"][b, i])) for i in range(int(sm["count"][b]))]
        ref_chains = oracles.chain_seeds_ref(fm, pref, smems, opt)
        exp_fr = oracles.frac_rep_ref(smems, opt.max_occ, L)
        assert abs(got["frac_rep"][b] - exp_fr) < 1e-6

        nc = int(got["n_chains"][b])
        assert nc == len(ref_chains), (b, nc, len(ref_chains))

        # compare chains as multisets keyed by (pos, rid, seed tuple)
        dev = {}
        for c in range(nc):
            sidx = np.flatnonzero(got["seed_chain"][b] == c)
            seeds_c = tuple((int(got["seed_qbeg"][b, i]),
                             int(got["seed_rbeg"][b, i]),
                             int(got["seed_len"][b, i])) for i in sidx)
            dev[(int(got["pos"][b, c]), int(got["rid"][b, c]), seeds_c)] = \
                (int(got["weight"][b, c]), int(got["kept"][b, c]))
        for rc in ref_chains:
            key = (rc["pos"], rc["rid"], tuple(rc["seeds"]))
            assert key in dev, (b, key, sorted(dev))
            w = oracles.chain_weight_ref(rc["seeds"])
            assert dev[key][0] == w, (b, key, dev[key], w)

        # kept flags via the filter oracle
        flt_in = []
        for rc in ref_chains:
            flt_in.append(dict(
                w=oracles.chain_weight_ref(rc["seeds"]),
                beg=rc["seeds"][0][0],
                end=rc["seeds"][-1][0] + rc["seeds"][-1][2],
                is_alt=False, pos=rc["pos"], rid=rc["rid"],
                seeds=rc["seeds"]))
        surv = oracles.chain_flt_ref(flt_in, opt)
        exp_kept = {(c["pos"], c["rid"], tuple(c["seeds"])): c["kept"]
                    for c in surv}
        for key, (w, kept) in dev.items():
            assert kept == exp_kept.get(key, 0), (b, key, kept, exp_kept)


@pytest.mark.slow
def test_chain_pallas_matches_jnp(rng):
    """Pallas chain-loop kernel (interpret mode on CPU) is bit-identical
    to the jnp while_loop across every ChainBatch field."""
    pref, fm = _setup(rng, n_contigs=3, contig_len=900)
    dref = DeviceReference(pref)
    dfm = DeviceFMIndex.from_host(fm)
    opt = AlignConfig()
    B, L = 13, 101  # non-multiple of the tile width exercises padding
    codes = _reads(rng, pref, B, L, mut=0.05)
    lens = np.asarray([L] * (B - 2) + [70, 0], np.int32)
    active = np.ones(B, bool)
    active[-1] = False

    seeds = collect_seeds(dfm, dref, jnp.asarray(codes), jnp.asarray(lens),
                          jnp.asarray(active), opt, max_seeds=128,
                          prev_cap=64)

    import unittest.mock as mock
    ref = chainmod.chain_seeds(dfm, dref, seeds, jnp.asarray(lens), opt,
                               max_seedpos=256, max_chains=32,
                               use_pallas=False)
    from fgdp_tpu.ops import chain_pallas
    orig = chain_pallas.chain_loop_pallas

    def interp(*a, **kw):
        return orig(*a, interpret=True, **kw)

    with mock.patch.object(chain_pallas, "chain_loop_pallas", interp):
        got = chainmod.chain_seeds(dfm, dref, seeds, jnp.asarray(lens),
                                   opt, max_seedpos=256, max_chains=32,
                                   use_pallas=True)
    for name in ref._fields:
        a, b = np.asarray(getattr(ref, name)), np.asarray(getattr(got, name))
        assert np.array_equal(a, b), (name, a, b)
