"""Batched device SMEM kernels vs scalar reference transcription vs brute force."""

import numpy as np
import pytest

import jax.numpy as jnp

from fgdp_tpu.config import AlignConfig
from fgdp_tpu.index.fmindex import FMIndex
from fgdp_tpu.ops import smem as smemops
from fgdp_tpu.ops.fm import DeviceFMIndex
from fgdp_tpu.testing import oracles
from fgdp_tpu.utils import dna


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(7)
    ref = rng.integers(0, 4, size=600, dtype=np.uint8)
    fm = FMIndex.build(ref)
    dfm = DeviceFMIndex.from_host(fm)
    refc = jnp.asarray(ref, jnp.int32)
    return rng, ref, fm, dfm, refc


def make_reads(rng, ref, n_reads=24, L=48):
    """Mix of planted exact reads, mutated reads, junk, and N-contaminated."""
    reads = np.zeros((n_reads, L), dtype=np.uint8)
    text = np.concatenate([ref, dna.revcomp(ref)])
    for i in range(n_reads):
        kind = i % 4
        if kind == 0:  # exact
            p = rng.integers(0, len(text) - L)
            reads[i] = text[p:p + L]
        elif kind == 1:  # mutated
            p = rng.integers(0, len(text) - L)
            r = text[p:p + L].copy()
            for _ in range(rng.integers(1, 5)):
                r[rng.integers(0, L)] = rng.integers(0, 4)
            reads[i] = r
        elif kind == 2:  # random junk
            reads[i] = rng.integers(0, 4, size=L, dtype=np.uint8)
        else:  # with ambiguous bases
            p = rng.integers(0, len(text) - L)
            r = text[p:p + L].copy()
            r[rng.integers(0, L)] = 4
            r[rng.integers(0, L)] = 4
            reads[i] = r
    return reads


def seeds_to_sets(seeds, B, fm):
    """Normalize seeds to (m, n, s, sorted SA positions): k may carry a
    direct position encoding (k < -1 => -k - 2) from the single-suffix
    fast path; positions are what downstream consumes."""
    out = []
    m, n, k, s = (np.asarray(seeds.m), np.asarray(seeds.n),
                  np.asarray(seeds.k), np.asarray(seeds.s))
    cnt = np.asarray(seeds.count)
    for b in range(B):
        rows = []
        for i in range(cnt[b]):
            ki, si = int(k[b, i]), int(s[b, i])
            pos = (-ki - 2,) if ki < -1 else                 tuple(sorted(int(fm.sa[r]) for r in range(ki, ki + si)))
            rows.append((int(m[b, i]), int(n[b, i]), si, pos))
        out.append(sorted(rows))
    return out


def oracle_to_sets(ref_out, fm):
    return sorted((m, n, s,
                   tuple(sorted(int(fm.sa[r]) for r in range(k, k + s))))
                  for (m, n, k, l, s) in ref_out)


def test_scalar_oracle_matches_brute_force(world):
    """The transcription of the reference kernel must produce the textbook
    SMEM set (min_intv=1, no length filter)."""
    rng, ref, fm, _, _ = world
    text = oracles.text_with_rc(ref)
    for _ in range(8):
        L = 20
        p = int(rng.integers(0, 2 * len(ref) - L))
        q = np.frombuffer(text[p:p + L], dtype=np.uint8).copy()
        q[int(rng.integers(0, L))] = int(rng.integers(0, 4))
        got = oracles.smem_all_pos_ref(fm, q, 1, 1)
        got_set = {(m, n + 1, s) for (m, n, k, l, s) in got}
        want = {(s0, e0, c) for (s0, e0, c) in oracles.smems_brute(text, q)}
        assert got_set == want


@pytest.mark.parametrize("two_step", [True, False])
def test_device_k1_matches_scalar(world, two_step):
    rng, ref, fm, dfm, refc = world
    reads = make_reads(rng, ref)
    B, L = reads.shape
    codes = jnp.asarray(reads, jnp.int32)
    lens = jnp.full(B, L, jnp.int32)
    min_intv = jnp.ones(B, jnp.int32)
    active = jnp.ones(B, bool)
    min_seed_len = 10
    seeds = smemops.smem_all_pos(dfm, refc, len(ref), codes, lens,
                                 min_intv, active, min_seed_len,
                                 max_seeds=64, prev_cap=L + 2,
                                 two_step=two_step)
    got = seeds_to_sets(seeds, B, fm)
    for b in range(B):
        ref_out = oracles.smem_all_pos_ref(fm, reads[b], 1, min_seed_len)
        want = oracle_to_sets(ref_out, fm)
        assert got[b] == want, f"read {b}"


@pytest.mark.parametrize("two_step", [True, False])
def test_device_one_pos_matches_scalar_k2_params(world, two_step):
    """K2-style: varied anchors and min_intv per lane."""
    rng, ref, fm, dfm, refc = world
    reads = make_reads(rng, ref, n_reads=16)
    B, L = reads.shape
    x = rng.integers(0, L, size=B).astype(np.int32)
    mi = rng.integers(1, 6, size=B).astype(np.int32)
    seeds0 = smemops._empty_seeds(B, 64)
    seeds, next_x = smemops.smem_one_pos(
        dfm, refc, len(ref), jnp.asarray(reads, jnp.int32),
        jnp.full(B, L, jnp.int32),
        jnp.asarray(x), jnp.asarray(mi), jnp.ones(B, bool),
        10, seeds0, prev_cap=L + 2, two_step=two_step)
    got = seeds_to_sets(seeds, B, fm)
    nx = np.asarray(next_x)
    for b in range(B):
        ref_out, ref_nx = oracles.smem_one_pos_ref(fm, reads[b], int(x[b]),
                                                   int(mi[b]), 10)
        want = oracle_to_sets(ref_out, fm)
        assert got[b] == want, f"read {b}"
        assert nx[b] == ref_nx, f"read {b} next_x"


def test_device_k3_matches_scalar(world):
    rng, ref, fm, dfm, refc = world
    reads = make_reads(rng, ref)
    B, L = reads.shape
    seeds = smemops.seed_strategy(
        dfm, jnp.asarray(reads, jnp.int32), jnp.full(B, L, jnp.int32),
        jnp.ones(B, bool), max_intv=20, min_seed_len=11, max_seeds=64)
    got = seeds_to_sets(seeds, B, fm)
    for b in range(B):
        ref_out = oracles.seed_strategy_ref(fm, reads[b], 20, 11)
        want = oracle_to_sets(ref_out, fm)
        assert got[b] == want, f"read {b}"


@pytest.mark.slow
def test_full_collect_pipeline_matches(world):
    """K1+K2+K3 driver parity (mem_collect_smem semantics)."""
    rng, ref, fm, dfm, refc = world
    opt = AlignConfig(min_seed_len=10, max_mem_intv=20, split_width=10)
    reads = make_reads(rng, ref, n_reads=12)
    B, L = reads.shape
    from fgdp_tpu.align.seeding import collect_seeds
    from fgdp_tpu.index.reference import DeviceReference, PackedReference
    dref = DeviceReference(PackedReference.from_contigs(["c"], [ref]))
    seeds = collect_seeds(dfm, dref, jnp.asarray(reads, jnp.int32),
                          jnp.full(B, L, jnp.int32), jnp.ones(B, bool), opt,
                          max_seeds=128, prev_cap=L + 2)
    got = seeds_to_sets(seeds, B, fm)
    for b in range(B):
        k1, k2, k3 = oracles.collect_smems_ref(fm, reads[b], opt)
        want = oracle_to_sets(k1 + k2 + k3, fm)
        assert got[b] == want, f"read {b}"


def test_device_k3_tail_tiering_matches(world):
    """K3 straggler compaction path (off by default) stays exact."""
    rng, ref, fm, dfm, refc = world
    reads = make_reads(rng, ref)
    B, L = reads.shape
    a = smemops.seed_strategy(
        dfm, jnp.asarray(reads, jnp.int32), jnp.full(B, L, jnp.int32),
        jnp.ones(B, bool), max_intv=20, min_seed_len=11, max_seeds=64)
    b = smemops.seed_strategy(
        dfm, jnp.asarray(reads, jnp.int32), jnp.full(B, L, jnp.int32),
        jnp.ones(B, bool), max_intv=20, min_seed_len=11, max_seeds=64,
        tail_frac=4)
    assert seeds_to_sets(a, B, fm) == seeds_to_sets(b, B, fm)


@pytest.mark.slow
def test_backward_two_step_ambiguous_second_char(world):
    """N at the SECOND char of a backward gather pair must kill the
    lane exactly like the one-step body (a lane left alive would skip
    the N and extend across it). Crafted so the skip-extension would
    survive if taken."""
    rng, ref, fm, dfm, refc = world
    text = np.concatenate([ref, dna.revcomp(ref)])
    L = 40
    x = 20
    # read matches text at p; N placed at x-2 (second-of-pair when the
    # backward walk starts at j = x-1)
    p = 150
    read = text[p:p + L].astype(np.uint8).copy()
    read[x - 2] = 4
    reads = read[None, :]
    codes = jnp.asarray(reads, jnp.int32)
    lens = jnp.full(1, L, jnp.int32)
    seeds0 = smemops._empty_seeds(1, 64)
    outs = {}
    for ts in (True, False):
        seeds, nx = smemops.smem_one_pos(
            dfm, refc, len(ref), codes, lens, jnp.full(1, x, jnp.int32),
            jnp.ones(1, jnp.int32), jnp.ones(1, bool), 5, seeds0,
            prev_cap=L + 2, two_step=ts)
        outs[ts] = (seeds_to_sets(seeds, 1, fm), int(nx[0]))
    assert outs[True] == outs[False]
    # and both match the scalar oracle
    ref_out, ref_nx = oracles.smem_one_pos_ref(fm, reads[0], x, 1, 5)
    assert outs[True][0][0] == oracle_to_sets(ref_out, fm)
    assert outs[True][1] == ref_nx


def _pack16(ref: np.ndarray) -> jnp.ndarray:
    """Doubled-space (fwd + revcomp) codes packed 16/uint32, mirroring
    DeviceReference.__init__ (index/reference.py)."""
    x = np.concatenate([np.asarray(ref, np.uint8),
                        3 - np.asarray(ref, np.uint8)[::-1]])
    nw = (len(x) + 15) // 16 + 1
    xp = np.zeros(nw * 16, np.uint32)
    xp[:len(x)] = x
    return jnp.asarray(
        (xp.reshape(nw, 16) << (2 * np.arange(16, dtype=np.uint32))
         ).sum(axis=1, dtype=np.uint32))


@pytest.mark.slow
def test_packed_epilogue_parity(world):
    """The single-suffix epilogues must emit identical seeds whether the
    text window comes from elementwise _text_base gathers or the packed
    16-codes/word fetch (ref_codes16)."""
    rng, ref, fm, dfm, refc = world
    reads = make_reads(rng, ref, n_reads=32)
    B, L = reads.shape
    codes = jnp.asarray(reads, jnp.int32)
    lens = jnp.full(B, L, jnp.int32)
    min_intv = jnp.ones(B, jnp.int32)
    active = jnp.ones(B, bool)
    c16 = _pack16(ref)
    base = smemops.smem_all_pos(dfm, refc, len(ref), codes, lens,
                                min_intv, active, 10, max_seeds=64,
                                prev_cap=L + 2)
    fast = smemops.smem_all_pos(dfm, refc, len(ref), codes, lens,
                                min_intv, active, 10, max_seeds=64,
                                prev_cap=L + 2, ref_codes16=c16)
    for f in ("m", "n", "k", "s", "count", "overflow"):
        np.testing.assert_array_equal(np.asarray(getattr(base, f)),
                                      np.asarray(getattr(fast, f)), f)
    # K2-style lanes too (distinct anchors/min_intv per lane)
    anchors = jnp.asarray(rng.integers(4, L - 4, B), jnp.int32)
    mi = jnp.asarray(rng.integers(1, 4, B), jnp.int32)
    ridx = jnp.arange(B, dtype=jnp.int32)
    lb, _ = smemops.smem_one_pos_lanes(dfm, refc, len(ref), codes, lens,
                                       ridx, anchors, mi, active, 10,
                                       L + 2, 16)
    lf, _ = smemops.smem_one_pos_lanes(dfm, refc, len(ref), codes, lens,
                                       ridx, anchors, mi, active, 10,
                                       L + 2, 16, ref_codes16=c16)
    for f in ("m", "n", "k", "s", "count"):
        np.testing.assert_array_equal(np.asarray(getattr(lb, f)),
                                      np.asarray(getattr(lf, f)), f)
