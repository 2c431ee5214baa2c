"""Self-restarting SMEM machines (ops/smem_sweep) vs the wave machines.

The sweep must reproduce smem_all_pos / smem_one_pos_lanes output
slot-for-slot (same seeds, same order, same counts); k is compared
after normalizing to SA position sets because both designs emit the
direct-position encoding (k = -pos - 2) for single-suffix seeds but for
different (equivalent) subsets of them.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fgdp_tpu.index.fmindex import FMIndex
from fgdp_tpu.index.reference import DeviceReference, PackedReference
from fgdp_tpu.ops import smem as smemops
from fgdp_tpu.ops import smem_sweep as sweep
from fgdp_tpu.ops.fm import DeviceFMIndex
from fgdp_tpu.utils import dna

from test_smem import make_reads


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(7)
    ref = rng.integers(0, 4, size=600, dtype=np.uint8)
    pref = PackedReference.from_contigs(["chr1"], [ref])
    fm = FMIndex.build(pref.codes)
    dfm = DeviceFMIndex.from_host(fm)
    dref = DeviceReference(pref)
    return rng, ref, fm, dfm, dref


def slots(seeds, fm, B):
    """Per-read ordered seed tuples with k normalized to positions."""
    m, n, k, s = (np.asarray(seeds.m), np.asarray(seeds.n),
                  np.asarray(seeds.k), np.asarray(seeds.s))
    cnt = np.asarray(seeds.count)
    out = []
    for b in range(B):
        rows = []
        for i in range(cnt[b]):
            ki, si = int(k[b, i]), int(s[b, i])
            pos = (-ki - 2,) if ki < -1 else \
                tuple(sorted(int(fm.sa[r]) for r in range(ki, ki + si)))
            rows.append((int(m[b, i]), int(n[b, i]), si, pos))
        out.append(rows)
    return out


@pytest.mark.slow
def test_k1_sweep_matches_wave(world):
    rng, ref, fm, dfm, dref = world
    reads = make_reads(rng, ref)
    B, L = reads.shape
    codes = jnp.asarray(reads, jnp.int32)
    lens = jnp.full(B, L, jnp.int32)
    mi = jnp.ones(B, jnp.int32)
    active = jnp.ones(B, bool)
    msl = 10
    want = smemops.smem_all_pos(dfm, dref.codes, dref.l_pac, codes, lens,
                                mi, active, msl, max_seeds=64,
                                prev_cap=L + 2, ref_codes16=dref.codes16)
    got = sweep.smem_all_pos_sweep(dfm, dref.codes16, codes, lens, mi,
                                   active, msl, max_seeds=64,
                                   prev_cap=L + 2)
    assert np.array_equal(np.asarray(got.count), np.asarray(want.count))
    assert not np.asarray(got.overflow).any()
    assert slots(got, fm, B) == slots(want, fm, B)


@pytest.mark.slow
def test_k1_sweep_varied_lengths_and_inactive(world):
    rng, ref, fm, dfm, dref = world
    reads = make_reads(rng, ref, n_reads=16)
    B, L = reads.shape
    codes = jnp.asarray(reads, jnp.int32)
    lens = jnp.asarray(rng.integers(L // 2, L + 1, B), jnp.int32)
    mi = jnp.ones(B, jnp.int32)
    active = jnp.asarray(rng.random(B) < 0.8)
    msl = 8
    want = smemops.smem_all_pos(dfm, dref.codes, dref.l_pac, codes, lens,
                                mi, active, msl, max_seeds=64,
                                prev_cap=L + 2, ref_codes16=dref.codes16)
    got = sweep.smem_all_pos_sweep(dfm, dref.codes16, codes, lens, mi,
                                   active, msl, max_seeds=64,
                                   prev_cap=L + 2)
    assert np.array_equal(np.asarray(got.count), np.asarray(want.count))
    assert slots(got, fm, B) == slots(want, fm, B)


@pytest.mark.slow
def test_k2_lanes_sweep_matches_wave(world):
    """K2 shape: one anchor per job lane, min_intv > 1, merged into an
    existing SeedBatch."""
    rng, ref, fm, dfm, dref = world
    reads = make_reads(rng, ref, n_reads=16)
    B, L = reads.shape
    codes = jnp.asarray(reads, jnp.int32)
    lens = jnp.full(B, L, jnp.int32)
    NJ = 2 * B
    ridx = jnp.asarray(np.repeat(np.arange(B), 2), jnp.int32)
    x = jnp.asarray(rng.integers(0, L, NJ), jnp.int32)
    mi = jnp.asarray(rng.integers(1, 6, NJ), jnp.int32)
    on = jnp.asarray(rng.random(NJ) < 0.85)
    msl = 8

    lanes, _ = smemops.smem_one_pos_lanes(
        dfm, dref.codes, dref.l_pac, codes, lens, ridx, x, mi, on,
        msl, prev_cap=L + 2, max_out=32, ref_codes16=dref.codes16)
    want = smemops.merge_lane_seeds(
        lanes, ridx, jnp.zeros(NJ, jnp.int32), on, B, 64)
    got = sweep.smem_lanes_sweep(dfm, dref.codes16, codes, lens, ridx, x,
                                 mi, on, msl, prev_cap=L + 2, B=B,
                                 max_seeds=64)
    assert np.array_equal(np.asarray(got.count), np.asarray(want.count))
    assert slots(got, fm, B) == slots(want, fm, B)


def test_pack_reads_roundtrip(world):
    rng, ref, fm, dfm, dref = world
    codes = rng.integers(0, 5, size=(4, 53)).astype(np.int32)
    cj = jnp.asarray(codes)
    packed = sweep.pack_reads(cj)
    rid = jnp.arange(4, dtype=jnp.int32)
    lens = jnp.asarray([53, 53, 20, 1], jnp.int32)
    got = np.asarray(sweep.read_window(
        packed, rid, jnp.asarray([0, 5, -3, 40], jnp.int32),
        lens, 32))
    for i, st in enumerate([0, 5, -3, 40]):
        for t in range(32):
            p = st + t
            wantv = codes[i, p] if 0 <= p < int(lens[i]) else 4
            wantv = 4 if wantv >= 4 else wantv
            assert got[i, t] == wantv, (i, t)
