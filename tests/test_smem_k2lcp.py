"""LCP-engine K2 re-seeding (ops/smem_k2lcp) vs the sweep machines.

The K2-LCP kernel locates each job's q[x..n] interval by ISA jump +
tree ascent (the fmi_shrink analogue, reference LISA_search.h:1345)
and enumerates the job's SMEMs with the single-pass threshold walk.
Its output must equal the sweep K2 path (smem_lanes_sweep, itself
parity-tested against the scalar FMI_search transcription) on REAL
jobs — qualifying K1 SMEMs re-seeded at their midpoint — so the test
compares full collect_seeds output between the two drivers.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fgdp_tpu.config import AlignConfig
from fgdp_tpu.align.seeding import collect_seeds
from fgdp_tpu.index.fmindex import FMIndex
from fgdp_tpu.index.lcptree import LcpTree
from fgdp_tpu.index.reference import DeviceReference, PackedReference
from fgdp_tpu.ops.fm import DeviceFMIndex
from fgdp_tpu.utils import dna

from test_smem import make_reads
from test_smem_sweep import slots


def build_world(ref):
    pref = PackedReference.from_contigs(["chr1"], [ref])
    fm = FMIndex.build(pref.codes)
    dfm = DeviceFMIndex.from_host(fm)
    dref = DeviceReference(pref)
    x = np.concatenate([pref.codes, dna.revcomp(pref.codes)]).astype(
        np.uint8)
    lt = LcpTree.build(x, fm.sa)
    return pref, fm, dfm, dref, lt


def run_both(rng, ref, reads, opt, max_seeds=96):
    pref, fm, dfm, dref, lt = build_world(ref)
    B, L = reads.shape
    codes = jnp.asarray(reads, jnp.int32)
    lens = jnp.full(B, L, jnp.int32)
    active = jnp.ones(B, bool)
    want = collect_seeds(dfm, dref, codes, lens, active, opt,
                         max_seeds=max_seeds, use_sweep=True)
    got = collect_seeds(dfm, dref, codes, lens, active, opt,
                        max_seeds=max_seeds,
                        lcp_tree=jnp.asarray(lt.tree),
                        lcp_isa=jnp.asarray(lt.isa))
    return fm, B, want, got


@pytest.mark.slow
def test_k2lcp_random_ref():
    """Unique-ish genome: most K1 SMEMs qualify for K2 (s=1 <= split
    width), min_intv=2 walks ascend past the parent interval."""
    rng = np.random.default_rng(11)
    ref = rng.integers(0, 4, size=2000, dtype=np.uint8)
    reads = make_reads(rng, ref, n_reads=24)
    opt = AlignConfig(min_seed_len=10, split_factor=1.5, split_width=10,
                      max_mem_intv=0)
    fm, B, want, got = run_both(rng, ref, reads, opt)
    assert not np.asarray(want.overflow).any()
    assert not np.asarray(got.overflow).any()
    assert np.array_equal(np.asarray(got.count), np.asarray(want.count))
    assert slots(got, fm, B) == slots(want, fm, B)


@pytest.mark.slow
def test_k2lcp_repeat_rich():
    """Tandem/dispersed repeats: intervals with s in [2, split_width]
    exercise the forward-extension branch (q[x..n] interval meeting
    min_intv extends right of the parent SMEM) and the shrink
    ping-pong (extendable-by-mask but under-threshold)."""
    rng = np.random.default_rng(12)
    unit = rng.integers(0, 4, size=137, dtype=np.uint8)
    parts = []
    for _ in range(6):
        parts.append(unit.copy())
        parts.append(rng.integers(0, 4, size=211, dtype=np.uint8))
    alu = rng.integers(0, 4, size=97, dtype=np.uint8)
    for _ in range(4):
        a = alu.copy()
        mpos = rng.integers(0, 97, 3)
        a[mpos] = rng.integers(0, 4, 3)
        parts.append(a)
        parts.append(rng.integers(0, 4, size=83, dtype=np.uint8))
    ref = np.concatenate(parts)
    reads = make_reads(rng, ref, n_reads=32)
    opt = AlignConfig(min_seed_len=10, split_factor=1.2, split_width=10,
                      max_mem_intv=0)
    fm, B, want, got = run_both(rng, ref, reads, opt, max_seeds=128)
    w_ok = ~np.asarray(want.overflow)
    g_ok = ~np.asarray(got.overflow)
    # overflow policy may differ between designs (different internal
    # caps); compare reads clean in both, and require most to be clean
    ok = w_ok & g_ok
    assert ok.sum() >= B - 2, (w_ok.sum(), g_ok.sum())
    ws, gs = slots(want, fm, B), slots(got, fm, B)
    for b in np.flatnonzero(ok):
        assert gs[b] == ws[b], f"read {b}"


@pytest.mark.slow
def test_k2lcp_with_k3_and_errors():
    """Full driver config (K3 on, 2% errors, varied read lengths)."""
    rng = np.random.default_rng(13)
    ref = rng.integers(0, 4, size=3000, dtype=np.uint8)
    reads = make_reads(rng, ref, n_reads=24, L=64)
    opt = AlignConfig(min_seed_len=10, split_factor=1.5, split_width=10,
                      max_mem_intv=20)
    fm, B, want, got = run_both(rng, ref, reads, opt)
    assert np.array_equal(np.asarray(got.overflow),
                          np.asarray(want.overflow))
    assert np.array_equal(np.asarray(got.count), np.asarray(want.count))
    assert slots(got, fm, B) == slots(want, fm, B)
