"""Single-pass LCP-tree SMEM engine vs the pivot machine and the scalar
oracle: both must enumerate the identical SMEM set (bwa-mem K1,
min_intv=1) for every read."""

import numpy as np
import pytest

import jax.numpy as jnp

from fgdp_tpu.index.fmindex import FMIndex
from fgdp_tpu.index.lcptree import LcpTree, _lcp_arrays_py
from fgdp_tpu.io import native
from fgdp_tpu.ops import smem_lcp
from fgdp_tpu.ops.fm import DeviceFMIndex
from fgdp_tpu.testing import oracles
from fgdp_tpu.utils import dna

from test_smem import make_reads, oracle_to_sets, seeds_to_sets


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(13)
    ref = rng.integers(0, 4, size=600, dtype=np.uint8)
    fm = FMIndex.build(ref)
    dfm = DeviceFMIndex.from_host(fm)
    x = np.concatenate([ref, dna.revcomp(ref)]).astype(np.uint8)
    lt = LcpTree.build(x, fm.sa)
    from fgdp_tpu.index.reference import DeviceReference, PackedReference
    pref = PackedReference.from_contigs(["chr1"], [ref])
    dref = DeviceReference(pref)
    return rng, ref, fm, dfm, lt, dref


def test_native_lcp_matches_python(world):
    _, ref, fm, _, _, _ = world
    x = np.concatenate([ref, dna.revcomp(ref)]).astype(np.uint8)
    out = native.lcp_tree_arrays(x, fm.sa)
    if out is None:
        pytest.skip("no native toolchain")
    for got, want in zip(out, _lcp_arrays_py(x, fm.sa)):
        np.testing.assert_array_equal(got, want)


def test_lcp_interval_semantics(world):
    """Spot-check tree rows: [left, right) is the smallest lcp-interval
    strictly containing the boundary, depth = lcp, mask = extendability."""
    rng, ref, fm, _, lt, _ = world
    x = np.concatenate([ref, dna.revcomp(ref)]).astype(np.uint8)
    n = len(x)
    sa = fm.sa

    def suffix(r):
        p = int(sa[r])
        return bytes(x[p:].tobytes())

    t = lt.tree
    for b in rng.integers(1, lt.nrows, 40):
        b = int(b)
        lcp, left, right, mask = (int(v) for v in t[b])
        # depth check: common prefix of all suffixes in [left, right)
        s0 = suffix(left)
        s1 = suffix(right - 1)
        common = 0
        while (common < min(len(s0), len(s1))
               and s0[common] == s1[common]):
            common += 1
        assert common == lcp, (b, common, lcp)
        # strict containment of the boundary
        assert left < b < right
        # mask check against brute backward extension
        if lcp > 0:
            pat = x[int(sa[left]):int(sa[left]) + lcp]
            for c in range(4):
                cat = np.concatenate([[c], pat]).astype(np.uint8)
                occurs = any(
                    np.array_equal(x[p:p + len(cat)], cat)
                    for p in range(n - len(cat) + 1))
                assert bool((mask >> c) & 1) == occurs, (b, c)


@pytest.mark.parametrize("min_seed_len", [1, 17])
def test_lcp_smem_matches_scalar_oracle(world, min_seed_len):
    rng, ref, fm, dfm, lt, dref = world
    reads = make_reads(rng, ref, n_reads=32, L=48)
    B, L = reads.shape
    seeds = smem_lcp.smem_all_lcp(
        dfm, jnp.asarray(lt.tree), jnp.asarray(lt.isa),
        jnp.asarray(reads, jnp.int32),
        jnp.full(B, L, jnp.int32), jnp.ones(B, bool),
        min_seed_len, max_seeds=96, ref_codes16=dref.codes16)
    got = seeds_to_sets(seeds, B, fm)
    assert not bool(np.asarray(seeds.overflow).any())
    for b in range(B):
        ref_out = oracles.smem_all_pos_ref(fm, reads[b], 1, min_seed_len)
        want = oracle_to_sets(ref_out, fm)
        assert got[b] == want, b


def test_lcp_smem_short_and_empty_reads(world):
    rng, ref, fm, dfm, lt, dref = world
    reads = np.full((4, 16), 4, np.uint8)
    reads[1, :3] = ref[10:13]
    reads[2] = np.concatenate([ref[100:108], [4], ref[200:207]])
    lens = np.array([0, 3, 16, 16], np.int32)
    reads[3, :16] = ref[50:66]
    seeds = smem_lcp.smem_all_lcp(
        dfm, jnp.asarray(lt.tree), jnp.asarray(lt.isa),
        jnp.asarray(reads, jnp.int32),
        jnp.asarray(lens), jnp.ones(4, bool), 1, max_seeds=64,
        ref_codes16=dref.codes16)
    got = seeds_to_sets(seeds, 4, fm)
    for b in range(4):
        ref_out = oracles.smem_all_pos_ref(fm, reads[b][:lens[b]], 1, 1)
        assert got[b] == oracle_to_sets(ref_out, fm), b
