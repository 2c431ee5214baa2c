"""Contig-sharded index vs joint index: SAM parity.

Two repeat-free contigs, one index over both vs a 2-shard
ShardedAligner (one index per contig, merged candidates, global-
coordinate finalize). With no cross-shard seeds the merged candidate
set equals the joint set, so SAM output must match line-for-line
(parallel/sharded_index.py docstring).
"""

import numpy as np
import pytest

from fgdp_tpu.config import AlignConfig, BatchShapes
from fgdp_tpu.index.fmindex import FMIndex
from fgdp_tpu.index.reference import PackedReference
from fgdp_tpu.parallel.sharded_index import (ShardedAligner,
                                             partition_contigs,
                                             slice_reference)
from fgdp_tpu.pipeline import Aligner


def test_partition_contigs_balanced():
    lens = [100, 100, 300, 100, 400]
    gs = partition_contigs(lens, 2)
    assert gs == [(0, 3), (3, 5)]
    assert partition_contigs(lens, 1) == [(0, 5)]
    assert len(partition_contigs(lens, 10)) == 5


def test_slice_reference_roundtrip():
    rng = np.random.default_rng(0)
    seqs = [rng.integers(0, 5, n).astype(np.uint8) for n in (500, 700)]
    pref = PackedReference.from_contigs(["a", "b"], seqs)
    sub = slice_reference(pref, 1, 2)
    assert sub.names == ["b"]
    assert sub.l_pac == 700
    # codes must be the SAME post-randomization bytes as the joint slice
    np.testing.assert_array_equal(sub.codes, pref.codes[500:])


@pytest.mark.slow
def test_sharded_vs_joint_sam_parity():
    rng = np.random.default_rng(7)
    L = 101
    n1, n2 = 120_000, 150_000
    c1 = rng.integers(0, 4, n1).astype(np.uint8)
    c2 = rng.integers(0, 4, n2).astype(np.uint8)
    pref = PackedReference.from_contigs(["chrA", "chrB"], [c1, c2])
    opt = AlignConfig()
    shapes = BatchShapes(read_len=L, batch_reads=64)

    B = 64
    names, seqs = [], []
    for i in range(B):
        src, n = (c1, n1) if i % 2 == 0 else (c2, n2)
        p = int(rng.integers(0, n - L))
        c = src[p:p + L].astype(np.int64)
        m = rng.random(L) < 0.01
        c = np.where(m, rng.integers(0, 4, L), c)
        if rng.random() < 0.5:
            c = 3 - c[::-1]
        names.append(f"r{i}")
        seqs.append(c)

    joint = Aligner(pref, FMIndex.build(pref.codes), opt=opt,
                    shapes=shapes)
    sam_joint = joint.align_batch(names, seqs)

    sharded = ShardedAligner(pref, n_shards=2, opt=opt, shapes=shapes)
    assert len(sharded.shards) == 2
    sam_sharded = sharded.align_batch(names, seqs)

    assert sam_sharded == sam_joint
