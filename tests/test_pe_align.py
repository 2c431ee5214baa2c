"""Paired-end alignment end-to-end: proper pairs, flags, TLEN, rescue."""

import numpy as np
import pytest

from fgdp_tpu.config import BatchShapes
from fgdp_tpu.index.reference import PackedReference
from fgdp_tpu.pipeline import Aligner
from fgdp_tpu.utils import dna

SHAPES = BatchShapes(read_len=101, batch_reads=64, max_smems=96,
                     max_seeds=128, max_chains=16, max_regs=16,
                     max_ext_ref=304)


@pytest.fixture(scope="module")
def aligner():
    rng = np.random.default_rng(17)
    seqs = [rng.integers(0, 4, 6000).astype(np.uint8)]
    pref = PackedReference.from_contigs(["chr1"], seqs)
    return Aligner.build(pref, shapes=SHAPES)


def _simulate_pairs(rng, pref, n, L=101, isize_mean=300, isize_sd=20,
                    sub=0.01):
    names, reads, truth = [], [], []
    for i in range(n):
        isize = int(rng.normal(isize_mean, isize_sd))
        isize = max(isize, 2 * L + 10)
        pos = int(rng.integers(0, int(pref.lens[0]) - isize - 1))
        r1 = pref.codes[pos:pos + L].astype(np.int64).copy()
        r2 = pref.codes[pos + isize - L:pos + isize].astype(np.int64)
        r2 = dna.revcomp(r2.astype(np.uint8)).astype(np.int64)
        for r in (r1, r2):
            m = rng.random(L) < sub
            r[m] = (r[m] + 1) % 4
        names += [f"p{i}", f"p{i}"]
        reads += [r1, r2]
        truth.append((pos + 1, pos + isize - L + 1, isize))
    return names, reads, truth


@pytest.mark.slow
def test_pe_proper_pairs(aligner):
    rng = np.random.default_rng(5)
    n = 40
    names, reads, truth = _simulate_pairs(rng, aligner.pref, n)
    lines = aligner.align_pairs(names, reads)
    by_name = {}
    for ln in lines:
        f = ln.split("\t")
        flag = int(f[1])
        if not (flag & 0x900):
            by_name.setdefault(f[0], []).append(f)
    assert len(by_name) == n
    n_proper = 0
    n_pos_ok = 0
    for i, (p1, p2, isize) in enumerate(truth):
        recs = by_name[f"p{i}"]
        assert len(recs) == 2
        r1 = next(r for r in recs if int(r[1]) & 0x40)
        r2 = next(r for r in recs if int(r[1]) & 0x80)
        f1, f2 = int(r1[1]), int(r2[1])
        assert f1 & 0x1 and f2 & 0x1
        if f1 & 0x2:
            n_proper += 1
        if abs(int(r1[3]) - p1) <= 3 and abs(int(r2[3]) - p2) <= 3:
            n_pos_ok += 1
        # strands: r1 forward, r2 reverse (FR simulation)
        assert not (f1 & 0x10) and (f2 & 0x10), (f1, f2)
        assert (f1 & 0x20) and not (f2 & 0x20)
        # mate fields
        assert r1[6] == "=" and r2[6] == "="
        assert abs(abs(int(r1[8])) - isize) <= 6, (r1[8], isize)
        assert int(r1[8]) > 0 > int(r2[8])
    assert n_pos_ok >= n - 1
    assert n_proper >= n - 2


@pytest.mark.slow
def test_rescue_all_matches_sequential(aligner):
    """Batched rescue (rescue_all: enumerate -> one SW batch -> replay)
    must leave reg lists identical to the per-pair scalar matesw loop."""
    import copy

    from fgdp_tpu.align import pair as pairmod

    rng = np.random.default_rng(11)
    names, reads, truth = _simulate_pairs(rng, aligner.pref, 24)
    # mutate every 12th base of several ends: max exact run (11) is
    # below min_seed_len (19) so seeding finds nothing, but local SW
    # still aligns (score ~56 >> 19) -> rescue fires AND succeeds
    for k in (1, 4, 9):
        bad = reads[k].copy()
        bad[::12] = (bad[::12] + 1) % 4
        reads[k] = bad
    regs_np = aligner._device_regs(reads)
    reg_lists = aligner._reg_lists(reads, regs_np)
    reg_pairs_a = [(copy.deepcopy(reg_lists[2 * i]),
                    copy.deepcopy(reg_lists[2 * i + 1]))
                   for i in range(len(reads) // 2)]
    reg_pairs_b = copy.deepcopy(reg_pairs_a)
    codes_pairs = [(reads[2 * i], reads[2 * i + 1])
                   for i in range(len(reads) // 2)]
    opt, pref = aligner.opt, aligner.pref
    pes = pairmod.pestat(opt, pref.l_pac, reg_pairs_a)

    # (a) sequential scalar loop (the sam_pe-internal rescue)
    n_seq = 0
    for p, regs_pair in enumerate(reg_pairs_a):
        for i in (0, 1):
            if not regs_pair[i]:
                continue
            best = regs_pair[i][0]["score"]
            cand = [r for r in regs_pair[i]
                    if r["score"] >= best - opt.pen_unpaired]
            for j, anchor in enumerate(cand):
                if j >= opt.max_matesw:
                    break
                n_seq += pairmod.matesw(opt, pref, pes, anchor,
                                        codes_pairs[p][1 - i],
                                        regs_pair[1 - i])
    # (b) batched
    pairmod.rescue_all(opt, pref, pes, reg_pairs_b, codes_pairs)
    assert n_seq > 0          # the corruption must trigger rescues
    assert reg_pairs_a == reg_pairs_b


def test_pe_mate_rescue(aligner):
    """One end heavily corrupted: pairing still places it via rescue."""
    rng = np.random.default_rng(6)
    names, reads, truth = _simulate_pairs(rng, aligner.pref, 30)
    # corrupt the first pair's r2 start so its seeds mostly vanish
    bad = reads[1].copy()
    bad[:55] = rng.integers(0, 4, 55)
    reads[1] = bad
    lines = aligner.align_pairs(names, reads)
    recs = [ln.split("\t") for ln in lines
            if ln.split("\t")[0] == "p0" and not (int(ln.split("\t")[1]) &
                                                  0x900)]
    assert len(recs) == 2
    r2 = next(r for r in recs if int(r[1]) & 0x80)
    assert not (int(r2[1]) & 0x4)      # mapped (possibly via rescue)
    assert r2[2] == "chr1"
