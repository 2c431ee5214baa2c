"""CNN gate feature builder (model.cpp generateData transcription):
insertion padding, gap rows, window re-cut, and the modelRefer
padded-window skip."""

import os
import pathlib

import numpy as np
import pytest

from fgdp_tpu.call import cnn_filter as cf

TRANS_PT = "/root/reference/deepmutect/Mutect2Cpp-master/trans.pt"


def mk_read(pos, cigar, seq):
    return dict(pos=pos, cigar=cigar, seq_codes=np.asarray(seq, np.int64))


def simple_counts(reads, vc_start, vc_end):
    """No-insertion expectation: plain per-column counting with the
    reference's vcEnd-EXCLUSIVE M/D loops (model.cpp:194,168)."""
    out = np.zeros((6, 31), np.int64)
    for rd in reads:
        rs = rd["pos"]
        re = rs + cf._cigar_ref_len(rd["cigar"]) - 1
        bp = cf._lead_soft(rd["cigar"])
        for op, ln in rd["cigar"]:
            if rs > min(re, vc_end):
                break
            if op in (2, 3):
                for p in range(max(vc_start, rs), min(rs + ln, vc_end)):
                    out[5, p - vc_start] += 1
                rs += ln
            elif op in (0, 7, 8):
                # reference quirk: in the window-overlapping branch the
                # base pointer advances only by written bases
                # (model.cpp:190-224)
                if rs + ln > vc_start:
                    if vc_start > rs:
                        bp += vc_start - rs
                    for p in range(max(vc_start, rs),
                                   min(rs + ln, vc_end)):
                        out[min(int(rd["seq_codes"][bp]), 4),
                            p - vc_start] += 1
                        bp += 1
                    rs += ln
                else:
                    rs += ln
                    bp += ln
            elif op == 1:
                bp += ln
            # S: pre-accounted by the soft-start offset (no advance)
    return out


def test_no_insertion_matches_simple():
    rng = np.random.default_rng(5)
    ref = rng.integers(0, 4, 200)
    reads = []
    for _ in range(40):
        p = int(rng.integers(40, 120))
        ln = int(rng.integers(20, 60))
        cigar = [(0, ln)]
        if rng.random() < 0.3:               # deletion mid-read
            d = int(rng.integers(1, 5))
            cigar = [(0, ln // 2), (2, d), (0, ln - ln // 2)]
        if rng.random() < 0.3:               # leading soft clip
            s = int(rng.integers(1, 8))
            cigar = [(4, s)] + cigar
        qlen = sum(l for op, l in cigar if op in (0, 4, 7, 8))
        reads.append(mk_read(p, cigar, rng.integers(0, 4, qlen)))
    vc_start, vc_end = 80, 110
    res, ins = cf.generate_data(ref, reads, [], reads, vc_start, vc_end)
    assert ins.sum() == 0
    want = simple_counts(reads, vc_start, vc_end)
    np.testing.assert_array_equal(res[1], want)
    # ref row: one-hot of ref bases over the window
    for k in range(31):
        assert res[0][int(ref[vc_start + k]), k] == 1
        assert res[0].sum(axis=0)[k] == 1


def test_insertion_padding_shifts_and_gap_rows():
    # one read with a 2 bp insertion after ref pos 100 (anchored at 100)
    ref = np.zeros(200, np.int64)            # all A
    seq = [1] * 10 + [2, 2] + [3] * 10       # C x10, G G inserted, T x10
    rd = mk_read(90, [(0, 10), (1, 2), (0, 10)], seq)
    vc_start, vc_end = 85, 115
    res, ins = cf.generate_data(ref, [rd], [], [rd], vc_start, vc_end)
    # insertion profile: anchored at ref pos 100 -> column 15, len 2
    assert ins[15] == 2 and ins.sum() == 2
    # matricStart = sum(ins[:16]) = 2: the ref row window shifts right
    # by 2 padded slots, so the variant column still shows the ref base
    assert res[0][0, 15] == 1                # ref A at centre
    # the inserted G bases land in the pad slots just left of column 15
    assert res[1][2, 13] == 1 and res[1][2, 14] == 1
    # read bases: C runs before, T after
    assert res[1][1, 12] == 1 and res[1][3, 15] == 1


def test_gate_region_padded_window_skip():
    calls = []

    class Fake(cf.CnnFilter):
        def __init__(self):
            pass

        def features(self, ref, t, n, pos):
            calls.append(pos)
            return np.zeros((5, 6, 31), np.float32), \
                np.zeros(31, np.int64), pos - 15

        def classify(self, inputs):
            return False

    f = Fake()
    # variants 3 apart: after pos=100, position = (100-15) + 30 = 115,
    # so 103..114 are skipped, 116 is evaluated
    assert f.gate_region(None, [], [], [100, 103, 110, 116]) is False
    assert calls == [100, 116]


@pytest.mark.skipif(not os.path.exists(TRANS_PT),
                    reason="reference trans.pt unavailable")
def test_model_classify_runs():
    rng = np.random.default_rng(0)
    f = cf.CnnFilter(TRANS_PT)
    ref = rng.integers(0, 4, 400)
    reads = [mk_read(int(rng.integers(150, 190)), [(0, 60)],
                     rng.integers(0, 4, 60)) for _ in range(120)]
    out = f.gate_region(ref, reads, reads[:40], [200])
    assert out in (True, False)


GOLD_CNN = pathlib.Path(__file__).parent / "golden" / "mutect_cnn"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(TRANS_PT),
                    reason="reference trans.pt unavailable")
def test_gate_ab_vs_binary(tmp_path):
    """Decision-level A/B vs the compiled binary (model.cpp:516-527
    classify + Mutect2Engine.cpp:213-221 gate): on the 120x fixture the
    binary's gated run (golden_gate.vcf, produced with -M trans.pt)
    kept exactly the sites of its ungated run; OUR caller with
    --deep-model must reproduce the same gated site set, i.e. the same
    keep/drop decision for every >100-read region. (Round 4 found and
    fixed an inverted gate polarity through this fixture: the engine
    used to DROP every region the model called somatic.)"""
    import subprocess
    import sys as _sys

    def sites(path):
        return {tuple(l.split("\t")[:2] + l.split("\t")[3:5])
                for l in pathlib.Path(path).read_text().splitlines()
                if l and not l.startswith("#")}

    gold_no = sites(GOLD_CNN / "golden_nogate.vcf")
    gold_gate = sites(GOLD_CNN / "golden_gate.vcf")

    def run(deep):
        out = tmp_path / ("m.vcf" if deep else "nom.vcf")
        cmd = [_sys.executable, "-m", "fgdp_tpu", "mutect",
               "-R", str(GOLD_CNN / "ref.fa"),
               "-I", str(GOLD_CNN / "tumor.bam"),
               "-N", str(GOLD_CNN / "normal.bam"), "-O", str(out)]
        if deep:
            cmd += ["--deep-model", TRANS_PT]
        subprocess.run(cmd, check=True, timeout=2400,
                       cwd=str(pathlib.Path(__file__).parents[1]))
        return sites(out)

    mine_no = run(False)
    mine_gate = run(True)
    assert mine_no == gold_no
    assert mine_gate == gold_gate
    # the gate's keep/drop delta matches the binary's exactly
    assert (gold_no - gold_gate) == (mine_no - mine_gate)
