"""AssemblyRegionTrimmer: span math + hard-clip-to-window parity."""

import numpy as np
import pytest

from fgdp_tpu.call import trimming


def test_trimmed_span_snp_only():
    # one SNP at 1000 inside region [950, 1250): ideal = +-20,
    # maximum = region +-25 -> final = [980, 1020]
    w = trimming.trimmed_span(950, 1250, [(1000, "A", "T")], 10_000)
    assert w == (980, 1021)


def test_trimmed_span_indel_padding():
    # a deletion widens padding to 150 and events span to its end
    w = trimming.trimmed_span(950, 1250, [(1000, "ACGT", "A")], 10_000)
    # ideal = [850, 1153], maximum = [925, 1274] -> [925, 1153]
    assert w == (925, 1154)


def test_trimmed_span_merge_with_variant():
    # event pokes beyond maximum span: variant span always kept
    w = trimming.trimmed_span(950, 1000, [(940, "A" * 100, "A")], 10_000)
    assert w[0] <= 940 and w[1] >= 940 + 100


def test_trimmed_span_no_overlap():
    assert trimming.trimmed_span(950, 1250, [(10, "A", "T")],
                                 10_000) is None
    assert trimming.trimmed_span(950, 1250, [], 10_000) is None


def _aligned_pairs(seq, cigar, pos):
    """(read_idx, ref_pos) pairs of all M bases."""
    out = []
    x, y = 0, pos
    for op, ln in cigar:
        if op in (0, 7, 8):
            out.extend((x + i, y + i) for i in range(ln))
            x += ln
            y += ln
        elif op in (1, 4):
            x += ln
        elif op in (2, 3):
            y += ln
    return out


@pytest.mark.parametrize("seed", range(4))
def test_clip_preserves_aligned_pairs(seed):
    """Clipping == restricting the aligned-pair set to the window."""
    rng = np.random.default_rng(seed)
    for _ in range(40):
        # random SAM-valid cigar over a ~60bp read: interior M/I with
        # sprinkled D, soft clips only at the ends
        ops = []
        left = 60
        while left > 0:
            ln = int(rng.integers(1, min(left, 15) + 1))
            op = int(rng.choice([0, 0, 0, 1]))
            ops.append([op, ln])
            left -= ln
        cigar = []
        if rng.random() < 0.4:
            cigar.append((4, int(rng.integers(1, 8))))
        for op, ln in ops:
            cigar.append((op, ln))
            if rng.random() < 0.3:
                cigar.append((2, int(rng.integers(1, 6))))
        if rng.random() < 0.4:
            cigar.append((4, int(rng.integers(1, 8))))
        if not any(op in (0, 7, 8) for op, _ in cigar):
            cigar.append((0, 5))
        seq = rng.integers(0, 4, sum(l for op, l in cigar
                                     if op in (0, 1, 4, 7, 8)))
        quals = rng.integers(10, 40, len(seq))
        pos = int(rng.integers(100, 200))
        ref_len = sum(l for op, l in cigar if op in (0, 2, 3, 7, 8))
        w0 = int(rng.integers(pos - 10, pos + ref_len))
        w1 = int(rng.integers(w0 + 1, pos + ref_len + 10))
        out = trimming.clip_to_window(seq, quals, cigar, pos, w0, w1)
        orig = _aligned_pairs(seq, cigar, pos)
        want = [(x, y) for x, y in orig if w0 <= y < w1]
        if out is None:
            assert not want
            continue
        seq2, quals2, pos2, cigar2 = out
        got = _aligned_pairs(seq2, cigar2, pos2)
        # same ref positions; seq2 indices are shifted by the clip
        assert [y for _, y in got] == [y for _, y in want]
        x_shift = want[0][0]
        assert [x for x, _ in got] == [x - x_shift for x, _ in want]
        # clipped bases are the contiguous subsequence covering M+I
        lo = min(x for x, _ in want)
        hi = max(x for x, _ in want) + 1
        # M bases of the clip match the original bases
        for (x2, _), (x1, _) in zip(got, want):
            assert seq2[x2] == seq[x1]
        assert quals2 is not None and len(quals2) == len(seq2)
        # cigar starts/ends with M
        assert cigar2[0][0] == 0 and cigar2[-1][0] == 0


def test_clip_read_dict():
    rd = dict(seq_codes=np.arange(10) % 4, quals=np.full(10, 30),
              cigar=[(0, 4), (2, 3), (0, 6)], pos=100, mapq=60,
              _hmm_quals=("x",))
    out = trimming.clip_read_to_window(rd, 105, 110)
    assert out is not None
    assert out["pos"] == 107
    assert out["cigar"] == [(0, 3)]
    assert list(out["seq_codes"]) == [0, 1, 2]   # read idx 4,5,6
    assert "_hmm_quals" not in out
    assert trimming.clip_read_to_window(rd, 0, 50) is None
