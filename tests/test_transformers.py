"""PalindromeArtifactClipReadTransformer on read dicts."""

import numpy as np

from fgdp_tpu.call.transformers import (adaptor_boundary,
                                        palindrome_artifact_clip)


def _revcomp(c):
    return (3 - np.asarray(c, np.int64))[::-1]


def _mk(ref, pos, cigar, seq, frag_len, is_reverse, mate_start,
        mate_rev=None):
    flag = 0x1 | 0x2
    if is_reverse:
        flag |= 0x10
    if mate_rev if mate_rev is not None else not is_reverse:
        flag |= 0x20
    return dict(pos=pos, cigar=cigar,
                seq_codes=np.asarray(seq, np.int64),
                quals=np.full(len(seq), 30, np.int64),
                mate_start=mate_start, properly_paired=True, flag=flag,
                is_reverse=is_reverse, frag_len=frag_len)


def test_adaptor_boundary():
    # forward read, isize 40: boundary = pos + |isize|
    rd = _mk(None, 100, [(0, 30)], np.zeros(30), 40, False, 110)
    assert adaptor_boundary(rd) == 140
    # reverse read: boundary = mate_start - 1 (end must pass mate start)
    rd = _mk(None, 100, [(0, 30)], np.zeros(30), -40, True, 90)
    assert adaptor_boundary(rd) == 89
    rd = _mk(None, 100, [(0, 30)], np.zeros(30), 0, False, 110)
    assert adaptor_boundary(rd) is None


def test_palindrome_clip_fires_on_hairpin():
    rng = np.random.default_rng(5)
    ref = rng.integers(0, 4, 300).astype(np.uint8)
    # fragment [100, 140); forward read at 100, 30M + 10S overhang whose
    # soft clip reverse-complements ref[140-? ...]: artifact overhang
    # read = ref[100:130] + RC(ref beyond the boundary)
    frag_len = 40
    pos = 100
    ab = pos + frag_len               # 140
    n_cmp = 10 + 5
    hair = _revcomp(ref[ab - n_cmp:ab])      # 15 bases, RC
    body = ref[pos:pos + 30]
    seq = np.concatenate([body, hair[:10]])
    # the LAST 15 read bases must complement ref[ab-15..ab-1] reversed:
    # read[39-i] == 3 - ref[ab-15+i]; construct exactly
    seq[-15:] = 3 - ref[ab - 15:ab][::-1]
    rd = _mk(ref, pos, [(0, 30), (4, 10)], seq, frag_len, False, 130)
    # upstream read must have the clip at the START per the reference
    # (readIsUpstreamOfMate checks the FIRST cigar element) — so flip:
    # use a downstream (negative isize) read with trailing S instead
    rd = _mk(ref, pos, [(0, 30), (4, 10)], seq, frag_len, False, 130)
    out = palindrome_artifact_clip(rd, ref)
    # forward + positive isize = upstream; first element is M -> no clip
    assert len(out["seq_codes"]) == 40

    # downstream mate: reverse read, negative isize, trailing soft clip
    # boundary = mate_start - 1; compare read tail vs ref beyond it
    mate_start = 100
    ab2 = mate_start - 1
    pos2 = ab2 + 1 - 0               # read starts right at boundary+...
    rd2 = _mk(ref, 99, [(0, 30), (4, 10)], seq, -frag_len, True, mate_start)
    # make the trailing 15 bases complement ref[ab2+1 .. ab2+15] reversed
    s2 = np.asarray(rd2["seq_codes"])
    s2[-15:] = 3 - ref[ab2 + 1:ab2 + 16][::-1]
    rd2["seq_codes"] = s2
    out2 = palindrome_artifact_clip(rd2, ref)
    assert len(out2["seq_codes"]) == 30
    assert out2["cigar"] == [(0, 30)]
    assert len(out2["quals"]) == 30


def test_palindrome_clip_no_fire_on_random():
    rng = np.random.default_rng(6)
    ref = rng.integers(0, 4, 300).astype(np.uint8)
    seq = rng.integers(0, 4, 40)
    rd = _mk(ref, 99, [(0, 30), (4, 10)], seq, -40, True, 100)
    out = palindrome_artifact_clip(rd, ref)
    assert len(out["seq_codes"]) == 40
    assert out["cigar"] == [(0, 30), (4, 10)]
