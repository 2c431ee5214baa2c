"""FM-index build + host-side bi-directional extension vs brute force."""

import numpy as np
import pytest

from fgdp_tpu.index.fmindex import FMIndex
from fgdp_tpu.index.suffix_array import suffix_array
from fgdp_tpu.testing import oracles
from fgdp_tpu.utils import dna


def random_ref(rng, n):
    return rng.integers(0, 4, size=n, dtype=np.uint8)


def test_suffix_array_matches_sorted_suffixes(rng):
    codes = random_ref(rng, 300)
    sa = suffix_array(codes)
    suffixes = sorted(range(len(codes)), key=lambda i: codes[i:].tobytes())
    assert list(sa) == suffixes


def test_suffix_array_repetitive():
    codes = np.array([0, 1, 0, 1, 0, 1, 0], dtype=np.uint8)  # ACACACA
    sa = suffix_array(codes)
    suffixes = sorted(range(len(codes)), key=lambda i: codes[i:].tobytes())
    assert list(sa) == suffixes


@pytest.mark.parametrize("n", [64, 257, 1000])
def test_interval_sizes_match_occurrence_counts(rng, n):
    ref = random_ref(rng, n)
    fm = FMIndex.build(ref)
    text = oracles.text_with_rc(ref)
    for _ in range(40):
        plen = int(rng.integers(1, 12))
        start = int(rng.integers(0, 2 * n - plen))
        pat = np.frombuffer(text[start:start + plen], dtype=np.uint8)
        # backward search
        k, l, s = fm.init_interval(int(pat[-1]))
        for c in pat[-2::-1]:
            k, l, s = fm.backward_extend(k, l, s, int(c))
            if s == 0:
                break
        assert s == oracles.count_occ(text, pat.tobytes())
        if s > 0:
            hits = sorted(int(fm.sa[k + i]) for i in range(s))
            assert hits == oracles.find_all(text, pat.tobytes())


def test_forward_extension_matches_backward(rng):
    ref = random_ref(rng, 400)
    fm = FMIndex.build(ref)
    text = oracles.text_with_rc(ref)
    for _ in range(25):
        plen = int(rng.integers(2, 10))
        start = int(rng.integers(0, 2 * 400 - plen))
        pat = np.frombuffer(text[start:start + plen], dtype=np.uint8)
        # forward search (left to right)
        k, l, s = fm.init_interval(int(pat[0]))
        for c in pat[1:]:
            k, l, s = fm.forward_extend(k, l, s, int(c))
            if s == 0:
                break
        assert s == oracles.count_occ(text, pat.tobytes())
        # the l-interval must locate the reverse complement
        rc = dna.revcomp(pat)
        if s > 0:
            hits = sorted(int(fm.sa[l + i]) for i in range(s))
            assert hits == oracles.find_all(text, rc.tobytes())


def test_occ_sentinel_correction(rng):
    ref = random_ref(rng, 50)
    fm = FMIndex.build(ref)
    # total occ at end of BWT must equal symbol counts of X
    x = np.concatenate([ref, dna.revcomp(ref)])
    for c in range(4):
        assert fm.occ_at(c, fm.text_len) == int((x == c).sum())


def test_save_load_roundtrip(tmp_path, rng):
    ref = random_ref(rng, 128)
    fm = FMIndex.build(ref)
    fm.save(tmp_path / "idx")
    fm2 = FMIndex.load(tmp_path / "idx.npz")
    assert fm2.n_ref == fm.n_ref
    np.testing.assert_array_equal(fm2.sa, fm.sa)
    np.testing.assert_array_equal(fm2.occ, fm.occ)
    np.testing.assert_array_equal(fm2.bwt_words, fm.bwt_words)
