"""Read-to-best-haplotype realignment: fitting alignment + cigar
composition (AssemblyBasedCallerUtils::realignReadsToTheirBestHaplotype
semantics)."""

import numpy as np

from fgdp_tpu.call.realign import (compose_cigars, fitting_alignment,
                                   realign_read)

M, I, D, S = 0, 1, 2, 4


def _rng(seed=3):
    return np.random.default_rng(seed)


def test_exact_substring():
    rng = _rng()
    hap = rng.integers(0, 4, 120)
    read = hap[30:80]
    hs, cig = fitting_alignment(read, hap)
    assert hs == 30 and cig == [(M, 50)]
    pos, cig2 = realign_read(read, hap, [(M, len(hap))], 1000)
    assert pos == 1030 and cig2 == [(M, 50)]


def test_insertion_haplotype():
    rng = _rng(4)
    ref = rng.integers(0, 4, 100)
    ins = np.array([2, 3, 1])
    hap = np.concatenate([ref[:50], ins, ref[50:]])
    hap2ref = [(M, 50), (I, 3), (M, 50)]
    read = hap[40:70]                  # spans the insertion
    pos, cig = realign_read(read, hap, hap2ref, 2000)
    assert pos == 2040
    assert cig == [(M, 10), (I, 3), (M, 17)]


def test_deletion_haplotype():
    rng = _rng(5)
    ref = rng.integers(0, 4, 100)
    hap = np.concatenate([ref[:50], ref[56:]])     # 6bp deletion
    hap2ref = [(M, 50), (D, 6), (M, 44)]
    read = hap[40:70]
    pos, cig = realign_read(read, hap, hap2ref, 0)
    assert pos == 40
    assert cig == [(M, 10), (D, 6), (M, 20)]


def test_soft_clip_overhang():
    rng = _rng(6)
    hap = rng.integers(0, 4, 80)
    junk = (hap[:8] + 1) % 4           # mismatching prefix
    read = np.concatenate([junk, hap[10:40]])
    hs, cig = fitting_alignment(read, hap)
    # the fit may absorb a couple of junk bases as mismatch Ms; the
    # aligned block must cover the true match and start near 10
    assert cig[-1][0] == M and cig[-1][1] >= 30
    pos, cig2 = realign_read(read, hap, [(M, len(hap))], 500)
    assert 500 <= pos <= 512


def test_read_with_gaps_vs_haplotype():
    """Reads that themselves differ from the best hap by an indel
    (exercises the stateful gap-run traceback)."""
    rng = _rng(7)
    hap = rng.integers(0, 4, 100)
    # read with a 4bp deletion relative to the hap
    read = np.concatenate([hap[20:50], hap[54:80]])
    hs, cig = fitting_alignment(read, hap)
    assert hs == 20
    assert cig == [(M, 30), (D, 4), (M, 26)]
    # read with a 3bp insertion relative to the hap
    ins = (hap[40:43] + 2) % 4
    read2 = np.concatenate([hap[20:50], ins, hap[50:80]])
    hs2, cig2 = fitting_alignment(read2, hap)
    assert hs2 == 20
    assert cig2 == [(M, 30), (I, 3), (M, 30)]


def test_dp_matrix_matches_brute_force():
    """H matrix (and hence scores) equals a scalar affine-gap DP."""
    from fgdp_tpu.call.realign import (GAP_EXTEND, GAP_OPEN, MATCH,
                                       MISMATCH, fitting_alignment)

    def brute_best(read, hap):
        n, m = len(read), len(hap)
        NEG = -(1 << 30)
        H = [[0] * (m + 1) for _ in range(n + 1)]
        E = [[NEG] * (m + 1) for _ in range(n + 1)]
        F = [[NEG] * (m + 1) for _ in range(n + 1)]
        for i in range(1, n + 1):
            H[i][0] = NEG // 2
        for i in range(1, n + 1):
            for j in range(m + 1):
                E[i][j] = max(H[i - 1][j] + GAP_OPEN,
                              E[i - 1][j] + GAP_EXTEND)
                if j > 0:
                    F[i][j] = max(H[i][j - 1] + GAP_OPEN,
                                  F[i][j - 1] + GAP_EXTEND)
                    sub = MATCH if hap[j - 1] == read[i - 1] else MISMATCH
                    H[i][j] = max(H[i - 1][j - 1] + sub, E[i][j], F[i][j])
        # free end anywhere (SOFTCLIP trailing semantics)
        return max(max(row) for row in H[1:])

    def cigar_score(read, hap, hs, cig):
        sc, i, j = 0, 0, hs
        for op, ln in cig:
            if op == M:
                for _ in range(ln):
                    sc += MATCH if hap[j] == read[i] else MISMATCH
                    i += 1
                    j += 1
            elif op == I:
                sc += GAP_OPEN + (ln - 1) * GAP_EXTEND
                i += ln
            elif op == D:
                sc += GAP_OPEN + (ln - 1) * GAP_EXTEND
                j += ln
            else:
                i += ln
        return sc

    rng = _rng(11)
    for t in range(30):
        hap = rng.integers(0, 4, int(rng.integers(20, 80)))
        kind = t % 3
        if kind == 0:
            a, b = sorted(rng.integers(0, len(hap), 2))
            read = hap[a:b + 1].copy()
        else:
            read = rng.integers(0, 4, int(rng.integers(5, 40)))
        if len(read) == 0:
            continue
        hs, cig = fitting_alignment(read, hap)
        got = cigar_score(read, hap, hs, cig)
        want = brute_best(read, hap)
        assert got == want, (t, got, want, cig)


def test_trailing_softclip():
    """Read extending past the haplotype end ends in S, not I."""
    rng = _rng(9)
    hap = rng.integers(0, 4, 60)
    tail = (hap[:5] + 1) % 4
    read = np.concatenate([hap[30:60], tail])
    hs, cig = fitting_alignment(read, hap)
    assert hs == 30
    assert cig[0] == (M, 30) and cig[-1][0] == S and cig[-1][1] >= 3
    pos, cig2 = realign_read(read, hap, [(M, len(hap))], 700)
    assert pos == 730 and cig2[-1][0] == S
