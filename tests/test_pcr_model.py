"""PCR indel error model: vectorized tandem-repeat scan vs the scalar
reference transcription; cache formula; qual-modification chain."""

import numpy as np
import pytest

from fgdp_tpu.call import pcr_model
from fgdp_tpu.testing import oracles


def _random_read(rng, L, repeaty=True):
    b = rng.integers(0, 4, L).astype(np.int64)
    if repeaty:
        # plant homopolymers / STRs so the repeat logic is exercised
        for _ in range(3):
            u = int(rng.integers(1, 5))
            reps = int(rng.integers(2, 7))
            unit = rng.integers(0, 4, u)
            p = int(rng.integers(0, max(L - u * reps, 1)))
            b[p:p + u * reps] = np.tile(unit, reps)[:max(L - p, 0)][
                :u * reps if p + u * reps <= L else L - p]
    return b


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_tandem_repeat_lengths_vs_oracle(seed):
    rng = np.random.default_rng(seed)
    for L in (2, 3, 8, 25, 80, 151):
        b = _random_read(rng, L)
        got = pcr_model.tandem_repeat_lengths(b)
        exp = np.array([oracles.find_tandem_repeat_units_ref(list(b), o)
                        for o in range(L - 1)])
        assert (got == exp).all(), (L, list(b), got.tolist(), exp.tolist())


def test_tandem_repeat_known_cases():
    # the reference's own comment case: TTCTT(C)CCC at (C): FW=(C)3,
    # BW=(TTC)2 unequal; BW count of (C) anchored at offset = 1 -> 4
    b = np.array([3, 3, 1, 3, 3, 1, 1, 1, 1])   # T T C T T C C C C
    offset = 5                                  # the (C) after TT
    assert oracles.find_tandem_repeat_units_ref(list(b), offset) == 4
    assert pcr_model.tandem_repeat_lengths(b)[offset] == 4
    # homopolymer AAAAA: middle offset sees BW+FW
    b = np.array([0, 0, 0, 0, 0])
    got = pcr_model.tandem_repeat_lengths(b)
    exp = [oracles.find_tandem_repeat_units_ref([0] * 5, o)
           for o in range(4)]
    assert got.tolist() == exp


def test_pcr_cache_formula():
    # CONSERVATIVE (=3): cache[0] = max(10, round(40 - e^0)+1) = 40
    c = pcr_model.pcr_indel_cache(3)
    assert c[0] == 40              # round(40 - e^0) + 1
    assert c[20] == 33             # round(40 - e^(20/3pi)) + 1
    assert (c >= pcr_model.MIN_ADJUSTED_QSCORE).all()
    assert (np.diff(c) <= 0).all()                 # monotone down
    # HOSTILE (=1) hits the floor within MAX_REPEAT_LENGTH
    h = pcr_model.pcr_indel_cache(1)
    assert h[20] == 10
    # AGGRESSIVE decays faster than CONSERVATIVE
    a = pcr_model.pcr_indel_cache(2)
    assert (a <= c).all() and (a < c).any()
    assert pcr_model.pcr_indel_cache(0) is None


def test_apply_model_matches_oracle():
    rng = np.random.default_rng(5)
    cache = pcr_model.pcr_indel_cache(3)
    b = _random_read(rng, 101)
    iq = np.full(101, 45, np.int64)
    dq = np.full(101, 45, np.int64)
    oracles.apply_pcr_error_model_ref(list(b), iq, dq, list(cache))
    q2, iq2, dq2 = pcr_model.modify_read_quals(
        b, np.full(101, 30), 60, cache)
    assert (iq2 == iq).all() and (dq2 == dq).all()


def test_modify_read_quals_chain():
    cache = pcr_model.pcr_indel_cache(3)
    b = np.array([0, 1, 2, 3, 0, 1, 2, 3] * 4)
    quals = np.array([2, 17, 18, 30, 40, 50, 25, 19] * 4)
    q, iq, dq = pcr_model.modify_read_quals(b, quals, 35, cache)
    # capped at mapq, then squashed below 18 -> 6
    assert q[0] == 6 and q[1] == 6 and q[2] == 18
    assert q[4] == 35 and q[5] == 35        # mapq cap
    assert (iq >= 6).all() and (dq >= 6).all()
