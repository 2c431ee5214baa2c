"""PCR indel error model + PairHMM read-quality preprocessing.

Re-creates the reference's modifyReadQualities chain
(PairHMMLikelihoodCalculationEngine.cpp:124-170, 254-283):
  1. base quals capped at MAPQ, squashed to 6 when < 18
  2. ins/del quals start at 45 (no BI/BD tags) and are reduced at
     tandem-repeat context per the PCR error model cache
  3. everything below MIN_USABLE (6) pinned to 6

The tandem-repeat scan (findTandemRepeatUnits, .cpp:175-254) is
vectorized over all offsets of a read with one boolean array per unit
length s: E_s[i] = bases[i] == bases[i+s]. Runs of E_s give every
quantity the scalar algorithm derives:
  * backward repeats of the unit ENDING at offset
        1 + revrun_s[offset-s] // s
  * forward repeats of the unit STARTING at offset+1
        1 + fwdrun_s[offset+1] // s
  * FW unit == BW unit  <=>  sBW == sFW == s and revrun_s[offset] >= s
  * backward repeats of the FW unit anchored at offset
        revrun_s[offset] // s
Scalar parity is proven against the transcription oracle
(testing/oracles.find_tandem_repeat_units_ref) in tests/test_pcr_model.py.
"""

from __future__ import annotations

import math

import numpy as np

MAX_STR_UNIT_LENGTH = 8
MAX_REPEAT_LENGTH = 20
MIN_ADJUSTED_QSCORE = 10
INITIAL_QSCORE = 40.0
MIN_USABLE_Q = 6
BASE_QUALITY_THRESHOLD = 18          # PairHMM.h:18
DEFAULT_INDEL_QUAL = 45              # ReadUtils.h:40

# PCRErrorModel enum (PairHMMLikelihoodCalculationEngine.h:13):
# 0 = NONE, 1 = HOSTILE, 2 = AGGRESSIVE, 3 = CONSERVATIVE (Mutect2
# default, LikelihoodEngineArgumentCollection.h:30)


def pcr_indel_cache(pcr_error_model: int) -> np.ndarray | None:
    """cache[repeatLength] = adjusted indel qual
    (initializePCRErrorModel / getErrorModelAdjustedQual, .cpp:45-61)."""
    if pcr_error_model == 0:
        return None
    rate = float(pcr_error_model)
    out = np.zeros(MAX_REPEAT_LENGTH + 1, np.int64)
    for i in range(MAX_REPEAT_LENGTH + 1):
        d = INITIAL_QSCORE - math.exp(i / (rate * math.pi))
        rounded = int(d + 0.5) if d > 0 else int(d - 0.5)
        out[i] = max(MIN_ADJUSTED_QSCORE, rounded + 1)
    return out


def _runs_fwd(E):
    """fwd[i] = length of the True run starting at i."""
    n = len(E)
    if n == 0:
        return np.zeros(0, np.int64)
    idx = np.arange(n)
    rev_E = E[::-1]
    last_false = np.maximum.accumulate(np.where(~rev_E, idx, -1))
    runs_rev = np.where(rev_E, idx - last_false, 0)
    return runs_rev[::-1].copy()


def _runs_rev(E):
    """rev[i] = length of the True run ending at i."""
    n = len(E)
    if n == 0:
        return np.zeros(0, np.int64)
    idx = np.arange(n)
    last_false = np.maximum.accumulate(np.where(~E, idx, -1))
    return np.where(E, idx - last_false, 0)


def tandem_repeat_lengths(bases: np.ndarray) -> np.ndarray:
    """findTandemRepeatUnits for every offset 0..L-2 at once; returns
    int array out[offset] = capped repeat length."""
    b = np.asarray(bases)
    L = len(b)
    if L < 2:
        return np.zeros(max(L - 1, 0), np.int64)
    offs = np.arange(L - 1)
    NBIG = 1 << 20

    # per unit length s: extension-run arrays over E_s
    num_bw = np.zeros((MAX_STR_UNIT_LENGTH + 1, L - 1), np.int64)
    ok_bw = np.zeros((MAX_STR_UNIT_LENGTH + 1, L - 1), bool)
    num_fw = np.zeros((MAX_STR_UNIT_LENGTH + 1, L - 1), np.int64)
    ok_fw = np.zeros((MAX_STR_UNIT_LENGTH + 1, L - 1), bool)
    rev_at_off = np.zeros((MAX_STR_UNIT_LENGTH + 1, L - 1), np.int64)
    for s in range(1, MAX_STR_UNIT_LENGTH + 1):
        if s >= L:
            break
        E = b[:-s] == b[s:]                  # len L-s
        fwd = _runs_fwd(E)
        rev = _runs_rev(E)
        valid_bw = offs + 1 - s >= 0         # unit fits left of offset
        ext_b = np.where(offs - s >= 0,
                         rev[np.clip(offs - s, 0, len(rev) - 1)], 0)
        num_bw[s] = 1 + ext_b // s
        ok_bw[s] = valid_bw
        valid_fw = offs + s + 1 <= L         # unit fits right of offset
        ext_f = np.where(offs + 1 <= L - s - 1,
                         fwd[np.clip(offs + 1, 0, len(fwd) - 1)], 0)
        num_fw[s] = 1 + ext_f // s
        ok_fw[s] = valid_fw
        rev_at_off[s] = np.where(offs <= len(rev) - 1,
                                 rev[np.clip(offs, 0, len(rev) - 1)], 0)

    def first_repeat(num, ok):
        """Smallest valid s with count >= 2, else 0."""
        hit = ok & (num >= 2)
        s_of = np.where(hit, np.arange(MAX_STR_UNIT_LENGTH + 1)[:, None],
                        NBIG)
        s_min = s_of.min(axis=0)
        return np.where(s_min == NBIG, 0, s_min)

    s_bw = first_repeat(num_bw, ok_bw)           # 0 = no repeat found
    s_fw = first_repeat(num_fw, ok_fw)
    # counts: from the breaking s, else 1 (anchored-only count)
    cols = np.arange(L - 1)
    max_bw = np.where(s_bw > 0, num_bw[s_bw, cols], 1)
    max_fw = np.where(s_fw > 0, num_fw[s_fw, cols], 1)
    unit_bw_len = np.where(s_bw > 0, s_bw, 1)
    unit_fw_len = np.where(s_fw > 0, s_fw, 1)
    units_equal = (unit_bw_len == unit_fw_len) & \
        (rev_at_off[unit_fw_len, cols] >= unit_fw_len)
    # unequal units: backward repeats of the FW unit anchored at offset
    bw2 = rev_at_off[unit_fw_len, cols] // unit_fw_len
    total = np.where(units_equal, max_fw + max_bw, max_fw + bw2)
    return np.minimum(total, MAX_REPEAT_LENGTH)


def modify_read_quals(bases, quals, mapq, cache):
    """The full modifyReadQualities chain for one read; returns
    (base_quals, ins_quals, del_quals) int64 arrays."""
    q = np.minimum(np.asarray(quals, np.int64), int(mapq))
    q = np.where(q < BASE_QUALITY_THRESHOLD, MIN_USABLE_Q, q)
    L = len(q)
    iq = np.full(L, DEFAULT_INDEL_QUAL, np.int64)
    dq = np.full(L, DEFAULT_INDEL_QUAL, np.int64)
    if cache is not None and L >= 2:
        rl = tandem_repeat_lengths(bases)
        adj = cache[rl]
        iq[:L - 1] = np.minimum(iq[:L - 1], adj)
        dq[:L - 1] = np.minimum(dq[:L - 1], adj)
    iq = np.where(iq < MIN_USABLE_Q, MIN_USABLE_Q, iq)
    dq = np.where(dq < MIN_USABLE_Q, MIN_USABLE_Q, dq)
    return q, iq, dq
