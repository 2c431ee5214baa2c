"""ApplyBQSR transformer: covariate keys, Bayesian recalibration."""

import numpy as np

from fgdp_tpu.call import bqsr

REPORT = """#:GATKReport.v1.1:5
#:GATKTable:2:2:%s:%s:;
#:GATKTable:Arguments:Recalibration argument collection values used in this run
Argument             Value
mismatches_context_size  2

#:GATKTable:3:94:%d:%d:%d:;
#:GATKTable:Quantized:Quality quantization map
QualityScore  Count  QuantizedScore
20            100    20
30            100    30
40            100    40

#:GATKTable:6:1:%s:%s:%.4f:%.4f:%d:%.2f:;
#:GATKTable:RecalTable0:Read group recalibration table
ReadGroup  EventType  EmpiricalQuality  EstimatedQReported  Observations  Errors
rg1        M          29.0000           30.0000             1000000       1500.00

#:GATKTable:6:2:%s:%d:%s:%.4f:%d:%.2f:;
#:GATKTable:RecalTable1:Quality score recalibration table
ReadGroup  QualityScore  EventType  EmpiricalQuality  Observations  Errors
rg1        30            M          28.0000           500000        1200.00
rg1        20            M          22.0000           500000        2500.00

#:GATKTable:8:2:%s:%d:%s:%s:%s:%.4f:%d:%.2f:;
#:GATKTable:RecalTable2:Covariate recalibration table
ReadGroup  QualityScore  CovariateValue  CovariateName  EventType  EmpiricalQuality  Observations  Errors
rg1        30            AC              Context        M          25.0000           100000        900.00
rg1        30            2               Cycle          M          27.0000           100000        500.00
"""


def test_parse_report_tables():
    t = bqsr.parse_gatk_report(REPORT)
    assert set(t) >= {"Arguments", "Quantized", "RecalTable0",
                      "RecalTable1", "RecalTable2"}
    assert t["RecalTable0"][0]["EstimatedQReported"] == "30.0000"
    assert len(t["RecalTable1"]) == 2


def test_context_and_cycle_keys():
    # key low 4 bits = length, then 2 bits/base
    assert bqsr.key_from_context([0, 1], 0, 2) == 2 | (0 << 4) | (1 << 6)
    assert bqsr.key_from_context([0, 4], 0, 2) == -1
    assert bqsr.key_from_cycle(1) == 2
    assert bqsr.key_from_cycle(-1) == 3
    # forward unpaired read: cycles 1..L
    ck = bqsr.cycle_keys(3, False, False, False)
    assert list(ck) == [bqsr.key_from_cycle(1), bqsr.key_from_cycle(2),
                        bqsr.key_from_cycle(3)]
    # reverse: starts at L, decrements
    ck = bqsr.cycle_keys(3, True, False, False)
    assert list(ck) == [bqsr.key_from_cycle(3), bqsr.key_from_cycle(2),
                        bqsr.key_from_cycle(1)]


def test_bayesian_empirical_quality_pulls_toward_observed():
    # 1e6 observations with 1e-3 error rate -> Q30 empirical
    q = bqsr.bayesian_empirical_quality(1_000_000, 1000, 40.0)
    assert abs(q - 30.0) <= 1.0
    # few observations -> prior (reported) dominates
    q = bqsr.bayesian_empirical_quality(10, 0, 40.0)
    assert q >= 39.0


def test_apply_recalibrates_quals():
    tr = bqsr.BQSRReadTransformer(REPORT)
    read = dict(seq_codes=np.array([0, 1, 2, 3, 0, 1] * 5),
                quals=np.full(30, 30, np.int64), is_reverse=False)
    tr.apply(read)
    q = read["quals"]
    # deltas recomputed from Observations/Errors: rg 1500/1e6 -> 28,
    # qs(30) 1200/5e5 -> 26; AC-context and cycle-2 positions drop
    # further (900/1e5 -> ~20, 500/1e5 -> ~23 under the stacked priors)
    assert q.max() <= 26
    assert q.min() >= 15
    assert len(set(q.tolist())) > 1   # covariates differentiated positions
    # low quals below preserve threshold untouched
    read2 = dict(seq_codes=np.zeros(5, np.int64),
                 quals=np.full(5, 4, np.int64), is_reverse=False)
    tr.apply(read2)
    assert (read2["quals"] == 4).all()
