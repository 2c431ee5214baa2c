"""FilterMutectCalls port: threshold math, clustering, filter behavior."""

import math

import numpy as np
import pytest

from fgdp_tpu.call import clustering as cl
from fgdp_tpu.call import filtering as fl


def test_beta_binomial_normalizes():
    a, b, n = 2.5, 7.0, 20
    total = sum(math.exp(cl.beta_binomial_log_prob(a, b, n, k))
                for k in range(n + 1))
    assert abs(total - 1.0) < 1e-9


def test_binomial_normalizes_and_edges():
    n, p = 15, 0.23
    total = sum(math.exp(cl.binomial_log_prob(n, p, k))
                for k in range(n + 1))
    assert abs(total - 1.0) < 1e-9
    assert cl.binomial_log_prob(5, 0.0, 0) == 0.0
    assert cl.binomial_log_prob(5, 0.0, 1) == -math.inf


def test_digamma_matches_known_values():
    # psi(1) = -gamma, psi(0.5) = -gamma - 2 ln 2
    gamma = 0.5772156649015329
    assert abs(cl.digamma(1.0) + gamma) < 1e-8
    assert abs(cl.digamma(0.5) + gamma + 2 * math.log(2)) < 1e-8


def test_beta_quantile_median():
    # Beta(2,2) median = 0.5; Beta(1,1) quantile q = q
    assert abs(cl._beta_quantile(2, 2, 0.5) - 0.5) < 1e-6
    assert abs(cl._beta_quantile(1, 1, 0.3) - 0.3) < 1e-6


def test_threshold_calculator_formula():
    """ThresholdCalculator.cpp:21-48 transcription check."""
    posts = [0.01, 0.02, 0.05, 0.9, 0.95]
    thr = fl.ThresholdCalculator.calculate(posts, 1.0)
    # optimal F keeps the three confident calls, excludes the two bad ones
    assert 0.05 <= thr < 0.9
    assert fl.ThresholdCalculator.calculate([], 1.0) == 0.0
    # all good -> threshold 1 (keep everything)
    assert fl.ThresholdCalculator.calculate([0.0, 0.0], 1.0) == 1.0


def _call(tlod=20.0, ad_ref=20, ad_alt=10, indel=0, af=None, **kw):
    af = af if af is not None else ad_alt / max(ad_ref + ad_alt, 1)
    kw.setdefault("sb", (ad_ref // 2, ad_ref - ad_ref // 2,
                         ad_alt // 2, ad_alt - ad_alt // 2))
    return fl.FilterableCall(tlod=tlod, ad_ref=ad_ref, ad_alt=ad_alt,
                             indel_length=indel, af=af, **kw)


def test_sequencing_error_prob_orders_by_lod():
    model = cl.SomaticClusteringModel()
    weak = cl.Datum(1.0 * cl.LOG10, 0, 0, 2, 30, 0)
    strong = cl.Datum(20.0 * cl.LOG10, 0, 0, 10, 30, 0)
    p_weak = model.probability_of_sequencing_error(weak)
    p_strong = model.probability_of_sequencing_error(strong)
    assert p_strong < p_weak
    assert p_strong < 0.01


def test_filter_calls_pass_and_fail():
    # matched-normal mode: clean somatic calls carry normal ref evidence
    calls = [_call(tlod=25.0, nlod=8.0) for _ in range(30)]
    bad = [
        _call(tlod=1.2, ad_alt=2, ad_ref=40, nlod=8.0),       # weak evidence
        _call(tlod=25.0, nlod=8.0, ad_ref=100, ad_alt=30,
              sb=(50, 50, 30, 0)),                            # strand bias
        _call(tlod=25.0, nlod=8.0, mbq_alt=5),                # base_qual
        _call(tlod=25.0, nlod=8.0, mmq_alt=10),               # map_qual
        _call(tlod=25.0, nlod=8.0, mpos=0),                   # position
        _call(tlod=25.0, nlod=8.0, ecnt=7),                   # clustered
        _call(tlod=25.0, af=0.5, ad_alt=15, ad_ref=15,
              pop_af=0.4, nlod=-3.0),                         # germline
    ]
    calls.extend(bad)
    fl.filter_calls(calls)
    n_pass_good = sum(1 for c in calls[:30] if not c.filters)
    assert n_pass_good >= 28, [c.filters for c in calls[:30]]
    assert "weak_evidence" in bad[0].filters
    assert "strand_bias" in bad[1].filters
    assert "base_qual" in bad[2].filters
    assert "map_qual" in bad[3].filters
    assert "position" in bad[4].filters
    assert "clustered_events" in bad[5].filters
    assert "germline" in bad[6].filters


def test_clustering_learns_from_data():
    model = cl.SomaticClusteringModel()
    rng = np.random.default_rng(3)
    # 60 real somatic variants at AF ~0.25, 40 sequencing errors
    for _ in range(60):
        alt = int(rng.binomial(40, 0.25))
        model.record([40 - alt, alt], [15.0 * cl.LOG10], 0.0, 0.0, [0])
    for _ in range(40):
        model.record([39, 1], [-2.0 * cl.LOG10], 0.0, 0.0, [0])
    model.learn_and_clear_accumulated_data()
    # post-learning: a typical somatic datum is recognized
    d = cl.Datum(15.0 * cl.LOG10, 0, 0, 10, 40, 0)
    assert model.probability_of_sequencing_error(d) < 0.05
    # and a marginal one is mostly error
    d2 = cl.Datum(-1.0 * cl.LOG10, 0, 0, 1, 40, 0)
    assert model.probability_of_sequencing_error(d2) > 0.5


def test_engine_filter_integration():
    """apply_filter_mutect_calls mutates VariantCall.filters."""
    from fgdp_tpu.call.engine import VariantCall, apply_filter_mutect_calls

    calls = [VariantCall(contig="c", pos=100 + i, ref="A", alt="C",
                         tlod=25.0, nlod=None, depth=30, ad_ref=20,
                         ad_alt=10, af=0.33, filters=())
             for i in range(10)]
    calls.append(VariantCall(contig="c", pos=500, ref="A", alt="C",
                             tlod=0.5, nlod=None, depth=30, ad_ref=29,
                             ad_alt=1, af=0.03, filters=()))
    apply_filter_mutect_calls(calls)
    assert all(not c.filters for c in calls[:10])
    assert "weak_evidence" in calls[-1].filters


def test_n_ratio_filter():
    # alt depth 10, 8 Ns -> ratio 0.8 >= 0.5 threshold
    calls = [_call(tlod=25.0, nlod=8.0) for _ in range(20)]
    bad = _call(tlod=25.0, nlod=8.0, n_count=8)
    ok = _call(tlod=25.0, nlod=8.0, n_count=2)
    calls += [bad, ok]
    fl.filter_calls(calls, n_ratio=0.5)
    assert "n_ratio" in bad.filters
    assert "n_ratio" not in ok.filters
    # default n_ratio = inf: never fires
    bad2 = _call(tlod=25.0, nlod=8.0, n_count=1000)
    fl.filter_calls(calls + [bad2])
    assert "n_ratio" not in bad2.filters
    # zero alt depth: no division, no filter
    z = _call(tlod=25.0, nlod=8.0, ad_alt=0, n_count=5)
    fl.filter_calls(calls + [z], n_ratio=0.5)
    assert "n_ratio" not in z.filters


def test_panel_of_normals_filter():
    calls = [_call(tlod=25.0, nlod=8.0) for _ in range(20)]
    bad = _call(tlod=25.0, nlod=8.0, in_pon=True)
    calls.append(bad)
    fl.filter_calls(calls)
    assert "panel_of_normals" in bad.filters
    assert all("panel_of_normals" not in c.filters for c in calls[:20])


def test_filtered_haplotype_filter():
    """A clean call phased with an artifact call (within the distance
    bound) inherits its artifact probability; an equally clean call on
    a different phase group does not."""
    calls = [_call(tlod=25.0, nlod=8.0, pos=10_000 + 7 * i)
             for i in range(20)]
    # artifact: heavy strand bias, phased group "A" at pos 500
    art = _call(tlod=25.0, nlod=8.0, ad_ref=100, ad_alt=30,
                sb=(50, 50, 30, 0), pos=500, phasing="0|1501_A_T")
    # phased partner 40bp away: clean annotations
    partner = _call(tlod=25.0, nlod=8.0, pos=540, phasing="0|1501_A_T")
    # same phase group but 5kb away: outside max_intra_haplotype_distance
    far = _call(tlod=25.0, nlod=8.0, pos=5500, phasing="0|1501_A_T")
    # clean call on another phase group
    other = _call(tlod=25.0, nlod=8.0, pos=560, phasing="0|1561_G_C")
    calls += [art, partner, far, other]
    fl.filter_calls(calls)
    assert "strand_bias" in art.filters
    assert "bad_haplotype" in partner.filters, partner.filters
    assert "bad_haplotype" not in far.filters
    assert "bad_haplotype" not in other.filters
