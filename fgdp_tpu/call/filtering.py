"""FilterMutectCalls: 2-pass filtering engine + filter set.

Host-side port of the reference's filtering layer (deepmutect
Mutect2Cpp-master/src/filtering/): each filter computes an error
probability per call, the engine combines them by error type
(ErrorProbabilities.cpp), a threshold is learned from the posterior
distribution by optimal F-score (ThresholdCalculator.cpp:21-48), and
the somatic clustering model supplies priors (clustering.py). The
driver runs the reference's n-pass loop (main.cpp:643-662): pass 1
accumulates + learns, pass 2 applies.

Calls are `FilterableCall`s: engine.VariantCall plus the annotations
the filters need (SB strand counts, median base/mapping quality, median
read position, fragment length difference, event count, population AF).
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from . import clustering as cl

LOG10 = math.log(10.0)

# error types (filtering/ErrorType.h)
ARTIFACT, NON_SOMATIC, SEQUENCING = "artifact", "non_somatic", "sequencing"

# M2FiltersArgumentCollection defaults (M2FiltersArgumentCollection.h:22-50)
DEFAULTS = dict(
    initial_posterior_threshold=0.1,
    max_false_discovery_rate=0.05,
    f_score_beta=1.0,
    min_median_base_quality=20,
    min_median_mapping_quality=30,
    long_indel_length=5,
    unique_alt_read_count=0,
    n_ratio=math.inf,
    min_median_read_position=1,
    min_af=0.0,
    min_slippage_length=8,
    slippage_rate=0.1,
    max_median_fragment_length_difference=10000.0,
    max_events_in_region=2,
    max_alt_alleles=1,
    normal_p_value_threshold=0.001,
    max_intra_haplotype_distance=100,
)


@dataclasses.dataclass
class FilterableCall:
    """A biallelic call + the annotations FilterMutectCalls consumes."""

    tlod: float                # log10 tumor odds (TLOD)
    ad_ref: int
    ad_alt: int
    indel_length: int          # len(alt) - len(ref)
    af: float                  # tumor allele fraction estimate
    # annotations (GATK INFO/FORMAT equivalents); None = absent
    sb: tuple = (0, 0, 0, 0)   # fwd_ref, rev_ref, fwd_alt, rev_alt
    mbq_ref: int = 30          # median base quality (ref, alt)
    mbq_alt: int = 30
    mmq_alt: int = 60          # median mapping quality of alt reads
    mpos: int = 25             # median distance from end of read
    mfrl_diff: float = 0.0     # |median fragment len alt - ref|
    ecnt: int = 1              # events in haplotype region
    site_alt_lods: tuple = ()  # TLODs of all alt alleles at the site
    pop_af: float = 1e-6       # population allele frequency
    nlod: float | None = None          # log10 normal ref odds
    n_artifact_lod: float | None = None  # log10 normal artifact odds
    normal_ad_ref: int = 0
    normal_ad_alt: int = 0
    repeat_unit_length: int = 0   # STR context for slippage
    repeat_count: int = 0
    rpa: tuple | None = None      # (ref_repeats, alt_repeats) VCF RPA
    pos: int = 0                  # site coordinate (FilteredHaplotype)
    n_count: int = 0              # N bases at site (CountNs annotation)
    in_pon: bool = False          # site present in the panel of normals
    phasing: str | None = None    # PGT+PID string, None = unphased
    # output
    filters: list = dataclasses.field(default_factory=list)
    error_prob: float = 0.0

    @property
    def total(self):
        return self.ad_ref + self.ad_alt

    @property
    def tumor_log_odds_ln(self):
        return self.tlod * LOG10


class ThresholdCalculator:
    """ThresholdCalculator.cpp: optimal F_beta-score threshold."""

    def __init__(self, initial=DEFAULTS["initial_posterior_threshold"],
                 beta=DEFAULTS["f_score_beta"]):
        self.threshold = initial
        self.beta = beta
        self.probs = []

    def add(self, p):
        self.probs.append(p)

    def relearn_and_clear(self):
        self.threshold = self.calculate(self.probs, self.beta)
        self.probs = []

    @staticmethod
    def calculate(posteriors, beta):
        ps = sorted(posteriors)
        n = len(ps)
        expected_tp = sum(1 - p for p in ps)
        tp = fp = 0.0
        fn = expected_tp
        best_idx = -1
        best_f = 0.0
        for i, p in enumerate(ps):
            tp += 1 - p
            fp += p
            fn -= 1 - p
            f = (1 + beta * beta) * tp / \
                ((1 + beta * beta) * tp + beta * beta * fn + fp)
            if f >= best_f:
                best_idx = i
                best_f = f
        if best_idx == -1:
            return 0.0
        return 1.0 if best_idx == n - 1 else ps[best_idx]


# --------------------------------------------------------------------------
# filters
# --------------------------------------------------------------------------

class Filter:
    name = "?"
    error_type = ARTIFACT

    def error_probability(self, c: FilterableCall, eng) -> float:
        return max(0.0, min(1.0, self._calc(c, eng)))

    def _calc(self, c, eng):
        raise NotImplementedError

    def accumulate(self, c, error_probs, eng):
        pass

    def learn_and_clear(self):
        pass


class HardFilter(Filter):
    def _calc(self, c, eng):
        return 1.0 if self.is_artifact(c, eng) else 0.0


class TumorEvidenceFilter(Filter):
    """TumorEvidenceFilter.cpp."""
    name = "weak_evidence"
    error_type = SEQUENCING

    def _calc(self, c, eng):
        d = cl.Datum(c.tumor_log_odds_ln, 0, 0, c.ad_alt, c.total,
                     c.indel_length)
        return eng.model.probability_of_sequencing_error(d)


class StrandArtifactFilter(Filter):
    """StrandArtifactFilter.cpp: 3-state (fwd artifact / rev artifact /
    none) beta-binomial mixture with EM-learned artifact shape."""
    name = "strand_bias"
    error_type = ARTIFACT

    INITIAL_PRIOR = 0.001
    ALPHA_SEQ = 1.0
    BETA_SEQ_SNV = 1000.0
    BETA_SEQ_SHORT_INDEL = 5000.0
    BETA_SEQ_LONG_INDEL = 50000.0
    LONG_INDEL = 3
    LONGEST_INDEL = 4

    def __init__(self):
        self.prior = self.INITIAL_PRIOR
        self.alpha = 1.0
        self.beta = 20.0
        self._esteps = []

    def _estep(self, c: FilterableCall):
        fr, rr, fa, ra = c.sb
        fwd_count, rev_count = fr + fa, rr + ra
        indel = abs(c.indel_length)
        if fa + ra == 0 or indel > self.LONGEST_INDEL:
            return (0.0, 0.0, fwd_count, rev_count, fa, ra)
        art_f = cl.beta_binomial_log_prob(self.alpha, self.beta,
                                          fwd_count, fa) + \
            self._non_artifact_ll(rev_count, ra, indel)
        art_r = cl.beta_binomial_log_prob(self.alpha, self.beta,
                                          rev_count, ra) + \
            self._non_artifact_ll(fwd_count, fa, indel)
        none = (cl.binom_coeff_log(fwd_count, fa)
                + cl.binom_coeff_log(rev_count, ra)
                - cl.binom_coeff_log(fwd_count + rev_count, fa + ra)
                + cl.beta_binomial_log_prob(1, 1, fwd_count + rev_count,
                                            fa + ra))
        probs = cl.normalize_log([
            art_f + math.log(self.prior / 2),
            art_r + math.log(self.prior / 2),
            none + math.log(1 - self.prior)])
        return (float(probs[0]), float(probs[1]), fwd_count, rev_count,
                fa, ra)

    def _non_artifact_ll(self, count, alt, indel):
        beta_seq = self.BETA_SEQ_SNV if indel == 0 else (
            self.BETA_SEQ_SHORT_INDEL if indel < self.LONG_INDEL
            else self.BETA_SEQ_LONG_INDEL)
        return cl.beta_binomial_log_prob(self.ALPHA_SEQ, beta_seq, count, alt)

    def _calc(self, c, eng):
        e = self._estep(c)
        return e[0] + e[1]

    def accumulate(self, c, error_probs, eng):
        self._esteps.append(self._estep(c))

    def learn_and_clear(self):
        pot = [e for e in self._esteps if e[0] + e[1] > 0.1]
        if pot:
            art_alt = sum(e[0] * e[4] + e[1] * e[5] for e in pot)
            art_depth = sum(e[0] * e[2] + e[1] * e[3] for e in pot)
            mean = (art_alt + 1.0) / (art_depth + 21.0)
            # 1-D maximization of the artifact likelihood over alpha
            # (reference uses Brent; a log-spaced scan suffices)
            best_a, best_ll = self.alpha, -math.inf
            for a in np.geomspace(0.05, 20, 40):
                b = (1 / mean - 1) * a
                ll = sum(
                    e[0] * cl.beta_binomial_log_prob(a, b, e[2], e[4])
                    + e[1] * cl.beta_binomial_log_prob(a, b, e[3], e[5])
                    for e in pot)
                if ll > best_ll:
                    best_a, best_ll = a, ll
            self.alpha = best_a
            self.beta = (1 / mean - 1) * best_a
            n_art = sum(e[0] + e[1] for e in self._esteps)
            self.prior = max(min((n_art + 1.0) /
                                 (len(self._esteps) + 2.0), 0.5), 1e-5)
        self._esteps = []


class BaseQualityFilter(HardFilter):
    """BaseQualityFilter.cpp."""
    name = "base_qual"

    def is_artifact(self, c, eng):
        return c.mbq_alt < eng.args["min_median_base_quality"] and \
            c.indel_length == 0


class MappingQualityFilter(HardFilter):
    """MappingQualityFilter.cpp: applies to SNVs + short indels."""
    name = "map_qual"

    def is_artifact(self, c, eng):
        if abs(c.indel_length) >= eng.args["long_indel_length"]:
            return False
        return c.mmq_alt < eng.args["min_median_mapping_quality"]


class ReadPositionFilter(HardFilter):
    """ReadPositionFilter.cpp."""
    name = "position"

    def is_artifact(self, c, eng):
        return -1 < c.mpos < eng.args["min_median_read_position"]


class FragmentLengthFilter(HardFilter):
    """FragmentLengthFilter.cpp."""
    name = "fragment"

    def is_artifact(self, c, eng):
        return c.mfrl_diff > \
            eng.args["max_median_fragment_length_difference"]


class MultiallelicFilter(HardFilter):
    """MultiallelicFilter.cpp (MULTIALLELIC_LOD_THRESHOLD = 5.0)."""
    name = "multiallelic"
    LOD_THRESHOLD = 5.0

    def is_artifact(self, c, eng):
        passing = sum(1 for l in c.site_alt_lods if l > self.LOD_THRESHOLD)
        return passing > eng.args["max_alt_alleles"]


class ClusteredEventsFilter(HardFilter):
    """ClusteredEventsFilter.cpp."""
    name = "clustered_events"

    def is_artifact(self, c, eng):
        return c.ecnt > eng.args["max_events_in_region"]


class MinAlleleFractionFilter(HardFilter):
    """MinAlleleFractionFilter.cpp."""
    name = "low_allele_frac"

    def is_artifact(self, c, eng):
        return c.af < eng.args["min_af"]


class DuplicatedAltReadFilter(HardFilter):
    """DuplicatedAltReadFilter.cpp — needs unique-fragment counting;
    disabled at the default unique_alt_read_count=0 like the reference."""
    name = "duplicate"

    def is_artifact(self, c, eng):
        return False if eng.args["unique_alt_read_count"] == 0 else \
            c.ad_alt <= eng.args["unique_alt_read_count"]


class PolymeraseSlippageFilter(Filter):
    """PolymeraseSlippageFilter.cpp: indels in long STRs."""
    name = "slippage"
    error_type = ARTIFACT

    def _calc(self, c, eng):
        # PolymeraseSlippageFilter.cpp:20-56: requires the RPA/RU
        # annotation; fires only on one-unit slips in STRs whose
        # reference base span >= minSlippageLength
        rpa = getattr(c, "rpa", None)
        if rpa is None or c.repeat_unit_length == 0:
            return 0.0
        ref_str_bases = c.repeat_unit_length * rpa[0]
        if ref_str_bases < eng.args["min_slippage_length"] or \
                abs(rpa[0] - rpa[1]) != 1:
            return 0.0
        from scipy import special as sps
        log_som = eng.model.log_likelihood_given_somatic(c.total, c.ad_alt)
        # likelihood under slippage: regularizedBeta(rate, alt+1, ref+1)
        lik_slip = float(sps.betainc(c.ad_alt + 1, c.ad_ref + 1,
                                     eng.args["slippage_rate"]))
        if lik_slip <= 0.0:
            lik_slip = math.exp(cl.binomial_log_prob(
                c.total, eng.args["slippage_rate"], c.ad_alt))
        log_odds = log_som - math.log(max(lik_slip, 1e-300))
        return Mutect2FilteringEngine._posterior_probability_of_error(
            log_odds, eng.model.log_prior_of_somatic_variant(
                c.indel_length))


class NRatioFilter(HardFilter):
    """NRatioFilter.cpp: N-base pileup count vs alt depth (summed over
    tumor AND normal samples, sumADsOverSamples(vc, true, true)).
    Inactive at the default n_ratio = inf, like the reference."""
    name = "n_ratio"

    def is_artifact(self, c, eng):
        alt = c.ad_alt + c.normal_ad_alt
        if alt == 0:
            return False
        return c.n_count / alt >= eng.args["n_ratio"]


class PanelOfNormalsFilter(HardFilter):
    """PanelOfNormalsFilter.cpp: site blacklisted by the PoN VCF
    (IN_PON attribute, set by the --panel-of-normals CLI path)."""
    name = "panel_of_normals"

    def is_artifact(self, c, eng):
        return c.in_pon


class FilteredHaplotypeFilter(Filter):
    """FilteredHaplotypeFilter.cpp: a variant phased with an artifact
    inherits that artifact's probability. Pass 1 accumulates, per
    phasing string (PGT+PID), (position, max non-sequencing error prob
    from OTHER filters); pass 2 reads back the max probability among
    phased neighbours within max_intra_haplotype_distance.

    Deviation from the C++ port: its distance test compares
    `position - probability` (FilteredHaplotypeFilter.cpp:49, a
    transcription bug); this implements the GATK semantics
    |neighbour_pos - call_pos| <= maxIntraHaplotypeDistance."""
    name = "bad_haplotype"
    error_type = ARTIFACT

    def __init__(self):
        self._accum = {}
        self._phased = {}

    def _calc(self, c, eng):
        if not c.phasing:
            return 0.0
        probs = self._phased.get(c.phasing)
        if not probs:
            return 0.0
        dist = eng.args["max_intra_haplotype_distance"]
        return max((p for pos, p in probs if abs(pos - c.pos) <= dist),
                   default=0.0)

    def accumulate(self, c, error_probs, eng):
        if not c.phasing:
            return
        art = max((p for f, p in error_probs.items()
                   if f.error_type != SEQUENCING and f.name != self.name),
                  default=0.0)
        self._accum.setdefault(c.phasing, []).append((c.pos, art))

    def learn_and_clear(self):
        self._phased = self._accum
        self._accum = {}


class NormalArtifactFilter(Filter):
    """NormalArtifactFilter.cpp."""
    name = "normal_artifact"
    error_type = ARTIFACT
    MIN_NORMAL_ARTIFACT_RATIO = 0.1
    IMPUTED_NORMAL_BASE_QUALITY = 30

    def _calc(self, c, eng):
        if c.n_artifact_lod is None:
            return 0.0
        tumor_af = c.ad_alt / max(c.total, 1)
        normal_depth = c.normal_ad_ref + c.normal_ad_alt
        normal_af = c.normal_ad_alt / normal_depth if normal_depth else 0.0
        if normal_af < self.MIN_NORMAL_ARTIFACT_RATIO * tumor_af:
            return 0.0
        # n_artifact_lod carries the VCF NALOD (negative log10 odds of
        # a normal artifact); log10ToLog like NormalArtifactFilter.cpp:41
        p = eng.posterior_probability_of_normal_artifact(
            c.n_artifact_lod * LOG10)
        # NormalArtifactFilter.cpp:44-47: median REF base quality from
        # MBQ[0] when present, else the imputed default
        mbq = getattr(c, "mbq_ref", None) or self.IMPUTED_NORMAL_BASE_QUALITY
        err = 10.0 ** (-mbq / 10.0)
        # P(normal alt count >= observed | sequencing error only)
        pval = 1.0 - _binom_cdf(normal_depth, err, c.normal_ad_alt - 1)
        return 1.0 if pval < eng.args["normal_p_value_threshold"] else p


class GermlineFilter(Filter):
    """GermlineFilter.cpp."""
    name = "germline"
    error_type = NON_SOMATIC
    MIN_AF_FOR_GERMLINE_HOM_ALT = 0.9
    EPSILON = 1e-10

    def _calc(self, c, eng):
        pop_af = c.pop_af
        if pop_af < self.EPSILON:
            return 0.0
        if pop_af > 1 - self.EPSILON:
            return 1.0
        total = c.total
        if total == 0:
            return 0.0
        maf = 0.5
        log_germline = math.log(0.5) + cl.log_sum_exp([
            cl.binomial_log_prob(total, maf, c.ad_alt),
            cl.binomial_log_prob(total, 1 - maf, c.ad_alt)])
        log_somatic = eng.model.log_likelihood_given_somatic(total, c.ad_alt)
        log_odds_het = log_germline - log_somatic
        log_odds_hom = 0.0 if c.af >= self.MIN_AF_FOR_GERMLINE_HOM_ALT \
            else -math.inf
        # GermlineFilter.cpp:55-57: germlineProbability(-normalLod, ...) —
        # high NLOD (confident ref normal) suppresses the germline state
        normal_lod = c.nlod * LOG10 if c.nlod is not None else 0.0
        return self._germline_probability(
            -normal_lod, log_odds_het, log_odds_hom, pop_af,
            eng.model.log_prior_of_somatic_variant(c.indel_length))

    @staticmethod
    def _germline_probability(normal_log_odds, log_odds_het, log_odds_hom,
                              pop_af, log_prior_somatic):
        log_prior_not_somatic = cl.log1mexp(log_prior_somatic)
        lp_het = math.log(max(2 * pop_af * (1 - pop_af), 1e-300))
        lp_hom = math.log(max(pop_af * pop_af, 1e-300))
        lp_not_germ = math.log(max((1 - pop_af) ** 2, 1e-300))
        lp_germ = cl.log_sum_exp([
            lp_het + log_odds_het + normal_log_odds + log_prior_not_somatic,
            lp_hom + log_odds_hom + normal_log_odds + log_prior_not_somatic])
        lp_som = lp_not_germ + log_prior_somatic
        return float(cl.normalize_log([lp_germ, lp_som])[0])


def _binom_cdf(n, p, k):
    if k < 0:
        return 0.0
    if k >= n:
        return 1.0
    return float(sum(math.exp(cl.binomial_log_prob(n, p, i))
                     for i in range(0, int(k) + 1)))


# --------------------------------------------------------------------------
# engine + 2-pass driver
# --------------------------------------------------------------------------

class Mutect2FilteringEngine:
    """Mutect2FilteringEngine.cpp: per-call error probabilities combined
    by type, learned F-score threshold, clustering-model priors."""

    EPSILON = 1e-10

    def __init__(self, callable_sites=None, **overrides):
        self.args = dict(DEFAULTS)
        self.args.update(overrides)
        self.model = cl.SomaticClusteringModel()
        # enables empirical variant-prior learning
        # (SomaticClusteringModel.cpp:241-247)
        self.model.callable_sites = callable_sites
        self.threshold = ThresholdCalculator(
            self.args["initial_posterior_threshold"],
            self.args["f_score_beta"])
        self.filters = [
            TumorEvidenceFilter(),
            StrandArtifactFilter(),
            BaseQualityFilter(),
            MappingQualityFilter(),
            DuplicatedAltReadFilter(),
            NormalArtifactFilter(),
            ReadPositionFilter(),
            MinAlleleFractionFilter(),
            ClusteredEventsFilter(),
            GermlineFilter(),
            MultiallelicFilter(),
            FragmentLengthFilter(),
            PolymeraseSlippageFilter(),
            NRatioFilter(),
            PanelOfNormalsFilter(),
            FilteredHaplotypeFilter(),
        ]

    def posterior_probability_of_normal_artifact(self, neg_log_odds_ln):
        return self._posterior_probability_of_error(
            neg_log_odds_ln, self.model.log_prior_of_variant_versus_artifact)

    @staticmethod
    def _posterior_probability_of_error(log_odds_real_vs_error,
                                        log_prior_real):
        probs = cl.normalize_log([
            log_odds_real_vs_error + log_prior_real,
            cl.log1mexp(log_prior_real)])
        return float(probs[1])

    def _error_probabilities(self, c: FilterableCall):
        by_filter = {f: f.error_probability(c, self) for f in self.filters}
        by_type = {ARTIFACT: 0.0, NON_SOMATIC: 0.0, SEQUENCING: 0.0}
        for f, p in by_filter.items():
            by_type[f.error_type] = max(by_type[f.error_type], p)
        true_prob = 1.0
        for p in by_type.values():
            true_prob *= 1 - p
        return by_filter, by_type, max(0.0, min(1.0, 1 - true_prob))

    def accumulate(self, c: FilterableCall):
        """First-pass accumulation (accumulateData)."""
        by_filter, by_type, err = self._error_probabilities(c)
        for f in self.filters:
            f.accumulate(c, by_filter, self)
        self.model.record([c.ad_ref, c.ad_alt], [c.tumor_log_odds_ln],
                          by_type[ARTIFACT], by_type[NON_SOMATIC],
                          [c.indel_length])
        self.threshold.add(err)

    def learn_parameters(self):
        for f in self.filters:
            f.learn_and_clear()
        self.model.learn_and_clear_accumulated_data()
        self.threshold.relearn_and_clear()

    def apply_filters(self, c: FilterableCall) -> bool:
        """Second pass (applyFiltersAndAccumulateOutputStats): sets
        c.filters/c.error_prob, returns True if the call PASSes."""
        by_filter, _, err = self._error_probabilities(c)
        c.error_prob = err
        c.filters = []
        thr = self.threshold.threshold
        for f, p in by_filter.items():
            if p > self.EPSILON and p > thr - self.EPSILON:
                c.filters.append(f.name)
        return not c.filters


def filter_calls(calls, n_learning_passes: int = 2, **overrides):
    """The FilterMutectCalls n-pass driver (reference main.cpp:643-662).
    Mutates each call's .filters/.error_prob; returns the engine."""
    eng = Mutect2FilteringEngine(**overrides)
    for _ in range(n_learning_passes):
        for c in calls:
            eng.accumulate(c)
        eng.learn_parameters()
    for c in calls:
        eng.apply_filters(c)
    return eng
