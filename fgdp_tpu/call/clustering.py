"""Somatic allele-fraction clustering (SomaticClusteringModel port).

Host-side NumPy port of the reference's FilterMutectCalls clustering
layer (deepmutect Mutect2Cpp-master/src/clustering/): a Dirichlet-
process mixture over tumor allele fractions with fixed components for
sequencing error, high-AF (germline-like/clonal), and background, plus
Chinese-restaurant-process sparse clusters learned by Gibbs sampling
(SomaticClusteringModel.cpp:17-254). Probability kernels follow
BetaBinomialCluster.cpp / BinomialCluster.cpp / SequencingError.cpp.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

LOG10 = math.log(10.0)

# SomaticClusteringModel.h:24-32
SEQUENCING_ERROR_INDEX = 0
HIGH_AF_INDEX = 1
BACKGROUND_INDEX = 2
OFFSET = 3
MAX_INDEL_SIZE_IN_PRIOR_MAP = 10
NUM_ITERATIONS = 5
INITIAL_HIGH_AF_WEIGHT = 0.01
INITIAL_BACKGROUND_WEIGHT = 0.01
CONCENTRATION = 0.5

# M2FiltersArgumentCollection.cpp:9-16
DEFAULT_LOG_INDEL_PRIOR = -7 * LOG10
DEFAULT_LOG_SNV_PRIOR = -6 * LOG10
DEFAULT_INITIAL_LOG_PRIOR_OF_VARIANT_VS_ARTIFACT = -1 * LOG10


def log1mexp(a: float) -> float:
    """log(1 - exp(a)) for a <= 0 (NaturalLogUtils)."""
    if a > 0:
        return math.nan
    if a == 0:
        return -math.inf
    if a < math.log(0.5):
        return math.log1p(-math.exp(a))
    return math.log(-math.expm1(a))


def log_sum_exp(xs) -> float:
    xs = np.asarray(xs, float)
    m = np.max(xs)
    if not np.isfinite(m):
        return float(m)
    return float(m + np.log(np.sum(np.exp(xs - m))))


def normalize_log(xs) -> np.ndarray:
    """Log-space normalize then exponentiate to linear probabilities."""
    xs = np.asarray(xs, float)
    return np.exp(xs - log_sum_exp(xs))


def digamma(x: float) -> float:
    """psi(x) via upward recurrence + asymptotic series."""
    r = 0.0
    while x < 6.0:
        r -= 1.0 / x
        x += 1.0
    f = 1.0 / (x * x)
    return r + math.log(x) - 0.5 / x - f * (
        1.0 / 12 - f * (1.0 / 120 - f * (1.0 / 252 - f * (1.0 / 240))))


def betaln(a: float, b: float) -> float:
    return math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)


def binom_coeff_log(n: int, k: int) -> float:
    if k < 0 or k > n:
        return -math.inf
    return (math.lgamma(n + 1) - math.lgamma(k + 1)
            - math.lgamma(n - k + 1))


def beta_binomial_log_prob(alpha: float, beta: float, n: int, k: int) -> float:
    """BetaBinomialDistribution.logProbability."""
    if k < 0 or k > n:
        return -math.inf
    return (binom_coeff_log(n, k) + betaln(k + alpha, n - k + beta)
            - betaln(alpha, beta))


def binomial_log_prob(n: int, p: float, k: int) -> float:
    if p <= 0:
        return 0.0 if k == 0 else -math.inf
    if p >= 1:
        return 0.0 if k == n else -math.inf
    return (binom_coeff_log(n, k) + k * math.log(p)
            + (n - k) * math.log1p(-p))


@dataclasses.dataclass
class Datum:
    """clustering/Datum.cpp."""

    tumor_log_odds: float     # natural log
    artifact_prob: float
    non_somatic_prob: float
    alt_count: int
    total_count: int
    indel_length: int

    @property
    def non_sequencing_error_prob(self) -> float:
        return 1.0 - (1.0 - self.artifact_prob) * (1.0 - self.non_somatic_prob)


FLAT_BETA = (1.0, 1.0)


def _log_odds_correction(original, new, alt: int, ref: int) -> float:
    """BetaBinomialCluster::logOddsCorrection."""
    return (-betaln(*new) + betaln(new[0] + alt, new[1] + ref)
            + betaln(*original) - betaln(original[0] + alt, original[1] + ref))


class SequencingErrorCluster:
    def log_likelihood_datum(self, d: Datum) -> float:
        return 0.0   # SequencingError.cpp:8


class BetaBinomialCluster:
    """BetaBinomialCluster.cpp; gradient-ascent learn (RATE=0.01, 10 epochs)."""

    RATE = 0.01
    NUM_EPOCHS = 10

    def __init__(self, alpha: float, beta: float):
        self.alpha = alpha
        self.beta = beta

    def log_likelihood_datum(self, d: Datum) -> float:
        alt = d.alt_count
        ref = d.total_count - alt
        return d.tumor_log_odds + _log_odds_correction(
            FLAT_BETA, (self.alpha, self.beta), alt, ref)

    def log_likelihood(self, total: int, alt: int) -> float:
        return beta_binomial_log_prob(self.alpha, self.beta, total, alt)

    def learn(self, data):
        a, b = self.alpha, self.beta
        for _ in range(self.NUM_EPOCHS):
            for d in data:
                alt = d.alt_count
                ref = d.total_count - alt
                dt = digamma(d.total_count + a + b)
                dab = digamma(a + b)
                ga = digamma(a + alt) - dt - digamma(a) + dab
                gb = digamma(b + ref) - dt - digamma(b) + dab
                a = max(a + self.RATE * ga, 0.5)
                b = max(b + self.RATE * gb, 0.5)
        self.alpha, self.beta = a, b


class BinomialCluster:
    """BinomialCluster.cpp: fuzzy binomial at a learned allele fraction."""

    STD_DEV_OVER_MEAN = 0.01

    def __init__(self, mean: float):
        self._set_fuzzy(mean)

    def _set_fuzzy(self, unbounded_mean: float):
        mean = min(unbounded_mean, 1 - self.STD_DEV_OVER_MEAN)
        apb = ((1 - mean) / (mean * self.STD_DEV_OVER_MEAN ** 2)) - 1
        self.alpha = mean * apb
        self.beta = apb - self.alpha

    def log_likelihood_datum(self, d: Datum) -> float:
        alt = d.alt_count
        ref = d.total_count - alt
        return d.tumor_log_odds + _log_odds_correction(
            FLAT_BETA, (self.alpha, self.beta), alt, ref)

    def log_likelihood(self, total: int, alt: int) -> float:
        return beta_binomial_log_prob(self.alpha, self.beta, total, alt)

    def learn(self, data):
        alt = 0.0001
        total = 0.0001
        for d in data:
            alt += d.alt_count
            total += d.total_count
        self._set_fuzzy(alt / total)


class SomaticClusteringModel:
    """SomaticClusteringModel.cpp."""

    REGULARIZING_PSEUDOCOUNT = 1.0

    def __init__(self, log_snv_prior=DEFAULT_LOG_SNV_PRIOR,
                 log_indel_prior=DEFAULT_LOG_INDEL_PRIOR, seed=47382911):
        self.rng = np.random.default_rng(seed)
        self.log_variant_vs_artifact_prior = \
            DEFAULT_INITIAL_LOG_PRIOR_OF_VARIANT_VS_ARTIFACT
        self.total_sparse_cluster_count = 0
        self.first_pass = True
        self.log_high_af_weight = math.log(INITIAL_HIGH_AF_WEIGHT)
        self.log_background_weight = math.log(INITIAL_BACKGROUND_WEIGHT)
        self.log_sparse_clusters_weight = log1mexp(log_sum_exp(
            [self.log_high_af_weight, self.log_background_weight]))
        self.log_variant_priors = {
            i: log_indel_prior
            for i in range(-MAX_INDEL_SIZE_IN_PRIOR_MAP,
                           MAX_INDEL_SIZE_IN_PRIOR_MAP + 1)}
        self.log_variant_priors[0] = log_snv_prior
        self.clusters = [SequencingErrorCluster(),
                         BetaBinomialCluster(10, 1),      # high-AF
                         BetaBinomialCluster(1, 1)]       # background
        self.cluster_counts = []
        self.cluster_assignments = []
        self.data = []
        self.callable_sites = None

    # -- priors ------------------------------------------------------------
    def log_prior_of_somatic_variant(self, indel_length: int) -> float:
        if indel_length not in self.log_variant_priors:
            self.log_variant_priors[indel_length] = \
                min(self.log_variant_priors.values())
        return self.log_variant_priors[indel_length] + \
            (math.log(1.0 / 3) if indel_length == 0 else 0.0)

    @property
    def log_prior_of_variant_versus_artifact(self) -> float:
        return self.log_variant_vs_artifact_prior

    def _log_crp_weight(self, cluster_index: int) -> float:
        num = CONCENTRATION if cluster_index == len(self.clusters) \
            else self.cluster_counts[cluster_index]
        den = self.total_sparse_cluster_count + CONCENTRATION
        return math.log(max(num, 1e-300) / den)

    # -- posteriors --------------------------------------------------------
    def cluster_probabilities(self, d: Datum) -> np.ndarray:
        log_variant_prior = self.log_prior_of_somatic_variant(d.indel_length)
        log_no_variant_prior = log1mexp(log_variant_prior)
        nc = len(self.clusters)
        post = np.zeros(nc + 1)
        for i in range(nc + 1):
            ll = self.clusters[i].log_likelihood_datum(d) if i < nc \
                else BetaBinomialCluster(*FLAT_BETA).log_likelihood_datum(d)
            if i == SEQUENCING_ERROR_INDEX:
                post[i] = log_no_variant_prior + ll
            elif i == HIGH_AF_INDEX:
                post[i] = log_variant_prior + self.log_high_af_weight + ll
            elif i == BACKGROUND_INDEX:
                post[i] = log_variant_prior + self.log_background_weight + ll
            else:
                post[i] = log_variant_prior + self.log_sparse_clusters_weight \
                    + self._log_crp_weight(i) + ll
        return normalize_log(post)

    def probability_of_sequencing_error(self, d: Datum) -> float:
        return float(self.cluster_probabilities(d)[SEQUENCING_ERROR_INDEX])

    def log_likelihood_given_somatic(self, total: int, alt: int) -> float:
        lls = []
        for i in range(len(self.clusters)):
            if i == SEQUENCING_ERROR_INDEX:
                continue
            ll = self.clusters[i].log_likelihood(total, alt)
            if i == HIGH_AF_INDEX:
                lls.append(self.log_high_af_weight + ll)
            elif i == BACKGROUND_INDEX:
                lls.append(self.log_background_weight + ll)
            else:
                lls.append(self.log_sparse_clusters_weight
                           + self._log_crp_weight(i) + ll)
        return log_sum_exp(lls)

    # -- accumulation + Gibbs learning ------------------------------------
    def record(self, tumor_ads, tumor_log_odds, artifact_prob,
               non_somatic_prob, indel_lengths):
        """tumor_ads: [ref, alt1, ...]; tumor_log_odds natural-log per alt."""
        total = int(np.sum(tumor_ads))
        for i, lod in enumerate(tumor_log_odds):
            self.data.append(Datum(lod, artifact_prob, non_somatic_prob,
                                   int(tumor_ads[i + 1]), total,
                                   int(indel_lengths[i])))

    def learn_and_clear_accumulated_data(self):
        if self.first_pass:
            self.cluster_assignments = [None] * len(self.data)
            self.cluster_counts = [0] * len(self.clusters)
        elif len(self.cluster_assignments) != len(self.data):
            # defensive resize (the reference assumes equal pass sizes):
            # release the old assignments' count contributions first
            for a in self.cluster_assignments:
                if a is not None:
                    self.cluster_counts[a] -= 1
                    if a >= OFFSET:
                        self.total_sparse_cluster_count -= 1
            self.cluster_assignments = [None] * len(self.data)

        for _ in range(NUM_ITERATIONS):
            for di in range(len(self.data)):
                d = self._pop_datum(di)
                if self.rng.random() < d.non_sequencing_error_prob:
                    continue
                probs = self.cluster_probabilities(d)
                u = self.rng.random()
                ci = 0
                s = 0.0
                while s < u and ci < len(probs):
                    s += probs[ci]
                    ci += 1
                self._assign_datum(di, max(ci - 1, 0))
            self._prune_empty_clusters()
            by_cluster = [[] for _ in self.clusters]
            for i, a in enumerate(self.cluster_assignments):
                if a is not None:
                    by_cluster[a].append(self.data[i])
            for c, dd in zip(self.clusters, by_cluster):
                if hasattr(c, "learn"):
                    c.learn(dd)
            self._learn_weights_and_priors()
        self.first_pass = False
        self.data = []

    def _pop_datum(self, di):
        a = self.cluster_assignments[di]
        if a is not None:
            self.cluster_counts[a] -= 1
            if a >= OFFSET:
                self.total_sparse_cluster_count -= 1
        self.cluster_assignments[di] = None
        return self.data[di]

    def _assign_datum(self, di, ci):
        d = self.data[di]
        if ci == len(self.clusters):
            u = self.rng.random()
            # quantile of Beta(alt+1, ref+1) via inverse-cdf bisection
            a, b = d.alt_count + 1, d.total_count - d.alt_count + 1
            new_af = _beta_quantile(a, b, u)
            self.clusters.append(BinomialCluster(max(new_af, 1e-3)))
            self.cluster_counts.append(0)
        if ci >= OFFSET:
            self.total_sparse_cluster_count += 1
        self.cluster_assignments[di] = ci
        self.cluster_counts[ci] += 1

    def _prune_empty_clusters(self):
        old_to_new = {i: i for i in range(OFFSET)}
        new_clusters = self.clusters[:OFFSET]
        new_counts = self.cluster_counts[:OFFSET]
        for old in range(OFFSET, len(self.clusters)):
            if self.cluster_counts[old] > 0:
                old_to_new[old] = len(new_clusters)
                new_clusters.append(self.clusters[old])
                new_counts.append(self.cluster_counts[old])
        self.clusters = new_clusters
        self.cluster_counts = new_counts
        self.cluster_assignments = [
            old_to_new.get(a) if a is not None else None
            for a in self.cluster_assignments]

    def _learn_weights_and_priors(self):
        p = self.REGULARIZING_PSEUDOCOUNT
        total_variants = (self.cluster_counts[HIGH_AF_INDEX]
                          + self.cluster_counts[BACKGROUND_INDEX]
                          + self.total_sparse_cluster_count + p)
        # NOTE: reference has (p + high/total) vs ((p + bg)/total) asymmetry
        # at SomaticClusteringModel.cpp:223-225 — an upstream bug we do NOT
        # reproduce; both use (p + count)/total.
        self.log_high_af_weight = math.log(
            (p + self.cluster_counts[HIGH_AF_INDEX]) / total_variants)
        self.log_background_weight = math.log(
            (p + self.cluster_counts[BACKGROUND_INDEX]) / total_variants)
        self.log_sparse_clusters_weight = math.log(
            (p + self.total_sparse_cluster_count) / total_variants)

        lengths = [self.data[i].indel_length
                   for i, a in enumerate(self.cluster_assignments)
                   if (a or 0) != 0]
        counts = {}
        for ln in lengths:
            counts[ln] = counts.get(ln, 0) + 1
        technical = sum(d.artifact_prob for d in self.data)
        if self.callable_sites is not None:
            for i in range(-MAX_INDEL_SIZE_IN_PRIOR_MAP,
                           MAX_INDEL_SIZE_IN_PRIOR_MAP + 1):
                ratio = counts.get(i, 0) / self.callable_sites
                floor = 1.0e-8 if i == 0 else 1.0e-9
                self.log_variant_priors[i] = math.log(max(ratio, floor))
        variant_count = sum(counts.values())
        self.log_variant_vs_artifact_prior = math.log(
            (variant_count + p) / (variant_count + technical + 2 * p))


def _beta_quantile(a: float, b: float, q: float) -> float:
    """Inverse CDF of Beta(a, b) by bisection on the regularized
    incomplete beta (sufficient accuracy for cluster seeding)."""
    lo, hi = 0.0, 1.0
    for _ in range(60):
        mid = 0.5 * (lo + hi)
        if _beta_cdf(a, b, mid) < q:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def _beta_cdf(a: float, b: float, x: float) -> float:
    if x <= 0:
        return 0.0
    if x >= 1:
        return 1.0
    lbeta = betaln(a, b)
    front = math.exp(a * math.log(x) + b * math.log1p(-x) - lbeta)
    # continued fraction (Numerical Recipes betacf)
    if x < (a + 1) / (a + b + 2):
        return front * _betacf(a, b, x) / a
    return 1.0 - math.exp(b * math.log1p(-x) + a * math.log(x) - lbeta) \
        * _betacf(b, a, 1 - x) / b


def _betacf(a: float, b: float, x: float) -> float:
    MAXIT, EPS, FPMIN = 200, 3e-12, 1e-300
    qab, qap, qam = a + b, a + 1, a - 1
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < EPS:
            break
    return h
