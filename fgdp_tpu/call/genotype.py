"""Somatic genotyping: haplotype events -> allele likelihoods -> calls.

Transcribes the reference's genotyping core:
  * event extraction from haplotype-vs-ref alignments (EventMap role)
  * haplotype -> allele likelihood marginalization
    (AlleleLikelihoods::marginalize; SomaticGenotypeEngine.cpp)
  * SomaticLikelihoodsEngine.logEvidence — Dirichlet variational EM with
    the allele-fraction threshold ibeta term
    (SomaticLikelihoodsEngine.cpp:12-80)
  * somaticLogOdds: logEvidence(all) - logEvidence(without allele)
"""

from __future__ import annotations

import dataclasses

import numpy as np
from scipy import special as sps

from ..align.finalize import ksw_global

CONVERGENCE_THRESHOLD = 0.001       # SomaticLikelihoodsEngine.h


@dataclasses.dataclass
class Event:
    pos: int          # 0-based ref position (of the base before, for indels)
    ref: str
    alt: str


def haplotype_cigar(hap, ref, opt=None):
    """Haplotype→region-reference global cigar (CigarUtils::
    calculateCigar role)."""
    from ..config import AlignConfig
    opt = opt or AlignConfig()
    mat = opt.score_matrix()
    _, cigar = ksw_global(hap, ref, opt.o_del, opt.e_del, opt.o_ins,
                          opt.e_ins, max(len(hap), len(ref)), mat)
    return cigar


def haplotype_events(hap, ref, ref_start: int, opt=None, cigar=None):
    """Align haplotype to the region reference and extract variant events
    (SNVs, insertions, deletions) in VCF-style coordinates. Pass a
    precomputed haplotype_cigar to skip the alignment."""
    if cigar is None:
        cigar = haplotype_cigar(hap, ref, opt)
    events = []
    x = y = 0            # x: hap, y: ref
    bases = "ACGTN"
    for op, ln in cigar:
        if op == 0:
            for t in range(ln):
                if hap[x + t] != ref[y + t]:
                    events.append(Event(pos=ref_start + y + t,
                                        ref=bases[ref[y + t]],
                                        alt=bases[hap[x + t]]))
            x += ln
            y += ln
        elif op == 1:     # insertion (hap has extra)
            if y > 0:
                anchor = bases[ref[y - 1]]
                ins = "".join(bases[b] for b in hap[x:x + ln])
                events.append(Event(pos=ref_start + y - 1, ref=anchor,
                                    alt=anchor + ins))
            x += ln
        elif op == 2:     # deletion
            if y > 0:
                anchor = bases[ref[y - 1]]
                dele = "".join(bases[b] for b in ref[y:y + ln])
                events.append(Event(pos=ref_start + y - 1,
                                    ref=anchor + dele, alt=anchor))
            y += ln
    return events


def log_dirichlet_normalization(alpha):
    alpha = np.asarray(alpha, np.float64)
    return sps.gammaln(alpha.sum()) - sps.gammaln(alpha).sum()


def allele_fractions_posterior(log_likelihoods, prior_pseudocounts):
    """Variational EM (SomaticLikelihoodsEngine.cpp:56-80).
    log_likelihoods: [A, R] natural-log read likelihoods per allele."""
    ll = np.asarray(log_likelihoods, np.float64)
    A = ll.shape[0]
    post = np.ones(A)
    for _ in range(100):
        logw = sps.digamma(post) - sps.digamma(post.sum())
        z = ll + logw[:, None]
        z = np.exp(z - sps.logsumexp(z, axis=0, keepdims=True))
        counts = z.sum(axis=1)
        new = counts + np.asarray(prior_pseudocounts, np.float64)
        if np.abs(new - post).sum() < CONVERGENCE_THRESHOLD:
            post = new
            break
        post = new
    return post


def log_evidence(log_likelihoods, min_af=0.0, non_ref_index=-1,
                 prior_pseudocounts=None):
    """SomaticLikelihoodsEngine::logEvidence (cpp:12-54)."""
    ll = np.asarray(log_likelihoods, np.float64)
    A, R = ll.shape
    prior = np.ones(A) if prior_pseudocounts is None else \
        np.asarray(prior_pseudocounts, np.float64)
    post = allele_fractions_posterior(ll, prior)
    prior_contrib = log_dirichlet_normalization(prior)
    post_contrib = -log_dirichlet_normalization(post)
    if non_ref_index > 0:
        total = post.sum()
        a = post[non_ref_index]
        tail = 1.0 - sps.betainc(a, total - a, min_af)
        post_contrib += np.log(max(tail, 1e-300))
    logw = sps.digamma(post) - sps.digamma(post.sum())
    z = ll + logw[:, None]
    resp = np.exp(z - sps.logsumexp(z, axis=0, keepdims=True))
    # reference cutoffs: xLogx(x) = 0 below 1e-8 (.cpp:113-115) and the
    # likelihood term skips responsibilities < 1e-10 (.cpp:125,
    # NEGLIGIBLE_RESPONSIBILITY)
    xlogx = np.where(resp >= 1e-8,
                     resp * np.log(np.maximum(resp, 1e-300)), 0.0)
    lik_term = np.where(resp >= 1e-10, resp * ll, 0.0)
    contrib = lik_term.sum() - xlogx.sum()
    return prior_contrib + post_contrib + contrib


def somatic_log_odds(log_matrix):
    """SomaticGenotypeEngine::somaticLogOdds: per alt allele a,
    logEvidence(all alleles) - logEvidence(without a). log_matrix: [A, R]
    with row 0 = ref. Returns array [A-1] of natural-log odds."""
    ll = np.asarray(log_matrix, np.float64)
    A = ll.shape[0]
    if ll.shape[1] == 0:
        return np.full(A - 1, -np.inf)
    full = log_evidence(ll)
    out = np.zeros(A - 1)
    for a in range(1, A):
        rows = [i for i in range(A) if i != a]
        without = log_evidence(ll[rows])
        out[a - 1] = full - without
    return out


def diploid_alt_log_odds(log_matrix):
    """SomaticGenotypeEngine::diploidAltLogOdds (.cpp:304-326): natural-log
    odds of hom-ref over het in a (normal) sample. log_matrix: [2, R]
    natural-log, row 0 = ref. hom-ref likelihood = sum of ref-row; het
    likelihood per read = logSumExp(ref, alt) + ln(1/2)."""
    m = np.asarray(log_matrix, np.float64)
    if m.shape[1] == 0:
        return 0.0
    hom_ref = m[0].sum()
    het = np.logaddexp(m[0], m[1]).sum() + m.shape[1] * np.log(0.5)
    return hom_ref - het


def effective_counts(log_matrix):
    """SomaticGenotypeEngine::getEffectiveCounts: per-allele sums of the
    per-read softmax responsibilities. log_matrix: [A, R] natural log.
    Returns float[A]."""
    m = np.asarray(log_matrix, np.float64)
    if m.shape[1] == 0:
        return np.zeros(m.shape[0])
    z = np.exp(m - sps.logsumexp(m, axis=0, keepdims=True))
    return z.sum(axis=1)


# AlleleLikelihoods::NATURAL_LOG_INFORMATIVE_THRESHOLD
# (LOG_10_INFORMATIVE_THRESHOLD = 0.2, DepthPerSampleHC.cpp:7)
INFORMATIVE_THRESHOLD = 0.2 * np.log(10.0)


def best_alleles(log_matrix):
    """AlleleLikelihoods::bestAllelesBreakingTies over a [2, R] natural-log
    matrix (row 0 = ref; ties break to ref). Returns (best_is_alt bool[R],
    informative bool[R]) where informative = best - second > 0.2*ln10."""
    m = np.asarray(log_matrix, np.float64)
    best_alt = m[1] > m[0]
    informative = np.abs(m[1] - m[0]) > INFORMATIVE_THRESHOLD
    return best_alt, informative


def allele_fraction_posterior_mean(log_matrix):
    """addGenotypes' AF (SomaticGenotypeEngine.cpp:363-369): normalized
    Dirichlet posterior (flat prior 1.0) mean of the ALT fraction.
    log_matrix: [2, R] natural log, row 0 = ref."""
    m = np.asarray(log_matrix, np.float64)
    if m.shape[1] == 0:
        return 0.5
    post = allele_fractions_posterior(m, np.ones(m.shape[0]))
    return float(post[1] / post.sum())


def marginalize_to_alleles(hap_liks, hap_has_alt, hap_spans):
    """AlleleLikelihoods::marginalize: read x allele log-likelihood =
    max over haplotypes carrying that allele. hap_liks: [H, R] log10;
    hap_has_alt: bool[H]; hap_spans: bool[H] haplotype overlaps the event.
    Returns [2, R] natural-log (ref row first)."""
    hl = np.asarray(hap_liks, np.float64) * np.log(10)   # log10 -> ln
    ref_rows = ~np.asarray(hap_has_alt) & np.asarray(hap_spans)
    alt_rows = np.asarray(hap_has_alt)
    neg = np.full(hl.shape[1], -1e300)
    ref_l = hl[ref_rows].max(axis=0) if ref_rows.any() else neg
    alt_l = hl[alt_rows].max(axis=0) if alt_rows.any() else neg
    return np.stack([ref_l, alt_l])
