"""Activity profiling: per-position active log-odds + region extraction.

Transcribes the reference's activity path (deepmutect Mutect2Cpp-master):
  * altQuals / indelQual / isNextToUsefulSoftClip  Mutect2Engine.cpp:91-129
  * logLikelihoodRatio (digamma + beta-entropy)    Mutect2Engine.cpp:129-150
  * isActive thresholding + normal check           Mutect2Engine.cpp:58-88
  * BandPassActivityProfile smoothing + region pop (BandPassActivityProfile)

Pileup statistics are bulk array work; the per-position log-odds is
computed vectorized over all positions of a region at once (the device
analogue of the per-pileup loop).
"""

from __future__ import annotations

import dataclasses

import numpy as np
from scipy import special as sps

MINIMUM_BASE_QUALITY = 6           # Mutect2Engine.h
DEFAULT_INITIAL_LOG_ODDS = 2.0     # M2ArgumentCollection initialLogOdds
MAX_PROB_PROPAGATION_DISTANCE = 50
ACTIVE_PROB_THRESHOLD = 0.002
GAUSSIAN_KERNEL_SIZE = 50
SIGMA = 17.0                       # BandPassActivityProfile sigma


def qual_to_error_prob(q):
    return 10.0 ** (np.asarray(q, np.float64) / -10.0)


def log_likelihood_ratio(n_ref, alt_quals, repeat_factor: int = 1):
    """Mutect2Engine::logLikelihoodRatio (Mutect2Engine.cpp:133-150)."""
    alt_quals = np.asarray(alt_quals, np.float64)
    n_alt = repeat_factor * len(alt_quals)
    n = n_ref + n_alt
    f_tilde_ratio = np.exp(sps.digamma(n_ref + 1) - sps.digamma(n_alt + 1))
    beta_entropy = np.log(10) * (
        -log10_factorial(n + 1) + log10_factorial(n_alt) +
        log10_factorial(n_ref))
    eps = qual_to_error_prob(alt_quals)
    z_bar = (1 - eps) / (1 - eps + eps * f_tilde_ratio)
    log_eps = np.log(eps)
    log_one_minus = np.log1p(-eps)
    read_sum = np.sum(z_bar * (log_one_minus - log_eps) +
                      bernoulli_entropy(z_bar))
    return beta_entropy + read_sum * repeat_factor


def log10_factorial(n):
    return sps.gammaln(np.asarray(n, np.float64) + 1) / np.log(10)


def log_likelihood_ratio_batch(n_ref, flat_quals, seg_ids, n_pos):
    """Vectorized log_likelihood_ratio over many pileup positions:
    n_ref int[n_pos]; flat_quals/seg_ids are all positions' alt quals
    flattened with their position index. Returns float64[n_pos]."""
    n_ref = np.asarray(n_ref, np.float64)
    seg_ids = np.asarray(seg_ids)
    n_alt = np.bincount(seg_ids, minlength=n_pos).astype(np.float64)
    n = n_ref + n_alt
    f_tilde = np.exp(sps.digamma(n_ref + 1) - sps.digamma(n_alt + 1))
    beta_entropy = np.log(10) * (
        -log10_factorial(n + 1) + log10_factorial(n_alt) +
        log10_factorial(n_ref))
    eps = qual_to_error_prob(np.asarray(flat_quals, np.float64))
    ft = f_tilde[seg_ids]
    z_bar = (1 - eps) / (1 - eps + eps * ft)
    terms = z_bar * (np.log1p(-eps) - np.log(eps)) + bernoulli_entropy(z_bar)
    read_sum = np.bincount(seg_ids, weights=terms, minlength=n_pos)
    return beta_entropy + read_sum


def bernoulli_entropy(p):
    p = np.clip(p, 1e-12, 1 - 1e-12)
    return -(p * np.log(p) + (1 - p) * np.log1p(-p))


@dataclasses.dataclass
class Pileup:
    """Columnar pileup over a region [start, end) of one contig.

    depth[i]: reads covering position start+i
    alt_quals: SPARSE dict {i: [quals]} of alt evidence (the reference's
    altQuals); only ~error-rate of covered positions have entries, and a
    dense per-position list costs O(region) python allocations.
    """

    start: int
    depth: np.ndarray
    alt_quals: dict


def build_pileup(reads, start: int, end: int, ref_codes: np.ndarray,
                 ref_start: int, pcr_error_qual: int = 40) -> Pileup:
    """reads: list of dicts with pos (0-based), cigar [(op, len)],
    seq_codes (int array), quals (int array), mate_start (or None),
    properly_paired (bool). Implements altQuals semantics
    (Mutect2Engine.cpp:91-113), vectorized per cigar op: depth via a
    difference array, alt candidates via array compares — per-base
    python only where evidence exists."""
    n = end - start
    ddiff = np.zeros(n + 1, np.int64)
    alt_quals: dict[int, list] = {}

    def add_alt(i, q):
        alt_quals.setdefault(i, []).append(q)

    for rd in reads:
        pos = rd["pos"]
        qpos = 0
        rpos = pos
        cig = rd["cigar"]
        seq = np.asarray(rd["seq_codes"])
        quals = np.asarray(rd["quals"])
        rlen = len(seq)
        ms = rd.get("mate_start")
        overlap_cap = ms is not None and rd.get("properly_paired")
        for ci, (op, ln) in enumerate(cig):
            if op in (0, 7, 8):          # M/=/X: aligned
                lo = max(rpos, start)
                hi = min(rpos + ln, end)
                if lo < hi:
                    ddiff[lo - start] += 1
                    ddiff[hi - start] -= 1
                    toff = lo - rpos
                    cnt = hi - lo
                    qseg = quals[qpos + toff:qpos + toff + cnt]
                    sseg = seq[qpos + toff:qpos + toff + cnt]
                    r0 = lo - ref_start
                    rseg = np.full(cnt, 4, np.int64)
                    c0 = max(r0, 0)
                    c1 = min(r0 + cnt, len(ref_codes))
                    if c0 < c1:
                        rseg[c0 - r0:c1 - r0] = ref_codes[c0:c1]
                    special = np.zeros(cnt, bool)
                    # indel immediately following the op's last base
                    if rpos + ln - 1 >= lo and rpos + ln - 1 < hi and \
                            ci + 1 < len(cig) and cig[ci + 1][0] in (1, 2):
                        t = rpos + ln - 1 - lo
                        ind_len = cig[ci + 1][1]
                        add_alt(lo - start + t,
                                min(30 + (ind_len - 1) * 10, 127))
                        special[t] = True
                    # next to a useful soft clip
                    for tpos, cond in ((rpos + ln - 1,
                                        ci + 1 < len(cig)
                                        and cig[ci + 1][0] == 4),
                                       (rpos,
                                        ci > 0 and cig[ci - 1][0] == 4)):
                        if cond and lo <= tpos < hi:
                            t = tpos - lo
                            if not special[t] and \
                                    int(qseg[t]) > MINIMUM_BASE_QUALITY:
                                add_alt(lo - start + t, 30)
                            special[t] = True
                    mism = (~special) & (sseg != rseg) & \
                        (qseg > MINIMUM_BASE_QUALITY)
                    if mism.any():
                        ps = lo + np.flatnonzero(mism)
                        for p in ps:
                            q = int(quals[qpos + (p - rpos)])
                            if overlap_cap and ms <= p < ms + rlen:
                                q = min(q, pcr_error_qual // 2)
                            add_alt(p - start, q)
                qpos += ln
                rpos += ln
            elif op == 1:                # I consumes query
                qpos += ln
            elif op in (2, 3):           # D/N consume ref
                lo = max(rpos, start)
                hi = min(rpos + ln, end)
                if lo < hi:
                    ddiff[lo - start] += 1
                    ddiff[hi - start] -= 1
                rpos += ln
            elif op == 4:                # S consumes query
                qpos += ln
    depth = np.cumsum(ddiff[:n])
    return Pileup(start=start, depth=depth, alt_quals=alt_quals)


def activity_probs(pileup: Pileup,
                   initial_log_odds: float = DEFAULT_INITIAL_LOG_ODDS,
                   normal_pileup: Pileup | None = None) -> np.ndarray:
    """isActive over every position (Mutect2Engine.cpp:58-88) -> 0/1."""
    n = len(pileup.depth)
    out = np.zeros(n)
    items = [(i, aq) for i, aq in pileup.alt_quals.items() if aq]
    if not items:
        return out
    pos = np.array([i for i, _ in items])
    n_alt = np.array([len(aq) for _, aq in items])
    n_ref = pileup.depth[pos] - n_alt
    flat = np.concatenate([np.asarray(aq, np.float64) for _, aq in items])
    seg = np.repeat(np.arange(len(items)), n_alt)
    llr = log_likelihood_ratio_batch(n_ref, flat, seg, len(items))
    active = llr >= initial_log_odds
    for t in np.flatnonzero(active):
        i = int(pos[t])
        if normal_pileup is not None:
            naq = normal_pileup.alt_quals.get(i, [])
            nd = int(normal_pileup.depth[i])
            if len(naq) > nd * 0.3 and sum(naq) > 100:
                continue
        out[i] = 1.0
    return out


def band_pass_smooth(probs: np.ndarray, sigma: float = SIGMA,
                     max_size: int = GAUSSIAN_KERNEL_SIZE) -> np.ndarray:
    """BandPassActivityProfile: Gaussian kernel spread of raw activity,
    kernel truncated at max_size and normalized like the reference."""
    x = np.arange(-max_size, max_size + 1)
    kern = np.exp(-(x ** 2) / (2.0 * sigma * sigma))
    kern = kern / kern.sum()
    return np.convolve(probs, kern, mode="same")


@dataclasses.dataclass
class AssemblyRegion:
    start: int          # region span (0-based, half open)
    end: int
    padded_start: int
    padded_end: int
    is_active: bool


def pop_assembly_regions(probs: np.ndarray, region_start: int,
                         min_size: int = 50, max_size: int = 300,
                         padding: int = 100,
                         threshold: float = ACTIVE_PROB_THRESHOLD,
                         contig_len: int | None = None):
    """ActivityProfile::popReadyAssemblyRegions semantics: alternating
    active/inactive runs, active runs cut at local prob minima when
    longer than max_size."""
    out = []
    n = len(probs)
    i = 0
    while i < n:
        active = probs[i] > threshold
        j = i
        while j < n and (probs[j] > threshold) == active:
            j += 1
        seg_start, seg_end = i, j
        while seg_start < seg_end:
            size = seg_end - seg_start
            if active and size > max_size:
                # cut at the minimum within [min_size, max_size)
                win = probs[seg_start + min_size:seg_start + max_size]
                cut = int(np.argmin(win)) + min_size if len(win) else max_size
                piece_end = seg_start + cut
            else:
                piece_end = seg_end
            a, b = region_start + seg_start, region_start + piece_end
            pa = max(a - padding, 0)
            pb = b + padding
            if contig_len is not None:
                pb = min(pb, contig_len)
                b = min(b, contig_len)
            out.append(AssemblyRegion(start=a, end=b, padded_start=pa,
                                      padded_end=pb, is_active=bool(active)))
            seg_start = piece_end
        i = j
    return out
