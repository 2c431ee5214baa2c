"""Mutect2-style somatic calling engine (region loop).

Mirrors the reference's callRegion flow (deepmutect Mutect2Cpp-master/
src/Mutect2Engine.cpp:168-244 and main.cpp region scheduler): activity
profile -> assembly regions -> local assembly -> PairHMM likelihoods
(device, ops/pairhmm.py) -> somatic genotyping -> VCF records.

Round-1 scope: tumor(+optional normal) calling with emission-threshold
and germline/weak-evidence filters; BQSR, the CNN gate, the full
FilterMutectCalls pass set and clustering are not yet ported.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..config import CallConfig
from ..ops import pairhmm
from . import activity, assembly, genotype

LOG10 = np.log(10.0)
DEFAULT_EMISSION_LOG10_ODDS = 3.0     # M2ArgumentCollection emissionLod
DEFAULT_NORMAL_LOG10_ODDS = 2.2
DEFAULT_GCP = 10
DEFAULT_INDEL_QUAL = 45              # GATK default ins/del qual


@dataclasses.dataclass
class VariantCall:
    contig: str
    pos: int          # 0-based
    ref: str
    alt: str
    tlod: float       # log10 tumor odds
    nlod: float | None
    depth: int
    ad_ref: int
    ad_alt: int
    af: float
    filters: tuple


def _reads_for_span(reads, start, end):
    out = []
    for rd in reads:
        rlen = sum(ln for op, ln in rd["cigar"] if op in (0, 2, 3, 7, 8))
        if rd["pos"] < end and rd["pos"] + max(rlen, 1) > start:
            out.append(rd)
    return out


def _pairhmm_matrix(reads, haps):
    """log10 likelihood matrix [H, R] via the device PairHMM.

    Identical (bases, quals) reads share one computed column — the
    reference's read dedup (VectorLoglessPairHMM.cpp:53-114)."""
    H = len(haps)
    R = len(reads)
    if H == 0 or R == 0:
        return np.zeros((H, R))
    keys = {}
    rep = []          # unique read indices
    col_of = np.zeros(R, np.int64)
    for i, rd in enumerate(reads):
        k = (rd["seq_codes"].tobytes(), np.asarray(rd["quals"]).tobytes())
        if k in keys:
            col_of[i] = keys[k]
        else:
            keys[k] = len(rep)
            col_of[i] = len(rep)
            rep.append(i)
    if len(rep) < R:
        uniq = _pairhmm_matrix([reads[i] for i in rep], haps)
        return uniq[:, col_of]
    rmax = max(len(r["seq_codes"]) for r in reads)
    hmax = max(len(h) for h in haps)
    NP = H * R
    r_arr = np.zeros((NP, rmax), np.int32)
    h_arr = np.zeros((NP, hmax), np.int32)
    rlens = np.zeros(NP, np.int32)
    hlens = np.zeros(NP, np.int32)
    q = np.zeros((NP, rmax), np.int32)
    iq = np.full((NP, rmax), DEFAULT_INDEL_QUAL, np.int32)
    dq = np.full((NP, rmax), DEFAULT_INDEL_QUAL, np.int32)
    cq = np.full((NP, rmax), DEFAULT_GCP, np.int32)
    p = 0
    for h in haps:
        for rd in reads:
            n = len(rd["seq_codes"])
            r_arr[p, :n] = rd["seq_codes"]
            q[p, :n] = rd["quals"]
            rlens[p] = n
            h_arr[p, :len(h)] = h
            hlens[p] = len(h)
            p += 1
    liks = pairhmm.compute_log_likelihoods(r_arr, rlens, q, iq, dq, cq,
                                           h_arr, hlens)
    return liks.reshape(H, R)


class Mutect2Engine:
    def __init__(self, ref_codes, contig_name, cfg: CallConfig | None = None,
                 emission_log10_odds=DEFAULT_EMISSION_LOG10_ODDS,
                 normal_log10_odds=DEFAULT_NORMAL_LOG10_ODDS,
                 cnn_model_path=None):
        self.ref = np.asarray(ref_codes, np.uint8)
        self.contig = contig_name
        self.cfg = cfg or CallConfig()
        self.emission = emission_log10_odds
        self.normal_odds = normal_log10_odds
        self.cnn = None
        if cnn_model_path:
            from .cnn_filter import CnnFilter
            self.cnn = CnnFilter(cnn_model_path)

    def call(self, tumor_reads, normal_reads=()):
        """tumor_reads/normal_reads: list of dicts (pos, cigar, seq_codes,
        quals, mate_start, properly_paired). Returns list[VariantCall]."""
        cfg = self.cfg
        n = len(self.ref)
        calls = []
        for rstart in range(0, n, cfg.region_size):
            rend = min(rstart + cfg.region_size, n)
            t_reads = _reads_for_span(tumor_reads, rstart, rend)
            if not t_reads:
                continue
            n_reads = _reads_for_span(normal_reads, rstart, rend)
            tp = activity.build_pileup(t_reads, rstart, rend, self.ref, 0,
                                       cfg.pcr_error_qual)
            np_ = activity.build_pileup(n_reads, rstart, rend, self.ref, 0,
                                        cfg.pcr_error_qual) \
                if n_reads else None
            probs = activity.activity_probs(tp, normal_pileup=np_)
            smooth = activity.band_pass_smooth(probs)
            regions = activity.pop_assembly_regions(
                smooth, rstart, cfg.min_assembly_region_size,
                cfg.max_assembly_region_size, cfg.assembly_region_padding,
                contig_len=n)
            for reg in regions:
                if not reg.is_active:
                    continue
                calls.extend(self._call_region(reg, tumor_reads,
                                               normal_reads))
        calls.sort(key=lambda c: c.pos)
        return calls

    def _call_region(self, reg, tumor_reads, normal_reads):
        cfg = self.cfg
        span = (reg.padded_start, reg.padded_end)
        ref_seg = self.ref[span[0]:span[1]].astype(np.uint8)
        t_reads = _reads_for_span(tumor_reads, *span)
        n_reads = _reads_for_span(normal_reads, *span)
        if not t_reads:
            return []
        haps = assembly.assemble_region(ref_seg, t_reads + n_reads,
                                        kmer_sizes=cfg.kmer_sizes)
        if len(haps) <= 1:
            return []
        hap_bases = [h.bases for h in haps]
        # events per haplotype
        hap_events = [[] if h.is_ref else
                      genotype.haplotype_events(h.bases, ref_seg, span[0])
                      for h in haps]
        all_events = {}
        for evs in hap_events:
            for e in evs:
                if reg.start <= e.pos < reg.end:
                    all_events[(e.pos, e.ref, e.alt)] = e
        if not all_events:
            return []

        # CNN gate ("deep" mode): dense regions the classifier deems
        # germline/noise are skipped wholesale (main.cpp:213-221)
        if self.cnn is not None and len(t_reads) > 100:
            for (pos, _, _) in sorted(all_events):
                if self.cnn.is_germline_or_noise(self.ref, t_reads,
                                                 n_reads, pos):
                    return []

        t_lik = _pairhmm_matrix(t_reads, hap_bases)     # [H, Rt] log10
        n_lik = _pairhmm_matrix(n_reads, hap_bases) if n_reads else None

        calls = []
        for (pos, ref_a, alt_a), ev in sorted(all_events.items()):
            has_alt = np.array([any(e.pos == pos and e.ref == ref_a and
                                    e.alt == alt_a for e in evs)
                                for evs in hap_events])
            spans = np.ones(len(haps), bool)
            tm = genotype.marginalize_to_alleles(t_lik, has_alt, spans)
            tlod_ln = genotype.somatic_log_odds(tm)[0]
            tlod = tlod_ln / LOG10
            if tlod <= self.emission:
                continue
            filters = []
            nlod = None
            if n_lik is not None and n_lik.shape[1] > 0:
                nm = genotype.marginalize_to_alleles(n_lik, has_alt, spans)
                # normal odds AGAINST the variant (diploid ref evidence)
                nlod_ln = -genotype.somatic_log_odds(nm)[0]
                nlod = nlod_ln / LOG10
                if nlod < self.normal_odds:
                    filters.append("germline")
            # allelic depths by best-likelihood read assignment
            assign = tm[1] > tm[0]
            informative = np.abs(tm[1] - tm[0]) > 0.1
            ad_alt = int((assign & informative).sum())
            ad_ref = int((~assign & informative).sum())
            depth = tm.shape[1]
            af = ad_alt / max(ad_ref + ad_alt, 1)
            calls.append(VariantCall(
                contig=self.contig, pos=pos, ref=ref_a, alt=alt_a,
                tlod=float(tlod), nlod=nlod, depth=depth,
                ad_ref=ad_ref, ad_alt=ad_alt, af=af,
                filters=tuple(filters)))
        return calls


def write_vcf(path, calls, contig_names, contig_lens,
              tumor_sample="TUMOR", normal_sample=None):
    from ..io.vcf import VcfWriter
    samples = [tumor_sample] + ([normal_sample] if normal_sample else [])
    w = VcfWriter(path, contig_names, contig_lens, samples)
    for c in calls:
        info = {"TLOD": f"{c.tlod:.2f}", "DP": c.depth}
        if c.nlod is not None:
            info["NLOD"] = f"{c.nlod:.2f}"
        sample = {"GT": "0/1", "AD": f"{c.ad_ref},{c.ad_alt}",
                  "AF": f"{c.af:.3f}"}
        fields = [sample] + ([{"GT": "0/0"}] if normal_sample else [])
        w.add(c.contig, c.pos + 1, c.ref, [c.alt], info, list(c.filters),
              fields)
    w.close()
