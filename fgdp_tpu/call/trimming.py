"""AssemblyRegionTrimmer: trim-to-variation with padding.

Reference: haplotypecaller/AssemblyRegionTrimmer.cpp:31-84 (span math)
used at Mutect2Engine.cpp:190-199 — after assembly, the region is cut
down to the span of its variation events plus padding (20 bp around
SNPs, 150 bp around indels, capped at the original region +- 25 bp),
haplotypes are trimmed to that window and reads hard-clipped to it
(AssemblyRegion::trim / ReadClipper semantics). This is both a parity
item and the caller's largest PairHMM saving: a one-SNV region shrinks
from ~500 bp of haplotype x 151 bp reads to a ~41 bp window.

Deviation: reads that merely extend past the window are hard-clipped
exactly like the reference; GATK's low-quality-tail pre-clip is not
re-applied post-trim (already handled upstream by the read pipeline).
"""

from __future__ import annotations

import numpy as np

SNP_PADDING = 20          # ReadThreadingAssemblerArgumentCollection.h:41
INDEL_PADDING = 150       # :42
USABLE_EXTENSION = 25     # discoverExtension, :40


def trimmed_span(reg_start, reg_end, events, contig_len):
    """The trimmer's span math (AssemblyRegionTrimmer.cpp:31-65).

    events: iterable of (pos, ref_str, alt_str) in contig coordinates
    (assembly variation events — the caller passes every event found on
    any haplotype). Returns half-open (w0, w1) or None when no event
    overlaps the original [reg_start, reg_end) region."""
    vs0 = vs1 = None
    non_snp = False
    for pos, ref_a, alt_a in events:
        end = pos + len(ref_a) - 1
        if pos <= reg_end - 1 and end >= reg_start:
            non_snp = non_snp or not (len(ref_a) == 1 and len(alt_a) == 1)
            vs0 = pos if vs0 is None else min(vs0, pos)
            vs1 = end if vs1 is None else max(vs1, end)
    if vs0 is None:
        return None
    pad = INDEL_PADDING if non_snp else SNP_PADDING
    m0 = max(reg_start - USABLE_EXTENSION, 0)
    m1 = min(reg_end - 1 + USABLE_EXTENSION, contig_len - 1)
    i0 = max(vs0 - pad, 0)
    i1 = min(vs1 + pad, contig_len - 1)
    f0, f1 = max(m0, i0), min(m1, i1)
    # mergeWithContiguous(variantSpan): the variant span itself always
    # stays callable even when it pokes past the maximum span
    f0, f1 = min(f0, vs0), max(f1, vs1)
    return f0, f1 + 1


def clip_to_window(seq, quals, cigar, pos, w0, w1):
    """Hard-clip an alignment (read or haplotype) to reference window
    [w0, w1) — ReadClipper::hardClipToRegion / Haplotype::trim.

    cigar ops: 0=M(/=X) both, 1=I seq-only, 2/3=D/N ref-only, 4=S
    seq-only (dropped), 5/6=H/P neither. Returns (seq, quals, pos,
    cigar) with the clip applied, or None when no aligned base remains.
    The result starts and ends with an M run (edge insertions and
    deletions are stripped, GATK convention)."""
    segs = []                 # (op, ln, x_start, y_start)
    x, y = 0, pos
    for op, ln in cigar:
        if op in (0, 7, 8):
            lo, hi = max(y, w0), min(y + ln, w1)
            if lo < hi:
                segs.append((0, hi - lo, x + lo - y, lo))
            x += ln
            y += ln
        elif op in (1, 4):
            if op == 1 and w0 < y < w1:
                segs.append((1, ln, x, y))
            x += ln
        elif op in (2, 3):
            lo, hi = max(y, w0), min(y + ln, w1)
            if lo < hi:
                segs.append((op, hi - lo, x, lo))
            y += ln
        # 5 (H) / 6 (P): consume nothing
    while segs and segs[0][0] != 0:
        segs.pop(0)
    while segs and segs[-1][0] != 0:
        segs.pop()
    if not segs:
        return None
    q0 = segs[0][2]
    q1 = segs[-1][2] + segs[-1][1]
    new_pos = segs[0][3]
    merged = []
    for op, ln, _, _ in segs:
        if merged and merged[-1][0] == op:
            merged[-1][1] += ln
        else:
            merged.append([op, ln])
    new_cigar = [(op, ln) for op, ln in merged]
    new_seq = np.asarray(seq)[q0:q1]
    new_quals = None if quals is None else np.asarray(quals)[q0:q1]
    return new_seq, new_quals, new_pos, new_cigar


def clip_read_to_window(rd, w0, w1):
    """dict-read form of clip_to_window; returns a clipped copy or None.
    The memoized PairHMM quals are dropped (bases changed)."""
    out = clip_to_window(rd["seq_codes"], rd["quals"], rd["cigar"],
                         rd["pos"], w0, w1)
    if out is None:
        return None
    seq, quals, pos, cigar = out
    rd2 = dict(rd)
    # original-read bookkeeping for MPOS (ReadPosRankSumTest.cpp:27-37:
    # hard-clipped bases still count toward distance-from-read-end)
    n_before = len(rd["seq_codes"])
    rd2["orig_len"] = rd.get("orig_len", n_before)
    # leading clipped bases = read bases consumed before the kept window
    lead = _leading_clipped(rd["cigar"], rd["pos"], cigar, pos)
    rd2["lclip"] = rd.get("lclip", 0) + lead
    rd2["seq_codes"] = seq
    rd2["quals"] = quals
    rd2["pos"] = pos
    rd2["cigar"] = cigar
    rd2.pop("_hmm_quals", None)
    return rd2


def _leading_clipped(old_cigar, old_pos, new_cigar, new_pos):
    """Read bases removed from the left by a clip from (old_pos,
    old_cigar) to (new_pos, new_cigar): walk the old cigar until the
    reference cursor reaches new_pos, counting read-consuming bases."""
    x, y = 0, old_pos
    for op, ln in old_cigar:
        if y >= new_pos and op in (0, 7, 8):
            break
        if op in (0, 7, 8):
            step = min(ln, max(new_pos - y, 0))
            x += step
            y += step
            if y >= new_pos:
                break
            x += ln - step
            y += ln - step
        elif op in (1, 4):
            x += ln
        elif op in (2, 3):
            y += ln
    return x
