"""Read-to-best-haplotype realignment.

AssemblyBasedCallerUtils::realignReadsToTheirBestHaplotype (reference
deepmutect Mutect2Cpp-master/src/haplotypecaller/
AssemblyBasedCallerUtils.cpp:163, GATK AlignmentUtils
createReadAlignedToRef semantics): each read is aligned to the
haplotype that maximizes its likelihood (a fitting alignment — the read
global, the haplotype local), and the read→haplotype cigar is composed
with the haplotype→reference cigar so downstream annotations (MPOS/MBQ
pileup offsets) see indel-aware coordinates instead of the original
aligner's soft-clipped placements.
"""

from __future__ import annotations

import numpy as np

# GATK SWParameters ALIGNMENT_TO_BEST_HAPLOTYPE (10, -15, -30, -5)
MATCH = 10
MISMATCH = -15
GAP_OPEN = -30
GAP_EXTEND = -5

OP_M, OP_I, OP_D, OP_S = 0, 1, 2, 4


def fitting_alignment(read: np.ndarray, hap: np.ndarray):
    """Align the whole read against a local window of hap (free hap
    start/end). Returns (hap_start, cigar list[(op, len)] over the read
    with M/I/D; leading/trailing read gaps become softclips)."""
    n, m = len(read), len(hap)
    NEG = -(1 << 30)
    # affine DP, read on rows
    H = np.zeros((n + 1, m + 1), np.int64)
    E = np.full((n + 1, m + 1), NEG, np.int64)   # gap in hap (I in read)
    F = np.full((n + 1, m + 1), NEG, np.int64)   # gap in read (D)
    H[1:, 0] = NEG // 2                          # read must be consumed
    karange = np.arange(m, dtype=np.int64)
    for i in range(1, n + 1):
        sub = np.where(hap == read[i - 1], MATCH, MISMATCH)
        E[i, :] = np.maximum(H[i - 1, :] + GAP_OPEN,
                             E[i - 1, :] + GAP_EXTEND)
        diag = H[i - 1, :-1] + sub
        # F scan (gap in read along the hap axis) as a running max over
        # the PREVIOUS columns' finalized M/E values (opening from F is
        # dominated by extending): srcME[kk] belongs to column kk+1, so
        # F[i, j] = max_{kk<=j-2}(srcME[kk] + GO + (j-2-kk) GE)
        src_me = np.maximum(diag, E[i, 1:])
        w = src_me + GAP_OPEN - karange * GAP_EXTEND
        cm = np.maximum.accumulate(w)
        F[i, 1] = NEG
        F[i, 2:] = (cm + karange * GAP_EXTEND)[:-1]
        H[i, 1:] = np.maximum(np.maximum(diag, E[i, 1:]), F[i, 1:])
        H[i, 0] = NEG // 2
    # SOFTCLIP end semantics (GATK createReadAlignedToRef): the
    # alignment may end anywhere; trailing read bases become softclips
    ei, ej = np.unravel_index(int(np.argmax(H)), H.shape)
    tail_sc = n - int(ei)
    # stateful traceback (gap runs must follow their own extension
    # chain, not re-derive from H mid-run)
    ops = []
    i, j = int(ei), int(ej)
    state = 0                        # 0=H 1=E(ins) 2=F(del)
    while i > 0 and j > 0:
        if state == 0:
            h = H[i, j]
            sub = MATCH if hap[j - 1] == read[i - 1] else MISMATCH
            if h == H[i - 1, j - 1] + sub:
                ops.append((OP_M, 1))
                i -= 1
                j -= 1
            elif h == E[i, j]:
                state = 1
            else:
                state = 2
        elif state == 1:
            ops.append((OP_I, 1))
            ext = E[i, j] == E[i - 1, j] + GAP_EXTEND
            i -= 1
            state = 1 if ext else 0
        else:
            ops.append((OP_D, 1))
            ext = j > 1 and F[i, j] == F[i, j - 1] + GAP_EXTEND
            j -= 1
            state = 2 if ext else 0
    lead_sc = i                      # read bases before hap window
    ops.reverse()
    cigar = []
    if lead_sc:
        cigar.append([OP_S, lead_sc])
    for op, ln in ops:
        if cigar and cigar[-1][0] == op:
            cigar[-1][1] += ln
        else:
            cigar.append([op, ln])
    if tail_sc:
        cigar.append([OP_S, tail_sc])
    return j, [(op, ln) for op, ln in cigar]


def compose_cigars(hap_start: int, read2hap, hap2ref):
    """Compose read→hap with hap→ref: returns (ref_offset of the first
    aligned read base relative to the hap's ref start, read→ref cigar).
    hap2ref ops are (op, len) with 0=M 1=I 2=D over the haplotype vs the
    reference window."""
    # expand hap2ref into per-hap-base (ref_advance_before, is_insertion)
    ref_pos = 0
    hap_ref = []                     # for each hap base: ref pos or -1 (ins)
    for op, ln in hap2ref:
        if op == OP_M:
            for _ in range(ln):
                hap_ref.append(ref_pos)
                ref_pos += 1
        elif op == OP_I:
            hap_ref.extend([-1] * ln)
        elif op == OP_D:
            ref_pos += ln
    out = []
    h = hap_start
    start_ref = None
    ref_end = None                   # running ref position after `out`

    def push(op, ln):
        nonlocal ref_end
        if ln <= 0:
            return
        if out and out[-1][0] == op:
            out[-1][1] += ln
        else:
            out.append([op, ln])
        if op in (OP_M, OP_D):
            ref_end += ln

    for op, ln in read2hap:
        if op == OP_S:
            push(OP_S, ln)
        elif op == OP_I:
            push(OP_I, ln)
        elif op == OP_M:
            for _ in range(ln):
                r = hap_ref[h] if h < len(hap_ref) else -1
                if r < 0:
                    push(OP_I, 1)    # read base over a hap insertion
                else:
                    if start_ref is None:
                        start_ref = r
                        ref_end = r
                    elif r > ref_end:
                        # deletion against ref between consecutive Ms
                        push(OP_D, r - ref_end)
                    push(OP_M, 1)
                h += 1
        elif op == OP_D:             # read skips hap bases
            for _ in range(ln):
                r = hap_ref[h] if h < len(hap_ref) else -1
                if r >= 0 and start_ref is not None:
                    push(OP_D, 1)
                h += 1
    if start_ref is None:
        start_ref = hap_ref[min(hap_start, len(hap_ref) - 1)] \
            if hap_ref else 0
        start_ref = max(start_ref, 0)
    return start_ref, [(op, ln) for op, ln in out]


def realign_read(read_codes: np.ndarray, hap_bases: np.ndarray,
                 hap2ref, hap_ref_start: int):
    """Returns (new_pos relative to the contig given hap_ref_start is
    absolute, new cigar) for annotation pileups."""
    hs, r2h = fitting_alignment(np.asarray(read_codes, np.int64),
                                np.asarray(hap_bases, np.int64))
    ref_off, cigar = compose_cigars(hs, r2h, hap2ref)
    return hap_ref_start + ref_off, cigar
