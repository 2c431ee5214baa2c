"""Read transformers applied on BAM ingest before calling.

PalindromeArtifactClipReadTransformer (reference deepmutect
Mutect2Cpp-master/src/transformers/PalindromeArtifactClipReadTransformer.cpp,
wired per-read in ReadCache.cpp:27,115 with minPalindromeSize=5):
reads from short fragments whose soft-clipped (or inserted) overhang
past the adaptor boundary reverse-complements the reference just
beyond the fragment are hairpin ligation artifacts; the overhang is
hard-clipped when >=90% of the compared bases match the complement.

Operates on the CLI's read dicts (pos/cigar/seq_codes/quals/
mate_start/frag_len/is_reverse/properly_paired + flag).
"""

from __future__ import annotations

import numpy as np

MIN_FRACTION_OF_MATCHING_BASES = 0.9
DEFAULT_MIN_PALINDROME_SIZE = 5

_OP_S, _OP_I = 4, 1
_REF_OPS = (0, 2, 3, 7, 8)


def _cigar_ref_len(cig) -> int:
    return sum(ln for op, ln in cig if op in _REF_OPS)


def adaptor_boundary(rd) -> int | None:
    """ReadUtils::getAdaptorBoundary (read/ReadUtils.cpp:434-454) with
    the hasWellDefinedFragmentSize gate (:419-432). 0-based."""
    flag = rd.get("flag", 0)
    isize = rd.get("frag_len", 0) or 0
    mate_start = rd.get("mate_start")
    if isize == 0 or not (flag & 0x1) or mate_start is None:
        return None
    if flag & 0x8:                       # mate unmapped
        return None
    rev = bool(rd.get("is_reverse"))
    mate_rev = bool(flag & 0x20)
    if rev == mate_rev:
        return None
    end = rd["pos"] + _cigar_ref_len(rd["cigar"]) - 1
    if rev:
        if not end > mate_start:
            return None
        return mate_start - 1
    if not rd["pos"] <= mate_start + isize:
        return None
    return rd["pos"] + abs(isize)


def palindrome_artifact_clip(rd, ref_codes: np.ndarray,
                             min_palindrome_size: int =
                             DEFAULT_MIN_PALINDROME_SIZE):
    """Apply in place; returns rd. ref_codes: the read's contig."""
    ab = adaptor_boundary(rd)
    if not rd.get("properly_paired") or ab is None:
        return rd
    cig = rd["cigar"]
    if not cig:
        return rd
    upstream = (rd.get("frag_len", 0) or 0) > 0
    edge = cig[0] if upstream else cig[-1]
    if edge[0] not in (_OP_S, _OP_I):
        return rd
    clip_len = edge[1]
    L = len(rd["seq_codes"])
    n_cmp = min(clip_len + min_palindrome_size, L)
    if upstream:
        ref_start, ref_end = ab - n_cmp, ab - 1
    else:
        ref_start, ref_end = ab + 1, ab + n_cmp
    if ref_start < 1 or ref_end > len(ref_codes) - 1:
        return rd
    read_end = rd["pos"] + _cigar_ref_len(cig) - 1
    if (upstream and ref_start < rd["pos"]) or \
            (not upstream and read_end < ref_end):
        return rd
    seg = np.asarray(ref_codes[ref_start:ref_end + 1], np.int64)
    read_idx = (n_cmp - 1) if upstream else (L - 1)
    seq = np.asarray(rd["seq_codes"], np.int64)
    idx = read_idx - np.arange(len(seg))
    n_match = int(np.sum((seg < 4) & (3 - seg == seq[idx])))
    if n_match / n_cmp < MIN_FRACTION_OF_MATCHING_BASES:
        return rd
    # hard-clip the overhang: exactly the edge S/I element
    if upstream:
        rd["seq_codes"] = rd["seq_codes"][clip_len:]
        rd["quals"] = rd["quals"][clip_len:]
        rd["cigar"] = cig[1:]
    else:
        rd["seq_codes"] = rd["seq_codes"][:L - clip_len]
        rd["quals"] = rd["quals"][:L - clip_len]
        rd["cigar"] = cig[:-1]
    return rd
