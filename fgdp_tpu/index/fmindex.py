"""FM-index over forward+reverse-complement text, in TPU-friendly layout.

Role of the reference's FMI_search/lbwt index (bwa-mem2-lcp/src/bwt.h:64-76,
ext/TAL/src/FMI/FMI_search.h:65-84): the index text is X = T + revcomp(T)
(sentinel-terminated), so bi-directional SMEM extension works with backward
extension only (bwa's FMD bi-interval trick, src/bwt.cpp bwt_extend
semantics).

TPU layout decisions (vs the reference's CPU layout):
  * Occ checkpoints every 16 suffixes: int32[nblocks, 4] cumulative counts
    plus one uint32 word of 16 packed 2-bit BWT codes per block. Rank within
    a block is a vectorized 2-bit-compare + popcount on the word — the VPU
    analogue of the reference's 64-bit one-hot popcounts (CP_OCC,
    FMI_search.h:77-84). One block fetch yields all four base counts.
  * Full int32 suffix array (single gather per seed; the reference's packed
    34-bit sa_low32/sa_high2, bwt.h:72-76, is the >2^31 upgrade path).
  * The sentinel is excluded from the packed words' alphabet: it is encoded
    as code 0 at `sentinel_row` and corrected in occ().

The 2-step ("lambert") dinucleotide tables of the fork (Occline,
src/bwt.h:64-67) are an additive optimization on the same layout: a second
bank of checkpoints over dinucleotide codes; see ops/fm.py for the
extension kernels.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..utils import dna
from .suffix_array import bwt_from_sa, suffix_array

OCC_BLOCK = 16  # BWT codes per occ checkpoint (one uint32 word)


@dataclasses.dataclass
class FMIndex:
    """Host-side FM-index arrays (numpy). See module docstring for layout."""

    n_ref: int                # forward reference length n; text X has 2n chars
    text_len: int             # N = 2n + 1 (incl. sentinel row count in BWT)
    sentinel_row: int         # BWT row holding the sentinel
    counts: np.ndarray        # int64[5]: C[c] = 1 + #{chars in X < c}
    occ: np.ndarray           # int32[nblocks, 4] cumulative counts at block starts
    bwt_words: np.ndarray     # uint32[nblocks] packed BWT codes
    sa: np.ndarray            # int32[N] full suffix array

    # ---- construction ----

    @classmethod
    def build(cls, ref_codes: np.ndarray) -> "FMIndex":
        assert ref_codes.max(initial=0) <= 3, "randomize ambiguous bases first"
        n = len(ref_codes)
        x = np.concatenate([ref_codes, dna.revcomp(ref_codes)]).astype(np.uint8)
        sa2n = suffix_array(x)
        bwt, sentinel_row, full_sa = bwt_from_sa(x, sa2n)
        big_n = 2 * n + 1
        assert big_n < 2**31, "int32 SA layout requires text < 2^31 (shard larger refs)"

        # C array: sentinel (rank 0) + cumulative symbol counts of X
        sym_counts = np.bincount(x, minlength=4)[:4]
        counts = np.zeros(5, dtype=np.int64)
        counts[0] = 1
        counts[1:] = 1 + np.cumsum(sym_counts)
        # counts[c] = first SA row of suffixes starting with c; counts[4] = N

        # occ checkpoints (sentinel counted as code 0 here; corrected in occ())
        nblocks = -(-big_n // OCC_BLOCK) + 1
        onehot = np.zeros((nblocks * OCC_BLOCK, 4), dtype=np.int32)
        onehot[np.arange(big_n), bwt] = 1
        csum = onehot.reshape(nblocks, OCC_BLOCK, 4).sum(axis=1).cumsum(axis=0)
        occ = np.zeros((nblocks, 4), dtype=np.int32)
        occ[1:] = csum[:-1]
        words = dna.pack_2bit_words(bwt, OCC_BLOCK)
        bwt_words = np.zeros(nblocks, dtype=np.uint32)
        bwt_words[: len(words)] = words

        return cls(
            n_ref=n, text_len=big_n, sentinel_row=sentinel_row,
            counts=counts, occ=occ, bwt_words=bwt_words,
            sa=full_sa.astype(np.int32),
        )

    # ---- host-side rank / search (oracle + build verification) ----

    def occ_at(self, c: int, i: int) -> int:
        """# occurrences of code c in BWT[0:i], sentinel excluded."""
        blk, rem = divmod(int(i), OCC_BLOCK)
        word = int(self.bwt_words[blk])
        cnt = int(self.occ[blk, c])
        for j in range(rem):
            if (word >> (2 * j)) & 3 == c:
                cnt += 1
        if c == 0 and i > self.sentinel_row:
            cnt -= 1
        return cnt

    def backward_extend(self, k: int, l: int, s: int, c: int):
        """Prepend code c to the pattern (bi-interval). Mirrors bwa
        bwt_extend(is_back=1) semantics (reference src/bwt.cpp)."""
        tk = [self.occ_at(d, k) for d in range(4)]
        tl = [self.occ_at(d, k + s) for d in range(4)]
        sizes = [tl[d] - tk[d] for d in range(4)]
        sent_in = 1 if (k <= self.sentinel_row < k + s) else 0
        # l-intervals accumulate in complement (descending code) order
        l3 = l + sent_in
        l2 = l3 + sizes[3]
        l1 = l2 + sizes[2]
        l0 = l1 + sizes[1]
        new_l = [l0, l1, l2, l3][c]
        new_k = int(self.counts[c]) + tk[c]
        return new_k, new_l, sizes[c]

    def forward_extend(self, k: int, l: int, s: int, c: int):
        """Append code c to the pattern (extend right)."""
        nl, nk, ns = self.backward_extend(l, k, s, 3 - c)
        return nk, nl, ns

    def init_interval(self, c: int):
        k = int(self.counts[c])
        s = int(self.counts[c + 1] - self.counts[c])
        l = int(self.counts[3 - c])
        return k, l, s

    # ---- serialization (the index artifacts are the checkpoint format,
    # like the reference's .bwt/.sa/.0123 files, bwtindex.cpp:318-363) ----

    def save(self, path):
        np.savez(
            path, n_ref=self.n_ref, text_len=self.text_len,
            sentinel_row=self.sentinel_row, counts=self.counts,
            occ=self.occ, bwt_words=self.bwt_words, sa=self.sa,
        )

    @classmethod
    def load(cls, path) -> "FMIndex":
        z = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
        return cls(
            n_ref=int(z["n_ref"]), text_len=int(z["text_len"]),
            sentinel_row=int(z["sentinel_row"]), counts=z["counts"],
            occ=z["occ"], bwt_words=z["bwt_words"], sa=z["sa"],
        )
