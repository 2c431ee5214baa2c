"""Packed reference + contig metadata (the reference's bntseq layer).

Mirrors bntseq_t semantics (reference ext/TAL/ext/bntseq.cpp): contigs are
concatenated into a forward "pac" space of length l_pac; alignment
coordinates live in the doubled space [0, 2*l_pac) where positions >=
l_pac are on the reverse strand of the mirrored forward sequence
(bns_get_seq :435-463, bns_depos usage :407). Ambiguous bases are
replaced by deterministic pseudo-random ACGT (bns_fasta2bntseq semantics)
and their runs recorded (the .amb "holes" used by bns_cnt_ambi :412).

TPU layout: forward codes as one uint8 HBM array + int32 contig offset
table; window fetch/rid lookup are vectorized gathers + searchsorted
(device fns below) instead of per-call mallocs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import dna


@dataclasses.dataclass
class PackedReference:
    names: list           # contig names
    lens: np.ndarray      # int64[n]
    offsets: np.ndarray   # int64[n+1] cumulative starts; offsets[n] == l_pac
    codes: np.ndarray     # uint8[l_pac] forward codes (0..3, N randomized)
    amb_offsets: np.ndarray  # int64[n_holes] start of each ambiguous run
    amb_lens: np.ndarray     # int64[n_holes]
    is_alt: np.ndarray       # bool[n] ALT contigs (see load_alt)

    @property
    def l_pac(self) -> int:
        return int(self.offsets[-1])

    @classmethod
    def from_contigs(cls, names, seqs, seed: int = 11) -> "PackedReference":
        """seqs: list of uint8 code arrays (0..3, 4=ambiguous)."""
        rng = np.random.default_rng(seed)
        lens = np.array([len(s) for s in seqs], np.int64)
        offsets = np.zeros(len(seqs) + 1, np.int64)
        offsets[1:] = np.cumsum(lens)
        codes = np.concatenate([np.asarray(s, np.uint8) for s in seqs]) \
            if seqs else np.zeros(0, np.uint8)
        amb = codes > 3
        codes = np.where(amb, rng.integers(0, 4, codes.shape).astype(np.uint8),
                         codes)
        # run-length encode ambiguity holes
        d = np.diff(np.concatenate([[0], amb.view(np.uint8), [0]]).astype(np.int8))
        starts = np.flatnonzero(d == 1)
        ends = np.flatnonzero(d == -1)
        return cls(names=list(names), lens=lens, offsets=offsets,
                   codes=codes, amb_offsets=starts.astype(np.int64),
                   amb_lens=(ends - starts).astype(np.int64),
                   is_alt=np.zeros(len(seqs), bool))

    @classmethod
    def from_reference(cls, ref) -> "PackedReference":
        """From an io.fasta.Reference (already parsed + randomized)."""
        amb = ref.amb_mask
        d = np.diff(np.concatenate([[0], amb.view(np.uint8), [0]]).astype(np.int8))
        starts = np.flatnonzero(d == 1)
        ends = np.flatnonzero(d == -1)
        return cls(names=list(ref.names), lens=np.diff(ref.offsets),
                   offsets=np.asarray(ref.offsets, np.int64),
                   codes=np.asarray(ref.codes, np.uint8),
                   amb_offsets=starts.astype(np.int64),
                   amb_lens=(ends - starts).astype(np.int64),
                   is_alt=np.zeros(len(ref.names), bool))

    @classmethod
    def from_fasta(cls, path, seed: int = 11) -> "PackedReference":
        from ..io.fasta import read_fasta
        pref = cls.from_reference(read_fasta(path, randomize_seed=seed))
        pref.load_alt(str(path) + ".alt")
        return pref

    def load_alt(self, alt_path) -> None:
        """Mark ALT contigs from a bwa-style .alt file: the first
        tab-field of every non-'@' line names an alt contig
        (bns_restore, ext/TAL/ext/bntseq.cpp:199-224)."""
        import os
        if not os.path.exists(alt_path):
            return
        idx = {n: i for i, n in enumerate(self.names)}
        with open(alt_path) as f:
            for ln in f:
                name = ln.split("\t", 1)[0].strip()
                if name and not name.startswith("@") and name in idx:
                    self.is_alt[idx[name]] = True

    # ---- host coordinate helpers (bntseq.cpp parity) ----

    def pos2rid(self, pos_f: int) -> int:
        """bns_pos2rid: contig of a forward-space position (-1 if out)."""
        if pos_f >= self.l_pac:
            return -1
        return int(np.searchsorted(self.offsets, pos_f, side="right") - 1)

    def depos(self, pos: int):
        """bns_depos: doubled-space -> (forward pos, is_rev)."""
        is_rev = pos >= self.l_pac
        return (2 * self.l_pac - 1 - pos) if is_rev else pos, is_rev

    def intv2rid(self, rb: int, re: int) -> int:
        if rb < self.l_pac < re:
            return -2
        rid_b = self.pos2rid(self.depos(rb)[0])
        rid_e = self.pos2rid(self.depos(re - 1)[0]) if rb < re else rid_b
        return rid_b if rid_b == rid_e else -1

    def get_seq(self, beg: int, end: int) -> np.ndarray:
        """bns_get_seq: X[beg:end) in the doubled space (empty if
        bridging the strand boundary)."""
        beg, end = min(beg, end), max(beg, end)
        end = min(end, 2 * self.l_pac)
        beg = max(beg, 0)
        if beg < self.l_pac < end:
            return np.zeros(0, np.uint8)
        if beg >= self.l_pac:
            bf = 2 * self.l_pac - end
            ef = 2 * self.l_pac - beg
            return (3 - self.codes[bf:ef])[::-1].astype(np.uint8)
        return self.codes[beg:end]

    def fetch_window(self, beg: int, mid: int, end: int):
        """bns_fetch_seq: clamp [beg,end) to the contig+strand of mid,
        return (seq, beg, end, rid)."""
        pos_f, is_rev = self.depos(mid)
        rid = self.pos2rid(pos_f)
        fb, fe = int(self.offsets[rid]), int(self.offsets[rid + 1])
        if is_rev:
            fb, fe = 2 * self.l_pac - fe, 2 * self.l_pac - fb
        beg = max(beg, fb)
        end = min(end, fe)
        return self.get_seq(beg, end), beg, end, rid

    def save(self, path):
        np.savez(path, names=np.array(self.names), lens=self.lens,
                 offsets=self.offsets, codes=self.codes,
                 amb_offsets=self.amb_offsets, amb_lens=self.amb_lens,
                 is_alt=self.is_alt)

    @classmethod
    def load(cls, path) -> "PackedReference":
        z = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
        return cls(names=[str(n) for n in z["names"]], lens=z["lens"],
                   offsets=z["offsets"], codes=z["codes"],
                   amb_offsets=z["amb_offsets"], amb_lens=z["amb_lens"],
                   is_alt=z["is_alt"])


@jax.tree_util.register_pytree_node_class
class DeviceReference:
    """HBM-resident reference arrays + vectorized coordinate ops."""

    def __init__(self, ref: PackedReference = None, _leaves=None,
                 _n_contigs=None):
        if ref is not None:
            assert 2 * ref.l_pac < 2**31, "shard larger references"
            self.codes = jnp.asarray(ref.codes, jnp.int32)
            self.offsets = jnp.asarray(ref.offsets, jnp.int32)  # [n+1]
            self.is_alt = jnp.asarray(ref.is_alt)
            self.l_pac = jnp.int32(ref.l_pac)
            self.n_contigs = len(ref.names)
            # doubled-space text (fwd + revcomp) packed 16 codes/uint32:
            # window fetches gather 1/16 the rows of an element gather
            x = np.concatenate([np.asarray(ref.codes, np.uint8),
                                3 - np.asarray(ref.codes, np.uint8)[::-1]])
            nw = (len(x) + 15) // 16 + 1
            xp = np.zeros(nw * 16, np.uint32)
            xp[:len(x)] = x
            self.codes16 = jnp.asarray(
                (xp.reshape(nw, 16) << (2 * np.arange(16, dtype=np.uint32))
                 ).sum(axis=1, dtype=np.uint32))
        else:
            (self.codes, self.offsets, self.is_alt, self.l_pac,
             self.codes16) = _leaves
            self.n_contigs = _n_contigs

    def tree_flatten(self):
        return ((self.codes, self.offsets, self.is_alt, self.l_pac,
                 self.codes16), self.n_contigs)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(_leaves=leaves, _n_contigs=aux)

    def fetch(self, pos):
        """X[pos] for doubled-space positions (batched); out-of-range -> 4."""
        l2 = 2 * self.l_pac
        fwd = pos < self.l_pac
        pf = jnp.where(fwd, pos, l2 - 1 - pos)
        base = jnp.take(self.codes, jnp.clip(pf, 0, self.l_pac - 1), axis=0)
        base = jnp.where(fwd, base, 3 - base)
        return jnp.where((pos >= 0) & (pos < l2), base, 4)

    def fetch_window(self, start, T: int, reverse: bool = False):
        """Contiguous doubled-space window codes: [J, T] int32 with 4 at
        out-of-range positions. reverse=True returns position
        start+T-1-c at column c (left-extension order). One packed-word
        gather per 16 codes instead of an element gather per code."""
        return packed_window(self.codes16, 2 * self.l_pac, start, T,
                             reverse)


    def pos2rid(self, pos_f):
        """Batched bns_pos2rid over forward-space positions.

        For few contigs a direct compare-sum beats jnp.searchsorted
        (whose batched lowering is elementwise-gather-bound, ~3 ms at
        [1024, 256] on v5e vs <0.5 ms for the compare reduction)."""
        if self.n_contigs <= 128:
            rid = jnp.sum(
                self.offsets[1:-1].reshape((1,) * pos_f.ndim + (-1,))
                <= pos_f[..., None], axis=-1, dtype=jnp.int32)
        else:
            rid = (jnp.searchsorted(self.offsets, pos_f, side="right") - 1
                   ).astype(jnp.int32)
        return jnp.where((pos_f >= 0) & (pos_f < self.l_pac), rid, -1)

    def depos(self, pos):
        is_rev = pos >= self.l_pac
        return jnp.where(is_rev, 2 * self.l_pac - 1 - pos, pos), is_rev

    def intv2rid(self, rb, re):
        """Batched bns_intv2rid (bntseq.cpp:402-410)."""
        bridging = (rb < self.l_pac) & (re > self.l_pac)
        rid_b = self.pos2rid(self.depos(rb)[0])
        rid_e = jnp.where(rb < re, self.pos2rid(self.depos(re - 1)[0]), rid_b)
        rid = jnp.where(rid_b == rid_e, rid_b, -1)
        return jnp.where(bridging, -2, rid)

    def contig_window(self, mid):
        """Batched bns_fetch_seq clamp bounds: contig+strand span of mid
        in doubled space -> (far_beg, far_end, rid)."""
        pos_f, is_rev = self.depos(mid)
        rid = self.pos2rid(pos_f)
        fb = jnp.take(self.offsets, jnp.clip(rid, 0, self.n_contigs), axis=0)
        fe = jnp.take(self.offsets, jnp.clip(rid + 1, 0, self.n_contigs), axis=0)
        l2 = 2 * self.l_pac
        far_beg = jnp.where(is_rev, l2 - fe, fb)
        far_end = jnp.where(is_rev, l2 - fb, fe)
        return far_beg, far_end, rid


def packed_window(codes16, l2, start, T: int, reverse: bool = False):
    """Free-function form of DeviceReference.fetch_window (usable from
    kernels that carry the packed words without the full object)."""
    start = start.astype(jnp.int32)
    W = T // 16 + 2
    w0 = jnp.right_shift(start, 4)      # arithmetic: floor for < 0
    words = jnp.take(codes16,
                     jnp.clip(w0[:, None] +
                              jnp.arange(W, dtype=jnp.int32)[None, :],
                              0, codes16.shape[0] - 1), axis=0)
    off = (start & 15).astype(jnp.uint32)   # nonneg remainder
    sh = 2 * off[:, None]
    aligned = jnp.where(
        off[:, None] == 0, words[:, :-1],
        (words[:, :-1] >> sh) |
        (words[:, 1:] << (jnp.uint32(32) - sh)))      # [J, W-1]
    cols = jnp.arange(T, dtype=jnp.int32)
    wi = cols >> 4
    bi = (2 * (cols & 15)).astype(jnp.uint32)
    codes = (aligned[:, wi] >> bi[None, :]) & jnp.uint32(3)
    codes = codes.astype(jnp.int32)
    pos = start[:, None] + cols[None, :]
    codes = jnp.where((pos >= 0) & (pos < l2), codes, 4)
    return codes[:, ::-1] if reverse else codes
