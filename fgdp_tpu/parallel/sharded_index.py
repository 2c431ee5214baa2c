"""Contig-sharded ("split") index: align against K independent
per-contig-group indexes and merge per-read candidate regions.

The whole-genome representability story (VERDICT r3 #4): the reference
packs one suffix array over the full 2x3.2 Gbp text as 34-bit entries
(sa_low32/sa_high2, bwa-mem2-lcp/src/bwt.h:69-76) because a single
index must address >2^31 positions. The TPU-native design shards the
index by contig groups instead: every shard's packed text (fwd+rc)
stays below 2^31, so EVERY device-side coordinate — SA entries, chain
rbeg/rmax windows, extension rb/re — remains int32 (the native gather
type), and shard results are remapped to global int64 coordinates on
the host, where the reference also does its 64-bit arithmetic
(sortmardup kTable, main.cpp:96-103). On a mesh, shards map to the fm
axis (one shard's arrays per device row) — the TP analogue of SURVEY
§2.4 — while this module's single-chip form runs the shard programs
back-to-back.

Semantics: identical to running `mem` once per shard reference and
merging candidate regions before mem_sort_dedup_patch / primary
marking. For references whose shards share no >=seed-length repeats
this equals the joint-index output exactly (tested); on cross-shard
repeats, per-shard occurrence counts are lower than joint counts, so
seeding keeps strictly MORE candidates than a joint index would (the
chain filter's max_occ cut sees per-shard occ) — never fewer.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..config import AlignConfig, BatchShapes
from ..index.fmindex import FMIndex
from ..index.reference import PackedReference
from ..pipeline import Aligner, finalize_pe_batch, finalize_se_batch


def partition_contigs(lens, n_shards: int):
    """Greedy contiguous partition of contigs into n_shards groups,
    balanced by total length. Returns list of (lo, hi) contig-index
    ranges (hi exclusive), one per shard; fewer groups when there are
    fewer contigs than shards."""
    n = len(lens)
    n_shards = max(1, min(n_shards, n))
    total = int(np.sum(lens))
    target = total / n_shards
    groups = []
    lo = 0
    acc = 0
    for i in range(n):
        acc += int(lens[i])
        groups_left = n_shards - len(groups)
        contigs_left = n - i - 1
        # close the group when it reaches its share — or when exactly
        # enough contigs remain to give every later group one
        if groups_left > 1 and (acc >= target
                                or contigs_left == groups_left - 1):
            groups.append((lo, i + 1))
            lo = i + 1
            acc = 0
    groups.append((lo, n))
    return groups


def slice_reference(pref: PackedReference, lo: int, hi: int) \
        -> PackedReference:
    """Shard sub-reference [lo, hi) by SLICING the already-randomized
    global codes (re-running from_contigs would re-randomize ambiguous
    bases differently and break parity with the joint index)."""
    b0 = int(pref.offsets[lo])
    b1 = int(pref.offsets[hi])
    keep = (pref.amb_offsets >= b0) & (pref.amb_offsets < b1)
    return PackedReference(
        names=list(pref.names[lo:hi]),
        lens=pref.lens[lo:hi].copy(),
        offsets=(pref.offsets[lo:hi + 1] - b0).copy(),
        codes=pref.codes[b0:b1],
        amb_offsets=(pref.amb_offsets[keep] - b0),
        amb_lens=pref.amb_lens[keep].copy(),
        is_alt=pref.is_alt[lo:hi].copy(),
    )


class ShardedAligner:
    """K per-shard device aligners + global-coordinate host finalize.
    Drop-in for pipeline.Aligner's align_batch/align_pairs surface."""

    def __init__(self, pref: PackedReference, n_shards: int = 2,
                 opt: AlignConfig | None = None,
                 shapes: BatchShapes | None = None, lcp=True,
                 shard_fms=None):
        """shard_fms: optional pre-built per-shard FMIndex list (human-
        scale builds run SA-IS in parallel worker processes and hand
        the artifacts in — scripts/bigindex_run.py)."""
        self.pref = pref                      # global (finalize side)
        self.opt = opt or AlignConfig()
        self.shapes = shapes or BatchShapes()
        self.groups = partition_contigs(pref.lens, n_shards)
        self.shards = []
        for s, (lo, hi) in enumerate(self.groups):
            sp = slice_reference(pref, lo, hi)
            assert 2 * sp.l_pac < 2**31, \
                "shard text exceeds int32 — raise n_shards"
            fm = shard_fms[s] if shard_fms is not None \
                else FMIndex.build(sp.codes)
            self.shards.append(Aligner(sp, fm, opt=self.opt,
                                       shapes=self.shapes, lcp=lcp))

    def sam_header(self, rg_line=None):
        return Aligner.sam_header(self, rg_line)   # uses self.pref

    # ---- device step ----

    def _device_regs(self, seq_codes):
        """Dispatch every shard's device program (pipelined), convert +
        escalate per shard, then merge to one global-coordinate regs
        dict (int64 rb/re)."""
        futs = [sh._device_regs_async(seq_codes) for sh in self.shards]
        merged = None
        L_g = self.pref.l_pac
        for s, (sh, fut) in enumerate(zip(self.shards, futs)):
            regs = sh._regs_to_np(fut, seq_codes)
            lo, _ = self.groups[s]
            off = int(self.pref.offsets[lo])
            l_s = sh.pref.l_pac
            rb = regs["rb"].astype(np.int64)
            re = regs["re"].astype(np.int64)
            fwd = rb < l_s
            shift_fwd = off
            shift_rc = 2 * L_g - 2 * l_s - off
            rb = np.where(fwd, rb + shift_fwd, rb + shift_rc)
            re = np.where(fwd, re + shift_fwd, re + shift_rc)
            regs = dict(regs)
            regs["rb"], regs["re"] = rb, re
            regs["rid"] = np.where(regs["rid"] >= 0, regs["rid"] + lo,
                                   regs["rid"])
            if merged is None:
                merged = regs
            else:
                for k, v in regs.items():
                    if getattr(v, "ndim", 0) == 2:
                        merged[k] = np.concatenate([merged[k], v], axis=1)
                merged["overflow"] = merged["overflow"] | regs["overflow"]
                # frac_rep: repeat fraction vs the union of shard hits
                merged["frac_rep"] = np.maximum(merged["frac_rep"],
                                                regs["frac_rep"])
        return merged

    # ---- host finalize (global reference) ----

    def align_batch(self, names, seq_codes, quals=None, id0: int = 0):
        regs_np = self._device_regs(seq_codes)
        return finalize_se_batch(self.pref, self.opt, self.shapes, names,
                                 seq_codes, quals, regs_np, id0)

    def align_pairs(self, names, seq_codes, quals=None, id0: int = 0):
        regs_np = self._device_regs(seq_codes)
        return finalize_pe_batch(self.pref, self.opt, names, seq_codes,
                                 quals, regs_np, id0)
