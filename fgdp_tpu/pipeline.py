"""Single-host alignment pipeline: FASTQ batches -> SAM lines.

The device program (jitted once per batch shape) runs seeding -> chaining
-> batched banded-SW extension; the host finishes dedup/patch, primary
marking, CIGAR and SAM text — mirroring the reference's worker split
(worker_bwt/worker_aln on compute threads, worker_sam on output,
src/bwamem.cpp:1800-1850) with the device as the compute side.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .align import chain as chainmod
from .align import extend as extendmod
from .align import finalize
from .align.seeding import collect_seeds
from .config import AlignConfig, BatchShapes
from .index.fmindex import FMIndex
from .index.reference import DeviceReference, PackedReference
from .ops.fm import DeviceFMIndex


def device_align(dfm: DeviceFMIndex, dref: DeviceReference, codes, lens,
                 active, opt: AlignConfig, shapes: BatchShapes,
                 lcp_tree=None, lcp_isa=None):
    """codes int32[B, L] -> AlnRegBatch (jit-able)."""
    seeds = collect_seeds(dfm, dref, codes, lens, active, opt,
                          max_seeds=shapes.max_smems, prev_cap=20,
                          scale=shapes.seed_scale,
                          lcp_tree=lcp_tree, lcp_isa=lcp_isa,
                          k1_emit_cap=shapes.k1_emit_cap,
                          k3_emit_cap=shapes.k3_emit_cap,
                          k2_scale=shapes.k2_scale)
    # flat-job pool sizing: the pool is shared first-come-first-served,
    # so a repeat read expanding to max_occ jobs must not starve later
    # reads of ALL seeds (observed: Alu-dense batches left the batch
    # tail with zero chains). Primary budget = 32 jobs/read average;
    # escalated programs (small B_esc) afford the per-read worst case.
    B_cur = codes.shape[0]
    jobs_cap = B_cur * (shapes.jobs_pool_per_read
                        or (32 if shapes.seed_scale == 1
                            else shapes.max_seeds))
    cb = chainmod.chain_seeds(dfm, dref, seeds, lens, opt,
                              max_seedpos=shapes.max_seeds,
                              max_chains=shapes.max_chains,
                              jobs_cap=jobs_cap)
    regs = extendmod.extend_chains(cb, codes, lens, dref, opt,
                                   max_regs=shapes.max_regs,
                                   t_max=shapes.max_ext_ref,
                                   jobs_per_read=shapes.ext_jobs_per_read
                                   or 6 * shapes.seed_scale)
    return compact_regs(regs, shapes.transfer_regs)


# reg fields that fit comfortably in int16 (offsets/scores bounded by
# read_len and a*read_len; rb/re are pac coordinates and stay wide)
_NARROW_FIELDS = ("qb", "qe", "score", "truesc", "sw_w", "seedcov",
                  "seedlen0")


def compact_regs(regs: "extendmod.AlnRegBatch", k: int):
    """Device-side transfer compaction: order each read's reg slots
    valid-first (stable) and keep only the first k columns, downcasting
    bounded fields to int16. The device->host link is the pipeline's
    scarcest resource (measured 4-5 MB/s through the relay vs 0.13 s of
    compute per 1024-read batch); typical reads carry 1-3 valid regs of
    max_regs=48 slots, so shipping 16 compacted columns cuts the batch
    payload ~4x without losing information — a read with more than k
    valid regs sets its overflow flag and is re-run through the
    escalation ladder, which widens k alongside every other bound."""
    if k >= regs.valid.shape[1]:
        return regs
    counts = regs.valid.sum(axis=1)
    # stable valid-first permutation without argsort: rank each column
    # (valids by prefix count, invalids after all valids), then invert
    # the first k ranks with a [B, E, k] one-hot argmax — the argsort
    # this replaces profiled 6 ms/batch (pipeline.py:76 in the r4 trace)
    rank = jnp.where(
        regs.valid, jnp.cumsum(regs.valid, axis=1) - 1,
        counts[:, None] + jnp.cumsum(~regs.valid, axis=1) - 1)
    oh = rank[:, :, None] == jnp.arange(k, dtype=rank.dtype)[None, None, :]
    order = jnp.argmax(oh, axis=1).astype(jnp.int32)

    def take(a):
        return jnp.take_along_axis(a, order, axis=1)

    fields = {}
    for name in regs._fields:
        v = getattr(regs, name)
        if v.ndim != 2:
            continue
        v = take(v)
        if name in _NARROW_FIELDS:
            v = v.astype(jnp.int16)
        fields[name] = v
    return regs._replace(overflow=regs.overflow | (counts > k), **fields)


class Aligner:
    """End-to-end single-end aligner over one reference."""

    def __init__(self, pref: PackedReference, fm: FMIndex,
                 opt: AlignConfig | None = None,
                 shapes: BatchShapes | None = None,
                 lcp: "LcpTree | bool | None" = True):
        self.pref = pref
        self.opt = opt or AlignConfig()
        self.shapes = shapes or BatchShapes()
        self.dref = DeviceReference(pref)
        self.dfm = DeviceFMIndex.from_host(fm)
        # K1 seeding engine: the LCP-tree single-pass machine by default
        # (lcp=True builds the tree from the index's SA; pass a loaded
        # LcpTree to skip the build, or lcp=None/False for the sweep)
        if lcp is True:
            from .index.lcptree import LcpTree
            from .utils import dna
            x = np.concatenate([pref.codes,
                                dna.revcomp(pref.codes)]).astype(np.uint8)
            lcp = LcpTree.build(x, fm.sa)
        if lcp:
            self.lcp_tree = jnp.asarray(lcp.tree)
            self.lcp_isa = jnp.asarray(lcp.isa)
        else:
            self.lcp_tree = self.lcp_isa = None
        # host-only output options don't shape the device program; pin
        # them to defaults in the jit key so e.g. -a reuses the cache
        import dataclasses as _dc
        self._dev_opt = _dc.replace(self.opt, output_all=False)
        self._fn = jax.jit(functools.partial(
            device_align, opt=self._dev_opt, shapes=self.shapes))
        self._esc_fns = {}        # escalation level -> jitted program
        self._warm = False

    @classmethod
    def build(cls, pref: PackedReference, **kw) -> "Aligner":
        return cls(pref, FMIndex.build(pref.codes), **kw)

    def sam_header(self, rg_line=None):
        lines = ["@HD\tVN:1.6\tSO:unsorted"]
        for i, (name, ln) in enumerate(zip(self.pref.names,
                                           self.pref.lens)):
            ah = "\tAH:*" if bool(self.pref.is_alt[i]) else ""
            lines.append(f"@SQ\tSN:{name}\tLN:{int(ln)}{ah}")
        if rg_line:
            lines.append(rg_line)
        lines.append("@PG\tID:fgdp-tpu\tPN:fgdp-tpu\tVN:0.1")
        return lines

    def align_batch(self, names, seq_codes, quals=None, id0: int = 0):
        """Single-end alignment. names: list[str]; seq_codes: list of int
        arrays (0..4). Returns SAM lines (one or more per read)."""
        from .utils.profiling import PROF, WORKER_SAM

        regs_np = self._device_regs(seq_codes)
        with PROF.phase(WORKER_SAM):
            out = finalize_se_batch(self.pref, self.opt, self.shapes,
                                    names, seq_codes, quals, regs_np, id0)
        return out

    def align_pairs(self, names, seq_codes, quals=None, id0: int = 0):
        """Paired-end alignment. seq_codes interleaved [r1_0, r2_0, r1_1,
        ...] (reference worker layout, bseq 2i/2i+1). Returns SAM lines."""
        from .align import pair as pairmod

        from .utils.profiling import PROF, WORKER_SAM

        B = len(seq_codes)
        assert B % 2 == 0
        regs_np = self._device_regs(seq_codes)
        with PROF.phase(WORKER_SAM):
            out = finalize_pe_batch(self.pref, self.opt, names, seq_codes,
                                    quals, regs_np, id0)
        return out

    def _device_regs_async(self, seq_codes):
        """Dispatch the device align program; returns device arrays
        WITHOUT synchronizing — callers overlap the next dispatch with
        the previous batch's host conversion (the kt_pipeline stage
        overlap; a blocking np.asarray per batch exposes the full
        dispatch round-trip and serializes device and host)."""
        from .utils.profiling import PROF

        B = len(seq_codes)
        L = self.shapes.read_len
        codes = np.full((B, L), 4, np.int32)
        lens = np.zeros(B, np.int32)
        for i, s in enumerate(seq_codes):
            n = min(len(s), L)
            codes[i, :n] = np.asarray(s[:n], np.int32)
            lens[i] = n
        # first call compiles; report it apart from steady-state device
        # time (display_stats taxonomy: MEM_COLLECT+MEM_ALN2 are fused in
        # one device program here)
        phase = "MEM_DEVICE" if self._warm else "JIT_COMPILE"
        with PROF.phase(phase):
            regs = self._fn(self.dfm, self.dref, jnp.asarray(codes),
                            jnp.asarray(lens), jnp.ones(B, bool),
                            lcp_tree=self.lcp_tree,
                            lcp_isa=self.lcp_isa)
        self._warm = True
        # start the device->host copies now: they complete behind the
        # next batches' compute, so _regs_to_np's np.asarray is a wait,
        # not a fresh round-trip (the relay link is the bottleneck)
        for v in regs:
            try:
                v.copy_to_host_async()
            except (AttributeError, RuntimeError):
                break
        return regs

    ESCALATE_LEVELS = 2

    def _regs_to_np(self, regs, seq_codes=None):
        # int16 fields ride the wire narrow (compact_regs); the host
        # finalize code computes in plain int — upcast on arrival
        out = {k: (a := np.asarray(v),
                   a.astype(np.int32) if a.dtype == np.int16 else a)[1]
               for k, v in regs._asdict().items()}
        if seq_codes is not None:
            out = self._retry_overflow(out, seq_codes)
        return out

    def _escalated_shapes(self, level: int):
        """Full escalation (seed-stage overflow): every cap doubles per
        level, incl. the seeding-internal pools via seed_scale; the
        chain seed-position table gets an extra 2x — repeat-dense reads
        measured up to ~1k expanded seed positions (chr20 campaign)."""
        import dataclasses as _dc
        f = 2 ** level
        s = self.shapes
        return _dc.replace(s, max_smems=s.max_smems * f,
                           max_seeds=s.max_seeds * 2 * f,
                           max_chains=s.max_chains * f,
                           max_regs=s.max_regs * f,
                           transfer_regs=s.transfer_regs * f,
                           seed_scale=s.seed_scale * f)

    def _k2_wide_shapes(self, level: int):
        """Targeted escalation for seed-stage overflow, which on
        repeat-rich genomes is almost entirely K2's prev/entry/backward
        pools (K1 itself overflowed 74 of 4096 reads on the chr20
        campaign): K1 reruns at 1x rounds/cost, K2 pools widen 4x+, and
        the chain/extend shapes widen like the chain-wide flavor. The
        full everything-2x flavor remains the level-2 backstop."""
        import dataclasses as _dc
        f = 2 ** level
        s = self.shapes
        return _dc.replace(s, seed_scale=1, k2_scale=2 * f,
                           max_smems=s.max_smems * f,
                           max_seeds=s.max_seeds * 2 * f,
                           max_chains=s.max_chains * f,
                           max_regs=s.max_regs * f,
                           transfer_regs=s.transfer_regs * f,
                           jobs_pool_per_read=s.max_seeds * 2 * f,
                           ext_jobs_per_read=6 * f)

    def _chain_wide_shapes(self, level: int):
        """Targeted escalation for reads whose SEEDING fit but whose
        chain/extension/transfer stages overflowed (the majority class
        on repeat-rich genomes: ~2/3 of escalations in the chr20
        campaign): seeding reruns at 1x cost, only the chain table,
        job pools, and reg slots widen."""
        import dataclasses as _dc
        f = 2 ** level
        s = self.shapes
        return _dc.replace(s, max_seeds=s.max_seeds * 2 * f,
                           max_chains=s.max_chains * f,
                           max_regs=s.max_regs * f,
                           transfer_regs=s.transfer_regs * f,
                           jobs_pool_per_read=s.max_seeds * 2 * f,
                           ext_jobs_per_read=6 * f)

    def _retry_overflow(self, regs_np, seq_codes):
        """Re-run overflowed reads through progressively wider device
        buckets (the host-driver fallback promised by BatchShapes: the
        reference reallocs per-read seed/chain arrays at will,
        FMI_search.cpp / bwamem.cpp; under static TPU shapes a read that
        exceeds max_smems/max_seeds/max_chains/max_regs sets its
        overflow flag and is retried at 2x, 4x, ... shapes)."""
        ovf = regs_np.get("overflow")
        if ovf is None or not np.any(ovf):
            return regs_np
        from .utils.profiling import PROF
        with PROF.phase("ESC_RETRY"):
            return self._retry_overflow_inner(regs_np, seq_codes)

    def _retry_overflow_inner(self, regs_np, seq_codes):
        # np views of jax arrays are read-only; copy before merging
        regs_np = {k: np.array(v) for k, v in regs_np.items()}
        ovf = regs_np["overflow"]
        idx = np.flatnonzero(np.asarray(ovf))
        # cause routing: reads whose seeding-stage pools overflowed need
        # the full re-run (wider seeding machines); reads that only
        # overflowed chain/extension/transfer re-run with 1x seeding
        # and wide chain shapes — about half the escalated device work
        # on repeat-rich genomes
        seed_flag = np.asarray(regs_np.get(
            "ovf_seed", np.zeros(len(ovf), bool))).copy()
        # escalation accounting (scale campaigns report these)
        self.esc_reads = getattr(self, "esc_reads", 0) + len(idx)
        self.esc_calls = getattr(self, "esc_calls", 0)
        B = len(ovf)
        L = self.shapes.read_len

        def get_fn(flavor, level, B_esc):
            fn = self._esc_fns.get((flavor, level, B_esc))
            if fn is None:
                import dataclasses as _dc
                mk = {"full": self._escalated_shapes,
                      "k2w": self._k2_wide_shapes,
                      "cw": self._chain_wide_shapes}[flavor]
                esh = _dc.replace(mk(level), batch_reads=B_esc)
                fn = jax.jit(functools.partial(
                    device_align, opt=self._dev_opt, shapes=esh))
                self._esc_fns[(flavor, level, B_esc)] = fn
            return fn

        for level in range(1, self.ESCALATE_LEVELS + 1):
            still = []
            # seed-stage overflow goes through the K1-cheap k2-wide
            # flavor first; reads that STILL flag seed overflow get the
            # full everything-wide program at the next level
            seed_fl = "k2w" if level == 1 else "full"
            for flavor in (seed_fl, "cw"):
                want = seed_flag[idx] if flavor != "cw" \
                    else ~seed_flag[idx]
                sub_idx = idx[want]
                if len(sub_idx) == 0:
                    continue
                B_esc = 128
                while B_esc < min(len(sub_idx), 512):
                    B_esc *= 2
                B_esc = min(B_esc, max(B, 128))
                fn = get_fn(flavor, level, B_esc)
                for c0 in range(0, len(sub_idx), B_esc):
                    self.esc_calls += 1
                    chunk = sub_idx[c0:c0 + B_esc]
                    codes = np.full((B_esc, L), 4, np.int32)
                    lens = np.zeros(B_esc, np.int32)
                    active = np.zeros(B_esc, bool)
                    for j, b in enumerate(chunk):
                        s = seq_codes[b]
                        n = min(len(s), L)
                        codes[j, :n] = np.asarray(s[:n], np.int32)
                        lens[j] = n
                        active[j] = True
                    sub = fn(self.dfm, self.dref, jnp.asarray(codes),
                             jnp.asarray(lens), jnp.asarray(active),
                             lcp_tree=self.lcp_tree,
                             lcp_isa=self.lcp_isa)
                    sub_np = {k: np.asarray(v)
                              for k, v in sub._asdict().items()}
                    E_new = sub_np["valid"].shape[1]
                    E_cur = regs_np["valid"].shape[1]
                    if E_new > E_cur:
                        for k, v in regs_np.items():
                            if v.ndim == 2:
                                pad = np.zeros((B, E_new - E_cur),
                                               v.dtype)
                                regs_np[k] = np.concatenate([v, pad],
                                                            axis=1)
                    for j, b in enumerate(chunk):
                        for k, v in regs_np.items():
                            if v.ndim == 2:
                                v[b] = sub_np[k][j]
                        regs_np["overflow"][b] = sub_np["overflow"][j]
                        # a cw re-run that NOW flags seeding overflow
                        # promotes to the full flavor next level
                        seed_flag[b] = bool(
                            sub_np.get("ovf_seed",
                                       np.zeros(B_esc, bool))[j])
                        if sub_np["overflow"][j]:
                            still.append(b)
            idx = np.asarray(sorted(still), dtype=np.int64)
            if len(idx) == 0:
                break
        return regs_np

    def _device_regs(self, seq_codes):
        from .utils.profiling import PROF

        regs = self._device_regs_async(seq_codes)
        with PROF.phase("MEM_DEVICE"):
            return self._regs_to_np(regs, seq_codes)

    def finalize_batch(self, names, seq_codes, quals, regs_np, id0,
                       paired=False):
        """Host finalize of one batch's device regs -> SAM lines."""
        from .utils.profiling import PROF, WORKER_SAM

        with PROF.phase(WORKER_SAM):
            if paired:
                return finalize_pe_batch(self.pref, self.opt, names,
                                         seq_codes, quals, regs_np, id0)
            return finalize_se_batch(self.pref, self.opt, self.shapes,
                                     names, seq_codes, quals, regs_np,
                                     id0)

    def _reg_lists(self, seq_codes, regs):
        return _reg_lists_np(self.pref, self.opt, seq_codes, regs)


def finalize_se_batch(pref, opt, shapes, names, seq_codes, quals, regs_np,
                      id0):
    """Host finalize for a single-end batch: device regs -> SAM lines.
    Module-level and numpy-only so worker processes can run it
    (pipeline_stream.FinalizePool)."""
    reg_lists = _reg_lists_np(pref, opt, seq_codes, regs_np)
    # id0 may be a scalar base (ids = id0 + row) or a per-read id array
    # (the deferred-escalation flush finalizes reads gathered from many
    # batches; ids feed the hash_64 tie-breaks so they must be the
    # reads' ORIGINAL global ids for output identical to the sync path)
    ids = id0 if np.ndim(id0) else id0 + np.arange(len(reg_lists))
    # batch the reg2aln DP (CIGAR/MD) across the whole read batch
    jobs = []
    job_of = []
    for b, rl in enumerate(reg_lists):
        finalize.mark_primary(opt, rl, int(ids[b]))
        codes = np.asarray(seq_codes[b], np.int64)
        for k in finalize.selected_regs(opt, rl):
            jobs.append((codes, rl[k]))
            job_of.append((b, k))
    alns = finalize.reg2aln_batch(pref, opt, jobs) if jobs else []
    aln_maps = [dict() for _ in reg_lists]
    for (b, k), a in zip(job_of, alns):
        aln_maps[b][k] = a
    out = []
    for b, rl in enumerate(reg_lists):
        qual = quals[b] if quals else None
        out.extend(finalize.reg2sam(
            pref, opt, names[b], np.asarray(seq_codes[b], np.int64),
            qual, rl, int(ids[b]), alns_by_k=aln_maps[b]))
    return out


def finalize_pe_batch(pref, opt, names, seq_codes, quals, regs_np, id0):
    """Host finalize for a paired-end batch (insert-size inference +
    pairing + SAM); module-level for worker processes. seq_codes are
    interleaved [r1_0, r2_0, ...]; id0 counts PAIRS."""
    from .align import pair as pairmod

    B = len(seq_codes)
    reg_lists = _reg_lists_np(pref, opt, seq_codes, regs_np)
    reg_pairs = [(reg_lists[2 * i], reg_lists[2 * i + 1])
                 for i in range(B // 2)]
    pes = pairmod.pestat(opt, pref.l_pac, reg_pairs)
    codes_pairs = [(np.asarray(seq_codes[2 * i], np.int64),
                    np.asarray(seq_codes[2 * i + 1], np.int64))
                   for i in range(B // 2)]
    # batched mate rescue (kswv analogue) across the whole batch, then
    # per-pair pairing/SAM with rescue already applied
    pairmod.rescue_all(opt, pref, pes, reg_pairs, codes_pairs)
    out = []
    for i in range(B // 2):
        q1 = quals[2 * i] if quals else None
        q2 = quals[2 * i + 1] if quals else None
        l0, l1 = pairmod.sam_pe(
            opt, pref, pes, id0 + i,
            (names[2 * i], names[2 * i + 1]), codes_pairs[i],
            (q1, q2), list(reg_pairs[i]), rescue_done=True)
        out.extend(l0)
        out.extend(l1)
    return out


def _reg_lists_np(pref, opt, seq_codes, regs):
        """Device regs -> per-read dict lists through dedup/patch,
        sorted by score (mem_sort_dedup_patch output order).

        Arrays convert to nested Python lists ONCE (tolist) — per-element
        numpy scalar indexing was ~3x slower across the hot loop."""
        B = len(seq_codes)
        fields = ("rid", "qb", "qe", "rb", "re", "score", "truesc",
                  "sw_w", "seedcov", "seedlen0")
        cols = {f: np.asarray(regs[f]).tolist() for f in fields}
        valid_l = np.asarray(regs["valid"]).tolist()
        frac_l = np.asarray(regs["frac_rep"]).tolist()
        is_alt_l = np.asarray(pref.is_alt).tolist()
        E = len(valid_l[0]) if B else 0
        out = []
        for b in range(B):
            vb = valid_l[b]
            rl = []
            for e in range(E):
                if not vb[e]:
                    continue
                qb = cols["qb"][b][e]
                qe = cols["qe"][b][e]
                if qe <= qb:
                    continue
                rid = cols["rid"][b][e]
                rl.append(dict(
                    rid=rid, qb=qb, qe=qe, rb=cols["rb"][b][e],
                    re=cols["re"][b][e], score=cols["score"][b][e],
                    truesc=cols["truesc"][b][e], w=cols["sw_w"][b][e],
                    seedcov=cols["seedcov"][b][e],
                    seedlen0=cols["seedlen0"][b][e],
                    frac_rep=frac_l[b],
                    sub=0, csub=0, sub_n=0,
                    is_alt=is_alt_l[rid] if rid >= 0 else False,
                ))
            codes = np.asarray(seq_codes[b], np.int64)
            rl = finalize.sort_dedup_patch(pref, opt, codes, rl)
            out.append(rl)
        return out
