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
                 lcp_tree=None, lcp_isa=None, salt=None):
    """codes int32[B, L] -> AlnRegBatch (jit-able).

    `salt`: optional int32 array whose SHAPE perturbs the compiled
    program (its runtime value is all-zeros and only feeds a
    never-true overflow term) — the recovery lever for the jax
    shared-constant dispatch conflation documented in BASELINE.md
    "Device-program isolation": on an INVALID_ARGUMENT execution
    failure the Aligner bumps the salt and re-jits to a fresh program
    identity."""
    # codes may arrive int8 (the upload is 4x narrower through the
    # relay link; _device_regs_async sends int8) — widen on device
    codes = codes.astype(jnp.int32)
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
    regs = compact_regs(regs, shapes.transfer_regs)
    if salt is not None:
        # never true at runtime (salt is zeros); keeps the salt arg
        # live so its shape reaches the executable fingerprint
        regs = regs._replace(
            overflow=regs.overflow | (jnp.sum(salt) < jnp.int32(0)))
    return regs


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


# reg-batch wire format: every AlnRegBatch field packed into ONE int32
# device array. The relay charges ~28 ms of fixed cost per fetched
# array on top of ~26 MB/s of bandwidth (measured round 5: fetching the
# 14 reg fields cost 389 ms/batch vs 67 ms for one array of the same
# bytes), so the device->host sync ships a single buffer.
_PACK_I32 = ("rid", "rb", "re")
_PACK_I16 = ("qb", "qe", "score", "truesc", "sw_w", "seedcov",
             "seedlen0")


def pack_regs(regs, cap_per_read: int = 4) -> jax.Array:
    """AlnRegBatch -> one flat int32[1 + 2B + 7*CAP] wire buffer.

    Only VALID reg slots ship (typical reads carry 1-3 of the E=16
    transfer slots, so padded [B, E] fields were ~4x dead bytes):
    slots compact order-preservingly into CAP = cap_per_read * B rows
    of 7 words (rid, rb, re, qb|qe, score|truesc, sw_w|seedcov,
    seedlen0). Header: word 0 = E; per read, one word packing
    (count | overflow<<16 | ovf_seed<<17) and one frac_rep bitcast.
    Reads whose slots fall past CAP flag overflow (escalation re-runs
    them, like every other static cap)."""
    B, E = regs.valid.shape
    CAP = cap_per_read * B
    fv = regs.valid.reshape(-1)
    key = jnp.where(fv, jnp.arange(B * E, dtype=jnp.int32),
                    jnp.int32(B * E))
    l_src = jax.lax.sort(key)[:CAP]
    l_on = l_src < B * E
    src = jnp.where(l_on, l_src, 0)
    counts = regs.valid.astype(jnp.int32).sum(axis=1)
    csum = jnp.cumsum(counts)
    kept = jnp.minimum(counts,
                       jnp.maximum(jnp.int32(CAP) - (csum - counts), 0))
    cap_ovf = kept < counts

    i16 = [getattr(regs, f).astype(jnp.int32).reshape(-1)
           for f in _PACK_I16]
    cols = [regs.rid.astype(jnp.int32).reshape(-1),
            regs.rb.astype(jnp.int32).reshape(-1),
            regs.re.astype(jnp.int32).reshape(-1),
            (i16[0] & 0xffff) | (i16[1] << 16),
            (i16[2] & 0xffff) | (i16[3] << 16),
            (i16[4] & 0xffff) | (i16[5] << 16),
            i16[6] & 0xffff]
    tbl = jnp.stack(cols, axis=1)            # [B*E, 7]
    payload = jnp.where(l_on[:, None], tbl[src], 0)
    ovf = regs.overflow | cap_ovf
    hdr = jnp.stack(
        [kept | (ovf.astype(jnp.int32) << 16)
         | (regs.ovf_seed.astype(jnp.int32) << 17),
         jax.lax.bitcast_convert_type(
             regs.frac_rep.astype(jnp.float32), jnp.int32)], axis=1)
    return jnp.concatenate([jnp.asarray([E, B], jnp.int32),
                            hdr.reshape(-1), payload.reshape(-1)])


def unpack_regs(buf: np.ndarray) -> dict:
    """Inverse of pack_regs -> {field: np array} with [B, E] layouts
    matching AlnRegBatch._asdict() (int16 fields upcast to int32;
    invalid slots zero)."""
    buf = np.ascontiguousarray(buf)
    E, B = int(buf[0]), int(buf[1])
    hdr = buf[2:2 + 2 * B].reshape(B, 2)
    payload = buf[2 + 2 * B:].reshape(-1, 7)
    counts = hdr[:, 0] & 0xffff
    out = {"overflow": (hdr[:, 0] & (1 << 16)) != 0,
           "ovf_seed": (hdr[:, 0] & (1 << 17)) != 0,
           "frac_rep": hdr[:, 1].view(np.float32)}
    valid = np.arange(E, dtype=np.int32)[None, :] < counts[:, None]
    out["valid"] = valid
    offs = np.cumsum(counts) - counts
    rows = np.flatnonzero(valid.reshape(-1))
    b_of = rows // E
    e_of = rows % E
    src = offs[b_of] + e_of
    half = payload.astype(np.int32).view(np.int16).reshape(-1, 14)
    names_i16 = dict(zip(_PACK_I16, (6, 7, 8, 9, 10, 11, 12)))
    for i, f in enumerate(_PACK_I32):
        a = np.zeros((B, E), np.int32)
        a.reshape(-1)[rows] = payload[src, i]
        out[f] = a
    for f, col in names_i16.items():
        a = np.zeros((B, E), np.int32)
        a.reshape(-1)[rows] = half[src, col].astype(np.int32)
        out[f] = a
    return out


def device_align_packed(dfm, dref, codes, lens, active, opt, shapes,
                        lcp_tree=None, lcp_isa=None, salt=None):
    """device_align + single-buffer wire packing (see pack_regs).

    Escalated programs (any widened shape) ship at full per-read width:
    their batches are repeat-dense by construction, so the primary's
    6-slots-per-read average would re-flag them in a loop; primary
    batches average 1-3 valid regs/read, so cap 6 is generous there."""
    cap = shapes.pack_cap or shapes.transfer_regs
    return pack_regs(device_align(dfm, dref, codes, lens, active,
                                  opt=opt, shapes=shapes,
                                  lcp_tree=lcp_tree, lcp_isa=lcp_isa,
                                  salt=salt), cap_per_read=cap)


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
            device_align_packed, opt=self._dev_opt, shapes=self.shapes))
        self._esc_fns = {}        # escalation level -> jitted program
        self._salts = {}          # program key -> relay-loss salt level
        self._warm = False
        # escalation-ladder placement: "same" = in-process on the
        # primary's device (default); "worker" = clean-env CPU
        # subprocess per rung (EscalationPool), the hard-isolation
        # fallback for jax dispatch bugs of the round-5 class (shared
        # captured-constant conflation between same-source jit
        # variants, see BASELINE.md "device-program isolation");
        # "cpu" = in-process CPU backend.
        import os as _os
        self._esc_mode = _os.environ.get("FGDP_ESC_MODE", "same")
        self._fm_host = fm
        self._lcp_host = lcp if lcp else None
        self._cpu = None          # lazy CPU-backend index context
        self._esc_pool = None     # lazy clean-env CPU worker process

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
        # int8 wire format: 4x fewer upload bytes on the relay link
        # (device_align widens to int32 on arrival)
        codes = np.full((B, L), 4, np.int8)
        lens = np.zeros(B, np.int32)
        for i, s in enumerate(seq_codes):
            n = min(len(s), L)
            codes[i, :n] = np.asarray(s[:n], np.int8)
            lens[i] = n
        # first call compiles; report it apart from steady-state device
        # time (display_stats taxonomy: MEM_COLLECT+MEM_ALN2 are fused in
        # one device program here)
        phase = "MEM_DEVICE" if self._warm else "JIT_COMPILE"
        with PROF.phase(phase):
            salted = 0
            for attempt in range(4):
                try:
                    regs = self._fn(self.dfm, self.dref,
                                    jnp.asarray(codes),
                                    jnp.asarray(lens), jnp.ones(B, bool),
                                    lcp_tree=self.lcp_tree,
                                    lcp_isa=self.lcp_isa,
                                    salt=self._salt_arr("primary"))
                    break
                except Exception as e:  # noqa: BLE001
                    import sys
                    if self._is_transient(e) and attempt < 3:
                        import time as _t
                        print(f"[fgdp] transient relay error on the "
                              f"align dispatch; retrying: "
                              f"{str(e)[:90]}", file=sys.stderr)
                        _t.sleep(2.0)
                        continue
                    if salted or not self._is_relay_loss(e):
                        raise
                    salted = 1
                    self._salts["primary"] = \
                        self._salts.get("primary", 0) + 1
                    print(f"[fgdp] align executable lost (jit-variant "
                          f"conflation); re-jitting with salt "
                          f"{self._salts['primary']}", file=sys.stderr)
        self._warm = True
        # start the device->host copy now: it completes behind the
        # next batches' compute, so _regs_to_np's np.asarray is a wait,
        # not a fresh round-trip (the relay link is the bottleneck;
        # regs is ONE packed buffer — see pack_regs)
        try:
            regs.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass
        return regs

    ESCALATE_LEVELS = 2

    # ---- relay executable-loss recovery --------------------------------
    # The axon relay can lose a loaded executable once several large
    # programs coexist in one process: its next execution fails with
    # INVALID_ARGUMENT "TPU backend error" (empirically, executable
    # pairs whose 64-bit launch keys agree mod 8 conflict — reproduced
    # and bisected in round 5; the r4->r5 program set re-rolled the
    # fingerprints into a conflicting pair, which is also the mechanism
    # behind bench crashes after warming the escalation ladder).
    # Recovery: bump a per-program SALT whose array shape feeds the
    # fingerprint (device_align `salt` arg) and re-jit — a fresh
    # fingerprint re-registers the program. One compile per collision.

    def _salt_arr(self, key):
        return jnp.zeros(1 + self._salts.get(key, 0), jnp.int32)

    def _esc_ctx(self):
        """(dfm, dref, lcp_tree, lcp_isa, device) for escalated re-runs:
        the primary's own context ("same"/"tpu" modes), or a
        lazily-built CPU-backend copy of the index ("cpu" mode)."""
        if self._esc_mode != "cpu":
            return (self.dfm, self.dref, self.lcp_tree, self.lcp_isa,
                    None)
        if self._cpu is None:
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                dfm = DeviceFMIndex.from_host(self._fm_host)
                dref = DeviceReference(self.pref)
                if self._lcp_host is not None:
                    tree = jnp.asarray(self._lcp_host.tree)
                    isa_ = jnp.asarray(self._lcp_host.isa)
                else:
                    tree = isa_ = None
            self._cpu = (dfm, dref, tree, isa_, cpu)
        return self._cpu

    def _esc_exec(self, flavor, level, B_esc, codes, lens, active):
        """Run one escalated chunk; returns {field: np.ndarray}.

        Under the axon relay ("worker" mode, the default there) the
        chunk runs in a CLEAN-ENV CPU subprocess: the relay loses track
        of loaded executables when several large programs coexist in
        one process — for on-relay programs AND for remote-compiled
        CPU programs of the same process — so the only robust placement
        for the ladder's extra executables is a process that never
        touches the relay (same isolation as FinalizePool workers).
        On real PJRT TPU runtimes ("same") the ladder stays on-device."""
        if self._esc_mode == "worker":
            if self._esc_pool is None:
                self._esc_pool = EscalationPool(self)
            return self._esc_pool.run(flavor, level, B_esc, codes, lens,
                                      active)
        return self._run_esc_chunk(flavor, level, B_esc, codes, lens,
                                   active)

    def _run_esc_chunk(self, flavor, level, B_esc, codes, lens, active):
        """In-process escalated execution with relay-loss salt retry."""
        import contextlib

        fn = self._esc_fn(flavor, level, B_esc)
        esc_key = (flavor, level, B_esc)
        e_dfm, e_dref, e_tree, e_isa, e_dev = self._esc_ctx()
        cm = jax.default_device(e_dev) if e_dev is not None \
            else contextlib.nullcontext()
        salted = 0
        for attempt in range(4):
            try:
                with cm:
                    sub = fn(e_dfm, e_dref, jnp.asarray(codes),
                             jnp.asarray(lens), jnp.asarray(active),
                             lcp_tree=e_tree, lcp_isa=e_isa,
                             salt=self._salt_arr(esc_key))
                return unpack_regs(np.asarray(sub))
            except Exception as e:  # noqa: BLE001
                import sys
                if self._is_transient(e) and attempt < 3:
                    import time as _t
                    print(f"[fgdp] transient relay error on {esc_key}; "
                          f"retrying: {str(e)[:90]}", file=sys.stderr)
                    _t.sleep(2.0)
                    continue
                if salted or not self._is_relay_loss(e):
                    raise
                salted = 1
                self._salts[esc_key] = self._salts.get(esc_key, 0) + 1
                print(f"[fgdp] relay lost escalated executable "
                      f"{esc_key}; re-jitting with salt "
                      f"{self._salts[esc_key]}", file=sys.stderr)

    @staticmethod
    def _is_relay_loss(e) -> bool:
        return "INVALID_ARGUMENT" in str(e)

    @staticmethod
    def _is_transient(e) -> bool:
        """Relay/compile-server infra hiccups: retry the SAME program
        (no salt bump) — e.g. 'INTERNAL: .../remote_compile: read body:
        response body closed before all bytes were read' killed a
        campaign mid-warm in round 5."""
        msg = str(e)
        return ("remote_compile" in msg or "response body closed" in msg
                or "Socket closed" in msg or "UNAVAILABLE" in msg)

    def _regs_to_np(self, regs, seq_codes=None, raw_codes=None):
        # int16 fields ride the wire narrow (compact_regs); the host
        # finalize code computes in plain int — upcast on arrival
        def conv(r):
            return unpack_regs(np.asarray(r))
        try:
            out = conv(regs)
        except Exception as e:  # noqa: BLE001 — relay loss recovery
            if raw_codes is None or not self._is_relay_loss(e):
                raise
            import sys
            self._salts["primary"] = self._salts.get("primary", 0) + 1
            print(f"[fgdp] relay lost the align executable; re-jitting "
                  f"with salt {self._salts['primary']}", file=sys.stderr)
            out = conv(self._device_regs_async(raw_codes))
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
                           pack_cap=0, seed_scale=s.seed_scale * f)

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
                           pack_cap=0,
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
                           pack_cap=0,
                           jobs_pool_per_read=s.max_seeds * 2 * f,
                           ext_jobs_per_read=6 * f)

    def _esc_fn(self, flavor, level, B_esc):
        """Jitted escalated device program for one ladder rung."""
        fn = self._esc_fns.get((flavor, level, B_esc))
        if fn is None:
            import dataclasses as _dc
            mk = {"full": self._escalated_shapes,
                  "k2w": self._k2_wide_shapes,
                  "cw": self._chain_wide_shapes}[flavor]
            esh = _dc.replace(mk(level), batch_reads=B_esc)
            fn = jax.jit(functools.partial(
                device_align_packed, opt=self._dev_opt, shapes=esh))
            self._esc_fns[(flavor, level, B_esc)] = fn
        return fn

    def warm_escalation(self, B_esc: int = 128, levels=None,
                        rungs=None):
        """Compile + run every escalation-ladder rung reachable from the
        primary program at the B_esc bucket.

        The ladder compiles lazily, so the FIRST overflowing batch of a
        run pays a full device-program compile (tens of seconds) for
        each (flavor, level) it reaches — round 4's e2e 'regression'
        (19.7k -> 12.4k reads/s, BENCH_r04) was exactly such compiles
        landing inside the bench's timed pass once the cause-routed
        flavors tripled the program space and honest overflow flags
        made them reachable. Steady-state measurement (and any
        latency-sensitive serving deployment) warms the rungs up front;
        the reference has no analogue because its per-read allocation
        never re-runs anything (bwamem.cpp:879-1128)."""
        if rungs is None:
            rungs = []
            for level in range(1, self.ESCALATE_LEVELS + 1):
                seed_fl = "k2w" if level == 1 else "full"
                rungs += [(seed_fl, level), ("cw", level)]
            if levels is not None:
                rungs = [r for r in rungs if r[1] in levels]
        L = self.shapes.read_len
        codes = np.zeros((B_esc, L), np.int32)
        lens = np.full(B_esc, L, np.int32)
        active = np.zeros(B_esc, bool)       # compile + execute, no work
        for flavor, level in rungs:
            self._esc_exec(flavor, level, B_esc, codes, lens, active)

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
                # worker-mode rungs run on host cores: smaller buckets
                # cut the per-flush CPU work ~4x at headline overflow
                # counts (a handful of reads per 64k). On-device rungs
                # batch BIG: the r5 campaign measured escalated reads at
                # ~3.8 ms/read in 512-wide launches vs 0.07 ms/read for
                # the primary — fuller launches amortize the widened
                # program's fixed cost (cw carries ~70% of the tail and
                # is the cheapest flavor, so it gets the largest cap).
                B_floor = 32 if self._esc_mode == "worker" else 128
                cap_fl = 512 if self._esc_mode == "worker" else \
                    {"k2w": 1024, "cw": 2048, "full": 512}[flavor]
                # NOTE: clamp only to pow2 buckets — clamping to the
                # (arbitrary) flush length compiled one-off shapes like
                # B_esc=1532 inside the r5 campaign's timed pass
                B_esc = B_floor
                while B_esc < min(len(sub_idx), cap_fl):
                    B_esc *= 2
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
                    sub_np = self._esc_exec(flavor, level, B_esc,
                                            codes, lens, active)
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
            return self._regs_to_np(regs, seq_codes,
                                    raw_codes=seq_codes)

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


_ESC_AL = None


def _esc_worker_init(pref_path, fm_path, lcp_path, opt, shapes):
    global _ESC_AL
    from .index.fmindex import FMIndex
    from .index.lcptree import LcpTree
    from .index.reference import PackedReference

    pref = PackedReference.load(pref_path)
    fm = FMIndex.load(fm_path)
    lcp = LcpTree.load(lcp_path) if lcp_path else False
    _ESC_AL = Aligner(pref, fm, opt=opt, shapes=shapes, lcp=lcp)


def _esc_worker_run(args):
    flavor, level, B_esc, codes, lens, active = args
    return _ESC_AL._run_esc_chunk(flavor, level, B_esc, codes, lens,
                                  active)


class EscalationPool:
    """Clean-environment CPU worker processes for the escalation ladder
    — ONE process per (flavor, level, B_esc) rung.

    Two bugs force this isolation (both reproduced + bisected in
    round 5, see BASELINE.md "device-program isolation"):
      * the axon relay loses track of loaded executables once several
        large programs coexist in one process (re-executions fail with
        INVALID_ARGUMENT), and
      * jax 0.9.0's dispatch conflates same-source jit variants
        (different shapes of the same function): re-executing one after
        running another fails with "Execution supplied N buffers but
        compiled program expected M" — on plain CPU, no relay involved.
    A process that only ever runs ONE device_align variant can hit
    neither. Workers strip the axon plugin from PYTHONPATH and pin
    JAX_PLATFORMS=cpu, so the main process keeps exactly one large
    resident TPU executable (the primary align program). Worker
    compiles land in their own persistent cache (jaxcache_escworker)
    and amortize across runs."""

    def __init__(self, aligner: "Aligner"):
        import os
        import tempfile

        self._tmpd = tempfile.mkdtemp(prefix="fgdp_escw_")
        self._pref_path = os.path.join(self._tmpd, "p.ref")
        self._fm_path = os.path.join(self._tmpd, "fm.npz")
        aligner.pref.save(self._pref_path)
        aligner._fm_host.save(self._fm_path)
        self._lcp_path = ""
        if aligner._lcp_host is not None:
            self._lcp_path = os.path.join(self._tmpd, "lcp.npz")
            aligner._lcp_host.save(self._lcp_path)
        self._opt = aligner.opt
        self._shapes = aligner.shapes
        self._ex = {}             # (flavor, level, B_esc) -> executor

    def _executor(self, key):
        ex = self._ex.get(key)
        if ex is not None:
            return ex
        import concurrent.futures
        import multiprocessing
        import os

        saved = {k: os.environ.get(k)
                 for k in ("PYTHONPATH", "JAX_PLATFORMS",
                           "JAX_COMPILATION_CACHE_DIR",
                           "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS")}
        pp = [p for p in os.environ.get("PYTHONPATH", "").split(":")
              if p and "axon" not in p]
        os.environ["PYTHONPATH"] = ":".join(pp)
        os.environ["JAX_PLATFORMS"] = "cpu"
        # own cache dir: the shared one holds REMOTE-compiled CPU
        # artifacts whose target-machine features mismatch this host
        os.environ["JAX_COMPILATION_CACHE_DIR"] = \
            "/tmp/jaxcache_escworker"
        os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
        try:
            ctx = multiprocessing.get_context("spawn")
            ex = concurrent.futures.ProcessPoolExecutor(
                max_workers=1, mp_context=ctx,
                initializer=_esc_worker_init,
                initargs=(self._pref_path, self._fm_path, self._lcp_path,
                          self._opt, self._shapes))
            list(ex.map(_worker_noop, [0]))
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        self._ex[key] = ex
        return ex

    def run(self, flavor, level, B_esc, codes, lens, active):
        key = (flavor, level, int(B_esc))
        return self._executor(key).submit(
            _esc_worker_run,
            (flavor, level, int(B_esc), np.asarray(codes),
             np.asarray(lens), np.asarray(active))).result()

    def shutdown(self):
        import shutil
        for ex in self._ex.values():
            ex.shutdown()
        shutil.rmtree(self._tmpd, ignore_errors=True)


def _worker_noop(_):
    return 0


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
    # batched mate rescue (kswv analogue) across the whole batch
    pairmod.rescue_all(opt, pref, pes, reg_pairs, codes_pairs)
    # plan every pair first, then ONE batched reg2aln DP over all
    # selected regs (the SE path's batching; the scalar per-reg DP
    # measured 5.8 s of a 4096-read batch = ~85% of PE finalize)
    plans = [pairmod.sam_pe_plan(opt, pref, pes, id0 + i,
                                 list(reg_pairs[i]))
             for i in range(B // 2)]
    jobs, jkeys = [], {}
    for i, plan in enumerate(plans):
        a = reg_pairs[i]
        if plan["mode"] == "paired":
            want = [(e, plan["z"][e]) for e in (0, 1)]
        else:
            want = [(e, plan["which"][e]) for e in (0, 1)
                    if plan["which"][e] is not None]
            want += [(e, k) for e in (0, 1)
                     for k in finalize.selected_regs(opt, a[e])]
        for e, k in want:
            if (i, e, k) not in jkeys:
                jkeys[(i, e, k)] = len(jobs)
                jobs.append((codes_pairs[i][e], a[e][k]))
    alns = finalize.reg2aln_batch(pref, opt, jobs) if jobs else []
    per_pair = {}
    for (i, e, k), j in jkeys.items():
        per_pair.setdefault(i, ({}, {}))[e][k] = j
    out = []
    for i, plan in enumerate(plans):
        a = reg_pairs[i]
        pj = per_pair.get(i, ({}, {}))

        def aln_of(e, k, i=i, pj=pj):
            if k is None:
                return finalize.reg2aln(pref, opt, codes_pairs[i][e],
                                        None)
            j = pj[e].get(k)
            # reg2aln mutates nothing, but aln dicts are mutated by the
            # emitters (flags/mapq/xa) — hand each consumer a copy
            return dict(alns[j]) if j is not None else finalize.reg2aln(
                pref, opt, codes_pairs[i][e], a[e][k])

        maps = ({k: dict(alns[j]) for k, j in pj[0].items()},
                {k: dict(alns[j]) for k, j in pj[1].items()})
        q1 = quals[2 * i] if quals else None
        q2 = quals[2 * i + 1] if quals else None
        l0, l1 = pairmod.sam_pe_emit(
            opt, pref, plan, id0 + i,
            (names[2 * i], names[2 * i + 1]), codes_pairs[i],
            (q1, q2), list(reg_pairs[i]), aln_of=aln_of,
            alns_by_k=maps)
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
