"""Seed collection driver: K1 + K2 re-seeding + K3, merged and sorted.

Mirrors mem_collect_smem (reference src/bwamem.cpp:771-869):
  K1  all-position SMEMs, min_intv=1
  K2  re-seed at the midpoint of long low-occurrence K1 SMEMs with
      min_intv = occ+1 (one anchor pass per qualifying SMEM)
  K3  forward-only interval-capped seeding (max_mem_intv), minSeedLen+1
then a per-read stable sort by (start m, end n) — the reference's
ks_introsort(mem_intv1) on (m<<32|n), which is stable for the typical
per-read SMEM counts (insertion sort under 64 elements).

K2 differs structurally from the reference: instead of one flat worklist,
qualifying SMEMs are compacted per read and processed in J rounds of
batched one-anchor passes (round r handles the r-th job of every read).
Per-read job order equals the reference's matchArray scan order, so the
merged, stably-sorted output is identical; reads with more than
`k2_rounds` qualifying SMEMs set the overflow flag.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import AlignConfig
from ..ops import fm as fmops
from ..ops import smem as smemops
from ..ops import smem_sweep as sweepops
from ..ops.fm import DeviceFMIndex
from ..ops.smem import SeedBatch

INT32_MAX = 2**31 - 1  # python int: literal, not a shared captured Array


def collect_seeds(dfm: DeviceFMIndex, dref, codes, lens, active,
                  opt: AlignConfig, max_seeds: int, prev_cap: int = 20,
                  k2_per_read: int = 2, lane_emit_cap: int = 16,
                  use_sweep: bool = True, scale: int = 1,
                  lcp_tree=None, lcp_isa=None,
                  k1_emit_cap: int | None = None,
                  k3_emit_cap: int | None = None,
                  k2_scale: int = 0) -> SeedBatch:
    """Returns per-read seed buffers sorted by (m, n); codes int32[B, L].

    K1 runs anchor-parallel: anchor positions are discovered by a light
    all-position forward pass + pointer doubling, then the full one-pos
    machine runs one lane per (read, anchor) — and K2 jobs reuse the same
    flattened machine (ops/smem.py). Capacities: NA = B*anchors_per_read
    anchor lanes, NK = B*k2_per_read K2 lanes; excess flags overflow.
    """
    B, L = codes.shape
    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
    # `scale` widens every internal lane/entry cap (the overflow
    # escalation ladder, pipeline.Aligner._retry_overflow): prev-array
    # depth, forward entry slots, and the batch-shared backward lane
    # pool all grow together, since any of them can starve a read on
    # repetitive references
    k2s = k2_scale or scale       # K2 pools scale independently of K1
    prev_cap = prev_cap * k2s
    k2_per_read = k2_per_read * k2s

    # --- K1. Default: the self-restarting sweep + independent backward
    # entry lanes (ops/smem_sweep.py) — near-full lane occupancy, ~2
    # gather rows per unit of work, and throughput that scales with
    # batch size into the large-N gather plateau (the wave machine is
    # flat in B). use_sweep=False falls back to the wave machine
    # (ops/smem.py), which the sweep is parity-tested against. ---
    # Emit-buffer widths: the machines' _append_seed one-hots pay
    # O(B x S) bandwidth EVERY while step, so narrower buffers are
    # faster — but a read overflowing its cap escalates (full re-run at
    # 2x shapes), and on repeat-rich genomes narrow caps make that the
    # common case (BatchShapes.k1_emit_cap notes). Default: full width.
    s_k1 = min(k1_emit_cap * scale, max_seeds) if k1_emit_cap \
        else max_seeds
    s_k3 = min(k3_emit_cap * scale, max_seeds) if k3_emit_cap \
        else max_seeds
    if lcp_tree is not None:
        # single-pass LCP-tree engine (ops/smem_lcp.py) — the LISA
        # all_SMEMs analogue; same SMEM set as the sweep (parity-tested),
        # ~O(L) extension steps per read in one lane per read
        from ..ops import smem_lcp as lcpops
        seeds = lcpops.smem_all_lcp(
            dfm, lcp_tree, lcp_isa, codes, lens, active,
            opt.min_seed_len, s_k1, ref_codes16=dref.codes16,
            max_rounds=24 * scale)
    elif use_sweep:
        seeds = sweepops.smem_all_pos_sweep(
            dfm, dref.codes16, codes, lens, jnp.ones(B, jnp.int32),
            active, opt.min_seed_len, s_k1, prev_cap,
            entry_cap=min(2 * L + 16, 192 * scale),
            bwd_mult=44 * scale)
    else:
        seeds = smemops.smem_all_pos(
            dfm, dref.codes, dref.l_pac, codes, lens,
            jnp.ones(B, jnp.int32), active,
            opt.min_seed_len, s_k1, prev_cap,
            ref_codes16=dref.codes16)
    k1_count = seeds.count

    # --- K2: qualifying K1 SMEMs re-seeded at their midpoint. Jobs are
    # compacted GLOBALLY (typical reads have 0-1), ordered by (read, K1
    # slot) = the reference's matchArray scan order. ---
    S = seeds.m.shape[1]
    slot_valid = jnp.arange(S)[None, :] < k1_count[:, None]
    qual = slot_valid & ((seeds.n + 1 - seeds.m) >= split_len) & \
        (seeds.s <= opt.split_width)
    NK = B * k2_per_read
    fq = qual.reshape(-1)
    # order-preserving compaction via one ascending sort of masked
    # indices (the former [B*S]-element one-hot scatters measured 6.5 ms
    # at B=4096; see smem_sweep.flatten_entries for the same move)
    key = jnp.where(fq, jnp.arange(B * S, dtype=jnp.int32),
                    jnp.int32(B * S))
    l_src = jax.lax.sort(key)[:NK]
    k_on = l_src < B * S
    qidx = jnp.where(k_on, l_src, 0)
    k_read = qidx // S
    job_x = ((seeds.m + seeds.n + 1) >> 1).reshape(-1)[qidx]
    job_mi = (seeds.s + 1).reshape(-1)[qidx]
    # a read overflows iff it owns a qual job ranked past NK (compaction
    # is order-preserving, so those are exactly the reads whose
    # inclusive job-count prefix crosses the cap)
    ends = jnp.cumsum(fq.astype(jnp.int32)).reshape(B, S)[:, -1]
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), ends[:-1]])
    k2_overflow = (ends > NK) & (ends > starts)

    import os
    if lcp_tree is not None and os.environ.get("FGDP_K2_SWEEP") != "1":
        # LCP-engine K2 (the fmi_shrink analogue, ops/smem_k2lcp.py):
        # the job's interval at q[x..n] comes from an ISA jump + tree
        # ascent instead of a forward re-search, and the backward pass
        # is the K1 single-pass walk with the s >= min_intv threshold —
        # one lane per job, replacing the NK*bwd_mult backward pool
        # that dominated K2 device time in round 4. FGDP_K2_SWEEP=1
        # falls back to the sweep machines (operational escape hatch;
        # both paths are parity-tested, tests/test_smem_k2lcp.py).
        from ..ops import smem_k2lcp
        job_k = seeds.k.reshape(-1)[qidx]
        job_m = seeds.m.reshape(-1)[qidx]
        pos_occ = jnp.where(
            job_k < -1, -job_k - 2,
            fmops.sa_lookup(dfm, jnp.maximum(job_k, 0)))
        job_pos = pos_occ + (job_x - job_m)
        job_d0 = seeds.n.reshape(-1)[qidx] - job_x + 1
        seeds = smem_k2lcp.k2_reseed_lcp(
            dfm, lcp_tree, lcp_isa, codes, lens, k_read, job_x,
            job_mi, job_pos, job_d0, k_on, opt.min_seed_len, B, s_k1,
            into=seeds, sj_cap=16 * k2s, ascent_cap=64 * k2s,
            max_rounds=48 * k2s)
    elif use_sweep:
        # walk=False: K2 min_intv = occ + 1 >= 2, the s==1 walk branch
        # cannot trigger
        # bwd_mult 16: the shared backward-lane pool was the dominant
        # K2-side overflow on the chr20-scale genome (drop_ovf 2000 ->
        # 870 of 4096 reads at 16; saturated beyond — probe_overflow.py)
        seeds = sweepops.smem_lanes_sweep(
            dfm, dref.codes16, codes, lens, k_read, job_x, job_mi, k_on,
            opt.min_seed_len, prev_cap, B, s_k1, into=seeds,
            entry_cap=prev_cap + 2, bwd_mult=16 * k2s, walk=False)
    else:
        k2lanes, _ = smemops.smem_one_pos_lanes(
            dfm, dref.codes, dref.l_pac, codes, lens, k_read, job_x,
            job_mi, k_on, opt.min_seed_len, prev_cap, lane_emit_cap,
            ref_codes16=dref.codes16)
        seeds = smemops.merge_lane_seeds(k2lanes, k_read, qidx % S, k_on,
                                         B, s_k1, into=seeds)

    # --- K3 ---
    if opt.max_mem_intv > 0:
        k3 = smemops.seed_strategy(dfm, codes, lens, active,
                                   opt.max_mem_intv, opt.min_seed_len + 1,
                                   s_k3)
    else:
        k3 = smemops._empty_seeds(B, 1)

    # --- merge + stable per-read sort by (m, n) ---
    m = jnp.concatenate([seeds.m, k3.m], axis=1)
    n = jnp.concatenate([seeds.n, k3.n], axis=1)
    k = jnp.concatenate([seeds.k, k3.k], axis=1)
    s = jnp.concatenate([seeds.s, k3.s], axis=1)
    St = m.shape[1]
    valid = jnp.concatenate(
        [jnp.arange(seeds.m.shape[1])[None, :] < seeds.count[:, None],
         jnp.arange(k3.m.shape[1])[None, :] < k3.count[:, None]], axis=1)
    key_m = jnp.where(valid, m, INT32_MAX)
    key_n = jnp.where(valid, n, INT32_MAX)
    key_m, key_n, k, s = jax.lax.sort(
        (key_m, key_n, k, s), dimension=1, is_stable=True, num_keys=2)
    count = (seeds.count + k3.count).astype(jnp.int32)
    out_valid = jnp.arange(St)[None, :] < count[:, None]
    return SeedBatch(
        m=jnp.where(out_valid, key_m, 0),
        n=jnp.where(out_valid, key_n, 0),
        k=k, s=s, count=count,
        overflow=seeds.overflow | k3.overflow | k2_overflow,
    )
