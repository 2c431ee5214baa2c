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
from ..ops import smem as smemops
from ..ops.fm import DeviceFMIndex
from ..ops.smem import SeedBatch

INT32_MAX = jnp.int32(2**31 - 1)


def collect_seeds(dfm: DeviceFMIndex, codes, lens, active, opt: AlignConfig,
                  max_seeds: int, prev_cap: int, k2_rounds: int = 8) -> SeedBatch:
    """Returns per-read seed buffers sorted by (m, n); codes int32[B, L]."""
    B, L = codes.shape
    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)

    # --- K1 ---
    seeds = smemops.smem_all_pos(dfm, codes, lens, jnp.ones(B, jnp.int32),
                                 active, opt.min_seed_len, max_seeds, prev_cap)
    k1_count = seeds.count

    # --- K2: derive per-read job lists from K1 output ---
    S = seeds.m.shape[1]
    slot_valid = jnp.arange(S)[None, :] < k1_count[:, None]
    qual = slot_valid & ((seeds.n + 1 - seeds.m) >= split_len) & \
        (seeds.s <= opt.split_width)
    rank = jnp.cumsum(qual.astype(jnp.int32), axis=1) - 1   # job index per slot
    J = k2_rounds
    bidx = jnp.arange(B)
    slot = jnp.where(qual & (rank < J), rank, J)
    job_x = jnp.zeros((B, J), jnp.int32).at[bidx[:, None], slot].set(
        (seeds.m + seeds.n + 1) >> 1, mode="drop")
    job_mi = jnp.zeros((B, J), jnp.int32).at[bidx[:, None], slot].set(
        seeds.s + 1, mode="drop")
    n_jobs = jnp.sum(qual, axis=1).astype(jnp.int32)
    k2_overflow = n_jobs > J

    def k2_round(r, seeds):
        on = active & (n_jobs > r)
        seeds, _ = smemops.smem_one_pos(dfm, codes, lens, job_x[:, r],
                                        job_mi[:, r], on, opt.min_seed_len,
                                        seeds, prev_cap)
        return seeds

    seeds = jax.lax.fori_loop(0, J, k2_round, seeds)

    # --- K3 ---
    if opt.max_mem_intv > 0:
        k3 = smemops.seed_strategy(dfm, codes, lens, active,
                                   opt.max_mem_intv, opt.min_seed_len + 1,
                                   max_seeds)
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
