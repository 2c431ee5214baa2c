"""Sub-stage breakdown of the anchor-parallel seeding path."""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fgdp_tpu.config import AlignConfig
    from fgdp_tpu.index.fmindex import FMIndex
    from fgdp_tpu.index.reference import PackedReference
    from fgdp_tpu.ops.fm import DeviceFMIndex
    from fgdp_tpu.ops import smem as smemops

    rng = np.random.default_rng(0)
    n_ref = 2_000_000
    L, B = 151, 1024
    pref = PackedReference.from_contigs(
        ["chr1"], [rng.integers(0, 4, n_ref).astype(np.uint8)])
    fm = FMIndex.build(pref.codes)
    dfm = DeviceFMIndex.from_host(fm)
    opt = AlignConfig()

    pos = rng.integers(0, n_ref - L, B)
    codes = np.stack([pref.codes[p:p + L] for p in pos]).astype(np.int32)
    m = rng.random(codes.shape) < 0.01
    codes = np.where(m, rng.integers(0, 4, codes.shape), codes)
    lens = np.full(B, L, np.int32)
    codes, lens = jnp.asarray(codes), jnp.asarray(lens)

    nxfn = jax.jit(lambda c, l: smemops.anchor_next_x(dfm, c, l))
    chfn = jax.jit(lambda n, l: smemops.anchor_chain(n, l, B, L))

    def bench(name, f, *args):
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = f(*args)
        jax.block_until_ready(out)
        print(f"{name:16s} {(time.perf_counter()-t0)/3*1000:9.1f} ms",
              file=sys.stderr)
        return out

    nxt = bench("anchor_next_x", nxfn, codes, lens)
    vis = bench("anchor_chain", chfn, nxt, lens)

    is_anchor = np.asarray(vis) & (np.asarray(codes) < 4)
    print("anchors/read avg:", is_anchor.sum() / B, file=sys.stderr)

    NA = B * 24
    fa = jnp.asarray(is_anchor).reshape(-1)
    aslot = jnp.cumsum(fa.astype(jnp.int32)) - 1
    aslot = jnp.where(fa & (aslot < NA), aslot, NA)
    aidx = jnp.zeros(NA + 1, jnp.int32).at[aslot].set(
        jnp.arange(B * L, dtype=jnp.int32), mode="drop")[:NA]
    alive = jnp.zeros(NA + 1, bool).at[aslot].set(fa, mode="drop")[:NA]
    a_read = aidx // L
    a_x = aidx % L

    lanefn = jax.jit(lambda c, l, r, x, al: smemops.smem_one_pos_lanes(
        dfm, c, l, r, x, jnp.ones(NA, jnp.int32), al, opt.min_seed_len,
        64, 16))
    lanes = bench("one_pos_lanes64", lanefn, codes, lens, a_read, a_x, alive)
    lanefn2 = jax.jit(lambda c, l, r, x, al: smemops.smem_one_pos_lanes(
        dfm, c, l, r, x, jnp.ones(NA, jnp.int32), al, opt.min_seed_len,
        16, 16))
    bench("one_pos_lanes16", lanefn2, codes, lens, a_read, a_x, alive)

    mgfn = jax.jit(lambda ln, r, x, al: smemops.merge_lane_seeds(
        ln, r, x, al, B, 160))
    bench("merge", mgfn, lanes, a_read, a_x, alive)


if __name__ == "__main__":
    main()
