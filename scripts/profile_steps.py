"""Count while-loop iterations in the seeding/chaining machines.

Sizes the fixed per-step overhead opportunity: every while_loop
iteration costs ~0.1 ms of scheduling regardless of lane width
(bench_gather.py chain64), so total steps x 0.1 ms is the floor the
loops pay before any lane work.
"""

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fgdp_tpu.config import AlignConfig
    from fgdp_tpu.index.fmindex import FMIndex
    from fgdp_tpu.index.reference import DeviceReference, PackedReference
    from fgdp_tpu.ops.fm import DeviceFMIndex
    from fgdp_tpu.ops import smem as smemops

    rng = np.random.default_rng(0)
    n_ref, L, B = 2_000_000, 151, 1024
    pref = PackedReference.from_contigs(
        ["chr1"], [rng.integers(0, 4, n_ref).astype(np.uint8)])
    fm = FMIndex.build(pref.codes)
    dfm = DeviceFMIndex.from_host(fm)
    dref = DeviceReference(pref)
    opt = AlignConfig()

    pos = rng.integers(0, n_ref - L, B)
    codes = np.stack([pref.codes[p:p + L] for p in pos]).astype(np.int32)
    m = rng.random(codes.shape) < 0.01
    codes = jnp.asarray(np.where(m, rng.integers(0, 4, codes.shape), codes))
    lens = jnp.full(B, L, jnp.int32)
    active = jnp.ones(B, bool)
    mi = jnp.ones(B, jnp.int32)

    # monkeypatch while_loop to count iterations per call site
    import jax.lax as lax
    orig = lax.while_loop
    counters = []

    def counting_while(cond, body, init):
        slot = len(counters)
        counters.append(0)

        def body2(st):
            c, inner = st
            return (c + 1, body(inner))

        c, out = orig(lambda st: cond(st[1]), body2, (jnp.int32(0), init))
        counters[slot] = c
        return out

    lax.while_loop = counting_while
    smemops.jax.lax.while_loop = counting_while
    try:
        seeds = smemops.smem_all_pos(
            dfm, dref.codes, dref.l_pac, codes, lens, mi, active,
            opt.min_seed_len, 64, 20, ref_codes16=dref.codes16)
        k1 = [int(c) for c in counters]
        counters.clear()
        k3 = smemops.seed_strategy(dfm, codes, lens, active,
                                   opt.max_mem_intv, opt.min_seed_len + 1,
                                   64)
        k3c = [int(c) for c in counters]
        counters.clear()
    finally:
        lax.while_loop = orig

    print(f"K1 per-loop iteration counts: {k1}", file=sys.stderr)
    print(f"K1 total steps: {sum(k1)}", file=sys.stderr)
    print(f"K3 per-loop iteration counts: {k3c}", file=sys.stderr)
    print(f"K3 total steps: {sum(k3c)}", file=sys.stderr)


if __name__ == "__main__":
    main()
