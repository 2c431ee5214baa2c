"""Split K1 cost into forward vs backward phases at pipeline config."""

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
    P = 20

    def mk():
        pos = rng.integers(0, n_ref - L, B)
        c = np.stack([pref.codes[p:p + L] for p in pos]).astype(np.int32)
        m = rng.random(c.shape) < 0.01
        return jnp.asarray(np.where(m, rng.integers(0, 4, c.shape), c))

    lens = jnp.full(B, L, jnp.int32)
    active = jnp.ones(B, bool)
    mi = jnp.ones(B, jnp.int32)

    # fwd-only frontier sweep: same anchor chain, but skip the backward
    # pyramid (replace with nothing; next_x from fwd phase)
    def k1_fwd_only(codes):
        def read_grid(jt):
            a = jnp.take_along_axis(codes, jnp.clip(jt, 0, L - 1),
                                    axis=1).astype(jnp.int32)
            return jnp.where((jt >= 0) & (jt < L), a, 4)

        def cond(st):
            x, n = st
            return jnp.any(active & (x < lens))

        def body(st):
            x, n = st
            fw = smemops._fwd_phase(
                dfm, pref.codes, jnp.int32(n_ref), L, x, lens, mi,
                lambda j: smemops._read_base(codes, j), read_grid,
                active & (x < lens), P)
            return (jnp.where(active & (x < lens), fw["next_x"], x),
                    n + fw["num_prev"])

        x, n = jax.lax.while_loop(cond, body, (jnp.zeros(B, jnp.int32),
                                               jnp.zeros(B, jnp.int32)))
        return n

    f_fwd = jax.jit(k1_fwd_only)
    f_full = jax.jit(lambda c: smemops.smem_all_pos(
        dfm, pref.codes, jnp.int32(n_ref), c, lens, mi, active,
        opt.min_seed_len, 64, P))

    for name, f in (("k1_fwd_only", f_fwd), ("k1_full", f_full)):
        jax.block_until_ready(f(mk()))
        outs = [f(mk()) for _ in range(4)]
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        outs = [f(mk()) for _ in range(4)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / 4
        print(f"{name:12s} {dt*1000:8.1f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
