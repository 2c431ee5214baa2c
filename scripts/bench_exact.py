"""Exact-search microbench: RMI chunked vs pure-FM backward walk.

Honest axon timing: distinct inputs per iteration, pipelined dispatch,
per-call from a two-chain-length subtraction (see bench.py notes).
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fgdp_tpu.index.fmindex import FMIndex
    from fgdp_tpu.index.rmi import RMIndex
    from fgdp_tpu.ops import fm as fmops
    from fgdp_tpu.ops.exact import DeviceRMI, exact_search
    from fgdp_tpu.ops.fm import DeviceFMIndex
    from fgdp_tpu.utils import dna

    rng = np.random.default_rng(0)
    n_ref = 2_000_000
    L, B = 151, 4096
    ref = rng.integers(0, 4, n_ref).astype(np.uint8)
    print("building fm+rmi...", file=sys.stderr)
    fm = FMIndex.build(ref)
    x = np.concatenate([ref, dna.revcomp(ref)])
    rmi = RMIndex.build(x, fm.sa)
    dfm = DeviceFMIndex.from_host(fm)
    drmi = DeviceRMI.from_host(rmi)

    def mk():
        pos = rng.integers(0, len(x) - L, B)
        return jnp.asarray(np.stack([x[p:p + L] for p in pos]), jnp.int32)

    lens = jnp.full(B, L, jnp.int32)

    def fm_only(codes, lens):
        # pure 2-step FM walk (no RMI first chunk): force via short rmi?
        # emulate by exact_search with a chunk of the last char only:
        # just run the plain backward loop
        Bv, Lv = codes.shape
        last = codes[:, -1]
        k, l, s = fmops.init_interval(dfm, last)

        def body(t, st):
            k, s = st
            j2 = Lv - 2 - 2 * t
            a2 = codes[jnp.arange(Bv), jnp.clip(j2, 0, Lv - 1)]
            a1 = codes[jnp.arange(Bv), jnp.clip(j2 - 1, 0, Lv - 1)]
            k1, s1, k2, s2 = fmops.backward_extend2(dfm, k, s, a2, a1)
            ok2 = (j2 >= 0) & (s > 0) & (a2 < 4)
            kA = jnp.where(ok2, k1, k)
            sA = jnp.where(ok2, s1, jnp.where(j2 >= 0, 0, s))
            ok1 = ok2 & (j2 - 1 >= 0) & (sA > 0) & (a1 < 4)
            kB = jnp.where(ok1, k2, kA)
            sB = jnp.where(ok1, s2, jnp.where(ok2 & (j2 - 1 >= 0), 0, sA))
            return kB, sB

        k, s = jax.lax.fori_loop(0, (Lv - 1 + 1) // 2, body, (k, s))
        return k, s

    f_rmi = jax.jit(lambda c, l: exact_search(dfm, drmi, c, l))
    f_fm = jax.jit(fm_only)

    for name, f in (("rmi_chunked", f_rmi), ("fm_2step", f_fm)):
        outs = [f(mk(), lens) for _ in range(2)]       # warm + distinct
        jax.block_until_ready(outs)
        for K in (4, 12):
            t0 = time.perf_counter()
            outs = [f(mk(), lens) for _ in range(K)]
            jax.block_until_ready(outs)
            dt = time.perf_counter() - t0
            if K == 4:
                t4 = dt
        per = (dt - t4) / 8
        print(f"{name:12s} {per*1000:8.2f} ms/batch "
              f"({B/per:,.0f} reads/s)", file=sys.stderr)


if __name__ == "__main__":
    main()
