"""Raw HBM gather throughput probe: rows/s for fused-row gathers.

Establishes the speed-of-light for the FM-extension loops: every
two-step extension costs 2 gathered rows (lo/hi) per lane, so
seeding can never beat (rows/s) / (rows per read). Varies N (rows
per call) and row width to separate dispatch floor from per-row cost.
Also times the same gather chained under a while_loop, which is how
seeding actually consumes it (per-step overhead included).
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    nblocks = 125_000          # 2 Mbp reference scale
    for W in (8, 24):
        tbl = jnp.asarray(rng.integers(0, 2**31, (nblocks, W), np.int64)
                          .astype(np.int32))

        for N in (1024, 4096, 16384, 65536):
            idx_batches = [jnp.asarray(rng.integers(0, nblocks, N)
                                       .astype(np.int32))
                           for _ in range(8)]

            f = jax.jit(lambda i: jnp.sum(
                jnp.take(tbl, i, axis=0, mode="clip"), dtype=jnp.int32))
            jax.block_until_ready(f(idx_batches[0]))
            t0 = time.perf_counter()
            outs = [f(i) for i in idx_batches]
            jax.block_until_ready(outs)
            dt = (time.perf_counter() - t0) / len(idx_batches)
            print(f"W={W:3d} N={N:6d} single  {dt*1e6:9.1f} us "
                  f"{N/dt/1e6:8.1f} Mrows/s", file=sys.stderr)

        # chained: 64 dependent gathers under a while_loop (the seeding
        # shape: next index depends on the previous row)
        N = 2048
        idx0s = [jnp.asarray(rng.integers(0, nblocks, N).astype(np.int32))
                 for _ in range(8)]

        def chain(i0):
            def body(st):
                t, i, acc = st
                row = jnp.take(tbl, i, axis=0, mode="clip")
                s = jnp.sum(row, axis=1, dtype=jnp.int32)
                return (t + 1, (i + (s & 1023) + 1) % nblocks, acc + s)
            return jax.lax.while_loop(lambda st: st[0] < 64, body,
                                      (jnp.int32(0), i0,
                                       jnp.zeros(N, jnp.int32)))[2]

        g = jax.jit(chain)
        jax.block_until_ready(g(idx0s[0]))
        t0 = time.perf_counter()
        outs = [g(i) for i in idx0s]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / len(idx0s)
        rows = N * 64
        print(f"W={W:3d} N={N:6d} chain64 {dt*1e3:9.2f} ms "
              f"{rows/dt/1e6:8.1f} Mrows/s "
              f"({dt/64*1e6:6.1f} us/step)", file=sys.stderr)


if __name__ == "__main__":
    main()
