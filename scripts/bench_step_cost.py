"""While-step cost model: dependent-gather steps vs lane count and rows
per lane. Separates the per-step floor from per-row cost — decides
whether seeding wins by wider lanes, fewer steps, or cheaper rows.

Run: python scripts/bench_step_cost.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    nblocks = 62_500           # 1 Mbp at 16 codes/block: 500kb fwd+rc
    W = 8
    tbl = jnp.asarray(rng.integers(0, 2**31, (nblocks, W), np.int64)
                      .astype(np.int32))
    STEPS = 64

    def mk_chain(N, rows_per_lane):
        def chain(i0):
            def body(st):
                t, i, acc = st
                s = jnp.zeros(N, jnp.int32)
                for r in range(rows_per_lane):
                    row = jnp.take(tbl, (i + r * 7919) % nblocks,
                                   axis=0, mode="clip")
                    s = s + jnp.sum(row, axis=1, dtype=jnp.int32)
                return (t + 1, (i + (s & 1023) + 1) % nblocks, acc + s)
            return jax.lax.while_loop(lambda st: st[0] < STEPS, body,
                                      (jnp.int32(0), i0,
                                       jnp.zeros(N, jnp.int32)))[2]
        return jax.jit(chain)

    for rows in (1, 2, 4):
        for N in (1024, 4096, 16384, 65536):
            g = mk_chain(N, rows)
            idx0s = [jnp.asarray(rng.integers(0, nblocks, N)
                                 .astype(np.int32)) for _ in range(6)]
            jax.block_until_ready(g(idx0s[0]))
            t0 = time.perf_counter()
            outs = [g(i) for i in idx0s]
            jax.block_until_ready(outs)
            dt = (time.perf_counter() - t0) / len(idx0s)
            per_step = dt / STEPS
            print(f"rows/lane={rows} N={N:6d}  {per_step*1e6:7.1f} us/step"
                  f"  {N*rows/per_step/1e6:8.1f} Mrows/s",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
