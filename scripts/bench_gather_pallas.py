"""Pallas row-gather from HBM vs XLA gather, measured inside an
on-device dependency chain (the relay adds ~3.4 ms per dispatch, so
single-call timings are meaningless — chain 64 dependent steps and
divide).

XLA baseline (bench_gather.py): W=24 chain64 = 135 us/step @ N=2048
(15.1 Mrows/s). HBM rows must be 128-lane-aligned for DMA slicing, so
the Pallas table is padded to 128 int32 (512 B = one HBM transaction).
"""

import functools
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = 128

    def gather_kernel(idx_ref, tbl_ref, out_ref, sems, *, D):
        N = out_ref.shape[0]

        def dma(i):
            return pltpu.make_async_copy(
                tbl_ref.at[pl.ds(idx_ref[i], 1), :],
                out_ref.at[pl.ds(i, 1), :],
                sems.at[i % D])

        def pro(i, _):
            dma(i).start()
            return 0

        jax.lax.fori_loop(0, min(D, N), pro, 0, unroll=True)

        def body(i, _):
            @pl.when(i + D < N)
            def _():
                dma(i + D).start()

            dma(i).wait()
            return 0

        jax.lax.fori_loop(0, N, body, 0)

    def make(N, D):
        return pl.pallas_call(
            functools.partial(gather_kernel, D=D),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.SemaphoreType.DMA((D,))],
            ),
            out_shape=jax.ShapeDtypeStruct((N, W), jnp.int32),
        )

    rng = np.random.default_rng(0)
    nblocks = 125_000
    tbl = jnp.asarray(
        rng.integers(0, 2**31, (nblocks, W), np.int64).astype(np.int32))

    for N in (1024, 2048):
        for D in (8, 16, 32):
            g = make(N, D)

            def chain(i0):
                def body(st):
                    t, i, acc = st
                    rows = g(i, tbl)
                    s = jnp.sum(rows[:, :24], axis=1, dtype=jnp.int32)
                    return (t + 1, (i + (s & 1023) + 1) % nblocks, acc + s)

                return jax.lax.while_loop(
                    lambda st: st[0] < 64, body,
                    (jnp.int32(0), i0, jnp.zeros(N, jnp.int32)))[2]

            f = jax.jit(chain)
            i0s = [jnp.asarray(rng.integers(0, nblocks, N).astype(np.int32))
                   for _ in range(8)]
            try:
                jax.block_until_ready(f(i0s[0]))
            except Exception as e:
                print(f"N={N} D={D} FAILED: {str(e)[:160]}", file=sys.stderr)
                continue
            t0 = time.perf_counter()
            outs = [f(i) for i in i0s]
            jax.block_until_ready(outs)
            dt = (time.perf_counter() - t0) / len(i0s)
            print(f"N={N:6d} D={D:3d} chain64 {dt*1e3:8.2f} ms "
                  f"{N*64/dt/1e6:8.1f} Mrows/s ({dt/64*1e6:6.1f} us/step)",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
