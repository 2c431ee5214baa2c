"""Practical VPU f32 ceiling on this chip + the PairHMM ceiling model.

Round-3's version measured 2.59 TFLOP/s with 4 independent FMA chains
and derived a ~59 GCUPS ceiling at 40 ops/cell — which the kernel then
beat (88.3 GCUPS in BENCH_r03), falsifying the model. Two errors:
  * 4 chains is still latency-bound: the VPU needs ~8+ independent
    streams to reach its issue rate (measured below).
  * 40 ops/cell was stale: the kernel runs ~37 vector ops per cell-row
    element with the capped scan (13 recurrence/prior ops + 18 scan +
    3 selects + 3 hoistable-mask ops), and each op is 1 issue slot
    whether it is an FMA or a select.
This script measures the issue rate with an ILP sweep and prints the
implied ceiling at the current kernel's op count; README carries the
resulting single story.

Run: python scripts/bench_vpu_ceiling.py
"""

import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ROWS, LANES = 385, 256          # the PairHMM tile shape
    N_FMA = 64                      # FMAs per loop iteration
    STEPS = 151

    def mk_kernel(n_chains):
        def kernel(x_ref, o_ref, acc):
            acc[:] = x_ref[:]

            def body(i, _):
                chains = [acc[:] * jnp.float32(1.0 / (1 << c))
                          for c in range(n_chains)]
                for k in range(N_FMA // n_chains):
                    chains = [c * jnp.float32(0.999 - 1e-4 * ci)
                              + jnp.float32(1e-7 * (ci + 1))
                              for ci, c in enumerate(chains)]
                total = chains[0]
                for c in chains[1:]:
                    total = total + c
                acc[:] = total
                return 0

            jax.lax.fori_loop(0, STEPS, body, 0)
            o_ref[:] = acc[:]
        return kernel

    def mk_run(n_chains):
        @jax.jit
        def run(x):
            return pl.pallas_call(
                mk_kernel(n_chains),
                grid=(x.shape[1] // LANES,),
                in_specs=[pl.BlockSpec((ROWS, LANES), lambda g: (0, g),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((ROWS, LANES), lambda g: (0, g),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
                scratch_shapes=[pltpu.VMEM((ROWS, LANES), jnp.float32)],
            )(x)
        return run

    G = 8                           # grid steps (like NP=2048/256)
    rng = np.random.default_rng(0)

    def mk():
        return jnp.asarray(rng.random((ROWS, LANES * G), np.float32))

    best_tops = 0.0
    for n_chains in (4, 8, 16):
        run = mk_run(n_chains)

        def make_chain(K):
            @jax.jit
            def chain(x):
                for _ in range(K):
                    x = run(x) * jnp.float32(1.0) + jnp.float32(0.0)
                return x
            return chain

        c8 = make_chain(8)
        c40 = make_chain(40)
        _ = np.asarray(c8(mk())[0, 0])
        _ = np.asarray(c40(mk())[0, 0])
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(c8(mk())[0, 0])
            ta = time.perf_counter() - t0
            t0 = time.perf_counter()
            _ = np.asarray(c40(mk())[0, 0])
            tb = time.perf_counter() - t0
            per = (tb - ta) / 32
            best = per if best is None else min(best, per)
        # issue slots: each FMA is ONE VPU op (plus the n_chains-1 adds
        # and n_chains muls per body, amortized below as pure overhead)
        ops = N_FMA * STEPS * ROWS * LANES * G
        tops = ops / best / 1e12
        best_tops = max(best_tops, tops)
        print(f"chains={n_chains:2d}: {tops:.2f} Tops/s issue "
              f"({2*ops/best/1e12:.2f} TFLOP/s counting FMA=2; "
              f"{best*1e3:.2f} ms/call)", file=sys.stderr)

    # kernel op accounting (ops/pairhmm_pallas.py at cap=6):
    #  match 3 + prior 1 + Mi 7 + Xi 3 + u 2 + scan 6x3=18 + blend 3
    ops_per_cell = 37
    # v5e VPU: (8,128) lanes x 4 ALUs x ~0.94 GHz ~= 3.9e12 issue
    # slots/s (each vector op = 1 slot, FMA included)
    theory = 3.9e12
    print(f"microbench issue rate (LOWER bound — scheduling-limited, "
          f"see docstring): {best_tops:.2f} Tops/s", file=sys.stderr)
    print(f"theoretical v5e VPU issue peak ~3.9 Tops/s -> PairHMM "
          f"ceiling at {ops_per_cell} ops/cell: "
          f"{theory / ops_per_cell / 1e9:.0f} GCUPS", file=sys.stderr)
    print("kernel-implied sustained rate: measured GCUPS x "
          f"{ops_per_cell} ops/cell (e.g. 88.3 GCUPS in BENCH_r03 "
          "-> 3.3 Tops/s = 84% of theoretical)", file=sys.stderr)


if __name__ == "__main__":
    main()
