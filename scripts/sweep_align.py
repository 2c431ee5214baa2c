"""Sweep align-step knobs on the real chip (run when TPU available).

Honest timing: distinct batches, pipelined dispatch, mean of 4.
Sweeps: batch size B, K1 tail_frac, K1 two_step, prev_cap.
"""

import functools
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fgdp_tpu.config import AlignConfig, BatchShapes
    from fgdp_tpu.index.fmindex import FMIndex
    from fgdp_tpu.index.reference import DeviceReference, PackedReference
    from fgdp_tpu.ops.fm import DeviceFMIndex
    from fgdp_tpu.pipeline import device_align

    rng = np.random.default_rng(0)
    n_ref, L = 2_000_000, 151
    pref = PackedReference.from_contigs(
        ["chr1"], [rng.integers(0, 4, n_ref).astype(np.uint8)])
    fm = FMIndex.build(pref.codes)
    dfm = DeviceFMIndex.from_host(fm)
    dref = DeviceReference(pref)
    opt = AlignConfig()

    def mk(B):
        pos = rng.integers(0, n_ref - L, B)
        c = np.stack([pref.codes[p:p + L] for p in pos]).astype(np.int32)
        m = rng.random(c.shape) < 0.01
        return jnp.asarray(np.where(m, rng.integers(0, 4, c.shape), c))

    def bench(name, B, fn):
        lens = jnp.full(B, L, jnp.int32)
        act = jnp.ones(B, bool)
        f = jax.jit(fn)
        jax.block_until_ready(f(dfm, dref, mk(B), lens, act))
        ins = [mk(B) for _ in range(4)]
        outs = [f(dfm, dref, c, lens, act) for c in ins]
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        outs = [f(dfm, dref, c, lens, act) for c in ins]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / 4
        print(f"{name:28s} {dt*1000:8.1f} ms  {B/dt:8.0f} reads/s",
              file=sys.stderr)

    for B in (1024, 2048, 4096):
        shapes = BatchShapes(read_len=L, batch_reads=B)
        bench(f"B={B}", B,
              functools.partial(device_align, opt=opt, shapes=shapes))


if __name__ == "__main__":
    main()
