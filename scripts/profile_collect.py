"""Decompose collect_seeds: K1 / +K2 / +K3 / merge glue."""

import dataclasses
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
    from fgdp_tpu.align.seeding import collect_seeds

    rng = np.random.default_rng(0)
    n_ref = 2_000_000
    L, B = 151, 1024
    pref = PackedReference.from_contigs(
        ["chr1"], [rng.integers(0, 4, n_ref).astype(np.uint8)])
    fm = FMIndex.build(pref.codes)
    dfm = DeviceFMIndex.from_host(fm)
    dref = DeviceReference(pref)
    shapes = BatchShapes(read_len=L, batch_reads=B)
    base = AlignConfig()

    def mk():
        pos = rng.integers(0, n_ref - L, B)
        c = np.stack([pref.codes[p:p + L] for p in pos]).astype(np.int32)
        m = rng.random(c.shape) < 0.01
        return jnp.asarray(np.where(m, rng.integers(0, 4, c.shape), c))

    lens = jnp.full(B, L, jnp.int32)
    active = jnp.ones(B, bool)

    variants = {
        "full": base,
        "no_k3": dataclasses.replace(base, max_mem_intv=0),
        "no_k2": dataclasses.replace(base, split_factor=100.0),
        "k1_only": dataclasses.replace(base, max_mem_intv=0,
                                       split_factor=100.0),
    }
    for name, opt in variants.items():
        f = jax.jit(lambda c, opt=opt: collect_seeds(
            dfm, dref, c, lens, active, opt, shapes.max_smems))
        jax.block_until_ready(f(mk()))
        outs = [f(mk()) for _ in range(4)]
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        outs = [f(mk()) for _ in range(4)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / 4
        print(f"{name:10s} {dt*1000:8.1f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
