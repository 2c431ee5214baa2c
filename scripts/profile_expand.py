"""Micro-breakdown of expand_seeds ops at pipeline shapes."""

import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    B, S, P = int(os.environ.get('PROF_B', 1024)), 160, 256
    NSA = 4_000_000

    sa = jnp.asarray(rng.integers(0, NSA, NSA).astype(np.int32))
    offsets = jnp.asarray(np.array([0, 2_000_000], np.int32))

    def mk():
        base = np.sort(rng.integers(0, P, (B, S)).astype(np.int32), axis=1)
        t = np.broadcast_to(np.arange(P, dtype=np.int32)[None], (B, P))
        vals = rng.integers(0, NSA, (B, S)).astype(np.int32)
        idx = rng.integers(0, NSA, (B, P)).astype(np.int32)
        owner = rng.integers(0, S, (B, P)).astype(np.int32)
        return (jnp.asarray(base), jnp.asarray(t.copy()), jnp.asarray(vals),
                jnp.asarray(idx), jnp.asarray(owner))

    n_iter = 8
    ins = [mk() for _ in range(n_iter + 1)]

    def timed(name, f, pick):
        call = lambda x: f(*pick(x))
        jax.block_until_ready(call(ins[-1]))
        t0 = time.perf_counter()
        outs = [call(x) for x in ins[:n_iter]]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / n_iter
        print(f"{name:22s} {dt*1000:8.2f} ms", file=sys.stderr)

    timed("searchsorted_vmap",
          jax.jit(lambda base, t: jax.vmap(
              lambda b, tt: jnp.searchsorted(b, tt, side="right"))(base, t)),
          lambda x: (x[0], x[1]))
    timed("owner_cmpsum",
          jax.jit(lambda base, t: jnp.sum(
              (base[:, None, :] <= t[:, :, None]).astype(jnp.int32),
              axis=2)),
          lambda x: (x[0], x[1]))
    timed("sa_gather_BP",
          jax.jit(lambda idx: jnp.take(sa, idx, axis=0, mode="clip")),
          lambda x: (x[3],))
    timed("take_along_x4",
          jax.jit(lambda vals, owner: sum(
              jnp.take_along_axis(vals + i, owner, axis=1)
              for i in range(4))),
          lambda x: (x[2], x[4]))
    timed("onehot_matmul_x4",
          jax.jit(lambda vals, owner: sum(
              jnp.einsum('bps,bs->bp',
                         (owner[:, :, None] ==
                          jnp.arange(S)[None, None, :]).astype(jnp.float32),
                         ((vals + i) & 0xFFFF).astype(jnp.float32)).astype(jnp.int32)
              for i in range(4))),
          lambda x: (x[2], x[4]))
    timed("intv2rid_like",
          jax.jit(lambda idx: jnp.searchsorted(
              offsets, idx.reshape(-1), side="right").reshape(idx.shape)),
          lambda x: (x[3],))


if __name__ == "__main__":
    main()
