"""SW extension kernel microbench: sorted vs unsorted lanes, and the
qlen-bucketed (two-QP) variant. Run: python scripts/profile_sw.py"""

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

    from fgdp_tpu.config import AlignConfig
    from fgdp_tpu.ops import sw as swops
    from fgdp_tpu.ops.sw_pallas import sw_extend_pallas

    rng = np.random.default_rng(0)
    opt = AlignConfig()
    J = int(os.environ.get("PROF_J", 24576))
    L, TP = 151, 368
    p = swops.SWParams(opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                       opt.zdrop, opt.pen_clip5, opt.a, opt.b)

    def mk(sort):
        # qn: ~35% zero (no extension on that side), rest uniform
        qn = rng.integers(0, L + 1, J).astype(np.int32)
        qn[rng.random(J) < 0.35] = 0
        if sort:
            qn = np.sort(qn)
        tn = np.where(qn > 0, np.minimum(qn + 110, TP), 0).astype(np.int32)
        q = rng.integers(0, 4, (J, L)).astype(np.int32)
        t = np.full((J, TP), 4, np.int32)
        # target = query + noise so the DP actually extends
        for s in range(0, J, 997):
            pass
        noise = rng.random((J, L)) < 0.02
        tq = np.where(noise, rng.integers(0, 4, (J, L)), q)
        t[:, :L] = tq
        h0 = np.full(J, L * opt.a, np.int32)
        return (jnp.asarray(q), jnp.asarray(qn), jnp.asarray(t),
                jnp.asarray(tn), jnp.asarray(h0))

    def timed(name, f, inputs):
        out = f(*inputs[-1])
        jax.block_until_ready(out)
        n = len(inputs) - 1
        t0 = time.perf_counter()
        outs = [f(*x) for x in inputs[:n]]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / n
        print(f"{name:24s} {dt*1000:8.2f} ms", file=sys.stderr)

    f = jax.jit(lambda q, qn, t, tn, h0: sw_extend_pallas(
        q, qn, t, tn, h0, opt.w, None, p, t_max=TP))
    for sort in (False, True):
        ins = [mk(sort) for _ in range(4)]
        timed(f"full  sorted={sort}", f, ins)

    # all-dead call (the 2w retry path cost floor)
    ins0 = []
    for _ in range(4):
        q, qn, t, tn, h0 = mk(False)
        ins0.append((q, jnp.zeros_like(qn), t, jnp.zeros_like(tn), h0))
    timed("all-dead (retry floor)", f, ins0)


if __name__ == "__main__":
    main()
