"""Scaling proxy on the virtual CPU mesh: dp=1 vs dp=N walltime of the
sharded align step, sharded sort/markdup, and data-parallel PairHMM.

Real multi-chip hardware is unavailable; on forced host devices the
collectives are real XLA collectives over shared memory, so this
measures sharding/collective OVERHEAD (the thing that costs efficiency),
not ICI speedup. Numbers land in BASELINE.md's scaling table.

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/bench_scaling.py
"""

import functools
import os
import sys
import time

# FORCE cpu (the session may export JAX_PLATFORMS=axon and preimport
# jax via sitecustomize — same dance as tests/conftest.py)
os.environ["JAX_PLATFORMS"] = "cpu"
fl = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in fl:
    os.environ["XLA_FLAGS"] = (
        fl + " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def timeit(fn, n=5):
    import jax
    fn()                                    # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as g
    from fgdp_tpu.index.reference import DeviceReference
    from fgdp_tpu.ops import pairhmm
    from fgdp_tpu.ops.fm import DeviceFMIndex
    from fgdp_tpu.parallel import mesh as pmesh
    from fgdp_tpu.parallel import sortdup_sharded as shd
    from fgdp_tpu.pipeline import device_align
    from fgdp_tpu.sortdup import engine as sdengine

    N = len(jax.devices())
    print(f"devices: {N}")
    results = {}

    # ---- align step ----
    pref, fm, shapes, codes, lens, opt = g._tiny_setup(
        n_ref=200_000, batch=256, read_len=101)
    for ways in (1, N):
        m = pmesh.make_mesh(ways)
        dfm = pmesh.replicate(m, DeviceFMIndex.from_host(fm))
        dref = pmesh.replicate(m, DeviceReference(pref))
        cd, ld, ad = pmesh.shard_batch(
            m, (jnp.asarray(codes), jnp.asarray(lens),
                jnp.ones(len(codes), bool)))
        fn = pmesh.shard_align_fn(
            functools.partial(device_align, opt=opt, shapes=shapes), m)
        dt = timeit(lambda: fn(dfm, dref, cd, ld, ad))
        results[f"align_dp{ways}"] = dt
        print(f"align dp={ways}: {dt*1000:.1f} ms/batch(256)")

    # ---- sortdup (sharded mark_duplicates + coordinate sort) ----
    rng = np.random.default_rng(1)
    nrec = 1 << 16
    ref_len = np.int64(1 << 22)
    p5a = rng.integers(0, ref_len // 2, nrec).astype(np.int64)
    i32 = lambda hi: jnp.asarray(rng.integers(0, hi, nrec), jnp.int32)
    a_hi, a_lo = sdengine.split64(jnp.asarray(p5a))
    b_hi, b_lo = sdengine.split64(jnp.asarray(p5a + 100))
    rl_hi, rl_lo = sdengine.split64(jnp.asarray(ref_len))
    sd_args = dict(
        dbl_p5a_hi=a_hi, dbl_p5a_lo=a_lo, dbl_orient=i32(4),
        dbl_p5b_hi=b_hi, dbl_p5b_lo=b_lo, dbl_score=i32(1000),
        dbl_tile=i32(100), dbl_x=i32(1000), dbl_y=i32(1000),
        dbl_valid=jnp.ones(nrec, bool),
        sgl_p5_hi=a_hi, sgl_p5_lo=a_lo,
        sgl_rev=jnp.zeros(nrec, jnp.int32), sgl_score=i32(1000),
        sgl_tile=i32(100), sgl_x=i32(1000), sgl_y=i32(1000),
        sgl_valid=jnp.ones(nrec, bool),
        ref_len_hi=rl_hi, ref_len_lo=rl_lo,
    )
    t_hi, t_lo = sdengine.split64(jnp.asarray(np.int64(2 * ref_len)))
    dt = timeit(lambda: sdengine.mark_duplicates(**sd_args))
    results["sortdup_dp1"] = dt
    print(f"sortdup markdup dp=1 (single device): {dt*1000:.1f} ms/64k")
    msp = pmesh.make_mesh(N, axis="sp")
    dt = timeit(lambda: shd.sharded_mark_duplicates(msp, sd_args,
                                                    t_hi, t_lo))
    results[f"sortdup_dp{N}"] = dt
    print(f"sortdup markdup sp={N} (sharded): {dt*1000:.1f} ms/64k")

    # ---- sortdup decomposition: all_to_all vs per-shard sort ----
    # (VERDICT r2 #10: attribute the sharded-sortdup cost so the
    # efficiency at K real hosts can be predicted per record count)
    from jax.sharding import PartitionSpec as PP
    W = 12                   # routed payload columns of the markdup body
    pay = jnp.asarray(rng.integers(0, 1 << 30, (nrec, W)).astype(np.int32))
    key = jnp.asarray(rng.integers(0, 1 << 30, nrec).astype(np.int32))
    msp = pmesh.make_mesh(N, axis="sp")
    p_sh = jax.device_put(pay, NamedSharding(msp, PP("sp")))
    k_sh = jax.device_put(key, NamedSharding(msp, PP("sp")))

    @functools.partial(jax.shard_map, mesh=msp, in_specs=PP("sp"),
                       out_specs=PP("sp"))
    def a2a(x):
        return jax.lax.all_to_all(x, "sp", split_axis=0, concat_axis=0,
                                  tiled=True)

    @functools.partial(jax.shard_map, mesh=msp, in_specs=PP("sp"),
                       out_specs=PP("sp"))
    def local_sort(k):
        return jax.lax.sort(k, dimension=0)

    t_a2a = timeit(lambda: a2a(p_sh))
    t_sort = timeit(lambda: local_sort(k_sh))
    t_sort1 = timeit(lambda: jax.lax.sort(key, dimension=0))
    results["sd_a2a"] = t_a2a
    results["sd_localsort"] = t_sort
    results["sd_sort1"] = t_sort1
    print(f"sortdup decomposition @{nrec} recs x{W} cols: "
          f"all_to_all {t_a2a*1000:.1f} ms, per-shard sort "
          f"{t_sort*1000:.1f} ms, single-device sort "
          f"{t_sort1*1000:.1f} ms")
    print(f"  -> collective share of sharded run: "
          f"{t_a2a/(t_a2a+t_sort)*100:.0f}%; sharding wins when "
          f"sort(nrec) > a2a(nrec) + sort(nrec/{N})")

    # ---- PairHMM job batch ----
    NP, R, H = 512, 101, 160
    rng2 = np.random.default_rng(2)
    reads = rng2.integers(0, 4, (NP, R)).astype(np.int32)
    haps = rng2.integers(0, 4, (NP, H)).astype(np.int32)
    haps[:, 4:4 + R] = reads
    ph2pr = (10.0 ** (-np.arange(128) / 10.0)).astype(np.float32)
    pq = ph2pr[rng2.integers(20, 40, (NP, R))]
    tr = pairhmm.transitions(np.full((NP, R), 45), np.full((NP, R), 45),
                             np.full((NP, R), 10), np.float32)
    args = (reads, np.full(NP, R, np.int32), pq, tr, haps,
            np.full(NP, H, np.int32))
    for ways in (1, N):
        m = pmesh.make_mesh(ways)
        sh = NamedSharding(m, P("dp"))
        sh_args = [jax.device_put(jnp.asarray(x), sh) for x in args]
        dt = timeit(lambda: pairhmm.forward_f32(*sh_args)[0])
        results[f"pairhmm_dp{ways}"] = dt
        print(f"pairhmm dp={ways}: {dt*1000:.1f} ms/512 pairs")

    for k in ("align", "sortdup", "pairhmm"):
        a, b = results[f"{k}_dp1"], results[f"{k}_dp{N}"]
        print(f"{k}: dp1/dp{N} walltime ratio = {a/b:.2f}x "
              f"(efficiency proxy {a/b/N*100:.0f}% of linear)")


if __name__ == "__main__":
    main()
