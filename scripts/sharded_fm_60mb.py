"""FM-row-sharded index parity at real scale: load the 60 Mb chr20-like
index (scripts/scale_run.py --build artifacts), shard its occ/SA rows
across the fm axis of an 8-virtual-device CPU mesh
(parallel/mesh.shard_index), and assert the sharded align step equals
the replicated one on a read batch — the VERDICT r3 #7 ask ("exercise
fm-axis sharding with an index that actually needs sharding").

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     JAX_PLATFORMS=cpu python scripts/sharded_fm_60mb.py
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache_cpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fgdp_tpu.config import AlignConfig, BatchShapes
    from fgdp_tpu.index.fmindex import FMIndex
    from fgdp_tpu.index.reference import DeviceReference, PackedReference
    from fgdp_tpu.ops.fm import DeviceFMIndex
    from fgdp_tpu.parallel import mesh as pmesh
    from fgdp_tpu.pipeline import device_align

    prefix = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale/idx"
    t0 = time.time()
    pref = PackedReference.load(prefix + ".ref")
    fm = FMIndex.load(prefix + ".fmi")
    print(f"index load: {time.time()-t0:.1f}s "
          f"({fm.occ.shape[0]} occ blocks)", file=sys.stderr)

    B, L = 16, 151
    rng = np.random.default_rng(5)
    codes = np.zeros((B, L), np.int32)
    for i in range(B):
        p = int(rng.integers(0, pref.l_pac - L))
        codes[i] = pref.codes[p:p + L]
    lens = jnp.full(B, L, jnp.int32)
    act = jnp.ones(B, bool)
    shapes = BatchShapes(read_len=L, batch_reads=B)
    opt = AlignConfig()

    m2 = pmesh.make_mesh_2d(8, fm_ways=4)
    print(f"mesh {m2.shape}: occ/SA rows sharded {4}-way "
          f"(~{fm.occ.shape[0]//4} blocks/device)", file=sys.stderr)
    dref = pmesh.replicate(m2, DeviceReference(pref))
    dfm_rep = pmesh.replicate(m2, DeviceFMIndex.from_host(fm))
    dfm_sh = pmesh.shard_index(m2, DeviceFMIndex.from_host(fm))
    dp = NamedSharding(m2, P("dp"))
    codes_d = jax.device_put(jnp.asarray(codes), dp)
    lens_d = jax.device_put(lens, dp)
    act_d = jax.device_put(act, dp)
    fn = pmesh.shard_align_fn_2d(
        functools.partial(device_align, opt=opt, shapes=shapes), m2)
    t0 = time.time()
    out_rep = fn(dfm_rep, dref, codes_d, lens_d, act_d)
    jax.block_until_ready(out_rep)
    print(f"replicated step: {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    out_sh = fn(dfm_sh, dref, codes_d, lens_d, act_d)
    jax.block_until_ready(out_sh)
    print(f"fm-sharded step: {time.time()-t0:.1f}s", file=sys.stderr)
    for f in ("score", "rb", "re", "qb", "qe", "valid"):
        a = np.asarray(getattr(out_rep, f))
        b = np.asarray(getattr(out_sh, f))
        assert np.array_equal(a, b), f
    n_valid = int(np.asarray(out_sh.valid).sum())
    print(f"PARITY OK: sharded == replicated on {B} reads "
          f"({n_valid} regions)", file=sys.stderr)


if __name__ == "__main__":
    main()
