"""Multi-host wiring on the virtual 8-device mesh (single process)."""

import numpy as np

import jax
import jax.numpy as jnp

from fgdp_tpu.parallel import distributed as dist


def test_initialize_single_process_noop():
    assert dist.initialize() == 0
    assert dist.initialize(num_processes=1) == 0


def test_global_mesh_axes():
    m = dist.global_mesh({"dp": 2, "sp": -1})
    assert m.shape == {"dp": 2, "sp": 4}
    m2 = dist.global_mesh()
    assert m2.shape == {"dp": 8}


def test_host_local_batch_roundtrip():
    m = dist.global_mesh({"dp": 8})
    x = np.arange(64, dtype=np.int32).reshape(16, 4)
    g = dist.host_local_batch_to_global(m, x)
    assert np.array_equal(np.asarray(g), x)
    # the array is usable in a dp-sharded computation
    y = jax.jit(lambda a: a * 2)(g)
    assert np.array_equal(np.asarray(y), 2 * x)


def test_sharded_sortdup_on_global_mesh():
    """The SP machinery runs on a mesh built by the multi-host helper."""
    from fgdp_tpu.parallel import sortdup_sharded as shd
    from fgdp_tpu.sortdup import engine

    rng = np.random.default_rng(2)
    m = dist.global_mesh({"sp": 8})
    n = 128
    total = np.int64(1 << 30)
    uc = rng.integers(0, total, n).astype(np.int64)
    hi, lo = engine.split64(jnp.asarray(uc))
    order, ovf = shd.sharded_coordinate_sort(
        m, hi, lo, jnp.ones(n, bool), *engine.split64(2 * total))
    assert not ovf
    assert np.array_equal(np.asarray(uc)[order], np.sort(uc))
