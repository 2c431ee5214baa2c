"""Device-mesh sharding for the alignment pipeline.

The reference scales with pthreads on one host (kt_for work stealing,
src/kthread.cpp:41-115; NUMA binding fastmap.cpp:378-458). The TPU
analogue is SPMD over a jax mesh: read batches are data-parallel along
axis "dp" while the FM-index/reference arrays are replicated into every
chip's HBM (the human-genome index fits; range-sharding the index with
all-gathered hits is the planned TP analogue — see SURVEY §2.4).

All sharding is expressed with NamedSharding constraints on the jitted
program; XLA inserts the collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = "dp"):
    """Place batch-leading arrays shard-wise along the mesh axis."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda a: jax.device_put(a, sh) if hasattr(a, "shape") else a, tree)


def shard_align_fn(fn, mesh: Mesh, axis: str = "dp"):
    """jit `fn(dfm, dref, codes, lens, active)` with dp-sharded batch and
    replicated index; outputs stay dp-sharded."""
    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P(axis))
    return jax.jit(fn, in_shardings=(rep, rep, dp, dp, dp),
                   out_shardings=dp)
