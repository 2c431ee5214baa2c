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


# --------------------------------------------------------------------------
# FM-index sharding (the TP analogue, SURVEY §2.4): the occ/SA tables are
# range-sharded across a second mesh axis so a human-genome index
# (occ ~12 GB + SA, larger than one chip's HBM) spreads over the axis.
# Queries stay replicated along that axis; XLA SPMD partitions each
# gather into a local gather + cross-chip combine over ICI.
# --------------------------------------------------------------------------

def make_mesh_2d(n_devices: int | None = None, fm_ways: int = 2,
                 axes=("dp", "fm")) -> Mesh:
    """Mesh with a data-parallel axis and an index-sharding axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    fm_ways = min(fm_ways, n)
    while n % fm_ways:
        fm_ways -= 1
    return Mesh(np.asarray(devs).reshape(n // fm_ways, fm_ways), axes)


def _pad_rows(a, ways: int):
    n = a.shape[0]
    pad = (-n) % ways
    if pad == 0:
        return a
    import jax.numpy as jnp
    widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, widths)


def shard_index(mesh: Mesh, dfm, axis: str = "fm"):
    """Range-shard the big FM-index arrays (occ checkpoint rows, SA)
    along `axis`; small arrays/scalars replicate. Row padding keeps the
    leading dim divisible by the axis; padded occ rows are never
    addressed (block ids < nblocks) and padded SA entries only matter
    past text_len, which sa_lookup clips."""
    ways = mesh.shape[axis]
    row = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    return dfm._replace(
        occ_fused=jax.device_put(_pad_rows(dfm.occ_fused, ways), row),
        sa=jax.device_put(_pad_rows(dfm.sa, ways), row),
        counts=jax.device_put(dfm.counts, rep),
        c2=jax.device_put(dfm.c2, rep),
        sentinel_row=jax.device_put(dfm.sentinel_row, rep),
        r1_row=jax.device_put(dfm.r1_row, rep),
        cc_r0=jax.device_put(dfm.cc_r0, rep),
        cc_r1=jax.device_put(dfm.cc_r1, rep),
        n_ref=jax.device_put(dfm.n_ref, rep),
        text_len=jax.device_put(dfm.text_len, rep),
    )


def shard_align_fn_2d(fn, mesh: Mesh, dp_axis: str = "dp"):
    """jit the align step over a (dp, fm) mesh: batch sharded on dp,
    index sharded on fm (inputs carry their shardings), outputs dp."""
    dp = NamedSharding(mesh, P(dp_axis))
    return jax.jit(fn, out_shardings=dp)
