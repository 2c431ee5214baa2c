"""Multi-host wiring: jax.distributed + host-spanning meshes.

The reference is single-host (SURVEY §2.4: no MPI/NCCL anywhere); the
BASELINE north star requires the TPU build to scale across hosts. The
recipe (scaling-book): initialize the distributed runtime, build one
global mesh over all devices with the DP axis outermost (so DP crosses
DCN between hosts while FM/SP axes stay on intra-slice ICI), and keep
every jitted program global-SPMD — XLA partitions per host
automatically; hosts feed only their addressable shards.

Host-side data flow for the genomics pipeline:
  * each host streams its own FASTQ shard (round-robin chunking by host
    id) and feeds `jax.make_array_from_process_local_data`;
  * the index (replicated or fm-sharded) is loaded identically on every
    host from the shared artifacts;
  * sortdup's coordinate ranges map to the SP axis; the all_to_all
    routing in parallel/sortdup_sharded.py rides ICI within a slice and
    DCN across slices (XLA chooses by mesh layout).

Single-process invocation is a no-op passthrough, so the same driver
runs on one chip or a pod.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> int:
    """jax.distributed.initialize when running multi-process; returns
    the process id (0 when single-process)."""
    if num_processes is None or num_processes <= 1:
        return 0
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index()


def global_mesh(axes: dict[str, int] | None = None) -> Mesh:
    """Mesh over ALL devices (every process sees the same global mesh).
    axes: ordered {name: size}; sizes must multiply to the global device
    count; -1 once for 'the rest'. Default: {'dp': -1}. Put 'dp'
    first so data-parallel crosses DCN and inner axes stay on ICI."""
    devs = np.asarray(jax.devices())
    n = len(devs)
    if axes is None:
        axes = {"dp": -1}
    sizes = list(axes.values())
    if -1 in sizes:
        rest = n // int(np.prod([s for s in sizes if s != -1]) or 1)
        sizes[sizes.index(-1)] = rest
    assert int(np.prod(sizes)) == n, (sizes, n)
    return Mesh(devs.reshape(sizes), tuple(axes.keys()))


def host_local_batch_to_global(mesh: Mesh, tree, axis: str = "dp"):
    """Assemble per-host local batches into a global dp-sharded array
    (jax.make_array_from_process_local_data); identity on one process."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(sh, np.asarray(a)),
        tree)
