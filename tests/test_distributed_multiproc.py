"""2-process jax.distributed smoke test on localhost CPU.

Exercises the DCN-path code that a single-process dryrun cannot:
jax.distributed.initialize with a real coordinator, a global mesh
spanning two processes' devices, make_array_from_process_local_data
assembly of per-host batches, and a cross-process collective. Each
worker is a subprocess with 4 virtual CPU devices (global mesh = 8).

SURVEY §2.4 distributed-backend row; parallel/distributed.py.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _worker(pid: int, nproc: int, coord: str):
    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from fgdp_tpu.parallel import distributed as dist

    got_pid = dist.initialize(coord, nproc, pid)
    assert got_pid == pid
    assert jax.process_count() == nproc
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nproc

    mesh = dist.global_mesh({"dp": 4 * nproc})
    # per-host local batch -> global dp-sharded array
    local = (np.arange(16, dtype=np.int32).reshape(8, 2)
             + 1000 * pid)
    g = dist.host_local_batch_to_global(mesh, local)
    assert g.shape == (8 * nproc, 2)           # global shape
    total = int(jax.jit(lambda a: a.sum())(g))
    want = sum(int((np.arange(16) + 1000 * q).sum())
               for q in range(nproc))
    assert total == want, (total, want)

    # cross-process collective: psum over the dp axis via shard_map
    from functools import partial

    from jax.sharding import NamedSharding, PartitionSpec as P

    @partial(jax.shard_map, mesh=mesh, in_specs=P("dp"),
             out_specs=P())
    def allsum(x):
        return jax.lax.psum(x.sum(), "dp")[None]

    r = int(allsum(g)[0])
    assert r == want, (r, want)
    print(f"WORKER_OK {pid} {total}", flush=True)


def test_two_process_distributed():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    # CPU-only subprocesses with 4 virtual devices each; the axon TPU
    # plugin must be dropped from PYTHONPATH (a dead relay hangs import)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = os.pathsep.join(
        [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
         if p and "axon" not in p]
        + [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))])
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker",
         str(pid), "2", coord],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=180)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out")
    for rc, out, err in outs:
        assert rc == 0, (rc, out, err[-2000:])
        assert "WORKER_OK" in out, (out, err[-2000:])


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "--worker":
    _worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
