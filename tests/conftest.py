"""Test config: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding logic is validated on
forced host devices (the driver's dryrun_multichip uses the same mechanism).
Must set env before the first jax import anywhere in the test process.
"""

import os

# FORCE cpu: the session environment exports JAX_PLATFORMS=axon (real TPU
# tunnel) AND /root/.axon_site/sitecustomize PRE-IMPORTS jax at interpreter
# start, so jax config flags have already captured the env — plain
# os.environ writes here are silently ignored for platform selection.
# jax.config.update works as long as no backend has been initialized;
# XLA_FLAGS is still read from the environment at backend creation.
os.environ["JAX_PLATFORMS"] = "cpu"          # for subprocesses
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compile cache: the parity suites re-jit large programs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_fgdp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must not touch the TPU"
assert len(jax.devices()) >= 8, "virtual 8-device CPU mesh required"

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
