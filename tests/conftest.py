"""Test config: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding logic is validated on
forced host devices (the driver's dryrun_multichip uses the same mechanism).
Must set env before the first jax import anywhere in the test process.
"""

import os

# FORCE cpu: the session environment exports JAX_PLATFORMS=axon (real TPU
# tunnel); tests must run on the virtual CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compile cache: the parity suites re-jit large programs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_fgdp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
