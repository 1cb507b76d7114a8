"""Test config: force an 8-device virtual CPU mesh so sharding tests run
anywhere (the driver validates real multi-chip separately via __graft_entry__).
Must set env vars before jax import."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# Persistent compile cache: first full run pays XLA-CPU compiles (~1s/op on this
# 1-core host), later runs are warm.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
