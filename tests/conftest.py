"""Test config.

The image's sitecustomize (PYTHONPATH=/root/.axon_site) registers the 'axon'
TPU-tunnel PJRT plugin at interpreter start.  With it active, XLA compiles —
even for JAX_PLATFORMS=cpu — are routed to the remote terminal (minutes per
compile) and the CPU backend is pinned to a single device, so the 8-device
virtual mesh never materialises.  Tests must be hermetic and local: re-exec
pytest once with a cleaned environment (inside pytest_configure, after
restoring the captured fds).
"""
import os
import sys


def _needs_reexec() -> bool:
    return os.environ.get("_UPGDM_TESTS_REEXECED") != "1"


def pytest_configure(config):
    if not _needs_reexec():
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = dict(os.environ)
    env["_UPGDM_TESTS_REEXECED"] = "1"
    parts = [
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and ".axon_site" not in p
    ]
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in parts:
        parts.append(repo_root)
    env["PYTHONPATH"] = os.pathsep.join(parts)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_cpu"
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)


if not _needs_reexec():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import numpy as np
    import pytest

    @pytest.fixture
    def rng():
        return np.random.default_rng(0)
