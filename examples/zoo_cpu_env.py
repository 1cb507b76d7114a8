"""Run a repo module/script with the hermetic LOCAL-CPU jax environment.

The image's sitecustomize (PYTHONPATH=/root/.axon_site) routes every XLA
compile — even JAX_PLATFORMS=cpu — to the remote TPU terminal (minutes per
compile) and pins the CPU backend to one device.  CPU-only stages (zoo data
generation, stats) must strip it, exactly like tests/conftest.py does for
pytest.

Usage: python examples/zoo_cpu_env.py <script.py> [args...]
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

env = dict(os.environ)
parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
         if p and ".axon_site" not in p]
if REPO not in parts:
    parts.append(REPO)
env["PYTHONPATH"] = os.pathsep.join(parts)
env.pop("PALLAS_AXON_POOL_IPS", None)
env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
env["JAX_PLATFORMS"] = "cpu"
env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_cpu"

sys.exit(subprocess.call([sys.executable, *sys.argv[1:]], env=env))
