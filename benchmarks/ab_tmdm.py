#!/usr/bin/env python
"""TMDM sampling: fused Pallas denoiser vs plain flax denoiser, forced-sync.

run_all.py round-2 showed TMDM steady_s 1.909 -> 2.615 after the fused kernel
landed; this A/B isolates the denoiser choice with the 1-element-fetch sync
(block_until_ready does not block on the axon tunnel backend).
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import os  # noqa: E402

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

W = P = 100
NODE = 30
N_WIN = 8


def main():
    import jax

    from upgdm_tpu.models.tmdm import TMDMModel

    rng = np.random.default_rng(0)
    x_flat = rng.normal(size=(N_WIN * NODE, W, 1)).astype(np.float32)

    def sync(x):
        np.asarray(jax.tree.leaves(x)[0].ravel()[:1])

    import jax.numpy as jnp

    ready = jnp.zeros((8,), jnp.float32) + 1.0
    sync(ready)
    t0 = time.time()
    sync(ready)
    rtt = time.time() - t0

    results = {"rtt_s": rtt, "windows": N_WIN}
    for arm, use_pallas in (("flax", False), ("pallas", True)):
        model = TMDMModel(dict(
            dataset_nf=1, windows=W, pred_len=P, diffusion_steps=100,
            scaler_type=None, d_model=64, n_heads=4, e_layers=2, d_layers=1,
            d_ff=128, p_hidden_dims=[64, 64], p_hidden_layers=2,
            n_z_samples=100, task_model="TMDM",
            use_pallas_denoiser=use_pallas,
        ))
        outs, _ = model.evaluation_step(x_flat)  # compile
        sync(outs)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            outs, _ = model.evaluation_step(x_flat)
            sync(outs)
            best = min(best, time.time() - t0)
        n_traj = int(outs.shape[0] * outs.shape[-1])
        results[f"{arm}_s"] = best - rtt
        results[f"{arm}_traj_per_s"] = n_traj / (best - rtt)
        print(f"{arm}: {best - rtt:.3f}s  {n_traj / (best - rtt):.0f} traj/s",
              flush=True)
    print(json.dumps(results, indent=2))
    (REPO / "BENCH_TMDM_AB.json").write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
