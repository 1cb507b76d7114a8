#!/usr/bin/env python
"""A/B: fp32 vs bfloat16 denoiser MLP in the TMDM CARD sampling chain.

The TMDM chain (100 steps x tiny ConditionalLinear MLP) is bandwidth/VPU
bound like NsDiff's; sampling_dtype="bfloat16" casts the denoiser params and
inputs while the chain state, posterior coefficients and PRNG stay fp32.
CPU parity: 0.03% MPV shift (the CARD chain is affine in eps, so same-key
comparison is exact).  Forced-sync timing at the report config.
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
    import jax.numpy as jnp

    from upgdm_tpu.models.tmdm import TMDMModel

    def sync(x):
        np.asarray(jax.tree.leaves(x)[0].ravel()[:1])

    rng = np.random.default_rng(0)
    x_flat = rng.normal(size=(N_WIN * NODE, W, 1)).astype(np.float32)

    ready = jnp.zeros((8,), jnp.float32) + 1.0
    sync(ready)
    t0 = time.time()
    sync(ready)
    rtt = time.time() - t0

    cfg = dict(
        dataset_nf=1, windows=W, pred_len=P, diffusion_steps=100,
        scaler_type=None, d_model=64, n_heads=4, e_layers=2, d_layers=1,
        d_ff=128, p_hidden_dims=[64, 64], p_hidden_layers=2,
        n_z_samples=100, task_model="TMDM",
    )
    results = {"rtt_s": rtt, "windows": N_WIN}
    base = TMDMModel(dict(cfg, sampling_dtype="float32"))
    for tag, dt in (("fp32", "float32"), ("bf16", "bfloat16")):
        model = TMDMModel(dict(cfg, sampling_dtype=dt))
        model.params = base.params
        outs, _ = model.evaluation_step(x_flat)  # compile
        sync(outs)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            outs, _ = model.evaluation_step(x_flat)
            sync(outs)
            best = min(best, time.time() - t0)
        n_traj = int(outs.shape[0] * outs.shape[-1])
        dt_s = best - rtt
        results[f"{tag}_s"] = dt_s
        results[f"{tag}_traj_per_s"] = n_traj / dt_s
        print(f"{tag}: {dt_s:.3f}s  {n_traj / dt_s:.0f} traj/s", flush=True)
    results["speedup"] = results["fp32_s"] / results["bf16_s"]
    print(json.dumps(results, indent=2))
    (REPO / "BENCH_TMDM_BF16.json").write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
