#!/usr/bin/env python
"""A/B: fp32 vs bfloat16 denoising transformer in the DiffusionTS sampler.

BENCH_DTS_SCALE.json showed the chain is MXU-compute-saturated at 8 windows,
so halving the matmul passes with sampling_dtype="bfloat16" (net params +
inputs bf16; chain state, posterior coefficients, and the sign()-normalized
Langevin updates fp32) is the lever.  MPV bias measured at 0.39% on CPU
(S=192, 4 keys) against an fp32 key-to-key CV of 1.7% — no material bias.
Forced-sync timing at the report config (8 windows x 100 samples).
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
N_WIN = 8


def main():
    import jax
    import jax.numpy as jnp

    from upgdm_tpu.models.diffusionts import DiffusionTSModel

    def sync(x):
        np.asarray(jax.tree.leaves(x)[0].ravel()[:1])

    ready = jnp.zeros((8,), jnp.float32) + 1.0
    sync(ready)
    t0 = time.time()
    sync(ready)
    rtt = time.time() - t0

    rng = np.random.default_rng(0)
    x = rng.normal(size=(N_WIN, W, 1)).astype(np.float32)
    cfg = dict(
        dataset_nf=1, windows=W, pred_len=P, diffusion_steps=20, timesteps=100,
        scaler_type=None, d_model=64, n_heads=4, n_layer_enc=3, n_layer_dec=6,
        n_z_samples=100, task_model="DiffusionTS",
    )
    results = {"rtt_s": rtt, "windows": N_WIN}
    base = DiffusionTSModel(cfg)
    for tag, dt in (("fp32", "float32"), ("bf16", "bfloat16")):
        model = DiffusionTSModel(dict(cfg, sampling_dtype=dt))
        model.params = base.params
        outs, _ = model.evaluation_step(x)  # compile (stateful keys: every
        sync(outs)                          # later fetch is a fresh value)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            outs, _ = model.evaluation_step(x)
            sync(outs)
            best = min(best, time.time() - t0)
        n_traj = int(outs.shape[0] * outs.shape[-1])
        dt_s = best - rtt
        results[f"{tag}_s"] = dt_s
        results[f"{tag}_traj_per_s"] = n_traj / dt_s
        print(f"{tag}: {dt_s:.3f}s  {n_traj / dt_s:.1f} traj/s", flush=True)
    results["speedup"] = results["fp32_s"] / results["bf16_s"]
    print(json.dumps(results, indent=2))
    (REPO / "BENCH_DTS_BF16.json").write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
