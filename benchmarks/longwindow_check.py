#!/usr/bin/env python
"""Validate the reference's longest shipped window config on TPU.

The reference's sensitivity sweep ships `NsDiff_windows/models/
dataset__w1000p200st100.yaml` (windows=1000, pred_len=200 — total sequence
1200 through the NS-Transformer).  This runs that exact geometry end-to-end
(f + g + 100-sample bf16 reverse chain) and records throughput, proving the
long-window path compiles and samples sanely on real hardware.
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

NODE, W, P, STEPS, N_Z = 30, 1000, 200, 20, 100
N_WIN = 2  # 2 windows x 30 nodes x 1200 seq is already a full-chip batch


def main():
    import jax
    import jax.numpy as jnp

    from upgdm_tpu.models.nsdiff import NsDiffModel

    def sync(x):
        np.asarray(jax.tree.leaves(x)[0].ravel()[:1])

    model = NsDiffModel(dict(
        dataset_nf=1, windows=W, pred_len=P, rolling_length=50,
        diffusion_steps=STEPS, scaler_type=None, d_model=512, n_heads=8,
        e_layers=4, d_layers=2, d_ff=256, p_hidden_dims=[64, 64],
        p_hidden_layers=2, n_z_samples=N_Z, task_model="NsDiff",
    ))
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (rng.normal(size=(N_WIN * NODE, W, 1)) * 0.05 + 1.0).astype(np.float32))

    t0 = time.time()
    outs, _ = model.evaluation_step(x)
    sync(outs)
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        outs, _ = model.evaluation_step(x)
        sync(outs)
        best = min(best, time.time() - t0)
    ens = np.asarray(outs)
    mpv = float(ens.var(axis=-1).mean())
    results = {
        "windows": N_WIN, "nodes": NODE, "w": W, "p": P,
        "compile_s": round(compile_s, 1), "steady_s": round(best, 3),
        "windows_per_hr": round(N_WIN / best * 3600.0, 1),
        "trajectories_per_sec": round(ens.shape[0] * ens.shape[-1] / best, 1),
        "mpv_finite": bool(np.isfinite(mpv)), "mpv": mpv,
    }
    print(json.dumps(results, indent=2))
    (REPO / "BENCH_LONGWINDOW.json").write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
