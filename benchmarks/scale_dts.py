#!/usr/bin/env python
"""DiffusionTS throughput vs window-batch size (latency-bound hypothesis).

BASELINE.md round-2 concluded the DiffusionTS chain runs at ~1% utilization
and is latency-bound (20 DDIM steps x up to 3 Langevin grad evals of a small
transformer — a long dependency chain of small kernels).  If that is right,
trajectories/sec should scale nearly linearly with the window batch until
compute saturates.  The Fourier-layer scatter+matmul rewrite removed the
lane-padded temporaries that used to OOM >=32-window batches, so the larger
points are now measurable.  Forced-sync timing (1-element fetch, RTT
subtracted); fresh stateful keys per call make every fetch unique.
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
BATCHES = (8, 16, 32)


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
    model = DiffusionTSModel(dict(
        dataset_nf=1, windows=W, pred_len=P, diffusion_steps=20, timesteps=100,
        scaler_type=None, d_model=64, n_heads=4, n_layer_enc=3, n_layer_dec=6,
        n_z_samples=100, task_model="DiffusionTS",
    ))
    results = {"rtt_s": rtt, "rows": []}
    out_path = REPO / "BENCH_DTS_SCALE.json"
    for B in BATCHES:
        x = rng.normal(size=(B, W, 1)).astype(np.float32)
        try:
            t0 = time.time()
            outs, _ = model.evaluation_step(x)  # compile
            sync(outs)
            compile_s = time.time() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                outs, _ = model.evaluation_step(x)
                sync(outs)
                best = min(best, time.time() - t0)
            n_traj = int(outs.shape[0] * outs.shape[-1])
            row = {
                "windows": B, "compile_s": round(compile_s, 1),
                "steady_s": round(best - rtt, 3),
                "traj_per_s": round(n_traj / (best - rtt), 1),
                "windows_per_hr": round(B / (best - rtt) * 3600, 1),
            }
        except Exception as exc:  # OOM at large batch is itself a datum
            row = {"windows": B, "error": type(exc).__name__,
                   "detail": str(exc).splitlines()[0][:200]}
        results["rows"].append(row)
        out_path.write_text(json.dumps(results, indent=2))  # incremental
        print(json.dumps(row), flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
