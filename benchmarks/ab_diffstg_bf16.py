#!/usr/bin/env python
"""A/B: fp32 vs bfloat16 UGnet denoiser in the DiffSTG sampling chain.

The window-group sweep (BENCH_DIFFSTG_GROUPS.json) showed each per-window
program is bandwidth-bound (tiny d_h channels pad ~32x on MXU lanes), so
halving the bytes with sampling_dtype="bfloat16" (net params + net inputs in
bf16; chain state, posterior coefficients and PRNG stay fp32) is the obvious
lever.  MPV parity (CPU): 0.10% shift — guarded in tests/test_models_e2e.py.
Forced-sync timing over the 16-window host loop.
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

NODE, W, P = 30, 100, 100
N_WIN = 16


def main():
    import jax
    import jax.numpy as jnp

    from upgdm_tpu.models.diffstg import DiffSTGModel

    def sync(x):
        np.asarray(jax.tree.leaves(x)[0].ravel()[:1])

    rng = np.random.default_rng(0)
    cfg = dict(
        T_h=W, T_p=P, F=1, diffusion_steps=200, inference_diffusion_steps=20,
        inference_trick="ddim", inference_schedule="cosine",
        diffusion_schedule="linear", scaler_type=None, d_h=4, Td_h=10,
        channel_multipliers=[1, 2], n_blocks=2, gnn_name="GCNConv",
        parallel_sampling=10, sequential_sampling=10, init_num_nodes=NODE,
        task_model="DiffSTG",
    )
    adj = (rng.uniform(size=(NODE, NODE)) < 0.15).astype(np.float32)
    adj = ((adj + adj.T) > 0).astype(np.float32)
    np.fill_diagonal(adj, 0)
    adj = jnp.asarray(adj)
    hist = jnp.asarray(rng.normal(size=(N_WIN, NODE, W, 1)).astype(np.float32))
    S = 100
    key = jax.random.key(0)

    ready = jnp.zeros((8,), jnp.float32) + 1.0
    sync(ready)
    t0 = time.time()
    sync(ready)
    rtt = time.time() - t0
    results = {"rtt_s": rtt, "n_windows": N_WIN, "n_samples": S}

    base = DiffSTGModel(cfg)
    for tag, dt in (("fp32", "float32"), ("bf16", "bfloat16")):
        model = DiffSTGModel(dict(cfg, sampling_dtype=dt))
        model.params = base.params  # identical weights
        one = jax.jit(lambda p, h, k: model.sample_fn(p, h, adj, k, S))
        sync(one(model.params, hist[0], key))  # compile

        def sweep(rep):
            outs = [one(model.params, hist[i],
                        jax.random.fold_in(key, rep * N_WIN + i))
                    for i in range(N_WIN)]
            sync(outs[-1])

        best = float("inf")
        for rep in range(3):
            t0 = time.time()
            sweep(rep)
            best = min(best, time.time() - t0)
        dt_s = best - rtt
        results[f"{tag}_s"] = dt_s
        results[f"{tag}_traj_per_s"] = N_WIN * S / dt_s
        results[f"{tag}_windows_per_hr"] = N_WIN / dt_s * 3600.0
        print(f"{tag}: {dt_s:.3f}s  {N_WIN * S / dt_s:.0f} traj/s", flush=True)
    results["speedup"] = results["fp32_s"] / results["bf16_s"]
    print(json.dumps(results, indent=2))
    (REPO / "BENCH_DIFFSTG_BF16.json").write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
