#!/usr/bin/env python
"""DiffSTG: window-group-size sweep between the two measured extremes.

ab_diffstg.py settled host-loop (group=1) at 676 traj/s vs full-batch
vmap (group=16) at 295.  The per-window program is latency-bound (~0.3%
utilization), so vmapping a SMALL group of windows and host-looping over
groups may beat both: more parallel work per kernel without triggering
whatever scheduling cliff the 16-wide batch hits.  Forced-sync timing.
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
GROUPS = (2, 4)


def main():
    import jax
    import jax.numpy as jnp

    from upgdm_tpu.models.diffstg import DiffSTGModel

    def sync(x):
        np.asarray(jax.tree.leaves(x)[0].ravel()[:1])

    rng = np.random.default_rng(0)
    model = DiffSTGModel(dict(
        T_h=W, T_p=P, F=1, diffusion_steps=200, inference_diffusion_steps=20,
        inference_trick="ddim", inference_schedule="cosine",
        diffusion_schedule="linear", scaler_type=None, d_h=4, Td_h=10,
        channel_multipliers=[1, 2], n_blocks=2, gnn_name="GCNConv",
        parallel_sampling=10, sequential_sampling=10, init_num_nodes=NODE,
        task_model="DiffSTG",
    ))
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

    for G in GROUPS:
        batched = jax.jit(lambda p, hs, k: jax.vmap(
            lambda h, kk: model.sample_fn(p, h, adj, kk, S)
        )(hs, jax.random.split(k, G)))
        grouped = hist.reshape(N_WIN // G, G, NODE, W, 1)
        sync(batched(model.params, grouped[0], key))  # compile

        def sweep(rep):
            outs = [batched(model.params, grouped[i],
                            jax.random.fold_in(key, rep * 100 + i))
                    for i in range(N_WIN // G)]
            sync(outs[-1])

        best = float("inf")
        for rep in range(3):
            t0 = time.time()
            sweep(rep)
            best = min(best, time.time() - t0)
        dt = best - rtt
        results[f"group{G}_s"] = dt
        results[f"group{G}_traj_per_s"] = N_WIN * S / dt
        results[f"group{G}_windows_per_hr"] = N_WIN / dt * 3600.0
        print(json.dumps({k: v for k, v in results.items() if f"group{G}" in k}),
              flush=True)

    print(json.dumps(results, indent=2))
    (REPO / "BENCH_DIFFSTG_GROUPS.json").write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
