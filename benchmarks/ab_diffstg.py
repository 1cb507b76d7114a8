#!/usr/bin/env python
"""DiffSTG: host-looped per-window sampling vs one window-vmapped program.

Round-1/2 timings of this pair disagreed by 6.7x in opposite directions —
because ``block_until_ready`` does NOT block on the axon tunnel backend, so
any measurement that didn't pull bytes to the host timed only the dispatch.
This A/B forces completion via a 1-element fetch per arm (minus measured RTT)
and also records XLA cost-analysis FLOPs for the per-window program.
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


def sync(x):
    import jax

    np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def main():
    import jax
    import jax.numpy as jnp

    from upgdm_tpu.models.diffstg import DiffSTGModel

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
    results = {"n_windows": N_WIN, "n_samples": S}

    ready = jnp.zeros((8,), jnp.float32) + 1.0
    sync(ready)
    t0 = time.time()
    sync(ready)
    results["rtt_s"] = time.time() - t0

    # ---- arm 1: host loop, one compiled per-window program ------------------
    one = jax.jit(lambda p, h, k: model.sample_fn(p, h, adj, k, S))
    sync(one(model.params, hist[0], key))  # compile

    def host_loop(rep):
        # fold the rep into the key so every rep fetches DIFFERENT values —
        # the axon tunnel dedupes repeated fetches of identical values, which
        # would otherwise let later reps return without observing completion
        outs = [one(model.params, hist[i],
                    jax.random.fold_in(key, rep * N_WIN + i))
                for i in range(N_WIN)]
        sync(outs[-1])  # device executes serially; last sync covers all

    t0 = time.time()
    host_loop(0)
    results["host_loop_s"] = time.time() - t0
    for rep in range(1, 3):
        t0 = time.time()
        host_loop(rep)
        results["host_loop_s"] = min(results["host_loop_s"], time.time() - t0)

    # per-window FLOPs (best effort)
    try:
        cost = one.lower(model.params, hist[0], key).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        results["flops_per_window"] = float(cost.get("flops", 0.0))
    except Exception as exc:
        print(f"# cost analysis unavailable: {exc}", file=sys.stderr)

    # ---- arm 2: windows vmapped into one program ----------------------------
    batched = jax.jit(lambda p, hs, k: jax.vmap(
        lambda h, kk: model.sample_fn(p, h, adj, kk, S)
    )(hs, jax.random.split(k, N_WIN)))
    sync(batched(model.params, hist, key))  # compile
    best = float("inf")
    for rep in range(3):
        k_rep = jax.random.fold_in(key, 1000 + rep)  # unique values per rep
        t0 = time.time()
        sync(batched(model.params, hist, k_rep))
        best = min(best, time.time() - t0)
    results["vmap_s"] = best

    for arm in ("host_loop", "vmap"):
        dt = results[f"{arm}_s"] - results["rtt_s"]
        results[f"{arm}_traj_per_s"] = N_WIN * S / dt
        results[f"{arm}_windows_per_hr"] = N_WIN / dt * 3600.0
    print(json.dumps(results, indent=2))
    (REPO / "BENCH_DIFFSTG_AB.json").write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
