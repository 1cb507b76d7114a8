"""Shared forced-sync measurement scaffolding for the TPU benchmarks.

The axon tunnel has two measurement traps (CLAUDE.md):
  - ``block_until_ready`` does not block; completion is only observable via a
    device->host fetch, so every timed fn must end in a 1-element pull;
  - fetched VALUES are deduped by a hash that ignores the Mosaic payload, so
    every rep must compute a DIFFERENT value (fold the rep index into the
    PRNG key / seed / input) or later fetches may be served from cache.

``best_of`` passes the rep index to the timed fn for exactly that reason —
a timed fn that ignores it is almost certainly measuring the cache.
"""
from __future__ import annotations

import time

import numpy as np

# the headline sampling geometry (bench.py, BENCH_SPLIT.json): 16-window
# chunk x 30 nodes, w/p 100/100, d512 f/g, 20 reverse steps, n_z 100
NODE, WINDOWS, PRED_LEN, STEPS, N_Z, CHUNK = 30, 100, 100, 20, 100, 16
SAMPLING_NET_PARAM = dict(
    dataset_nf=1, windows=WINDOWS, pred_len=PRED_LEN, rolling_length=50,
    diffusion_steps=STEPS, scaler_type="StandardScaler", d_model=512, n_heads=8,
    e_layers=4, d_layers=2, d_ff=256, p_hidden_dims=[64, 64], p_hidden_layers=2,
    n_z_samples=N_Z, parallel_sample=10, task_model="NsDiff",
    diffusion_schedule="linear", beta_start=1e-4, beta_end=2e-2,
    output_attention=False, dropout=0.05, factor=3, activation="gelu",
    load_pretrain=False, freeze_pretrain=False,
)


def sync(x):
    """Force completion: pull one element to the host (see module docstring)."""
    import jax

    np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def best_of(fn, reps: int = 5) -> float:
    """Best wall time of ``fn(rep)`` over reps 1..reps (rep 0 = warm/compile).

    ``fn`` MUST vary its computed value with ``rep`` (tunnel value-dedupe).
    """
    fn(0)
    best = float("inf")
    for rep in range(1, reps + 1):
        t0 = time.time()
        fn(rep)
        best = min(best, time.time() - t0)
    return best


def mpv(samples) -> float:
    """Ensemble samples [..., S] -> scalar mean predictive variance."""
    return float(np.asarray(samples).var(axis=-1).mean())
