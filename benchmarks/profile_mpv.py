#!/usr/bin/env python
"""Attribute the MPV-sweep wall time across its device programs.

The bench headline (bench.py) is fast_mpv_sweep at CHUNK windows per dispatch.
One chunk = f(x) + g(x) once per window, a 100-sample x 20-step reverse scan,
and an on-device variance/mean reduction.  This script times each piece in
isolation (best-of-N, forced-sync) so optimization effort lands where
the time actually goes — VERDICT r1 weak-6 asked for exactly this split.

Every timed section computes a rep-distinct value (key fold / input
perturbation) so the tunnel's value-dedupe cannot serve cached fetches
(benchmarks/_common.py).

Usage:  python benchmarks/profile_mpv.py [--reps 5] [--chunk 16] [--flax]
Writes BENCH_SPLIT.json at the repo root.
"""
import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import os  # noqa: E402

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

NODE = 30
WINDOWS = 100
PRED_LEN = 100
STEPS = 20
N_Z = 100

NET_PARAM = dict(
    dataset_nf=1, windows=WINDOWS, pred_len=PRED_LEN, rolling_length=50,
    diffusion_steps=STEPS, scaler_type="StandardScaler", d_model=512, n_heads=8,
    e_layers=4, d_layers=2, d_ff=256, p_hidden_dims=[64, 64], p_hidden_layers=2,
    n_z_samples=N_Z, parallel_sample=10, task_model="NsDiff",
    diffusion_schedule="linear", beta_start=1e-4, beta_end=2e-2,
    output_attention=False, dropout=0.05, factor=3, activation="gelu",
    load_pretrain=False, freeze_pretrain=False,
)


from benchmarks._common import best_of, sync  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--flax", action="store_true",
                    help="also time the plain (non-Pallas) denoiser scan")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from upgdm_tpu.models.nsdiff import NsDiffModel

    chunk = args.chunk
    model = NsDiffModel(NET_PARAM)
    rng = np.random.default_rng(0)
    x_np = (rng.normal(size=(chunk * NODE, WINDOWS, 1)) * 0.05 + 1.0).astype(np.float32)
    x = jnp.asarray(x_np)
    key = jax.random.key(0)
    split = {"backend": jax.default_backend(), "chunk": chunk,
             "rows": chunk * NODE, "n_z": N_Z, "steps": STEPS}

    # ---- tunnel RTT: dispatch+fetch of a trivial rep-distinct value --------
    ready = jnp.zeros((8,), jnp.float32) + 1.0
    bump = jax.jit(lambda v, s: v + s)
    sync(bump(ready, 0.0))
    split["rtt_s"] = best_of(lambda r: sync(bump(ready, float(r))), args.reps)

    # ---- f(x) + g(x) alone (deterministic: perturb the input per rep) ------
    fg = jax.jit(lambda p, b: (model._apply_f(p, b), model._apply_g(p, b)))
    split["fx_gx_s"] = best_of(
        lambda r: sync(fg(model.params, x + np.float32(r) * 1e-6)), args.reps)

    # ---- full sampling program (as benched: evaluation_step body) ----------
    samp = jax.jit(lambda p, b, k: model.sample_fn(p, b, k, N_Z))
    split["sample_full_s"] = best_of(
        lambda r: sync(samp(model.params, x, jax.random.fold_in(key, r))),
        args.reps)

    # ---- the on-device reduction -------------------------------------------
    outs = samp(model.params, x, key)
    sync(outs)
    std = jnp.ones((1,), jnp.float32)
    mean = jnp.zeros((1,), jnp.float32)

    @jax.jit
    def reduce_(o, s, m):
        o = o * s[None, None, :, None] + m[None, None, :, None]
        var = o.var(axis=-1).reshape(chunk, NODE, PRED_LEN, 1)
        pm = o.reshape(chunk, NODE, PRED_LEN, 1, -1)
        return var.mean(axis=(1, 2, 3)), pm.mean(axis=(1, 2, 3, 4))

    split["reduce_s"] = best_of(
        lambda r: sync(reduce_(outs, std * (1.0 + np.float32(r) * 1e-6), mean)),
        args.reps)

    # ---- chain-only (sampling minus the f/g preamble, by subtraction) ------
    split["chain_only_s_est"] = split["sample_full_s"] - split["fx_gx_s"]

    # ---- optional: plain flax denoiser instead of the Pallas kernel --------
    if args.flax:
        model_flax = NsDiffModel(dict(NET_PARAM, use_pallas_denoiser=False))
        model_flax.params = model.params
        samp_flax = jax.jit(lambda p, b, k: model_flax.sample_fn(p, b, k, N_Z))
        split["sample_full_flax_s"] = best_of(
            lambda r: sync(samp_flax(model.params, x, jax.random.fold_in(key, r))),
            args.reps)

    # ---- host-visible end-to-end (dispatch + transfer of the two scalars) --
    def end_to_end(r):
        o = samp(model.params, x, jax.random.fold_in(key, r))
        v, m = reduce_(o, std, mean)
        np.asarray(v), np.asarray(m)

    split["end_to_end_s"] = best_of(end_to_end, args.reps)
    split["dispatch_overhead_s_est"] = (
        split["end_to_end_s"] - split["sample_full_s"] - split["reduce_s"])
    split["windows_per_hr_end_to_end"] = chunk / split["end_to_end_s"] * 3600.0

    out = REPO / "BENCH_SPLIT.json"
    out.write_text(json.dumps(split, indent=2))
    print(json.dumps(split, indent=2))


if __name__ == "__main__":
    main()
