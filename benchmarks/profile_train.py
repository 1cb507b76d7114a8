#!/usr/bin/env python
"""Attribute NsDiff training-step wall time + A/B the round-2 precision levers.

VERDICT r2 weak #4: the 2,857 samples/s training number (BENCH_TRAIN_BASELINE)
was measured in round 1 and never profiled. This is the training analog of
profile_mpv.py — forced-sync (the axon tunnel's block_until_ready does not
block; completion is only observable via a device->host fetch, so every timed
fn ends in a 1-element pull and rtt_s is reported for subtraction).

Pieces timed (all at the train-bench geometry B=64 W/P=100/100 d512):
  - full train step (fwd+bwd+Adam, donated buffers)   [the baseline number]
  - loss forward only
  - value_and_grad only (no optimizer)
  - pretrain_f / pretrain_g stage steps (f(x) / g(x) fwd+bwd in isolation)
  - A/B: bf16 compute train step (params+batch cast to bf16 inside the loss,
    fp32 master weights + fp32 loss reduction — the mixed-precision pattern)
  - A/B: batch-size scaling 64 -> 128 -> 256

Every timed section folds the rep index into the PRNG key (or computes a
rep-dependent value) so no two reps fetch the same value — the tunnel's
value-dedupe would otherwise serve cached fetches (benchmarks/_common.py).

Usage: python benchmarks/profile_train.py [--reps 5]
Writes BENCH_TRAIN_SPLIT.json at the repo root.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import os  # noqa: E402

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

B, W, P, F = 64, 100, 100, 1
NET_PARAM = dict(
    dataset_nf=F, windows=W, pred_len=P, rolling_length=50, diffusion_steps=20,
    scaler_type=None, d_model=512, n_heads=8, e_layers=4, d_layers=2, d_ff=256,
    p_hidden_dims=[64, 64], p_hidden_layers=2, n_z_samples=100, task_model="NsDiff",
)


from benchmarks._common import best_of, sync  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from upgdm_tpu.models.nsdiff import NsDiffModel
    from upgdm_tpu.train.optimizers import make_optimizer

    model = NsDiffModel(NET_PARAM)
    tx = make_optimizer({"optimizer_name": "Adam", "lr": 1e-3}, model.trainable_mask())
    batch_np = np.random.default_rng(0).normal(size=(B, W + P, F)).astype(np.float32)
    batch = jnp.asarray(batch_np)
    key = jax.random.key(0)
    split = {"backend": jax.default_backend(), "B": B, "W": W, "P": P, "d_model": 512}

    # rtt measured on rep-distinct values, like every timed section below
    ready = jnp.zeros((8,), jnp.float32) + 1.0
    bump = jax.jit(lambda v, s: v + s)
    sync(bump(ready, 0.0))
    split["rtt_s"] = best_of(lambda r: sync(bump(ready, float(r))), args.reps)

    # ---- full train step (no donation here so reps can reuse inputs) -------
    def make_step(loss_fn):
        @jax.jit
        def step(params, opt_state, b, k):
            loss, grads = jax.value_and_grad(loss_fn)(params, b, k)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return params, opt_state, loss

        return step

    def fp32_loss(p, b, k):
        return model.loss_fn(p, b, k, train=True)

    params0, opt0 = model.params, tx.init(model.params)
    step = make_step(fp32_loss)

    def run_step(s, p, o, r):
        out = s(p, o, batch, jax.random.fold_in(key, r))
        sync(out[2])

    split["train_step_s"] = best_of(
        lambda r: run_step(step, params0, opt0, r), args.reps)
    split["samples_per_sec"] = B / (split["train_step_s"] - split["rtt_s"])

    # ---- forward only / grad only ------------------------------------------
    fwd = jax.jit(fp32_loss)
    split["loss_fwd_s"] = best_of(
        lambda r: sync(fwd(params0, batch, jax.random.fold_in(key, r))), args.reps)
    vg = jax.jit(lambda p, b, k: jax.value_and_grad(fp32_loss)(p, b, k))
    split["value_and_grad_s"] = best_of(
        lambda r: sync(vg(params0, batch, jax.random.fold_in(key, r))[0]), args.reps)
    split["optimizer_s_est"] = split["train_step_s"] - split["value_and_grad_s"]

    # ---- stage isolation ----------------------------------------------------
    for stage in ("pretrain_f", "pretrain_g"):
        sf = jax.jit(
            lambda p, b, k, s=stage: jax.value_and_grad(
                lambda q: model.loss_fn(q, b, k, select=s, train=True)
            )(p)
        )
        split[f"{stage}_vg_s"] = best_of(
            lambda r: sync(sf(params0, batch, jax.random.fold_in(key, r))[0]),
            args.reps)

    # ---- A/B: bf16 compute (fp32 master weights, bf16 fwd/bwd) -------------
    def bf16_loss(p, b, k):
        pb = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            p,
        )
        return model.loss_fn(pb, b.astype(jnp.bfloat16), k, train=True).astype(jnp.float32)

    step16 = make_step(bf16_loss)
    opt16 = tx.init(params0)
    split["train_step_bf16_s"] = best_of(
        lambda r: run_step(step16, params0, opt16, r), args.reps
    )
    split["samples_per_sec_bf16"] = B / (split["train_step_bf16_s"] - split["rtt_s"])
    l32 = float(fwd(params0, batch, key))
    l16 = float(jax.jit(bf16_loss)(params0, batch, key))
    split["loss_fp32"] = l32
    split["loss_bf16"] = l16
    split["loss_rel_diff"] = abs(l16 - l32) / max(abs(l32), 1e-9)

    # ---- batch scaling ------------------------------------------------------
    for bs in (128, 256):
        big = jnp.asarray(
            np.random.default_rng(1).normal(size=(bs, W + P, F)).astype(np.float32)
        )
        stepb = make_step(fp32_loss)
        optb = tx.init(params0)

        def runb(r):
            out = stepb(params0, optb, big, jax.random.fold_in(key, r))
            sync(out[2])

        t = best_of(runb, args.reps)
        split[f"train_step_B{bs}_s"] = t
        split[f"samples_per_sec_B{bs}"] = bs / (t - split["rtt_s"])

    out = REPO / "BENCH_TRAIN_SPLIT.json"
    out.write_text(json.dumps(split, indent=2))
    print(json.dumps(split, indent=2))


if __name__ == "__main__":
    main()
