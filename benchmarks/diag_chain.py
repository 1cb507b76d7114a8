#!/usr/bin/env python
"""Diagnostic: decompose the NsDiff sampling-chain time.

Arms:
  scaffold  — p_sample scan with a trivial closed-form model_fn (no denoiser):
              measures PRNG + posterior math + scan overhead.
  cheap     — fused kernel with relu instead of softplus (keeps matmuls, norm):
              isolates the transcendental (softplus) VPU cost.
  full      — the real bf16/tile1024 kernel (reference point).
NOT part of the bench; numbers land in BENCH_DIAG.json for BASELINE.md notes.
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

NODE, WINDOWS, PRED_LEN, STEPS, N_Z, CHUNK = 30, 100, 100, 20, 100, 16

NET_PARAM = dict(
    dataset_nf=1, windows=WINDOWS, pred_len=PRED_LEN, rolling_length=50,
    diffusion_steps=STEPS, scaler_type="StandardScaler", d_model=512, n_heads=8,
    e_layers=4, d_layers=2, d_ff=256, p_hidden_dims=[64, 64], p_hidden_layers=2,
    n_z_samples=N_Z, parallel_sample=10, task_model="NsDiff",
    diffusion_schedule="linear", beta_start=1e-4, beta_end=2e-2,
    output_attention=False, dropout=0.05, factor=3, activation="gelu",
    load_pretrain=False, freeze_pretrain=False,
)


def sync(x):
    import jax

    np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def bench(fn, reps=5):
    sync(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        sync(fn())
        best = min(best, time.time() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from upgdm_tpu.models.nsdiff import NsDiffModel
    from upgdm_tpu.ops import diffusion as D
    from upgdm_tpu.ops.pallas import fused_denoiser as FD

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (rng.normal(size=(CHUNK * NODE, WINDOWS, 1)) * 0.05 + 1.0).astype(np.float32))
    key = jax.random.key(0)
    model = NsDiffModel(NET_PARAM)
    fg = jax.jit(lambda p, b: (model._apply_f(p, b), model._apply_g(p, b)))
    y0_hat, gx = fg(model.params, x)
    gx = gx + 1e-7
    keys = jax.random.split(key, N_Z)

    def chain_with(model_fn):
        def one(k):
            return D.nsdiff_p_sample_loop(model_fn, y0_hat, gx, model.sched, k)

        return jax.jit(lambda ks: jax.vmap(one)(ks))

    results = {}

    # scaffold: trivial model_fn, no kernel at all
    def trivial_fn(y, t):
        return y * 0.1, jnp.abs(y) * 0.01 + 0.05

    scaffold_run = chain_with(trivial_fn)
    results["scaffold_s"] = bench(lambda: scaffold_run(keys))

    # cheap kernel: relu replaces softplus (monkeypatched activation)
    import jax.nn as jnn

    real_softplus = jnn.softplus
    try:
        FD_mod = FD
        import jax.nn

        jax.nn.softplus = lambda v: jnp.maximum(v, 0.0)

        def cheap_fn(y, t):
            return FD_mod.fused_nsdiff_denoiser(
                model.params["model"], y, y0_hat, gx, t,
                matmul_dtype="bfloat16", tile_m=1024)

        # the inner fused_denoiser_rows jit would otherwise serve the
        # relu-traced jaxpr to the full arm below (same cache signature)
        FD.fused_denoiser_rows.clear_cache()
        cheap_run = chain_with(cheap_fn)
        results["relu_kernel_s"] = bench(lambda: cheap_run(keys))
    finally:
        jax.nn.softplus = real_softplus
        FD.fused_denoiser_rows.clear_cache()

    # full kernel (bf16, tile 1024)
    def full_fn(y, t):
        return FD.fused_nsdiff_denoiser(
            model.params["model"], y, y0_hat, gx, t,
            matmul_dtype="bfloat16", tile_m=1024)

    full_run = chain_with(full_fn)
    results["full_s"] = bench(lambda: full_run(keys))
    results["softplus_cost_s"] = results["full_s"] - results["relu_kernel_s"]
    results["kernel_cost_s"] = results["full_s"] - results["scaffold_s"]
    print(json.dumps(results, indent=2))
    (REPO / "BENCH_DIAG.json").write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
