#!/usr/bin/env python
"""A/B: tuned Pallas kernel (bf16 matmuls, fp32 activations) vs the plain
flax denoiser fully in bf16, on the NsDiff sampling chain.

Motivation: the chain is VPU-elementwise bound (BASELINE.md); Mosaic cannot
lower packed-bf16 compares, so the pallas kernel's softplus/l2-norm band is
stuck in fp32 — but XLA's own lowering CAN run that band in bf16 (proven by
the 1.61x TMDM flax-bf16 win).  If flax-bf16 beats the kernel, the bench
default flips.  Forced-sync timing; value parity is asserted on CPU
(tests/test_pallas_denoiser.py, test_models_e2e.py) because the tunnel
dedupes fetched values across programs differing only in kernel payload.
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


def main():
    import jax
    import jax.numpy as jnp

    from upgdm_tpu.models.nsdiff import NsDiffModel

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (rng.normal(size=(CHUNK * NODE, WINDOWS, 1)) * 0.05 + 1.0).astype(np.float32))
    key = jax.random.key(0)

    arms = {
        "pallas_bf16mm": dict(use_pallas_denoiser=True,
                              sampling_matmul_dtype="bfloat16"),
        "flax_bf16": dict(use_pallas_denoiser=False, sampling_dtype="bfloat16"),
    }
    results = {}
    base = NsDiffModel(NET_PARAM)
    for tag, extra in arms.items():
        model = NsDiffModel(dict(NET_PARAM, **extra))
        model.params = base.params
        samp = jax.jit(lambda p, b, k: model.sample_fn(p, b, k, N_Z))
        sync(samp(model.params, x, key))  # compile + warm
        best = float("inf")
        for rep in range(5):
            # fold the rep into the key: every fetch is a fresh value, so the
            # tunnel's value-dedupe can't short-circuit completion.  (The
            # recorded 1.22x was independently corroborated end-to-end by the
            # bench headline moving 96.6k -> 119.0k windows/hr = 1.23x.)
            k_rep = jax.random.fold_in(key, rep)
            t0 = time.time()
            sync(samp(model.params, x, k_rep))
            best = min(best, time.time() - t0)
        results[f"{tag}_chain_s"] = best
        print(f"{tag}: {best:.3f}s", flush=True)
    results["flax_over_pallas"] = (
        results["pallas_bf16mm_chain_s"] / results["flax_bf16_chain_s"]
    )
    print(json.dumps(results, indent=2))
    (REPO / "BENCH_NSDIFF_FLAX_BF16.json").write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
