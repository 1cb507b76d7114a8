#!/usr/bin/env python
"""A/B: fp32 vs bfloat16 denoiser-trunk matmuls in the NsDiff sampling chain.

Times the full CHUNK-window sampling program under both settings and reports
the per-window MPV relative difference (same PRNG key, so the two ensembles
are sample-for-sample comparable).  Decides whether sampling_matmul_dtype=
"bfloat16" can be the bench default under the <=1% MPV parity budget.
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
    # pin the Pallas kernel path: this script measures KERNEL knobs;
    # the model-level default is now the flax-bf16 denoiser
    # (BENCH_NSDIFF_FLAX_BF16.json)
    use_pallas_denoiser=True,
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

    results = {}
    ens = {}
    m32 = NsDiffModel(NET_PARAM)
    for tag, mm in (("fp32", "float32"), ("bf16", "bfloat16")):
        model = NsDiffModel(dict(NET_PARAM, sampling_matmul_dtype=mm))
        model.params = m32.params  # identical weights
        samp = jax.jit(lambda p, b, k: model.sample_fn(p, b, k, N_Z))
        sync(samp(model.params, x, key))  # compile + warm
        best = float("inf")
        for _ in range(5):
            t0 = time.time()
            sync(samp(model.params, x, key))
            best = min(best, time.time() - t0)
        results[f"{tag}_chain_s"] = best
        ens[tag] = np.asarray(samp(model.params, x, key))  # [B, O, N, S]

    for tag, e in ens.items():
        mpv = e.var(axis=-1).reshape(CHUNK, NODE, PRED_LEN, 1).mean(axis=(1, 2, 3))
        results[f"{tag}_mpv"] = mpv.tolist()
    a = np.asarray(results["fp32_mpv"])
    b = np.asarray(results["bf16_mpv"])
    results["mpv_rel_diff_max"] = float(np.max(np.abs(a - b) / a))
    results["mpv_rel_diff_mean"] = float(np.mean(np.abs(a - b) / a))
    results["speedup"] = results["fp32_chain_s"] / results["bf16_chain_s"]
    print(json.dumps(results, indent=2))
    (REPO / "BENCH_AB_BF16.json").write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
