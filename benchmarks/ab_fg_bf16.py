#!/usr/bin/env python
"""A/B: fp32 vs bfloat16 f(x)/g(x) backbones at sampling (VERDICT r2 #5).

BENCH_SPLIT.json puts fx_gx at ~0.05 s of the ~0.55 s chunk, so the ceiling
is a few percent of the headline; the flip only happens if the ensemble MPV
shift stays within the 1% parity budget (DSAttention's de-stationary
tau/delta statistics are the precision risk).  Forced-sync, unique keys per
rep.  Writes BENCH_FG_BF16.json.
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


def best_of(fn, reps=5):
    fn(0)
    best = float("inf")
    for r in range(1, reps + 1):
        t0 = time.time()
        fn(r)
        best = min(best, time.time() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from upgdm_tpu.models.nsdiff import NsDiffModel

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (rng.normal(size=(CHUNK * NODE, WINDOWS, 1)) * 0.05 + 1.0).astype(np.float32))
    key = jax.random.key(0)
    results = {}
    m32 = NsDiffModel(NET_PARAM)

    for tag, fg in (("fg_fp32", "float32"), ("fg_bf16", "bfloat16")):
        model = NsDiffModel(dict(NET_PARAM, fg_sampling_dtype=fg))
        model.params = m32.params
        samp = jax.jit(lambda p, b, k, m=model: m.sample_fn(p, b, k, N_Z))
        results[f"{tag}_s"] = best_of(
            lambda r: sync(samp(model.params, x, jax.random.fold_in(key, r))))
        ens = samp(model.params, x, key)
        results[f"{tag}_mpv"] = float(np.asarray(ens).var(axis=-1).mean())
        del ens

        # f/g alone (the piece the knob actually changes)
        def fg_only(p, b, m=model):
            fg_dt = m.dtype_param("fg_sampling_dtype", "float32")
            if fg_dt != jnp.float32:
                fp = {k: m.cast_sampling_tree(v, fg_dt) for k, v in p.items()}
                b = b.astype(fg_dt)
                return (m._apply_f(fp, b).astype(jnp.float32),
                        m._apply_g(fp, b).astype(jnp.float32))
            return m._apply_f(p, b), m._apply_g(p, b)

        jfg = jax.jit(fg_only)
        results[f"{tag}_fxgx_s"] = best_of(lambda r: sync(jfg(model.params, x)))

    results["speedup_end_to_end"] = results["fg_fp32_s"] / results["fg_bf16_s"]
    results["speedup_fxgx"] = results["fg_fp32_fxgx_s"] / results["fg_bf16_fxgx_s"]
    results["mpv_rel_diff"] = abs(
        results["fg_bf16_mpv"] - results["fg_fp32_mpv"]) / results["fg_fp32_mpv"]
    print(json.dumps(results, indent=2))
    (REPO / "BENCH_FG_BF16.json").write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
