#!/usr/bin/env python
"""Sweep fused-denoiser tile_m (and matmul dtype) on the bench chain."""
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
    base = NsDiffModel(NET_PARAM)

    configs = [("bfloat16", 1024), ("bfloat16", 2048), ("bfloat16", 4096)]
    if len(sys.argv) > 1:
        configs = [tuple(c.split(":")) for c in sys.argv[1:]]
        configs = [(mm, int(tm)) for mm, tm in configs]
    results = {}
    for mm, tm in configs:
        model = NsDiffModel(dict(NET_PARAM, sampling_matmul_dtype=mm,
                                 denoiser_tile_m=tm))
        model.params = base.params
        samp = jax.jit(lambda p, b, k, _m=model: _m.sample_fn(p, b, k, N_Z))
        t0 = time.time()
        sync(samp(model.params, x, key))
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(5):
            t0 = time.time()
            sync(samp(model.params, x, key))
            best = min(best, time.time() - t0)
        results[f"{mm}_tile{tm}_s"] = best
        print(f"# {mm} tile_m={tm}: {best:.3f}s/chunk (compile {compile_s:.0f}s)",
              flush=True)
    print(json.dumps(results, indent=2))
    (REPO / "BENCH_TILE_SWEEP.json").write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
