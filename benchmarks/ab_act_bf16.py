#!/usr/bin/env python
"""A/B: fp32 vs bfloat16 denoiser-trunk ACTIVATIONS in the NsDiff chain.

Follow-up to ab_bf16.py (which flipped the trunk matmuls to bf16): the chain
is VPU-elementwise bound (BASELINE.md round-2), so this measures running the
gate/softplus/l2-norm band between the matmuls on packed-bf16 VPU lanes
(kernel act_dtype).  Timing only — the axon tunnel dedupes fetched values for
programs that differ only inside pallas_call, so MPV parity for this knob is
asserted in CPU interpret mode (tests/test_pallas_denoiser.py).

OUTCOME (2026-08-16): blocked by the toolchain — Mosaic fails to lower
packed-bf16 compares ("arith.cmpf ... vector<8x128x2xbf16>", from softplus's
internal branch), so the act_bf16 arm does not compile on real TPU.  The knob
stays implemented + interpret-tested (0.40% per-call error) for when the
toolchain catches up; sampling_act_dtype default remains float32.
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
    m32 = NsDiffModel(NET_PARAM)
    for tag, act in (("act_fp32", "float32"), ("act_bf16", "bfloat16")):
        model = NsDiffModel(dict(
            NET_PARAM, sampling_matmul_dtype="bfloat16", sampling_act_dtype=act))
        model.params = m32.params  # identical weights
        samp = jax.jit(lambda p, b, k: model.sample_fn(p, b, k, N_Z))
        sync(samp(model.params, x, key))  # compile + warm
        best = float("inf")
        for rep in range(5):
            # unique values per rep — tunnel-dedupe-proof (see ab_diffstg.py)
            k_rep = jax.random.fold_in(key, rep)
            t0 = time.time()
            sync(samp(model.params, x, k_rep))
            best = min(best, time.time() - t0)
        results[f"{tag}_chain_s"] = best
    results["speedup"] = results["act_fp32_chain_s"] / results["act_bf16_chain_s"]
    print(json.dumps(results, indent=2))
    (REPO / "BENCH_AB_ACT_BF16.json").write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
