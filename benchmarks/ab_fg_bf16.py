#!/usr/bin/env python
"""A/B: fp32 vs bfloat16 f(x)/g(x) backbones at sampling (VERDICT r2 #5).

BENCH_SPLIT.json puts fx_gx at ~0.05 s of the ~0.55 s chunk, so the ceiling
is a few percent of the headline; the flip only happens if the ensemble MPV
shift stays within the 1% parity budget (DSAttention's de-stationary
tau/delta statistics are the precision risk).  Forced-sync; every rep varies
the computed value (key fold for the end-to-end arms, input perturbation for
the deterministic f/g-only arm) per the tunnel value-dedupe rule in
benchmarks/_common.py.  Writes BENCH_FG_BF16.json.
"""
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import os  # noqa: E402

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from benchmarks._common import (  # noqa: E402
    CHUNK, N_Z, NODE, SAMPLING_NET_PARAM, WINDOWS, best_of, mpv, sync,
)


def main():
    import jax
    import jax.numpy as jnp

    from upgdm_tpu.models.nsdiff import NsDiffModel

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (rng.normal(size=(CHUNK * NODE, WINDOWS, 1)) * 0.05 + 1.0).astype(np.float32))
    key = jax.random.key(0)
    results = {}
    m32 = NsDiffModel(SAMPLING_NET_PARAM)

    for tag, fg in (("fg_fp32", "float32"), ("fg_bf16", "bfloat16")):
        model = NsDiffModel(dict(SAMPLING_NET_PARAM, fg_sampling_dtype=fg))
        model.params = m32.params
        samp = jax.jit(lambda p, b, k, m=model: m.sample_fn(p, b, k, N_Z))
        results[f"{tag}_s"] = best_of(
            lambda r: sync(samp(model.params, x, jax.random.fold_in(key, r))))
        ens = samp(model.params, x, key)
        results[f"{tag}_mpv"] = mpv(ens)
        del ens

        # f/g alone (the piece the knob actually changes), through the
        # model's OWN cast path so the arms can't drift from sample_fn.
        # f/g are deterministic, so the per-rep value variation comes from
        # perturbing the input (same shape/dtype -> no recompile).
        def fg_only(p, b, m=model):
            fg_dt = m.dtype_param("fg_sampling_dtype", "float32")
            if fg_dt != jnp.float32:
                fp = dict(p)
                for k in ("cond_pred_model", "cond_pred_model_g"):
                    if k in fp:
                        fp[k] = m.cast_sampling_tree(fp[k], fg_dt)
                b = b.astype(fg_dt)
                return (m._apply_f(fp, b, deterministic=True).astype(jnp.float32),
                        m._apply_g(fp, b).astype(jnp.float32))
            return m._apply_f(p, b, deterministic=True), m._apply_g(p, b)

        jfg = jax.jit(fg_only)
        results[f"{tag}_fxgx_s"] = best_of(
            lambda r: sync(jfg(model.params, x + np.float32(r) * 1e-6)))

    results["speedup_end_to_end"] = results["fg_fp32_s"] / results["fg_bf16_s"]
    results["speedup_fxgx"] = results["fg_fp32_fxgx_s"] / results["fg_bf16_fxgx_s"]
    results["mpv_rel_diff"] = abs(
        results["fg_bf16_mpv"] - results["fg_fp32_mpv"]) / results["fg_fp32_mpv"]
    print(json.dumps(results, indent=2))
    (REPO / "BENCH_FG_BF16.json").write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
