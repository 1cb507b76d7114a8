#!/usr/bin/env python
"""A/B: lax.scan unroll factor on the NsDiff reverse chain (flax-bf16 path).

The chain is HBM-bound on elementwise fusions (BASELINE.md closing profile);
``unroll>1`` replicates the scan body so XLA can fuse the elementwise tail of
step i with the head of step i+1 (the denoiser matmuls still fence the rest).
Untried until round 3 — every other chain lever has been measured flat or
negative.  Forced-sync, rep-keyed (benchmarks/_common.py).

Writes BENCH_SCAN_UNROLL.json.
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

UNROLLS = (1, 2, 4)


def main():
    import time

    import jax
    import jax.numpy as jnp

    from upgdm_tpu.models.nsdiff import NsDiffModel
    from upgdm_tpu.ops import diffusion as D

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (rng.normal(size=(CHUNK * NODE, WINDOWS, 1)) * 0.05 + 1.0).astype(np.float32))
    key = jax.random.key(0)
    results = {}

    model = NsDiffModel(SAMPLING_NET_PARAM)
    y0_hat = jax.jit(lambda p, b: model._apply_f(p, b, deterministic=True))(model.params, x)
    gx = jax.jit(lambda p, b: model._apply_g(p, b))(model.params, x) + 1e-7
    sync((y0_hat, gx))

    in_dt = model.sampling_dtype()
    den_params = model.cast_sampling_tree(model.params["model"], in_dt)
    y0_n, gx_n = y0_hat.astype(in_dt), gx.astype(in_dt)

    def flax_fn(y, t):
        tb = jnp.broadcast_to(jnp.asarray(t), (y.shape[0],))
        eps, sig = model.denoiser.apply(
            {"params": den_params}, y.astype(in_dt), y0_n, gx_n, tb)
        return eps.astype(jnp.float32), sig.astype(jnp.float32)

    for u in UNROLLS:
        def one(k, u=u):
            return D.nsdiff_p_sample_loop(flax_fn, y0_hat, gx, model.sched, k,
                                          unroll=u)

        samp = jax.jit(lambda k, one=one: jnp.transpose(
            jax.vmap(one)(jax.random.split(k, N_Z)), (1, 2, 3, 0)))
        t0 = time.time()
        sync(samp(key))
        results[f"unroll{u}_compile_s"] = time.time() - t0
        results[f"unroll{u}_s"] = best_of(
            lambda r: sync(samp(jax.random.fold_in(key, r))))
        results[f"unroll{u}_mpv"] = mpv(samp(key))

    base = results["unroll1_s"]
    for u in UNROLLS[1:]:
        results[f"unroll{u}_vs_1"] = base / results[f"unroll{u}_s"]
        results[f"unroll{u}_mpv_rel_diff"] = abs(
            results[f"unroll{u}_mpv"] - results["unroll1_mpv"]
        ) / results["unroll1_mpv"]
    print(json.dumps(results, indent=2))
    (REPO / "BENCH_SCAN_UNROLL.json").write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
