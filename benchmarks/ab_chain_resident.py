#!/usr/bin/env python
"""A/B: chain-resident Pallas kernel vs the flax-bf16 sampling chain.

VERDICT r2 next-step #1.  Arms, all at the bench geometry (chunk 16 x 30
nodes, w/p 100/100, d512 f/g, 20 reverse steps, n_z 100):

  flax_bf16        - the current default (bf16 denoiser, XLA chain)
  kernel_step      - single-call fused denoiser kernel (mm bf16, act fp32)
  chain_fp32       - whole chain in one pallas_call, fp32 activations
  chain_bf16       - same with bf16 activations (branch-free softplus)

Timing is forced-sync (1-element fetch; the axon tunnel's block_until_ready
does not block) with unique keys/seeds per rep (tunnel value-dedupe).  The
chain kernel's in-kernel PRNG differs from jax.random, so correctness is the
STATISTICAL MPV parity row, not per-sample equality.

Writes BENCH_CHAIN_RESIDENT.json.
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
    fn(0)  # compile + warm
    best = float("inf")
    for rep in range(1, reps + 1):
        t0 = time.time()
        fn(rep)
        best = min(best, time.time() - t0)
    return best


def mpv(samples):
    """samples [B, O, N, S] -> scalar MPV."""
    return float(np.asarray(samples).var(axis=-1).mean())


def main():
    import jax
    import jax.numpy as jnp

    from upgdm_tpu.models.nsdiff import NsDiffModel
    from upgdm_tpu.ops.pallas.chain_resident import fused_nsdiff_chain

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (rng.normal(size=(CHUNK * NODE, WINDOWS, 1)) * 0.05 + 1.0).astype(np.float32))
    key = jax.random.key(0)
    results = {}

    model = NsDiffModel(NET_PARAM)  # flax bf16 default
    y0_hat = jax.jit(lambda p, b: model._apply_f(p, b, deterministic=True))(model.params, x)
    gx = jax.jit(lambda p, b: model._apply_g(p, b))(model.params, x) + 1e-7
    sync((y0_hat, gx))

    from upgdm_tpu.ops import diffusion as D

    # every arm consumes the SAME precomputed y0_hat/gx so the comparison is
    # chain-only (f/g cost is identical across arms and measured elsewhere,
    # BENCH_SPLIT.json fx_gx_s)
    def ensemble_of(model_fn):
        def one(k):
            return D.nsdiff_p_sample_loop(model_fn, y0_hat, gx, model.sched, k)

        def run(k):
            s = jax.vmap(one)(jax.random.split(k, N_Z))
            return jnp.transpose(s, (1, 2, 3, 0))

        return jax.jit(run)

    # --- flax bf16 (default) -------------------------------------------------
    in_dt = model.sampling_dtype()
    den_params = model.cast_sampling_tree(model.params["model"], in_dt)
    y0_n, gx_n = y0_hat.astype(in_dt), gx.astype(in_dt)

    def flax_fn(y, t):
        tb = jnp.broadcast_to(jnp.asarray(t), (y.shape[0],))
        eps, sig = model.denoiser.apply(
            {"params": den_params}, y.astype(in_dt), y0_n, gx_n, tb)
        return eps.astype(jnp.float32), sig.astype(jnp.float32)

    samp = ensemble_of(flax_fn)
    results["flax_bf16_s"] = best_of(lambda r: sync(samp(jax.random.fold_in(key, r))))
    results["flax_bf16_mpv"] = mpv(samp(key))

    # --- single-call kernel arm (round-2 tuned config) ----------------------
    from upgdm_tpu.ops.pallas.fused_denoiser import fused_nsdiff_denoiser

    def kernel_fn(y, t):
        return fused_nsdiff_denoiser(
            model.params["model"], y, y0_hat, gx, t,
            matmul_dtype="bfloat16", act_dtype="float32", tile_m=1024)

    samp_k = ensemble_of(kernel_fn)
    results["kernel_step_s"] = best_of(
        lambda r: sync(samp_k(jax.random.fold_in(key, r))))

    # --- chain-resident arms -------------------------------------------------
    for tag, act in (("chain_fp32", "float32"), ("chain_bf16", "bfloat16")):
        try:
            def run(r, act=act):
                out = fused_nsdiff_chain(
                    model.params["model"], y0_hat, gx, model.sched,
                    seed=1234 + r, n_z_samples=N_Z,
                    matmul_dtype="bfloat16", act_dtype=act, tile_m=1024,
                )
                sync(out)
                return out

            results[f"{tag}_s"] = best_of(run)
            results[f"{tag}_mpv"] = mpv(run(999))
        except Exception as exc:  # noqa: BLE001 - record toolchain failures
            results[f"{tag}_error"] = f"{type(exc).__name__}: {exc}"[:500]

    if "chain_fp32_s" in results:
        results["chain_fp32_vs_flax"] = results["flax_bf16_s"] / results["chain_fp32_s"]
    if "chain_bf16_s" in results:
        results["chain_bf16_vs_flax"] = results["flax_bf16_s"] / results["chain_bf16_s"]
    for tag in ("chain_fp32", "chain_bf16"):
        if f"{tag}_mpv" in results:
            results[f"{tag}_mpv_rel_diff"] = abs(
                results[f"{tag}_mpv"] - results["flax_bf16_mpv"]
            ) / results["flax_bf16_mpv"]

    print(json.dumps(results, indent=2))
    (REPO / "BENCH_CHAIN_RESIDENT.json").write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
