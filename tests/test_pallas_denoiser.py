"""Fused Pallas denoiser kernel vs the flax NsDiffDenoiser (interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from upgdm_tpu.models.denoise import NsDiffDenoiser
from upgdm_tpu.ops.pallas.fused_denoiser import fused_nsdiff_denoiser


@pytest.mark.parametrize("F", [1, 2])
def test_fused_denoiser_matches_flax(F):
    steps = 7
    mod = NsDiffDenoiser(enc_in=F, n_steps=steps)
    rng = np.random.default_rng(0)
    B, O = 5, 9
    y_t = jnp.asarray(rng.normal(size=(B, O, F)).astype(np.float32))
    y0 = jnp.asarray(rng.normal(size=(B, O, F)).astype(np.float32))
    gx = jnp.asarray(rng.uniform(0.1, 1.0, size=(B, O, F)).astype(np.float32))
    t_b = jnp.full((B,), 3, jnp.int32)
    params = jax.jit(mod.init)({"params": jax.random.key(0)}, y_t, y0, gx, t_b)["params"]

    eps_ref, sigma_ref = jax.jit(mod.apply)({"params": params}, y_t, y0, gx, t_b)
    eps_k, sigma_k = fused_nsdiff_denoiser(params, y_t, y0, gx, 3, interpret=True)
    np.testing.assert_allclose(np.asarray(eps_k), np.asarray(eps_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(sigma_k), np.asarray(sigma_ref), atol=2e-5)


def test_fused_denoiser_padding_path():
    # M not a multiple of TILE_M exercises the pad/slice path
    F, steps = 1, 4
    mod = NsDiffDenoiser(enc_in=F, n_steps=steps)
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.normal(size=(3, 5, F)).astype(np.float32))
    params = jax.jit(mod.init)(
        {"params": jax.random.key(1)}, y, y, y, jnp.zeros((3,), jnp.int32)
    )["params"]
    eps, sigma = fused_nsdiff_denoiser(params, y, y, y, 0, interpret=True)
    assert eps.shape == (3, 5, F)
    assert (np.asarray(sigma) > 0).all()


def test_fused_denoiser_bf16_matmul_close():
    # sampling_matmul_dtype="bfloat16": trunk matmuls in bf16 (fp32
    # accumulate) must stay within ~1% of the fp32 kernel per call.
    F, steps = 1, 7
    mod = NsDiffDenoiser(enc_in=F, n_steps=steps)
    rng = np.random.default_rng(2)
    B, O = 6, 11
    y_t = jnp.asarray(rng.normal(size=(B, O, F)).astype(np.float32))
    y0 = jnp.asarray(rng.normal(size=(B, O, F)).astype(np.float32))
    gx = jnp.asarray(rng.uniform(0.1, 1.0, size=(B, O, F)).astype(np.float32))
    params = jax.jit(mod.init)(
        {"params": jax.random.key(2)}, y_t, y0, gx, jnp.zeros((B,), jnp.int32)
    )["params"]
    eps32, sig32 = fused_nsdiff_denoiser(params, y_t, y0, gx, 3, interpret=True)
    for kw in (dict(matmul_dtype="bfloat16"),
               dict(matmul_dtype="bfloat16", act_dtype="bfloat16")):
        eps16, sig16 = fused_nsdiff_denoiser(
            params, y_t, y0, gx, 3, interpret=True, **kw
        )
        assert np.max(np.abs(np.asarray(eps16 - eps32))) < 1e-2
        rel = np.abs(np.asarray(sig16 - sig32)) / np.asarray(sig32)
        assert float(rel.max()) < 1e-2
        assert (np.asarray(sig16) > 0).all()
    # bf16 activations require bf16 matmuls (the cast would be folded away)
    with pytest.raises(ValueError):
        fused_nsdiff_denoiser(
            params, y_t, y0, gx, 3, interpret=True,
            matmul_dtype="float32", act_dtype="bfloat16",
        )


@pytest.mark.slow
def test_bf16_chain_mpv_parity():
    """Full 20-step reverse chain: bf16-matmul kernel vs fp32 kernel, same
    keys — ensemble MPV must agree within the 1% parity budget (measured
    0.085% at bench scale; see BASELINE.md round-2)."""
    from upgdm_tpu.models.nsdiff import NsDiffModel
    from upgdm_tpu.ops import diffusion as D

    net = dict(
        dataset_nf=1, windows=40, pred_len=20, rolling_length=10,
        diffusion_steps=20, scaler_type=None, d_model=32, n_heads=2,
        e_layers=1, d_layers=1, d_ff=16, p_hidden_dims=[8, 8],
        p_hidden_layers=2, n_z_samples=6, task_model="NsDiff",
        diffusion_schedule="linear", beta_start=1e-4, beta_end=2e-2,
        output_attention=False, dropout=0.05, factor=3, activation="gelu",
        load_pretrain=False, freeze_pretrain=False, use_pallas_denoiser=False,
    )
    m = NsDiffModel(net)
    rng = np.random.default_rng(3)
    x = jnp.asarray((rng.normal(size=(12, 40, 1)) * 0.05 + 1.0).astype(np.float32))
    y0_hat = jax.jit(lambda p, b: m._apply_f(p, b))(m.params, x)
    gx = jax.jit(lambda p, b: m._apply_g(p, b))(m.params, x) + 1e-7
    keys = jax.random.split(jax.random.key(0), 6)

    def ensemble(mm, act="float32"):
        def model_fn(y, t):
            return fused_nsdiff_denoiser(
                m.params["model"], y, y0_hat, gx, t, interpret=True,
                matmul_dtype=mm, act_dtype=act)

        def one(k):
            return D.nsdiff_p_sample_loop(model_fn, y0_hat, gx, m.sched, k)

        return np.asarray(jax.jit(jax.vmap(one))(keys))

    e32 = ensemble("float32")
    mpv32 = e32.var(axis=0).mean()
    for e16 in (ensemble("bfloat16"), ensemble("bfloat16", "bfloat16")):
        mpv16 = e16.var(axis=0).mean()
        assert abs(mpv32 - mpv16) / mpv32 < 0.01


def test_fused_tmdm_matches_flax():
    from upgdm_tpu.models.denoise import TMDMDenoiser
    from upgdm_tpu.ops.pallas.fused_denoiser import fused_tmdm_denoiser

    F, steps = 1, 9
    mod = TMDMDenoiser(enc_in=F, n_steps=steps)
    rng = np.random.default_rng(4)
    B, L = 4, 13
    y_t = jnp.asarray(rng.normal(size=(B, L, F)).astype(np.float32))
    y0 = jnp.asarray(rng.normal(size=(B, L, F)).astype(np.float32))
    emb = jnp.asarray(rng.normal(size=(B, L, 8)).astype(np.float32))
    t_b = jnp.full((B,), 5, jnp.int32)
    params = jax.jit(mod.init)(
        {"params": jax.random.key(4)}, emb, y_t, y0, t_b
    )["params"]
    eps_ref = jax.jit(mod.apply)({"params": params}, emb, y_t, y0, t_b)
    eps_k = fused_tmdm_denoiser(
        params, y_t, y0, 5, interpret=True, matmul_dtype="float32"
    )
    np.testing.assert_allclose(np.asarray(eps_k), np.asarray(eps_ref), atol=2e-5)
    # bf16 trunk stays within the ~1% budget per call
    eps_b = fused_tmdm_denoiser(
        params, y_t, y0, 5, interpret=True, matmul_dtype="bfloat16"
    )
    assert np.max(np.abs(np.asarray(eps_b - eps_ref))) < 1e-2
