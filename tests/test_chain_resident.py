"""Chain-resident NsDiff sampling kernel (ops/pallas/chain_resident.py).

Deterministic math is validated in interpret mode against a zero-noise
replica of ops/diffusion.nsdiff_p_sample_loop driven by the flax denoiser;
the PRNG arm's parity is STATISTICAL (ensemble MPV on real TPU, measured in
benchmarks/ab_chain_resident.py) because the in-kernel Box-Muller stream
necessarily differs from jax.random.normal.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upgdm_tpu.models.nsdiff import NsDiffModel
from upgdm_tpu.ops import diffusion as D
from upgdm_tpu.ops.pallas.chain_resident import fused_nsdiff_chain


def _tiny_model():
    net = dict(
        dataset_nf=1, windows=40, pred_len=20, rolling_length=10,
        diffusion_steps=20, scaler_type=None, d_model=32, n_heads=2,
        e_layers=1, d_layers=1, d_ff=16, p_hidden_dims=[8, 8],
        p_hidden_layers=2, n_z_samples=4, task_model="NsDiff",
        diffusion_schedule="linear", beta_start=1e-4, beta_end=2e-2,
        output_attention=False, dropout=0.05, factor=3, activation="gelu",
    )
    return NsDiffModel(net)


def _zero_noise_reference(m, y0_hat, gx, use_gx_directly=False):
    """nsdiff_p_sample_loop with every Gaussian draw zeroed (flax trunk)."""
    sched = m.sched
    n_steps = int(np.asarray(sched.alphas).shape[0])
    y = y0_hat  # sqrt(gx)*0 + y_T_mean

    def model_fn(y_t, t):
        tb = jnp.broadcast_to(jnp.asarray(t), (y_t.shape[0],))
        return m.denoiser.apply({"params": m.params["model"]}, y_t, y0_hat, gx, tb)

    for t in range(n_steps - 1, 0, -1):
        c = D.nsdiff_gather(sched, jnp.asarray(t), y)
        eps_theta, sigma_theta = model_fn(y, t)
        sqrt_abar = jnp.sqrt(1.0 - c.one_minus_abar_sqrt_t**2)
        if use_gx_directly:
            s_y0 = gx
            noise_var = c.betas_bar_t * gx
        else:
            s_y0 = D._nsdiff_sigma_y0_hat(c, gx, sigma_theta)
            noise_var = (c.betas_bar_t - c.betas_tilde_t) * gx + c.betas_tilde_t * s_y0
        y0_reparam = (y - (1.0 - sqrt_abar) * y0_hat
                      - eps_theta * jnp.sqrt(noise_var)) / sqrt_abar
        g0, g1, g2 = D.nsdiff_gammas(c, gx, s_y0)
        y = g0 * y0_reparam + g1 * y + g2 * y0_hat
    c = D.nsdiff_gather(sched, jnp.asarray(0), y)
    eps_theta, sigma_theta = model_fn(y, 0)
    sqrt_abar = jnp.sqrt(1.0 - c.one_minus_abar_sqrt_t**2)
    if use_gx_directly:
        noise_var = c.betas_bar_t * gx
    else:
        s_y0 = D._nsdiff_sigma_y0_hat(c, gx, sigma_theta)
        noise_var = (c.betas_bar_t - c.betas_tilde_t) * gx + c.betas_tilde_t * s_y0
    return (y - (1.0 - sqrt_abar) * y0_hat - eps_theta * jnp.sqrt(noise_var)) / sqrt_abar


@pytest.mark.parametrize("use_gx", [False, True])
def test_chain_kernel_matches_zero_noise_reference(use_gx):
    m = _tiny_model()
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.normal(size=(6, 40, 1)) * 0.05 + 1.0).astype(np.float32))
    y0_hat = jax.jit(lambda p, b: m._apply_f(p, b))(m.params, x)
    gx = jax.jit(lambda p, b: m._apply_g(p, b))(m.params, x) + 1e-7

    want = np.asarray(_zero_noise_reference(m, y0_hat, gx, use_gx_directly=use_gx))
    got = fused_nsdiff_chain(
        m.params["model"], y0_hat, gx, m.sched, seed=0, n_z_samples=2,
        interpret=True, matmul_dtype="float32", noise_mode="zero",
        use_gx_directly=use_gx, tile_m=64,
    )
    got = np.asarray(got)
    assert got.shape == want.shape + (2,)
    # zero noise => every ensemble member identical and equal to the replica
    np.testing.assert_allclose(got[..., 0], got[..., 1], rtol=0, atol=0)
    np.testing.assert_allclose(got[..., 0], want, rtol=2e-5, atol=2e-6)


def test_chain_kernel_padding_path():
    """Row counts not divisible by tile_m must round-trip unchanged."""
    m = _tiny_model()
    rng = np.random.default_rng(1)
    x = jnp.asarray((rng.normal(size=(3, 40, 1)) * 0.05 + 1.0).astype(np.float32))
    y0_hat = jax.jit(lambda p, b: m._apply_f(p, b))(m.params, x)
    gx = jax.jit(lambda p, b: m._apply_g(p, b))(m.params, x) + 1e-7
    out = fused_nsdiff_chain(
        m.params["model"], y0_hat, gx, m.sched, seed=0, n_z_samples=1,
        interpret=True, matmul_dtype="float32", noise_mode="zero", tile_m=128,
    )
    assert np.isfinite(np.asarray(out)).all()
    want = np.asarray(_zero_noise_reference(m, y0_hat, gx))
    np.testing.assert_allclose(np.asarray(out)[..., 0], want, rtol=2e-5, atol=2e-6)


def test_chain_kernel_bf16_act_interpret_parity():
    """act_dtype="bfloat16" checked in interpret mode (CLAUDE.md: never
    compare two kernels that differ only inside pallas_call by on-TPU
    outputs — the tunnel's value-dedupe hash ignores the Mosaic payload).
    Zero-noise chain, loose bf16 tolerance over the 20-step recursion."""
    m = _tiny_model()
    rng = np.random.default_rng(2)
    x = jnp.asarray((rng.normal(size=(4, 40, 1)) * 0.05 + 1.0).astype(np.float32))
    y0_hat = jax.jit(lambda p, b: m._apply_f(p, b))(m.params, x)
    gx = jax.jit(lambda p, b: m._apply_g(p, b))(m.params, x) + 1e-7

    kw = dict(seed=0, n_z_samples=1, interpret=True, noise_mode="zero",
              matmul_dtype="float32", tile_m=64)
    got32 = np.asarray(fused_nsdiff_chain(
        m.params["model"], y0_hat, gx, m.sched, act_dtype="float32", **kw))
    got16 = np.asarray(fused_nsdiff_chain(
        m.params["model"], y0_hat, gx, m.sched, act_dtype="bfloat16", **kw))
    # bf16 activations genuinely change the numerics (guards against the
    # knob silently running fp32) ...
    assert np.abs(got16 - got32).max() > 0
    # ... but stay within a bf16-accumulation budget of the fp32 chain
    scale = np.abs(got32).mean()
    assert np.abs(got16 - got32).mean() / scale < 0.05, (
        np.abs(got16 - got32).mean() / scale)
