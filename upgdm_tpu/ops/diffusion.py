"""Forward/reverse diffusion math for all four model families, scan-ready.

TPU-first design: every reverse sampler here is a ``lax.scan`` over timesteps
(one traced denoiser call per step), and the ensemble dimension is handled by
callers via ``vmap``/batching — there is no sample chunking, no tiling, and no
``duplicate_edge_index`` (the reference tiles batches host-side:
NsDiff_model.py:227-257, tmdm_adapter.py:130-151, DiffSTG
graph_diffusion_model.py:238-245).

Denoiser calls are injected as pure functions so the same math drives every
backbone:  ``model_fn(y, t) -> ...`` closures built by the model wrappers.

Parity targets:
  - NsDiff q/p math: /root/reference/models/Diffusion_model/NsDiff/nsdiff_utils.py
    (cal_forward_noise:58, cal_sigma_tilde:75, calc_gammas:80, q_sample:96,
    p_sample:111-158, p_sample_t_1to0:209-239, p_sample_loop:271-284,
    *_pe gx-direct variants:163-206,242-269)
  - TMDM/CARD math: /root/reference/models/Diffusion_model/TMDM/
    tmdm_diffusion_utils.py:42-119
  - DiffSTG posterior: /root/reference/models/Diffusion_model/DiffSTG/
    graph_diffusion_model.py:46-73
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

EPS = 10e-8  # the reference's epsilon (NsDiff_model.py:37)


def _bcast(coeff: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Reshape a per-batch (or scalar) coefficient for broadcasting against `like`."""
    if coeff.ndim == 0:
        return coeff
    return coeff.reshape(coeff.shape + (1,) * (like.ndim - coeff.ndim))


# ===========================================================================
# NsDiff — heteroscedastic non-stationary diffusion
# ===========================================================================

class NsDiffCoeffs(NamedTuple):
    """Per-timestep schedule gathers used by NsDiff train/sample steps.

    All fields broadcast against data tensors ([B, O, N] or [O, N]).
    """

    alpha_t: jnp.ndarray
    betas_tilde_t: jnp.ndarray
    betas_bar_t: jnp.ndarray
    betas_tilde_m_1_t: jnp.ndarray
    betas_bar_m_1_t: jnp.ndarray
    alphas_cumprod_prev_t: jnp.ndarray
    one_minus_abar_sqrt_t: jnp.ndarray


def nsdiff_gather(sched, t, like) -> NsDiffCoeffs:
    """Gather all NsDiff per-step coefficients for (possibly batched) t."""
    g = lambda arr: _bcast(jnp.asarray(arr)[t], like)
    return NsDiffCoeffs(
        alpha_t=g(sched.alphas),
        betas_tilde_t=g(sched.betas_tilde),
        betas_bar_t=g(sched.betas_bar),
        betas_tilde_m_1_t=g(sched.betas_tilde_m_1),
        betas_bar_m_1_t=g(sched.betas_bar_m_1),
        alphas_cumprod_prev_t=g(sched.alphas_cumprod_prev),
        one_minus_abar_sqrt_t=g(sched.one_minus_alphas_bar_sqrt),
    )


def nsdiff_forward_noise(c: NsDiffCoeffs, gx, y_sigma):
    """Heteroscedastic forward-noise variance (nsdiff_utils.py:58-64)."""
    return (c.betas_bar_t - c.betas_tilde_t) * gx + c.betas_tilde_t * y_sigma


def _nsdiff_sigma12(c: NsDiffCoeffs, gx, y_sigma):
    """Sigma_1 / Sigma_2 of the NsDiff posterior (nsdiff_utils.py:40-56)."""
    sigma_1 = (1.0 - c.alpha_t) ** 2 * gx + c.alpha_t * (1.0 - c.alpha_t) * y_sigma
    sigma_2 = (c.betas_bar_m_1_t - c.betas_tilde_m_1_t) * gx + c.betas_tilde_m_1_t * y_sigma
    return sigma_1, sigma_2


def nsdiff_sigma_tilde(c: NsDiffCoeffs, gx, y_sigma):
    """Posterior variance target for the KL loss (nsdiff_utils.py:75-78)."""
    s1, s2 = _nsdiff_sigma12(c, gx, y_sigma)
    return (s1 * s2) / (c.alpha_t * s2 + s1)


def nsdiff_gammas(c: NsDiffCoeffs, gx, y_sigma):
    """Posterior mean coefficients gamma_0/1/2 (nsdiff_utils.py:80-92)."""
    s1, s2 = _nsdiff_sigma12(c, gx, y_sigma)
    sqrt_a = jnp.sqrt(c.alpha_t)
    sqrt_abar_prev = jnp.sqrt(c.alphas_cumprod_prev_t)
    denom = c.alpha_t * s2 + s1
    gamma_0 = sqrt_abar_prev * s1 / denom
    gamma_1 = sqrt_a * s2 / denom
    gamma_2 = ((sqrt_a * (c.alpha_t - 1.0)) * s2 + (1.0 - sqrt_abar_prev) * s1) / denom
    return gamma_0, gamma_1, gamma_2


def nsdiff_q_sample(y, y_0_hat, sched, t, noise):
    """Forward sample with y0_hat-shifted mean (nsdiff_utils.py:96-107).

    NOTE: the reference adds the (pre-scaled) noise directly — the noise
    argument already carries sqrt(forward_noise).
    """
    sqrt_abar = _bcast(jnp.asarray(sched.alphas_bar_sqrt)[t], y)
    return sqrt_abar * y + (1.0 - sqrt_abar) * y_0_hat + noise


def _nsdiff_sigma_y0_hat(c: NsDiffCoeffs, gx, sigma_theta):
    """Per-step quadratic solve for sigma_{Y0} (nsdiff_utils.py:143-146)."""
    a = c.alpha_t
    bt_m1 = c.betas_tilde_m_1_t
    bb_m1 = c.betas_bar_m_1_t
    lam0 = a * (1.0 - a) * bt_m1
    lam1 = ((1.0 - a) ** 2 * bt_m1 + a * (1.0 - a) * (bb_m1 - bt_m1)) * gx - sigma_theta * (
        a * bt_m1 + a * (1.0 - a)
    )
    lam2 = gx**2 * (1.0 - a) ** 2 * (bb_m1 - bt_m1) - sigma_theta * gx * (
        a * bb_m1 - a * bt_m1 + (1.0 - a) ** 2
    )
    disc = jnp.maximum(lam1**2 - 4.0 * lam0 * lam2, 0.0)
    return (-lam1 + jnp.sqrt(disc)) / (2.0 * lam0)


def nsdiff_p_sample_loop(
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], tuple],
    y_0_hat: jnp.ndarray,
    gx: jnp.ndarray,
    sched,
    key: jax.Array,
    use_gx_directly: bool = False,
    unroll: int = 1,
) -> jnp.ndarray:
    """Full NsDiff reverse chain as a single ``lax.scan``.

    model_fn(y_t, t) -> (eps_theta, sigma_theta); y_0_hat doubles as y_T_mean
    (nsdiff_utils.py:271-284).  ``use_gx_directly=True`` selects the ``_pe``
    variant that replaces the quadratic solve with gx (nsdiff_utils.py:163-206).
    Returns the final y_0 reparameterisation (p_sample_t_1to0:209-239).

    ``unroll`` replicates the scan body (lax.scan's knob) so XLA can fuse the
    elementwise tail of step i with the head of step i+1; measured on the
    bench chain in benchmarks/ab_scan_unroll.py — keep 1 unless that A/B says
    otherwise (compile time scales with the unroll factor on the
    remote-compile backend).
    """
    n_steps = int(jnp.asarray(sched.alphas).shape[0])
    y_T_mean = y_0_hat
    key, k0 = jax.random.split(key)
    cur_y = jnp.sqrt(gx) * jax.random.normal(k0, y_T_mean.shape, y_T_mean.dtype) + y_T_mean

    def step(carry, inp):
        y, = carry
        t, k = inp
        c = nsdiff_gather(sched, t, y)
        eps_theta, sigma_theta = model_fn(y, t)
        sqrt_abar = jnp.sqrt(1.0 - c.one_minus_abar_sqrt_t**2)
        if use_gx_directly:
            sigma_y0 = gx
            noise_var = c.betas_bar_t * gx
        else:
            sigma_y0 = _nsdiff_sigma_y0_hat(c, gx, sigma_theta)
            noise_var = (c.betas_bar_t - c.betas_tilde_t) * gx + c.betas_tilde_t * sigma_y0
        y0_reparam = (y - (1.0 - sqrt_abar) * y_T_mean - eps_theta * jnp.sqrt(noise_var)) / sqrt_abar
        g0, g1, g2 = nsdiff_gammas(c, gx, sigma_y0)
        y_mean = g0 * y0_reparam + g1 * y + g2 * y_T_mean
        z = jax.random.normal(k, y.shape, y.dtype)
        y_next = y_mean + jnp.sqrt(sigma_theta) * z
        return (y_next,), None

    ts = jnp.arange(n_steps - 1, 0, -1)
    keys = jax.random.split(key, n_steps - 1)
    (cur_y,), _ = jax.lax.scan(step, (cur_y,), (ts, keys), unroll=unroll)

    # final step t=0 -> y_0 (deterministic reparameterisation)
    t0 = jnp.asarray(0, dtype=jnp.int32)
    c = nsdiff_gather(sched, t0, cur_y)
    eps_theta, sigma_theta = model_fn(cur_y, t0)
    sqrt_abar = jnp.sqrt(1.0 - c.one_minus_abar_sqrt_t**2)
    if use_gx_directly:
        noise_var = c.betas_bar_t * gx
    else:
        sigma_y0 = _nsdiff_sigma_y0_hat(c, gx, sigma_theta)
        noise_var = (c.betas_bar_t - c.betas_tilde_t) * gx + c.betas_tilde_t * sigma_y0
    y_0 = (cur_y - (1.0 - sqrt_abar) * y_T_mean - eps_theta * jnp.sqrt(noise_var)) / sqrt_abar
    return y_0


# ===========================================================================
# TMDM / CARD — conditional diffusion with y0_hat prior
# ===========================================================================

def card_q_sample(y, y_0_hat, sched, t, noise):
    """q(y_t | y_0, x) with f-phi shifted mean (tmdm_diffusion_utils.py:42-53)."""
    sqrt_abar = _bcast(jnp.asarray(sched.alphas_bar_sqrt)[t], y)
    sqrt_1m_abar = _bcast(jnp.asarray(sched.one_minus_alphas_bar_sqrt)[t], y)
    return sqrt_abar * y + (1.0 - sqrt_abar) * y_0_hat + sqrt_1m_abar * noise


def card_p_sample_loop(
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    y_0_hat: jnp.ndarray,
    sched,
    key: jax.Array,
) -> jnp.ndarray:
    """CARD reverse chain as ``lax.scan`` (tmdm_diffusion_utils.py:57-119).

    model_fn(y_t, t) -> eps_theta.  y_T = z + y_T_mean (unit-variance prior).
    """
    n_steps = int(jnp.asarray(sched.alphas).shape[0])
    y_T_mean = y_0_hat
    key, k0 = jax.random.split(key)
    cur_y = jax.random.normal(k0, y_T_mean.shape, y_T_mean.dtype) + y_T_mean

    alphas = jnp.asarray(sched.alphas)
    om_abar_sqrt = jnp.asarray(sched.one_minus_alphas_bar_sqrt)

    def step(carry, inp):
        y, = carry
        t, k = inp
        alpha_t = alphas[t]
        s1m = om_abar_sqrt[t]
        s1m_prev = om_abar_sqrt[t - 1]
        sqrt_abar = jnp.sqrt(1.0 - s1m**2)
        sqrt_abar_prev = jnp.sqrt(1.0 - s1m_prev**2)
        gamma_0 = (1.0 - alpha_t) * sqrt_abar_prev / (s1m**2)
        gamma_1 = (s1m_prev**2) * jnp.sqrt(alpha_t) / (s1m**2)
        gamma_2 = 1.0 + (sqrt_abar - 1.0) * (jnp.sqrt(alpha_t) + sqrt_abar_prev) / (s1m**2)
        eps_theta = model_fn(y, t)
        y0_reparam = (y - (1.0 - sqrt_abar) * y_T_mean - eps_theta * s1m) / sqrt_abar
        y_mean = gamma_0 * y0_reparam + gamma_1 * y + gamma_2 * y_T_mean
        beta_t_hat = (s1m_prev**2) / (s1m**2) * (1.0 - alpha_t)
        z = jax.random.normal(k, y.shape, y.dtype)
        y_next = y_mean + jnp.sqrt(beta_t_hat) * z
        return (y_next,), None

    ts = jnp.arange(n_steps - 1, 0, -1)
    keys = jax.random.split(key, n_steps - 1)
    (cur_y,), _ = jax.lax.scan(step, (cur_y,), (ts, keys))

    t0 = jnp.asarray(0, dtype=jnp.int32)
    s1m = om_abar_sqrt[t0]
    sqrt_abar = jnp.sqrt(1.0 - s1m**2)
    eps_theta = model_fn(cur_y, t0)
    y_0 = (cur_y - (1.0 - sqrt_abar) * y_T_mean - eps_theta * s1m) / sqrt_abar
    return y_0


# ===========================================================================
# DiffSTG — DDPM forward + DDPM/DDIM posterior on 1-indexed schedule
# ===========================================================================

def diffstg_q_sample(x0, sched, t, noise):
    """xt = sqrt(abar_t) x0 + sqrt(1-abar_t) eps (diffusion_schedulers.py:70-80).

    t is 1-indexed into the length-(T+1) alphabar table.
    """
    atbar = _bcast(jnp.asarray(sched.alphabar, dtype=x0.dtype)[t], x0)
    return jnp.sqrt(atbar) * x0 + jnp.sqrt(1.0 - atbar) * noise


def diffstg_posterior_step(sched, xt, pred_eps, t: int, target_t: int, trick: str, key):
    """One denoise step with static (t, target_t) ints.

    Mirrors gaussian_posterior (graph_diffusion_model.py:46-73); coefficients
    are Python floats folded at trace time (the reference also treats them as
    host scalars via ``.item()``).
    """
    alphabar = sched.alphabar
    atbar = float(alphabar[t])
    atbar_target = float(alphabar[target_t])
    if trick == "ddpm" or t <= 1:
        at = float(sched.alpha[t])
        atbar_prev = float(alphabar[t - 1])
        beta_tilde = float(sched.beta[t - 1]) * (1.0 - atbar_prev) / (1.0 - atbar)
        z = jax.random.normal(key, xt.shape, xt.dtype)
        xt_target = (1.0 / at**0.5) * (xt - ((1.0 - at) / (1.0 - atbar) ** 0.5) * pred_eps)
        return xt_target + beta_tilde**0.5 * z
    if trick == "ddim":
        xt_target = (atbar_target / atbar) ** 0.5 * (xt - (1.0 - atbar) ** 0.5 * pred_eps)
        return xt_target + (1.0 - atbar_target) ** 0.5 * pred_eps
    raise ValueError(f"Unknown inference trick {trick!r}")


# ===========================================================================
# DiffusionTS — x0-prediction helpers
# ===========================================================================

def dts_q_sample(x_start, sched, t, noise):
    sa = _bcast(jnp.asarray(sched.sqrt_alphas_cumprod)[t], x_start)
    sb = _bcast(jnp.asarray(sched.sqrt_one_minus_alphas_cumprod)[t], x_start)
    return sa * x_start + sb * noise


def dts_predict_noise_from_start(x_t, sched, t, x0):
    ra = _bcast(jnp.asarray(sched.sqrt_recip_alphas_cumprod)[t], x_t)
    rb = _bcast(jnp.asarray(sched.sqrt_recipm1_alphas_cumprod)[t], x_t)
    return (ra * x_t - x0) / rb


def dts_q_posterior(sched, x_start, x_t, t):
    c1 = _bcast(jnp.asarray(sched.posterior_mean_coef1)[t], x_t)
    c2 = _bcast(jnp.asarray(sched.posterior_mean_coef2)[t], x_t)
    mean = c1 * x_start + c2 * x_t
    log_var = _bcast(jnp.asarray(sched.posterior_log_variance_clipped)[t], x_t)
    return mean, log_var
