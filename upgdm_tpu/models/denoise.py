"""Conditional MLP denoisers for NsDiff and TMDM.

Parity:
  - NsDiff eps/sigma heads: /root/reference/models/Diffusion_model/NsDiff/
    denoise.py:6-51 (3x ConditionalLinear(128) with per-step embedding gates on
    concat(y_t, y0_hat, gx), L2-normalised between layers; eps head + softplus
    sigma head).
  - TMDM denoiser: /root/reference/models/Diffusion_model/TMDM/
    tmdm_model.py:6-64 (same gating, input concat(y_t, y0_hat) [+ enc x],
    single eps head, no inter-layer normalisation).

These are the innermost ops of the reverse-diffusion scan: one kernel-fused
(Dense -> gate -> softplus [-> normalize]) x3 + heads per timestep.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ConditionalLinear", "NsDiffDenoiser", "TMDMDenoiser"]


class ConditionalLinear(nn.Module):
    """Dense whose output is gated by a learned per-timestep embedding row."""

    num_out: int
    n_steps: int

    @nn.compact
    def __call__(self, x, t):
        out = nn.Dense(self.num_out)(x)
        embed = self.param(
            "embed", nn.initializers.uniform(scale=1.0), (self.n_steps, self.num_out)
        )
        gamma = embed[t]  # [B?, num_out] or [num_out]
        if gamma.ndim < out.ndim:
            gamma = jnp.expand_dims(gamma, tuple(range(gamma.ndim - 1, out.ndim - 1)))
        return gamma * out


def _l2_normalize(x, axis=-1, eps=1e-12):
    # torch F.normalize semantics: x / max(||x||_2, eps)
    norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


class NsDiffDenoiser(nn.Module):
    """(y_t, y0_hat, gx, t) -> (eps_pred, sigma_pred), each [..., O, N]."""

    enc_in: int
    n_steps: int
    hidden: int = 128

    @nn.compact
    def __call__(self, y_t, y_0_hat, g_x, t):
        h = jnp.concatenate([y_t, y_0_hat, g_x], axis=-1)
        h = nn.softplus(ConditionalLinear(self.hidden, self.n_steps, name="lin1")(h, t))
        h = _l2_normalize(h)
        h = nn.softplus(ConditionalLinear(self.hidden, self.n_steps, name="lin2")(h, t))
        h = _l2_normalize(h)
        h = nn.softplus(ConditionalLinear(self.hidden, self.n_steps, name="lin3")(h, t))
        h = _l2_normalize(h)
        eps_pred = nn.Dense(self.enc_in, name="lin4")(h)
        # sigma head reads softplus(h) — matches denoise.py:50 where the sigma
        # branch consumes softplus of the shared trunk output.
        sigma = nn.softplus(nn.Dense(self.enc_in, name="sigma_lin")(nn.softplus(h)))
        return eps_pred, sigma


class TMDMDenoiser(nn.Module):
    """(x_emb, y_t, y_0_hat, t) -> eps_pred.

    cat_x/cat_y_pred follow tmdm.yml (both True): input = concat(y_t, y0_hat).
    n_steps is timesteps + 1 (tmdm_model.py:26).
    """

    enc_in: int
    n_steps: int
    hidden: int = 128
    cat_x: bool = True
    cat_y_pred: bool = True

    @nn.compact
    def __call__(self, x_emb, y_t, y_0_hat, t):
        if self.cat_y_pred:
            h = jnp.concatenate([y_t, y_0_hat], axis=-1)
        elif self.cat_x:
            h = jnp.concatenate([y_t, x_emb], axis=-1)
        else:
            h = y_t
        h = nn.softplus(ConditionalLinear(self.hidden, self.n_steps, name="lin1")(h, t))
        h = nn.softplus(ConditionalLinear(self.hidden, self.n_steps, name="lin2")(h, t))
        h = nn.softplus(ConditionalLinear(self.hidden, self.n_steps, name="lin3")(h, t))
        return nn.Dense(self.enc_in, name="lin4")(h)
