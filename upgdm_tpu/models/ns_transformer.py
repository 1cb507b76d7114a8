"""Non-stationary Transformer backbones.

Covers both consumers of the reference stack:
  - NSTransformer     -> NsDiff's mean head f(x)
    (/root/reference/models/Diffusion_model/NsDiff/mu_backbone.py:53-183)
  - NSTransformerVAE  -> TMDM's VAE-regularised conditional predictor
    (/root/reference/models/Diffusion_model/TMDM/tmdm_ns_transformer.py:40-174)

plus the encoder/decoder layers they share (the reference imports these from
``torch_timeseries.nn.Transformer_EncDec``) and the de-stationary Projector.

All sequence work is [B, T, d_model] batched matmul on the MXU; the per-series
normalisation (mean/std over T) and its inverse stay fused elementwise.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import AttentionLayer
from .embedding import DataEmbedding

__all__ = ["Projector", "NSEncoder", "NSDecoder", "NSTransformer", "NSTransformerVAE"]

_ACT = {"relu": nn.relu, "gelu": nn.gelu}


class Projector(nn.Module):
    """MLP learning the de-stationary factors tau/delta (mu_backbone.py:12-41).

    x: [B, S, E]; stats: [B, 1, E] -> [B, output_dim].
    """

    hidden_dims: Sequence[int]
    hidden_layers: int
    output_dim: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, stats):
        B, S, E = x.shape
        # series_conv collapses the S windows to one summary row: a Conv1d with
        # in_channels=S, out_channels=1, circular padding along the E axis
        # (mu_backbone.py:21-22,36).
        pad = self.kernel_size // 2
        w = self.param(
            "series_conv_kernel", nn.initializers.he_normal(), (self.kernel_size, S, 1)
        )
        padded = jnp.concatenate([x[:, :, E - pad :], x, x[:, :, :pad]], axis=2)
        out = jax.lax.conv_general_dilated(
            padded,
            w.transpose(2, 1, 0),  # [out=1, in=S, k]
            window_strides=(1,),
            padding=[(0, 0)],
            dimension_numbers=("NCH", "OIH", "NCH"),
        )  # [B, 1, E]
        feats = jnp.concatenate([out, stats], axis=1).reshape(B, 2 * E)
        h = feats
        dims = list(self.hidden_dims)
        h = nn.relu(nn.Dense(dims[0])(h))
        for i in range(self.hidden_layers - 1):
            h = nn.relu(nn.Dense(dims[i + 1])(h))
        return nn.Dense(self.output_dim, use_bias=False)(h)


class NSEncoderLayer(nn.Module):
    d_model: int
    d_ff: int
    n_heads: int
    dropout: float = 0.05
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x, tau=None, delta=None, deterministic=True):
        new_x = AttentionLayer(self.d_model, self.n_heads, False, self.dropout)(
            x, x, x, tau=tau, delta=delta, deterministic=deterministic
        )
        x = x + nn.Dropout(self.dropout)(new_x, deterministic=deterministic)
        y = x = nn.LayerNorm()(x)
        y = nn.Dropout(self.dropout)(
            _ACT[self.activation](nn.Dense(self.d_ff)(y)), deterministic=deterministic
        )
        y = nn.Dropout(self.dropout)(nn.Dense(self.d_model)(y), deterministic=deterministic)
        return nn.LayerNorm()(x + y)


class NSEncoder(nn.Module):
    e_layers: int
    d_model: int
    d_ff: int
    n_heads: int
    dropout: float = 0.05
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x, tau=None, delta=None, deterministic=True):
        for _ in range(self.e_layers):
            x = NSEncoderLayer(
                self.d_model, self.d_ff, self.n_heads, self.dropout, self.activation
            )(x, tau=tau, delta=delta, deterministic=deterministic)
        return nn.LayerNorm()(x)


class NSDecoderLayer(nn.Module):
    d_model: int
    d_ff: int
    n_heads: int
    dropout: float = 0.05
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x, cross, tau=None, delta=None, deterministic=True):
        # Self-attention is causal; delta applies only to cross attention
        # (its length matches the encoder sequence).
        sa = AttentionLayer(self.d_model, self.n_heads, True, self.dropout, name="self_attn")(
            x, x, x, tau=tau, delta=None, deterministic=deterministic
        )
        x = x + nn.Dropout(self.dropout)(sa, deterministic=deterministic)
        x = nn.LayerNorm()(x)
        ca = AttentionLayer(self.d_model, self.n_heads, False, self.dropout, name="cross_attn")(
            x, cross, cross, tau=tau, delta=delta, deterministic=deterministic
        )
        x = x + nn.Dropout(self.dropout)(ca, deterministic=deterministic)
        y = x = nn.LayerNorm()(x)
        y = nn.Dropout(self.dropout)(
            _ACT[self.activation](nn.Dense(self.d_ff)(y)), deterministic=deterministic
        )
        y = nn.Dropout(self.dropout)(nn.Dense(self.d_model)(y), deterministic=deterministic)
        return nn.LayerNorm()(x + y)


class NSDecoder(nn.Module):
    d_layers: int
    d_model: int
    d_ff: int
    n_heads: int
    c_out: int
    dropout: float = 0.05
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x, cross, tau=None, delta=None, deterministic=True):
        for _ in range(self.d_layers):
            x = NSDecoderLayer(
                self.d_model, self.d_ff, self.n_heads, self.dropout, self.activation
            )(x, cross, tau=tau, delta=delta, deterministic=deterministic)
        x = nn.LayerNorm()(x)
        return nn.Dense(self.c_out)(x)


def _series_stats(x_enc):
    """Per-series normalisation stats (mu_backbone.py:156-159), stop-graded."""
    mean_enc = jax.lax.stop_gradient(x_enc.mean(axis=1, keepdims=True))
    centered = x_enc - mean_enc
    std_enc = jax.lax.stop_gradient(
        jnp.sqrt(centered.var(axis=1, keepdims=True) + 1e-5)
    )
    return mean_enc, std_enc


class NSTransformer(nn.Module):
    """NsDiff mean head f(x) (mu_backbone.py:53-183).

    __call__(x_enc [B, S, F]) -> (pred [B, pred_len, F], dec_out [B, L+P, F]).
    The decoder input is built internally (last label_len of the normalised
    history + zeros), matching how every reference call site constructs it
    (NsDiff_model.py:114-121).
    """

    seq_len: int
    label_len: int
    pred_len: int
    enc_in: int
    d_model: int = 512
    n_heads: int = 8
    e_layers: int = 2
    d_layers: int = 1
    d_ff: int = 256
    dropout: float = 0.05
    activation: str = "gelu"
    p_hidden_dims: Sequence[int] = (64, 64)
    p_hidden_layers: int = 2

    @nn.compact
    def __call__(self, x_enc, deterministic: bool = True):
        x_raw = jax.lax.stop_gradient(x_enc)
        mean_enc, std_enc = _series_stats(x_enc)
        x_norm = (x_enc - mean_enc) / std_enc
        x_dec = jnp.concatenate(
            [
                x_norm[:, -self.label_len :, :],
                jnp.zeros((x_enc.shape[0], self.pred_len, self.enc_in), x_enc.dtype),
            ],
            axis=1,
        )
        tau = jnp.exp(
            Projector(self.p_hidden_dims, self.p_hidden_layers, 1, name="tau_learner")(
                x_raw, std_enc
            )
        )
        delta = Projector(
            self.p_hidden_dims, self.p_hidden_layers, self.seq_len, name="delta_learner"
        )(x_raw, mean_enc)

        enc = DataEmbedding(self.d_model, self.dropout, name="enc_embedding")(
            x_norm, deterministic=deterministic
        )
        enc = NSEncoder(
            self.e_layers, self.d_model, self.d_ff, self.n_heads, self.dropout, self.activation,
            name="encoder",
        )(enc, tau=tau, delta=delta, deterministic=deterministic)

        dec = DataEmbedding(self.d_model, self.dropout, name="dec_embedding")(
            x_dec, deterministic=deterministic
        )
        dec_out = NSDecoder(
            self.d_layers, self.d_model, self.d_ff, self.n_heads, self.enc_in,
            self.dropout, self.activation, name="decoder",
        )(dec, enc, tau=tau, delta=delta, deterministic=deterministic)

        dec_out = dec_out * std_enc + mean_enc
        return dec_out[:, -self.pred_len :, :], dec_out


class NSTransformerVAE(nn.Module):
    """TMDM's conditional predictor with VAE latent z (tmdm_ns_transformer.py:40-174).

    Returns (pred, dec_out, KL_z, z_sample); dec_out spans label_len+pred_len
    and is the y0_hat TMDM conditions on (tmdm_adapter.py:100).
    """

    seq_len: int
    label_len: int
    pred_len: int
    enc_in: int
    d_model: int = 64
    n_heads: int = 4
    e_layers: int = 2
    d_layers: int = 1
    d_ff: int = 128
    dropout: float = 0.05
    activation: str = "gelu"
    p_hidden_dims: Sequence[int] = (64, 64)
    p_hidden_layers: int = 2
    n_reparam_samples: int = 100

    @nn.compact
    def __call__(self, x_enc, deterministic: bool = True):
        x_raw = jax.lax.stop_gradient(x_enc)
        mean_enc, std_enc = _series_stats(x_enc)
        x_norm = (x_enc - mean_enc) / std_enc
        x_dec = jnp.concatenate(
            [
                x_norm[:, -self.label_len :, :],
                jnp.zeros((x_enc.shape[0], self.pred_len, self.enc_in), x_enc.dtype),
            ],
            axis=1,
        )
        tau = jnp.exp(
            Projector(self.p_hidden_dims, self.p_hidden_layers, 1, name="tau_learner")(
                x_raw, std_enc
            )
        )
        delta = Projector(
            self.p_hidden_dims, self.p_hidden_layers, self.seq_len, name="delta_learner"
        )(x_raw, mean_enc)

        enc = DataEmbedding(self.d_model, self.dropout, name="enc_embedding")(
            x_norm, deterministic=deterministic
        )
        enc = NSEncoder(
            self.e_layers, self.d_model, self.d_ff, self.n_heads, self.dropout, self.activation,
            name="encoder",
        )(enc, tau=tau, delta=delta, deterministic=deterministic)

        def mlp(name):
            def f(h):
                h = nn.relu(nn.Dense(self.d_model, name=f"{name}_0")(h))
                return nn.Dense(self.d_model, name=f"{name}_1")(h)

            return f

        z_mean = mlp("z_mean")(enc)
        z_logvar = mlp("z_logvar")(enc)
        if not deterministic:
            # Reparameterise by averaging n samples (tmdm_ns_transformer.py:121-133):
            # equivalent to mean + sqrt(var) * eps_bar, eps_bar ~ N(0, 1/n).
            rng = self.make_rng("reparam")
            eps = jax.random.normal(
                rng, (self.n_reparam_samples,) + z_mean.shape, z_mean.dtype
            ).mean(axis=0)
            z_sample = z_mean + jnp.sqrt(jnp.exp(z_logvar)) * eps
        else:
            z_sample = z_mean
        enc = mlp("z_out")(z_sample)
        kl_z = jnp.mean(
            -0.5 * jnp.mean(1 - z_mean**2 + z_logvar - jnp.exp(z_logvar), axis=1)
        )

        dec = DataEmbedding(self.d_model, self.dropout, name="dec_embedding")(
            x_dec, deterministic=deterministic
        )
        dec_out = NSDecoder(
            self.d_layers, self.d_model, self.d_ff, self.n_heads, self.enc_in,
            self.dropout, self.activation, name="decoder",
        )(dec, enc, tau=tau, delta=delta, deterministic=deterministic)

        dec_out = dec_out * std_enc + mean_enc
        return dec_out[:, -self.pred_len :, :], dec_out, kl_z, z_sample
