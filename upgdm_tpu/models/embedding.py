"""Embedding blocks shared by the transformer backbones.

Re-implements the external ``torch_timeseries.nn.embedding`` dependency of the
reference (imported at mu_backbone.py:5-7, TMDM.py:3) plus the DiffusionTS and
DiffSTG positional/time embeddings, as Flax modules.

  - DataEmbedding = token Conv1d(k=3, circular, no bias) + fixed sinusoidal
    positional embedding, then dropout.
  - sinusoidal_time_embedding: DDPM timestep embedding
    (DiffSTG/ugnet.py:15-33, diffusionts_model_utils.py:49-61).
  - LearnablePositionalEncoding: diffusionts_model_utils.py:66-85.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = [
    "positional_encoding_table",
    "sinusoidal_time_embedding",
    "CircularConv1d",
    "TokenEmbedding",
    "DataEmbedding",
    "LearnablePositionalEncoding",
]


def positional_encoding_table(max_len: int, d_model: int) -> np.ndarray:
    """Fixed sin/cos position table [max_len, d_model] (Informer-family)."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(0, max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)[:, : pe[:, 1::2].shape[1]]
    return pe


def sinusoidal_time_embedding(t: jnp.ndarray, embedding_dim: int) -> jnp.ndarray:
    """Diffusion-timestep embedding [B] -> [B, embedding_dim].

    Matches the fairseq-style construction used by DiffSTG's UGnet
    (ugnet.py:15-33) and DiffusionTS's SinusoidalPosEmb.
    """
    half_dim = embedding_dim // 2
    emb = math.log(10000.0) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = t.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class CircularConv1d(nn.Module):
    """Conv over the time axis with circular padding; input/output [B, T, C]."""

    features: int
    kernel_size: int = 3
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        pad = self.kernel_size // 2
        x = jnp.concatenate([x[:, -pad:, :], x, x[:, :pad, :]], axis=1)
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            padding="VALID",
            use_bias=self.use_bias,
            kernel_init=nn.initializers.he_normal(),
        )(x)


class TokenEmbedding(nn.Module):
    d_model: int

    @nn.compact
    def __call__(self, x):
        return CircularConv1d(self.d_model, kernel_size=3, use_bias=False)(x)


class DataEmbedding(nn.Module):
    """Token conv + fixed positional table, then dropout ([B, T, c_in] -> [B, T, d])."""

    d_model: int
    dropout: float = 0.1
    max_len: int = 5000

    @nn.compact
    def __call__(self, x, x_mark=None, deterministic: bool = True):
        T = x.shape[1]
        pe = positional_encoding_table(self.max_len, self.d_model)[:T]
        out = TokenEmbedding(self.d_model)(x) + jnp.asarray(pe)[None, :, :]
        if x_mark is not None:
            out = out + nn.Dense(self.d_model, use_bias=False)(x_mark)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class LearnablePositionalEncoding(nn.Module):
    """Uniform-initialised learned position table (diffusionts_model_utils.py:66-85)."""

    d_model: int
    max_len: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # U(-0.02, 0.02) like the torch init; the stored param IS the table
        # (no apply-time shift), so imported checkpoints load verbatim
        pe = self.param(
            "pe",
            lambda key, shape: jax.random.uniform(key, shape, minval=-0.02, maxval=0.02),
            (1, self.max_len, self.d_model),
        )
        x = x + pe
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)
