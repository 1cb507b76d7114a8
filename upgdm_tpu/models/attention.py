"""Attention blocks: de-stationary attention (NS-Transformer) and the plain
full/cross attention used by DiffusionTS.

Re-implements the ``torch_timeseries.nn.SelfAttention_Family`` dependency of
the reference (mu_backbone.py:6, tmdm_ns_transformer.py:4) and DiffusionTS's
FullAttention/CrossAttention (diffusionts_transformer.py:123-201).

All attention math runs as batched einsums -> MXU; softmax/masking fuse on the
VPU.  Dropout is inert at inference (deterministic=True).
"""
from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["DSAttention", "AttentionLayer", "FullAttention", "CrossAttention"]

_NEG_INF = -1e9


class DSAttention(nn.Module):
    """De-stationary attention: scores are rescaled by tau and shifted by delta
    (the learned de-stationary factors) before softmax.

    q,k,v: [B, L, H, E]; tau: [B, 1] or None; delta: [B, S] or None.
    """

    mask_flag: bool = False
    attention_dropout: float = 0.05

    @nn.compact
    def __call__(self, queries, keys, values, tau=None, delta=None, deterministic=True):
        B, L, H, E = queries.shape
        scale = 1.0 / math.sqrt(E)
        tau = jnp.ones((B, 1), queries.dtype) if tau is None else tau
        delta = jnp.zeros((B, 1), queries.dtype) if delta is None else delta

        scores = jnp.einsum("blhe,bshe->bhls", queries, keys)
        scores = scores * tau[:, :, None, None] + delta[:, None, None, :]
        if self.mask_flag:
            causal = jnp.tril(jnp.ones((L, scores.shape[-1]), bool))
            scores = jnp.where(causal[None, None], scores, _NEG_INF)
        attn = nn.softmax(scale * scores, axis=-1)
        attn = nn.Dropout(self.attention_dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhls,bshd->blhd", attn, values)
        return out


class AttentionLayer(nn.Module):
    """Multi-head projection wrapper around an inner attention module."""

    d_model: int
    n_heads: int
    mask_flag: bool = False
    attention_dropout: float = 0.05

    @nn.compact
    def __call__(self, queries, keys, values, tau=None, delta=None, deterministic=True):
        B, L, _ = queries.shape
        S = keys.shape[1]
        H = self.n_heads
        d_head = self.d_model // H
        q = nn.Dense(self.d_model, name="query")(queries).reshape(B, L, H, d_head)
        k = nn.Dense(self.d_model, name="key")(keys).reshape(B, S, H, d_head)
        v = nn.Dense(self.d_model, name="value")(values).reshape(B, S, H, d_head)
        out = DSAttention(self.mask_flag, self.attention_dropout)(
            q, k, v, tau=tau, delta=delta, deterministic=deterministic
        )
        out = out.reshape(B, L, self.d_model)
        return nn.Dense(self.d_model, name="out")(out)


class FullAttention(nn.Module):
    """Plain MHSA with mean-head attention map (diffusionts_transformer.py:123-159)."""

    n_embd: int
    n_head: int
    attn_pdrop: float = 0.1
    resid_pdrop: float = 0.1

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        B, T, C = x.shape
        H = self.n_head
        d = C // H
        q = nn.Dense(C, name="query")(x).reshape(B, T, H, d).transpose(0, 2, 1, 3)
        k = nn.Dense(C, name="key")(x).reshape(B, T, H, d).transpose(0, 2, 1, 3)
        v = nn.Dense(C, name="value")(x).reshape(B, T, H, d).transpose(0, 2, 1, 3)
        att = (q @ k.transpose(0, 1, 3, 2)) / math.sqrt(d)
        if mask is not None:
            att = jnp.where(mask[:, None, None, :], att, _NEG_INF)
        att = nn.softmax(att, axis=-1)
        att = nn.Dropout(self.attn_pdrop)(att, deterministic=deterministic)
        y = (att @ v).transpose(0, 2, 1, 3).reshape(B, T, C)
        y = nn.Dropout(self.resid_pdrop)(nn.Dense(C, name="proj")(y), deterministic=deterministic)
        return y, att.mean(axis=1)


class CrossAttention(nn.Module):
    """Cross attention from x to encoder output (diffusionts_transformer.py:162-201)."""

    n_embd: int
    condition_embd: int
    n_head: int
    attn_pdrop: float = 0.1
    resid_pdrop: float = 0.1

    @nn.compact
    def __call__(self, x, encoder_output, mask=None, deterministic=True):
        B, T, C = x.shape
        T_E = encoder_output.shape[1]
        H = self.n_head
        d = C // H
        q = nn.Dense(C, name="query")(x).reshape(B, T, H, d).transpose(0, 2, 1, 3)
        k = nn.Dense(C, name="key")(encoder_output).reshape(B, T_E, H, d).transpose(0, 2, 1, 3)
        v = nn.Dense(C, name="value")(encoder_output).reshape(B, T_E, H, d).transpose(0, 2, 1, 3)
        att = (q @ k.transpose(0, 1, 3, 2)) / math.sqrt(d)
        if mask is not None:
            att = jnp.where(mask[:, None, None, :], att, _NEG_INF)
        att = nn.softmax(att, axis=-1)
        att = nn.Dropout(self.attn_pdrop)(att, deterministic=deterministic)
        y = (att @ v).transpose(0, 2, 1, 3).reshape(B, T, C)
        y = nn.Dropout(self.resid_pdrop)(nn.Dense(C, name="proj")(y), deterministic=deterministic)
        return y, att.mean(axis=1)
