"""NsDiff variance head g(x).

Parity: /root/reference/models/Diffusion_model/NsDiff/g_backbone.py:19-72 —
trailing window variance of the history -> 3-layer MLP with LayerNorm over the
[enc_in, hidden] plane -> softplus future sigma per (pred_len, F).

TPU note: the rolling variance is a fused ``reduce_window`` (ops.rolling) and
the MLP is three MXU matmuls over the feature-major layout [B, N, T'].
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.rolling import wv_sigma_trailing

__all__ = ["SigmaEstimation"]


class SigmaEstimation(nn.Module):
    seq_len: int
    pred_len: int
    enc_in: int
    hidden_size: int = 512
    kernel_size: int = 24

    @nn.compact
    def __call__(self, x_enc):
        # x_enc: [B, T, N] -> sigma forecast [B, pred_len, N]
        B, T, N = x_enc.shape
        sigma = wv_sigma_trailing(x_enc, self.kernel_size, discard_rep=False)
        sigma = sigma[:, -(T - self.kernel_size) :, :] + 10e-8
        h = sigma.transpose(0, 2, 1)  # [B, N, T - kernel]
        h = nn.relu(nn.Dense(self.hidden_size)(h))
        # torch LayerNorm([enc_in, hidden]): normalise AND affine over both dims
        h = nn.LayerNorm(reduction_axes=(-2, -1), feature_axes=(-2, -1))(h)
        h = nn.relu(nn.Dense(self.hidden_size)(h))
        h = nn.LayerNorm(reduction_axes=(-2, -1), feature_axes=(-2, -1))(h)
        h = nn.Dense(self.pred_len)(h)
        pred_sigma = nn.softplus(h).transpose(0, 2, 1)  # [B, pred_len, N]
        return pred_sigma[:, -self.pred_len :, :]
