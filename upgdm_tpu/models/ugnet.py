"""UGnet — the graph U-Net denoiser of DiffSTG (and NsDiff_spatial's variant).

TPU-native rebuild of /root/reference/models/Diffusion_model/DiffSTG/
ugnet.py:36-296.  Layout change: nodes are an explicit axis — features are
[B, V, T, C] (feature-last) with a dense adjacency [V, V] (or [B, V, V])
instead of PyG's flattened [B*V, ...] + edge_index.  Consequences:

  - TCN blocks are causal 1-D convs over T batched over (B, V) — the
    reference's Conv2d with a size-1 dummy axis (ugnet.py:62) collapses to its
    effective 1-D form;
  - the spatial GNN step is a dense masked message passing over V (models.gnn);
  - parallel sampling needs no ``duplicate_edge_index``: the adjacency
    broadcasts across the vmapped sample axis.

Shape algebra preserved: time down/up-sampling conv pairs (T+1 kernel,
Td_h//2 padding) map T_in <-> Td_h exactly as ugnet.py:100-110,126-131.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .embedding import sinusoidal_time_embedding
from .gnn import gnn_conv

__all__ = ["UGnet", "SpatialBlock", "TcnBlock", "ResidualBlock"]


class TimeConv(nn.Module):
    """Conv over the T axis of [B, V, T, C] (left+right explicit padding)."""

    features: int
    kernel_size: int
    stride: int = 1
    pad_left: int = 0
    pad_right: int = 0

    @nn.compact
    def __call__(self, x):
        B, V, T, C = x.shape
        h = x.reshape(B * V, T, C)
        if self.pad_left or self.pad_right:
            h = jnp.pad(h, ((0, 0), (self.pad_left, self.pad_right), (0, 0)))
        h = nn.Conv(self.features, (self.kernel_size,), strides=(self.stride,), padding="VALID")(h)
        return h.reshape(B, V, h.shape[1], self.features)


class TimeConvTranspose(nn.Module):
    """torch ConvTranspose1d(k, s, p) over the T axis of [B, V, T, C]."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        B, V, T, C = x.shape
        h = x.reshape(B * V, T, C)
        k, s, p = self.kernel_size, self.stride, self.padding
        w = self.param("kernel", nn.initializers.lecun_normal(), (k, C, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        out = jax.lax.conv_general_dilated(
            h.astype(w.dtype),  # raw lax conv requires matching dtypes
            w,
            window_strides=(1,),
            padding=[(k - 1 - p, k - 1 - p)],
            lhs_dilation=(s,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        ) + b
        return out.reshape(B, V, out.shape[1], self.features)


class SpatialBlock(nn.Module):
    """relu(gnn(x, adj)) (ugnet.py:36-45) on [B, V, C] features."""

    c_out: int
    gnn_name: str = "GCNConv"
    gnn_param: dict = None

    @nn.compact
    def __call__(self, x, adj):
        return nn.relu(gnn_conv(self.gnn_name, self.c_out, self.gnn_param)(x, adj))


class TcnBlock(nn.Module):
    """Causal dilated temporal conv with residual shortcut (ugnet.py:55-77)."""

    c_out: int
    kernel_size: int = 3
    dilation: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        B, V, T, C = x.shape
        pad = (self.kernel_size - 1) * self.dilation
        h = x.reshape(B * V, T, C)
        h = jnp.pad(h, ((0, 0), (pad, 0), (0, 0)))
        h = nn.Conv(
            self.c_out,
            (self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding="VALID",
        )(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = h.reshape(B, V, T, self.c_out)
        skip = x if C == self.c_out else nn.Dense(self.c_out, name="shortcut")(x)
        return h + skip


class ResidualBlock(nn.Module):
    """2x TCN + timestep injection + down/GNN/up sandwich (ugnet.py:79-133)."""

    c_out: int
    t_in: int
    d_h: int
    td_h: int
    gnn_name: str
    gnn_param: dict = None
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, temb, adj, deterministic=True):
        # x: [B, V, T_in, C]; temb: [B, d_h] (same timestep per graph)
        B, V, T, C = x.shape
        h = TcnBlock(self.c_out, self.kernel_size, name="tcn1")(x, deterministic)
        h = h + nn.Dense(self.c_out, name="t_conv")(temb)[:, None, None, :]
        h = TcnBlock(self.c_out, self.kernel_size, name="tcn2")(h, deterministic)
        # over channels (ugnet.py:113,123); eps matches torch LayerNorm
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(h)

        # downsample T_in -> Td_h (kernel T_in+1, pad Td_h//2)
        h = TimeConv(
            self.c_out, self.t_in + 1,
            pad_left=self.td_h // 2, pad_right=self.td_h // 2, name="downsampling",
        )(h)  # [B, V, Td_h, c_out]
        spatial = h.reshape(B, V, self.td_h * self.c_out)
        spatial = SpatialBlock(
            self.td_h * self.c_out, self.gnn_name, self.gnn_param, name="spatial"
        )(spatial, adj)
        h = spatial.reshape(B, V, self.td_h, self.c_out)
        # upsample Td_h -> T_in
        h = TimeConvTranspose(
            self.c_out, self.t_in + 1, 1, self.td_h // 2, name="upsampling"
        )(h)

        skip = x if C == self.c_out else nn.Dense(self.c_out, name="shortcut")(x)
        return h + skip


class Downsample(nn.Module):
    """Stride-2 time conv: T -> floor((T-1)/2)+1 (ugnet.py:149-157)."""

    c_in: int

    @nn.compact
    def __call__(self, x):
        return TimeConv(self.c_in, 3, stride=2, pad_left=1, pad_right=1, name="conv")(x)


class Upsample(nn.Module):
    """Transposed stride-2 time conv: T -> 2T (ugnet.py:168-176)."""

    c_in: int

    @nn.compact
    def __call__(self, x):
        return TimeConvTranspose(self.c_in, 4, 2, 1, name="conv")(x)


class UGnet(nn.Module):
    """(x_t, t, x_masked, adj) -> eps prediction, all [B, V, T, F].

    Structure mirrors ugnet.py:192-295: x and x_masked concatenated on the
    time axis (2T), channel multipliers define the resolutions, skip
    connections pop the down-path stack.
    """

    d_h: int
    T_h: int
    T_p: int
    F: int
    channel_multipliers: Sequence[int] = (1, 2)
    n_blocks: int = 2
    gnn_name: str = "GCNConv"
    gnn_param: dict = None
    td_h: int = 10

    @nn.compact
    def __call__(self, x, t, x_masked, adj, deterministic=True):
        T = self.T_h + self.T_p
        n_res = len(self.channel_multipliers)

        h_in = jnp.concatenate([x, x_masked], axis=2)  # [B, V, 2T, F]
        hx = nn.Dense(self.d_h, name="x_proj")(h_in)
        # follow the token dtype: a fp32 temb would promote every residual
        # `h + t_conv(temb)` — and all layers downstream — back to fp32
        # during bf16 sampling
        temb = sinusoidal_time_embedding(t, self.d_h).astype(hx.dtype)  # [B, d_h]

        # ---- down path
        t_in = 2 * T
        stack = [hx]
        in_ch = out_ch = self.d_h
        bi = 0
        for i in range(n_res):
            out_ch = in_ch * self.channel_multipliers[i]
            for _ in range(self.n_blocks):
                hx = ResidualBlock(
                    out_ch, t_in, self.d_h, self.td_h, self.gnn_name, self.gnn_param,
                    name=f"down_{bi}",
                )(hx, temb, adj, deterministic)
                stack.append(hx)
                in_ch = out_ch
                bi += 1
            if i < n_res - 1:
                hx = Downsample(in_ch, name=f"down_{bi}")(hx)
                stack.append(hx)
                t_in = (t_in - 1) // 2 + 1
                bi += 1

        hx = ResidualBlock(
            out_ch, t_in, self.d_h, self.td_h, self.gnn_name, self.gnn_param, name="middle_1"
        )(hx, temb, adj, deterministic)
        hx = ResidualBlock(
            out_ch, t_in, self.d_h, self.td_h, self.gnn_name, self.gnn_param, name="middle_2"
        )(hx, temb, adj, deterministic)

        # ---- up path
        in_ch = out_ch
        bi = 0
        for i in reversed(range(n_res)):
            out_ch = in_ch
            for _ in range(self.n_blocks):
                s = stack.pop()
                hx = ResidualBlock(
                    out_ch, t_in, self.d_h, self.td_h, self.gnn_name, self.gnn_param,
                    name=f"up_{bi}",
                )(jnp.concatenate([hx, s], axis=-1), temb, adj, deterministic)
                bi += 1
            out_ch = in_ch // self.channel_multipliers[i]
            s = stack.pop()
            hx = ResidualBlock(
                out_ch, t_in, self.d_h, self.td_h, self.gnn_name, self.gnn_param,
                name=f"up_{bi}",
            )(jnp.concatenate([hx, s], axis=-1), temb, adj, deterministic)
            in_ch = out_ch
            bi += 1
            if i > 0:
                hx = Upsample(in_ch, name=f"up_{bi}")(hx)
                t_in = t_in * 2
                bi += 1

        assert t_in == 2 * T, "time axis must round-trip to 2T"
        e = nn.Dense(self.F, name="out_proj")(hx)  # [B, V, 2T, F]
        # Linear over the time axis 2T -> T (ugnet.py:246-247)
        w = self.param("out_time_kernel", nn.initializers.lecun_normal(), (T, 2 * T))
        b = self.param("out_time_bias", nn.initializers.zeros, (T,))
        e = jnp.einsum("ot,bvtf->bvof", w, e) + b[None, None, :, None]
        return e
