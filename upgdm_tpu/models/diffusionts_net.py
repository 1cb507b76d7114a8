"""DiffusionTS denoising transformer: trend/season decomposed output.

TPU-native rebuild of /root/reference/models/Diffusion_model/DiffusionTS/
diffusionts_transformer.py (Transformer:381-438, TrendBlock:12-34,
FourierLayer:52-97, Encoder/Decoder blocks:204-378) and the supporting blocks
in diffusionts_model_utils.py (Conv_MLP:151-161, AdaLayerNorm:187-202,
GELU2:180-184, SinusoidalPosEmb:49-61, LearnablePositionalEncoding:66-85).

Notes on TPU idioms:
  - the seasonal FourierLayer uses XLA's native rfft + top_k; the extrapolation
    is a dense [freq x time] cosine contraction on the MXU;
  - the reference's Conv1d(n_channel -> 2 n_channel, 1) over the *time* axis
    (diffusionts_transformer.py:320,328) is a time-mixing Dense implemented as
    an einsum.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .attention import CrossAttention, FullAttention
from .embedding import LearnablePositionalEncoding, sinusoidal_time_embedding

__all__ = ["DTSTransformer"]


def gelu2(x):
    return x * jax.nn.sigmoid(1.702 * x)


# torch nn.GELU is the exact erf form; flax defaults to the tanh approximation
_ACT = {"GELU": lambda x: nn.gelu(x, approximate=False), "GELU2": gelu2}


class AdaLayerNorm(nn.Module):
    """LayerNorm modulated by the diffusion-timestep embedding."""

    n_embd: int

    @nn.compact
    def __call__(self, x, timestep):
        # cast the fp32 sinusoidal embedding to the token dtype so a bf16
        # sampling pass stays bf16 (fp32 emb x bf16 kernel would promote the
        # Dense — and everything downstream of the modulation — back to fp32)
        emb = sinusoidal_time_embedding(timestep, self.n_embd).astype(x.dtype)
        emb = nn.Dense(self.n_embd * 2)(nn.silu(emb))[:, None, :]
        scale, shift = jnp.split(emb, 2, axis=2)
        x = nn.LayerNorm(use_bias=False, use_scale=False)(x) * (1 + scale) + shift
        return x


class ConvMLP(nn.Module):
    """Transpose-Conv1d(k=3, pad 1)-dropout embedding (model_utils.py:151-161)."""

    out_dim: int
    resid_pdrop: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        y = nn.Conv(self.out_dim, (3,), padding=1)(x)
        return nn.Dropout(self.resid_pdrop)(y, deterministic=deterministic)


class TimeMixDense(nn.Module):
    """Dense over the time axis: the reference's Conv1d(T_in -> T_out, k=1)."""

    t_out: int

    @nn.compact
    def __call__(self, x):  # [B, T_in, D] -> [B, T_out, D]
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.t_out, x.shape[1]),
        )
        b = self.param("bias", nn.initializers.zeros, (self.t_out,))
        return jnp.einsum("ot,btd->bod", w, x) + b[None, :, None]


class TrendBlock(nn.Module):
    """Polynomial trend regressor (diffusionts_transformer.py:12-34).

    input [B, T, E] -> trend values [B, out_dim, out_feat].
    """

    out_dim: int
    out_feat: int
    activation: str = "GELU"
    trend_poly: int = 3

    @nn.compact
    def __call__(self, x):
        act = _ACT[self.activation]
        B, T, E = x.shape
        # torch Conv1d(in=T, out=3, k=3, pad=1): channels = time rows, width = E
        h = TimeMixConv(self.trend_poly, kernel_size=3, name="trend_conv")(x)  # [B, 3, E]
        h = act(h)
        # torch Conv1d(in_feat=E, out_feat, k=3, pad=1) applied after
        # Transpose(1,2): channels = E, width = 3
        h = nn.Conv(self.out_feat, (3,), padding=1, name="feat_conv")(h)  # conv over width 3
        # h: [B, 3, out_feat]
        lin_space = np.arange(1, self.out_dim + 1, dtype=np.float32) / (self.out_dim + 1)
        poly_space = np.stack([lin_space ** (p + 1) for p in range(self.trend_poly)], axis=0)
        trend_vals = jnp.einsum("bpf,po->bof", h, jnp.asarray(poly_space))
        return trend_vals  # [B, out_dim, out_feat]


class TimeMixConv(nn.Module):
    """torch Conv1d with in_channels = time axis of a [B, T, E] tensor."""

    out_channels: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):  # [B, T, E] -> [B, out_channels, E]
        # treat T as channels, E as spatial width
        h = x.transpose(0, 2, 1)  # [B, E, T] -> feature-last for nn.Conv over E?
        # nn.Conv convolves over axis 1 with features last: input [B, E, T]
        # convolving over E with T input features -> out [B, E, out]; transpose.
        h = nn.Conv(self.out_channels, (self.kernel_size,), padding=self.kernel_size // 2)(h)
        return h.transpose(0, 2, 1)


class FourierLayer(nn.Module):
    """Top-k frequency extrapolation (diffusionts_transformer.py:52-97).

    The rfft is computed as an explicit DFT matmul when ``use_dft_matmul``
    (default: on TPU backends): the sampler calls this layer with a huge
    batch of short (T<=2000) sequences, and two [T, T//2+1] real matmuls ride
    the MXU, whereas XLA:TPU lowers batched small FFTs poorly.  Identical
    values up to fp accumulation order.
    """

    d_model: int
    low_freq: int = 1
    factor: int = 1
    use_dft_matmul: Optional[bool] = None

    def _rfft(self, x, T):
        use_matmul = self.use_dft_matmul
        if use_matmul is None:
            use_matmul = jax.default_backend() not in ("cpu",)
        if not use_matmul:
            # RFFT only accepts fp32/fp64 inputs
            return jnp.fft.rfft(x.astype(jnp.float32), axis=1)
        n_freq = T // 2 + 1
        # W[t, f] = exp(-2πi t f / T), split into real/imag banks
        tf = 2.0 * np.pi * np.outer(np.arange(T), np.arange(n_freq)) / T
        cos_bank = jnp.asarray(np.cos(tf), x.dtype)
        sin_bank = jnp.asarray(np.sin(tf), x.dtype)
        re = jnp.einsum("btd,tf->bfd", x, cos_bank)
        im = -jnp.einsum("btd,tf->bfd", x, sin_bank)
        # complex64 requires fp32 components (the DFT matmuls above may run
        # bf16; the cheap spectral bookkeeping — abs/top_k/angle — stays fp32)
        return jax.lax.complex(re.astype(jnp.float32), im.astype(jnp.float32))

    @nn.compact
    def __call__(self, x):  # [B, T, D]
        B, T, D = x.shape
        x_freq = self._rfft(x, T)
        if T % 2 == 0:
            x_freq = x_freq[:, self.low_freq : -1]
            f = np.fft.rfftfreq(T)[self.low_freq : -1]
        else:
            x_freq = x_freq[:, self.low_freq :]
            f = np.fft.rfftfreq(T)[self.low_freq :]
        length = x_freq.shape[1]
        top_k = int(self.factor * math.log(length))
        top_k = max(1, min(top_k, length))
        mag = jnp.abs(x_freq)  # [B, Freq, D]
        # top_k along the frequency axis, per (batch, feature)
        magT = mag.transpose(0, 2, 1)  # [B, D, F]
        _, idx = jax.lax.top_k(magT, top_k)  # [B, D, k]
        xfT = x_freq.transpose(0, 2, 1)  # [B, D, F]
        sel = jnp.take_along_axis(xfT, idx, axis=2)  # [B, D, k]

        use_matmul = self.use_dft_matmul
        if use_matmul is None:
            use_matmul = jax.default_backend() not in ("cpu",)
        t = jnp.arange(T, dtype=jnp.float32)
        if use_matmul:
            # Scatter the k kept coefficients back into the full spectrum and
            # extrapolate with two [F, T] matmuls.  Identical math: the +/-f
            # conjugate pair of the reference sums to 2*(Re cos - Im sin).
            # Avoids the [B, D, 2k, T] wave bank whose tiny 2k axis pads 16x
            # on TPU lanes (OOM at large sample batches).
            B_, D_ = idx.shape[0], idx.shape[1]
            bidx = jnp.arange(B_)[:, None, None]
            didx = jnp.arange(D_)[None, :, None]
            re = jnp.zeros((B_, D_, length), x.dtype).at[bidx, didx, idx].add(
                jnp.real(sel).astype(x.dtype))
            im = jnp.zeros((B_, D_, length), x.dtype).at[bidx, didx, idx].add(
                jnp.imag(sel).astype(x.dtype))
            ang = 2 * np.pi * jnp.asarray(f, jnp.float32)[:, None] * t[None, :]  # [F, T]
            # banks follow the token dtype (bf16 sampling): the angles are
            # computed fp32 and only the cos/sin VALUES are rounded
            wave = 2.0 * (
                jnp.einsum("bdl,lt->btd", re, jnp.cos(ang).astype(x.dtype))
                - jnp.einsum("bdl,lt->btd", im, jnp.sin(ang).astype(x.dtype))
            )
            return wave
        f_sel = jnp.asarray(f, jnp.float32)[idx]  # [B, D, k]
        # append conjugates at negative frequencies (reference formulation)
        amp = jnp.abs(jnp.concatenate([sel, jnp.conj(sel)], axis=2))  # [B, D, 2k]
        phase = jnp.angle(jnp.concatenate([sel, jnp.conj(sel)], axis=2))
        freqs = jnp.concatenate([f_sel, -f_sel], axis=2)
        # [B, D, 2k, T] cosine bank summed over frequencies
        wave = amp[..., None] * jnp.cos(
            2 * np.pi * freqs[..., None] * t[None, None, None, :] + phase[..., None]
        )
        return wave.sum(axis=2).transpose(0, 2, 1)  # [B, T, D]


class DTSEncoderBlock(nn.Module):
    n_embd: int
    n_head: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    mlp_hidden_times: int = 4
    activation: str = "GELU"

    @nn.compact
    def __call__(self, x, timestep, mask=None, deterministic=True):
        a, _ = FullAttention(self.n_embd, self.n_head, self.attn_pdrop, self.resid_pdrop)(
            AdaLayerNorm(self.n_embd, name="ln1")(x, timestep),
            mask=mask,
            deterministic=deterministic,
        )
        x = x + a
        h = nn.LayerNorm(name="ln2")(x)
        h = nn.Dense(self.mlp_hidden_times * self.n_embd)(h)
        h = _ACT[self.activation](h)
        h = nn.Dense(self.n_embd)(h)
        h = nn.Dropout(self.resid_pdrop)(h, deterministic=deterministic)
        return x + h


class DTSDecoderBlock(nn.Module):
    n_channel: int
    n_feat: int
    n_embd: int
    n_head: int
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    mlp_hidden_times: int = 4
    activation: str = "GELU"
    condition_dim: int = 64

    @nn.compact
    def __call__(self, x, encoder_output, timestep, mask=None, deterministic=True):
        a, _ = FullAttention(self.n_embd, self.n_head, self.attn_pdrop, self.resid_pdrop)(
            AdaLayerNorm(self.n_embd, name="ln1")(x, timestep),
            mask=mask,
            deterministic=deterministic,
        )
        x = x + a
        a, _ = CrossAttention(
            self.n_embd, self.condition_dim, self.n_head, self.attn_pdrop, self.resid_pdrop
        )(
            AdaLayerNorm(self.n_embd, name="ln1_1")(x, timestep),
            encoder_output,
            mask=mask,
            deterministic=deterministic,
        )
        x = x + a
        # proj: Conv1d(T -> 2T, k=1) over the time axis, then split
        x12 = TimeMixDense(2 * self.n_channel, name="proj")(x)
        x1, x2 = jnp.split(x12, 2, axis=1)
        trend = TrendBlock(
            self.n_channel, self.n_feat, self.activation, name="trend"
        )(x1)
        season = FourierLayer(self.n_embd, name="seasonal")(x2)
        h = nn.LayerNorm(name="ln2")(x)
        h = nn.Dense(self.mlp_hidden_times * self.n_embd)(h)
        h = _ACT[self.activation](h)
        h = nn.Dense(self.n_embd)(h)
        h = nn.Dropout(self.resid_pdrop)(h, deterministic=deterministic)
        x = x + h
        m = jnp.mean(x, axis=1, keepdims=True)
        return x - m, nn.Dense(self.n_feat, name="linear")(m), trend, season


class DTSTransformer(nn.Module):
    """Full DiffusionTS transformer: (x, t) -> (trend, season_error).

    Model output = trend + season_error (DiffusionTS.py:147-150).
    """

    n_feat: int
    n_channel: int  # sequence length
    n_layer_enc: int = 3
    n_layer_dec: int = 6
    n_embd: int = 64
    n_heads: int = 4
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    mlp_hidden_times: int = 4
    activation: str = "GELU"
    conv_kernel: int = None  # resolved in setup

    def _combine_kernel(self):
        if self.conv_kernel is not None:
            return self.conv_kernel, self.conv_kernel // 2
        if self.n_feat < 32 and self.n_channel < 64:
            return 1, 0
        return 5, 2

    @nn.compact
    def __call__(self, x, t, padding_masks=None, deterministic=True, return_res=False):
        emb = ConvMLP(self.n_embd, self.resid_pdrop, name="emb")(x, deterministic)
        inp_enc = LearnablePositionalEncoding(
            self.n_embd, self.n_channel, self.resid_pdrop, name="pos_enc"
        )(emb, deterministic)
        enc_cond = inp_enc
        for i in range(self.n_layer_enc):
            enc_cond = DTSEncoderBlock(
                self.n_embd, self.n_heads, self.attn_pdrop, self.resid_pdrop,
                self.mlp_hidden_times, self.activation, name=f"enc_{i}",
            )(enc_cond, t, mask=padding_masks, deterministic=deterministic)

        inp_dec = LearnablePositionalEncoding(
            self.n_embd, self.n_channel, self.resid_pdrop, name="pos_dec"
        )(emb, deterministic)
        B = x.shape[0]
        season = jnp.zeros((B, self.n_channel, self.n_embd), x.dtype)
        trend = jnp.zeros((B, self.n_channel, self.n_feat), x.dtype)
        means = []
        h = inp_dec
        for i in range(self.n_layer_dec):
            h, residual_mean, residual_trend, residual_season = DTSDecoderBlock(
                self.n_channel, self.n_feat, self.n_embd, self.n_heads,
                self.attn_pdrop, self.resid_pdrop, self.mlp_hidden_times,
                self.activation, self.n_embd, name=f"dec_{i}",
            )(h, enc_cond, t, mask=padding_masks, deterministic=deterministic)
            season = season + residual_season
            trend = trend + residual_trend
            means.append(residual_mean)
        mean = jnp.concatenate(means, axis=1)  # [B, n_layer_dec, n_feat]

        res = ConvMLP(self.n_feat, self.resid_pdrop, name="inverse")(h, deterministic)
        res_m = jnp.mean(res, axis=1, keepdims=True)
        k, pad = self._combine_kernel()
        # combine_s: Conv1d(n_embd -> n_feat, k, circular) over time
        season_t = season
        if pad > 0:
            season_t = jnp.concatenate(
                [season[:, -pad:, :], season, season[:, :pad, :]], axis=1
            )
        season_mapped = nn.Conv(
            self.n_feat, (k,), padding="VALID", use_bias=False, name="combine_s"
        )(season_t)
        season_error = season_mapped + res - res_m
        # combine_m: Conv1d(n_layer_dec -> 1, k=1) over the layer axis
        trend_total = TimeMixDense(1, name="combine_m")(mean) + res_m + trend

        if return_res:
            return trend_total, season_mapped, res - res_m
        return trend_total, season_error
