"""Rolling-window variance ops.

The reference materialises every window with replicate-pad + ``unfold`` and then
reduces (O(T*W) memory traffic; /root/reference/models/Diffusion_model/NsDiff/
sigma.py:5-72).  On TPU we instead compute window sums with
``lax.reduce_window`` (a single fused VPU reduction, O(T) HBM traffic) and form
the population variance as E[x^2] - E[x]^2.  Inputs are small-magnitude series,
so fp32 is ample; a clamp at zero guards the tiny negative residue of the
difference-of-means formulation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["wv_sigma", "wv_sigma_trailing", "window_variance_1d"]


def _window_mean_sums(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """Sum over each length-`window` slice along axis 1 (valid windows only).

    x: [B, T, N] -> [B, T - window + 1, N]
    """
    return jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, window, 1),
        window_strides=(1, 1, 1),
        padding="VALID",
    )


def _padded_window_var(x: jnp.ndarray, window: int, pad_left: int, pad_right: int) -> jnp.ndarray:
    """Population variance over sliding windows of a replicate-padded series."""
    x = jnp.concatenate(
        [
            jnp.repeat(x[:, :1, :], pad_left, axis=1),
            x,
            jnp.repeat(x[:, -1:, :], pad_right, axis=1),
        ]
        if pad_right > 0
        else [jnp.repeat(x[:, :1, :], pad_left, axis=1), x],
        axis=1,
    )
    inv_w = 1.0 / window
    mean = _window_mean_sums(x, window) * inv_w
    mean_sq = _window_mean_sums(x * x, window) * inv_w
    return jnp.maximum(mean_sq - mean * mean, 0.0)


def wv_sigma(x_enc: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """Centered sliding-window population variance, same length as input.

    Parity: sigma.py:5-31 (even windows pad asymmetrically left-heavy).
    x_enc: [B, T, N] -> [B, T, N]
    """
    if window_size % 2 == 0:
        pad_left, pad_right = window_size // 2, window_size // 2 - 1
    else:
        pad_left = pad_right = window_size // 2
    return _padded_window_var(x_enc, window_size, pad_left, pad_right)


def wv_sigma_trailing(
    x_enc: jnp.ndarray, window_size: int, discard_rep: bool = False
) -> jnp.ndarray:
    """Trailing-window population variance.

    Parity: sigma.py:34-72.  With ``discard_rep=False`` the series is
    replicate-padded by window-1 at the front so the output has length T; with
    ``discard_rep=True`` only the T - window + 1 valid windows are returned.
    x_enc: [B, T, N]
    """
    if discard_rep:
        return _padded_window_var(x_enc, window_size, 0, 0) if window_size == 1 else (
            _no_pad_var(x_enc, window_size)
        )
    return _padded_window_var(x_enc, window_size, window_size - 1, 0)


def _no_pad_var(x: jnp.ndarray, window: int) -> jnp.ndarray:
    inv_w = 1.0 / window
    mean = _window_mean_sums(x, window) * inv_w
    mean_sq = _window_mean_sums(x * x, window) * inv_w
    return jnp.maximum(mean_sq - mean * mean, 0.0)


def window_variance_1d(series: jnp.ndarray, windows: int, step: int) -> jnp.ndarray:
    """Population variance of strided windows of a 1-D series.

    Used by the raw-window-variance control
    (diffusion_model_uncertainy.py:1233-1250).
    series: [T] -> [num_windows]
    """
    sums = jax.lax.reduce_window(
        series,
        0.0,
        jax.lax.add,
        window_dimensions=(windows,),
        window_strides=(step,),
        padding="VALID",
    )
    sq_sums = jax.lax.reduce_window(
        series * series,
        0.0,
        jax.lax.add,
        window_dimensions=(windows,),
        window_strides=(step,),
        padding="VALID",
    )
    inv_w = 1.0 / windows
    mean = sums * inv_w
    return jnp.maximum(sq_sums * inv_w - mean * mean, 0.0)
