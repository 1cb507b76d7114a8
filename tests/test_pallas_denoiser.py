"""Fused Pallas denoiser kernel vs the flax NsDiffDenoiser (interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from upgdm_tpu.models.denoise import NsDiffDenoiser
from upgdm_tpu.ops.pallas.fused_denoiser import fused_nsdiff_denoiser


@pytest.mark.parametrize("F", [1, 2])
def test_fused_denoiser_matches_flax(F):
    steps = 7
    mod = NsDiffDenoiser(enc_in=F, n_steps=steps)
    rng = np.random.default_rng(0)
    B, O = 5, 9
    y_t = jnp.asarray(rng.normal(size=(B, O, F)).astype(np.float32))
    y0 = jnp.asarray(rng.normal(size=(B, O, F)).astype(np.float32))
    gx = jnp.asarray(rng.uniform(0.1, 1.0, size=(B, O, F)).astype(np.float32))
    t_b = jnp.full((B,), 3, jnp.int32)
    params = jax.jit(mod.init)({"params": jax.random.key(0)}, y_t, y0, gx, t_b)["params"]

    eps_ref, sigma_ref = jax.jit(mod.apply)({"params": params}, y_t, y0, gx, t_b)
    eps_k, sigma_k = fused_nsdiff_denoiser(params, y_t, y0, gx, 3, interpret=True)
    np.testing.assert_allclose(np.asarray(eps_k), np.asarray(eps_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(sigma_k), np.asarray(sigma_ref), atol=2e-5)


def test_fused_denoiser_padding_path():
    # M not a multiple of TILE_M exercises the pad/slice path
    F, steps = 1, 4
    mod = NsDiffDenoiser(enc_in=F, n_steps=steps)
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.normal(size=(3, 5, F)).astype(np.float32))
    params = jax.jit(mod.init)(
        {"params": jax.random.key(1)}, y, y, y, jnp.zeros((3,), jnp.int32)
    )["params"]
    eps, sigma = fused_nsdiff_denoiser(params, y, y, y, 0, interpret=True)
    assert eps.shape == (3, 5, F)
    assert (np.asarray(sigma) > 0).all()
