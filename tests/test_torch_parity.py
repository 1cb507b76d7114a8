"""Numerical parity between the JAX build and the torch-CPU reference replica.

Weight-transferred forward parity for the NsDiff denoiser and SigmaEstimation
g(x), pure-math parity for the heteroscedastic reverse-step coefficients, and
a distribution-level check of the full sampling chain (MPV within 1%).
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from benchmarks import torch_reference as TR  # noqa: E402
from upgdm_tpu.models.denoise import NsDiffDenoiser  # noqa: E402
from upgdm_tpu.models.sigma_estimation import SigmaEstimation  # noqa: E402
from upgdm_tpu.ops import diffusion as D  # noqa: E402
from upgdm_tpu.ops.schedules import NsDiffSchedule  # noqa: E402


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


# ---------------------------------------------------------------------------
# weight transfer helpers (flax params -> torch modules)
# ---------------------------------------------------------------------------

def load_denoiser_weights(torch_mod: TR.Denoiser, params):
    sd = {}
    for i in (1, 2, 3):
        p = params[f"lin{i}"]
        sd[f"lin{i}.lin.weight"] = _t(p["Dense_0"]["kernel"]).T
        sd[f"lin{i}.lin.bias"] = _t(p["Dense_0"]["bias"])
        sd[f"lin{i}.embed.weight"] = _t(p["embed"])
    sd["lin4.weight"] = _t(params["lin4"]["kernel"]).T
    sd["lin4.bias"] = _t(params["lin4"]["bias"])
    sd["sigma_lin.weight"] = _t(params["sigma_lin"]["kernel"]).T
    sd["sigma_lin.bias"] = _t(params["sigma_lin"]["bias"])
    torch_mod.load_state_dict(sd)


def load_sigma_estimation_weights(torch_mod: TR.SigmaEstimation, params):
    sd = {
        "mlp.0.weight": _t(params["Dense_0"]["kernel"]).T,
        "mlp.0.bias": _t(params["Dense_0"]["bias"]),
        "mlp.2.weight": _t(params["LayerNorm_0"]["scale"]),
        "mlp.2.bias": _t(params["LayerNorm_0"]["bias"]),
        "mlp.3.weight": _t(params["Dense_1"]["kernel"]).T,
        "mlp.3.bias": _t(params["Dense_1"]["bias"]),
        "mlp.5.weight": _t(params["LayerNorm_1"]["scale"]),
        "mlp.5.bias": _t(params["LayerNorm_1"]["bias"]),
        "mlp.6.weight": _t(params["Dense_2"]["kernel"]).T,
        "mlp.6.bias": _t(params["Dense_2"]["bias"]),
    }
    torch_mod.load_state_dict(sd)


# ---------------------------------------------------------------------------


def test_denoiser_forward_parity():
    F, steps = 1, 20
    rng = np.random.default_rng(0)
    y_t = rng.normal(size=(8, 12, F)).astype(np.float32)
    y0 = rng.normal(size=(8, 12, F)).astype(np.float32)
    gx = rng.uniform(0.1, 1.0, size=(8, 12, F)).astype(np.float32)
    t = np.full((8,), 7, np.int64)

    jmod = NsDiffDenoiser(enc_in=F, n_steps=steps)
    params = jax.jit(jmod.init)(
        {"params": jax.random.key(0)}, jnp.asarray(y_t), jnp.asarray(y0),
        jnp.asarray(gx), jnp.asarray(t, jnp.int32),
    )["params"]
    eps_j, sigma_j = jax.jit(jmod.apply)(
        {"params": params}, jnp.asarray(y_t), jnp.asarray(y0), jnp.asarray(gx),
        jnp.asarray(t, jnp.int32),
    )

    tmod = TR.Denoiser(steps, F).eval()
    load_denoiser_weights(tmod, params)
    with torch.no_grad():
        eps_t, sigma_t = tmod(_t(y_t), _t(y0), _t(gx), torch.from_numpy(t))
    np.testing.assert_allclose(np.asarray(eps_j), eps_t.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(sigma_j), sigma_t.numpy(), atol=3e-5)


def test_sigma_estimation_forward_parity():
    W, P, F, K = 32, 8, 2, 8
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, W, F)).astype(np.float32).cumsum(axis=1)

    jmod = SigmaEstimation(W, P, F, hidden_size=16, kernel_size=K)
    params = jax.jit(jmod.init)({"params": jax.random.key(2)}, jnp.asarray(x))["params"]
    gx_j = jax.jit(jmod.apply)({"params": params}, jnp.asarray(x))

    tmod = TR.SigmaEstimation(W, P, F, hidden_size=16, kernel_size=K).eval()
    load_sigma_estimation_weights(tmod, params)
    with torch.no_grad():
        gx_t = tmod(_t(x))
    np.testing.assert_allclose(np.asarray(gx_j), gx_t.numpy(), atol=1e-4, rtol=1e-4)


def test_reverse_step_coefficient_parity():
    """sigma_y0 quadratic solve + gamma posterior coefficients, torch vs jax."""
    sched = NsDiffSchedule.create("linear", 20, 1e-4, 2e-2)
    rng = np.random.default_rng(3)
    gx = rng.uniform(0.1, 1.0, size=(5, 4, 1)).astype(np.float32)
    sigma_theta = rng.uniform(0.05, 0.5, size=(5, 4, 1)).astype(np.float32)
    for t in (1, 7, 19):
        c_t = TR._gathers(sched, t)
        sy0_t = TR._sigma_y0_hat(c_t, _t(gx), _t(sigma_theta)).numpy()
        g0_t, g1_t, g2_t = (g.numpy() if torch.is_tensor(g) else np.float32(g)
                            for g in TR._gammas(c_t, _t(gx), _t(sy0_t)))

        c_j = D.nsdiff_gather(sched, jnp.asarray(t), jnp.asarray(gx))
        sy0_j = np.asarray(D._nsdiff_sigma_y0_hat(c_j, jnp.asarray(gx), jnp.asarray(sigma_theta)))
        g0_j, g1_j, g2_j = (np.asarray(g) for g in D.nsdiff_gammas(
            c_j, jnp.asarray(gx), jnp.asarray(sy0_j)))
        np.testing.assert_allclose(sy0_j, sy0_t, rtol=2e-4)
        np.testing.assert_allclose(np.broadcast_to(g0_j, sy0_j.shape),
                                   np.broadcast_to(g0_t, sy0_j.shape), rtol=2e-4)
        np.testing.assert_allclose(np.broadcast_to(g1_j, sy0_j.shape),
                                   np.broadcast_to(g1_t, sy0_j.shape), rtol=2e-4)
        np.testing.assert_allclose(np.broadcast_to(g2_j, sy0_j.shape),
                                   np.broadcast_to(g2_t, sy0_j.shape), rtol=2e-3)


@pytest.mark.slow
def test_sampling_chain_mpv_parity():
    """Full reverse chain with SHARED weights and fixed f(x)/g(x): the
    across-sample MPV must agree within 1% (BASELINE.md target) at the
    distribution level (400 samples each, different RNGs)."""
    F, steps, O, B = 1, 20, 10, 4
    sched = NsDiffSchedule.create("linear", steps, 1e-4, 2e-2)
    rng = np.random.default_rng(4)
    y0_hat = rng.normal(size=(B, O, F)).astype(np.float32)
    gx = rng.uniform(0.2, 0.6, size=(B, O, F)).astype(np.float32)

    jmod = NsDiffDenoiser(enc_in=F, n_steps=steps)
    params = jax.jit(jmod.init)(
        {"params": jax.random.key(5)}, jnp.asarray(y0_hat), jnp.asarray(y0_hat),
        jnp.asarray(gx), jnp.zeros((B,), jnp.int32),
    )["params"]
    tmod = TR.Denoiser(steps, F).eval()
    load_denoiser_weights(tmod, params)

    S = 400

    def jmodel_fn(y, t):
        tb = jnp.broadcast_to(jnp.asarray(t), (y.shape[0],))
        return jmod.apply({"params": params}, y, jnp.asarray(y0_hat), jnp.asarray(gx), tb)

    def one_sample(k):
        return D.nsdiff_p_sample_loop(jmodel_fn, jnp.asarray(y0_hat), jnp.asarray(gx),
                                      sched, k)

    samples_j = jax.jit(lambda ks: jax.vmap(one_sample)(ks))(
        jax.random.split(jax.random.key(6), S)
    )
    mpv_j = float(np.asarray(samples_j).var(axis=0).mean())

    torch.manual_seed(7)
    y0_tile = _t(y0_hat).repeat(S, 1, 1, 1).flatten(0, 1)
    gx_tile = _t(gx).repeat(S, 1, 1, 1).flatten(0, 1)
    y0_out = TR.p_sample_loop(tmod, y0_tile, gx_tile, sched)
    samples_t = y0_out.reshape(S, B, O, F).numpy()
    mpv_t = float(samples_t.var(axis=0).mean())

    assert mpv_j == pytest.approx(mpv_t, rel=0.01), (mpv_j, mpv_t)
