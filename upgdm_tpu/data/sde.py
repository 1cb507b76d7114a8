"""SDE trajectory simulators — jitted Euler–Maruyama ``lax.scan`` kernels.

TPU-native rebuild of /root/reference/dataset/ (torchsde Euler for the
networked systems, adaptive Milstein for SLBP):

  - biomass:  dx_i = r x_i (1 - x_i/k) - eps(t) x_i^2/(x_i^2+1)
              + d * (A x - deg * x) + eta dW_i
    (spdata_sde_biomass_dynamic_gene.py:53-68)
  - SIS:      dx_i = -d x_i + eps(t) (1 - x_i) [A x]_i + eta dW_i
    (spdata_sde_SIS_dynamic_gene.py:43-52)
  - neuronal: dx_i = -x_i + (1 - eps(t)) [A sigmoid(tau (x - mu))]_i + eta dW_i
    (spdata_sde_neuronal_dynamic_gene.py:50-62)
  - SLBP:     2-state bream/pike lake model with additive noise
              (sqrt(2D), sqrt(0.2 D)) (SLBP_dynamic_gene.py:34-58)

Design notes:
  - One ``lax.scan`` per time segment (host loop over segments bounds device
    memory exactly like the reference's ``max_one_time`` chunking,
    SLBP_dynamic_gene.py:95-136); all segments reuse ONE compiled program.
  - The networked references pass ``g = eta * randn_like(x)`` to torchsde —
    i.e. the diffusion *coefficient* is itself resampled noise, giving
    increments eta * z1 * dW (a product-normal scale mixture, variance
    eta^2 dt but with excess kurtosis).  We match that distribution exactly:
    ``noise="scale_mixture"`` draws eta * sqrt(dt) * z1 * z2.
  - SLBP's diffusion is state-independent, so the reference's Milstein
    correction vanishes and fixed-step Euler at dt is exact to the same order.
  - Divergence guard + retry (mean outside [-10, 100] -> resample), parity
    with spdata_sde_biomass_dynamic_gene.py:146-149,316-331.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "simulate_sde",
    "biomass_drift",
    "sis_drift",
    "neuronal_drift",
    "slbp_drift",
    "simulate_network_system",
    "simulate_slbp",
    "SLBP_DEFAULT_PARAMS",
]


# ---------------------------------------------------------------------------
# Drift functions (y: [N] state vector; eps: scalar control parameter)
# ---------------------------------------------------------------------------

def biomass_drift(y, eps, adj, deg, r=1.0, k=10.0, d=0.05):
    y = jnp.clip(y, 0.0, None)
    logistic = r * y * (1.0 - y / k)
    harvesting = -eps * (y**2) / (y**2 + 1.0)
    diffusion = d * (adj @ y - deg * y)
    return logistic + harvesting + diffusion


def sis_drift(y, eps, adj, d=1.0):
    return -d * y + eps * (1.0 - y) * (adj @ y)


def neuronal_drift(y, eps, adj, tau=2.0, mu=1.5):
    """Wilson–Cowan-style networked neuronal dynamics.

    Defaults match the reference generator's fixed parameters
    (spdata_sde_neuronal_dynamic_gene.py:268-273: tau grid head 2.0,
    mu=1.5).  mu=1.5 is load-bearing: it places the sigmoid threshold low
    enough that the coupled high-activity branch exists, so ramping eps
    0->1 destabilizes it and the system tips; at mu=3.0 the coupling never
    ignites and there is no transition at all."""
    return -y + (1.0 - eps) * (adj @ jax.nn.sigmoid(tau * (y - mu)))


SLBP_DEFAULT_PARAMS: Dict[str, float] = {
    "i_b": 3e-4, "i_p": 3e-4, "r": 7.5e-3, "H1": 0.5, "H2": 0.1, "H3": 20.0,
    "H4": 15.0, "c_b": 7.5e-5, "c_p": 2.75e-4, "p_r": 5e-2, "c_e": 0.1,
    "m_p": 2.25e-3, "K": 1.0, "D": 1e-5,
}


def slbp_drift(y, n_level, p):
    """Bream/pike drift; y = [X, Y]; n_level = nutrient control N(t)."""
    X, Y = y[0], y[1]
    V = p["K"] * p["H3"] ** 2 / (X**2 + p["H3"] ** 2)
    F_R = X**2 / (X**2 + p["H4"] ** 2)
    dX = (
        p["i_b"]
        + p["r"] * X * (n_level / (n_level + p["H1"]))
        - p["c_b"] * X**2
        - p["p_r"] * F_R * Y
    )
    dY = (
        p["i_p"]
        + p["c_e"] * p["p_r"] * F_R * Y * (V / (V + p["H2"]))
        - p["m_p"] * Y
        - p["c_p"] * Y**2
    )
    return jnp.stack([dX, dY])


# ---------------------------------------------------------------------------
# Generic Euler–Maruyama engine
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("drift", "n_steps", "save_every", "noise"))
def _segment_scan(
    drift, y0, eps_values, sigma, dt, key, n_steps, save_every=1, noise="additive"
):
    """Integrate one segment; returns (y_end, ys_saved [n_steps//save_every, N]).

    ``noise="additive"``      -> increment sigma * sqrt(dt) * N(0,1) (SLBP).
    ``noise="scale_mixture"`` -> increment sigma * sqrt(dt) * z1*z2 with two
    independent normals: the networked references hand torchsde a *random*
    diffusion coefficient ``g = eta * randn_like(x)``, so their Euler
    increments are the product-normal eta * z1 * dW — matched here exactly
    (same distribution, incl. the excess kurtosis), not just to 2nd moment.
    """
    sqrt_dt = jnp.sqrt(dt)

    def step(carry, inp):
        y, = carry
        eps, k = inp
        if noise == "scale_mixture":
            z = jax.random.normal(k, (2,) + y.shape, y.dtype)
            dw = z[0] * z[1]
        else:
            dw = jax.random.normal(k, y.shape, y.dtype)
        y = y + drift(y, eps) * dt + sigma * sqrt_dt * dw
        return (y,), y

    keys = jax.random.split(key, n_steps)
    (y_end,), ys = jax.lax.scan(step, (y0,), (eps_values, keys))
    if save_every > 1:
        ys = ys[save_every - 1 :: save_every]
    return y_end, ys


def simulate_sde(
    drift: Callable,
    y0: np.ndarray,
    sigma,
    control_fn: Callable[[np.ndarray], np.ndarray],
    total_time: float,
    dt: float,
    key,
    burn_time: float = 0.0,
    burn_control: float = 0.0,
    max_segment_steps: int = 1_000_000,
    save_every: int = 1,
    noise: str = "additive",
):
    """Burn-in + segmented integration; returns (ts, ys, control_values).

    ``control_fn(t_array) -> eps_array`` defines the time-varying parameter;
    burn-in runs with the fixed ``burn_control`` (parity with
    simulate_with_burn_in, spdata_sde_biomass_dynamic_gene.py:118-211).
    """
    y0 = jnp.asarray(y0, jnp.float32)
    sigma = jnp.asarray(sigma, jnp.float32)
    key = jax.random.key(key) if isinstance(key, int) else key

    n_burn = int(burn_time / dt)
    if n_burn > 0:
        key, kb = jax.random.split(key)
        eps_burn = jnp.full((n_burn,), burn_control, jnp.float32)
        y0, _ = _segment_scan(drift, y0, eps_burn, sigma, dt, kb, n_burn, noise=noise)

    n_total = int(total_time / dt)
    ts = np.linspace(0.0, total_time, n_total, dtype=np.float64)
    eps_all = np.asarray(control_fn(ts), np.float32)

    ys_parts = []
    y = y0
    for start in range(0, n_total, max_segment_steps):
        n_seg = min(max_segment_steps, n_total - start)
        key, ks = jax.random.split(key)
        y, ys = _segment_scan(
            drift, y, jnp.asarray(eps_all[start : start + n_seg]), sigma, dt, ks,
            n_seg, save_every, noise=noise,
        )
        ys_parts.append(np.asarray(ys))
    ys = np.concatenate(ys_parts, axis=0)
    if save_every > 1:
        ts = ts[save_every - 1 :: save_every][: ys.shape[0]]
        eps_all = eps_all[save_every - 1 :: save_every][: ys.shape[0]]
    return ts, ys, eps_all


# ---------------------------------------------------------------------------
# System-level wrappers with divergence guard + retry
# ---------------------------------------------------------------------------

def _linear_ramp(lo, hi, trend, total_time):
    if trend == "increase":
        return lambda t: lo + (hi - lo) * (t / total_time)
    if trend == "decrease":
        return lambda t: hi - (hi - lo) * (t / total_time)
    raise ValueError("trend should be 'increase' or 'decrease'")


_NETWORK_DRIFTS = {
    "biomass": biomass_drift,
    "SIS": sis_drift,
    "neuronal": neuronal_drift,
}


def simulate_network_system(
    system: str,
    adj: np.ndarray,
    trend: str = "increase",
    control_range=(0.0, 1.0),
    base_params: Optional[dict] = None,
    eta: float = 0.05,
    total_time: float = 1e4,
    burn_time: float = 100.0,
    dt: float = 0.1,
    seed: int = 0,
    max_retries: int = 10,
    save_every: int = 1,
    constant_control: Optional[float] = None,
) -> dict:
    """One networked trajectory record {ys_dynamic [T, Node], ts_dynamic,
    tp_values} with the divergence-guarded retry loop (ref :316-331).

    ``constant_control`` reproduces the *_contant.py null datasets (control
    parameter fixed for the whole run)."""
    adj = jnp.asarray(adj, jnp.float32)
    deg = adj.sum(axis=1)
    base_params = base_params or {}
    if system == "biomass":
        drift = partial(biomass_drift, adj=adj, deg=deg, **base_params)
    elif system == "SIS":
        drift = partial(sis_drift, adj=adj, **base_params)
    elif system == "neuronal":
        drift = partial(neuronal_drift, adj=adj, **base_params)
    else:
        raise ValueError(f"unknown system {system!r}")

    lo, hi = control_range
    if constant_control is not None:
        control_fn = lambda t: np.full_like(np.asarray(t, np.float64), constant_control)
        burn_control = constant_control
    else:
        control_fn = _linear_ramp(lo, hi, trend, total_time)
        burn_control = lo if trend == "increase" else hi

    N = adj.shape[0]
    for attempt in range(max_retries):
        key = jax.random.key(seed * 1000 + attempt)
        key, k0 = jax.random.split(key)
        y0 = jax.random.uniform(k0, (N,))
        ts, ys, eps = simulate_sde(
            drift, y0, eta, control_fn, total_time, dt, key,
            burn_time=burn_time, burn_control=burn_control, save_every=save_every,
            noise="scale_mixture",
        )
        # per-timestep node-mean must stay finite and inside (-10, 100) for
        # the WHOLE trajectory (ref :146 checks max/min/isnan of mean(dim=1);
        # a global nanmean would silently accept part-NaN diverged runs)
        mean_t = np.asarray(ys, np.float64).mean(axis=1)
        if np.isfinite(mean_t).all() and mean_t.max() < 100.0 and mean_t.min() > -10.0:
            return {
                "ys_dynamic": ys.astype(np.float32),  # [T, Node]
                "ts_dynamic": ts.astype(np.float32),
                "tp_values": eps.astype(np.float32),
            }
    raise RuntimeError(f"simulation diverged after {max_retries} retries ({system})")


def simulate_slbp(
    params: Optional[dict] = None,
    trend: str = "increase",
    n_range=(0.0, 3.5),
    total_time: float = 1e6,
    burn_time: float = 1000.0,
    dt: float = 0.1,
    seed: int = 0,
    save_every: int = 1,
    constant_n: Optional[float] = None,
) -> dict:
    """One SLBP trajectory record {ys_dynamic [T, 2], ts_dynamic, N_values}
    (SLBP_dynamic_gene.py:61-136)."""
    p = dict(SLBP_DEFAULT_PARAMS)
    if params:
        p.update(params)
    sigma = np.array([(2 * p["D"]) ** 0.5, (0.2 * p["D"]) ** 0.5], np.float32)
    drift = partial(slbp_drift, p=p)

    lo, hi = n_range
    if constant_n is not None:
        control_fn = lambda t: np.full_like(np.asarray(t, np.float64), constant_n)
        burn_control = constant_n
    else:
        control_fn = _linear_ramp(lo, hi, trend, total_time)
        burn_control = lo if trend == "increase" else hi

    key = jax.random.key(seed)
    key, k0 = jax.random.split(key)
    y0 = jax.random.uniform(k0, (2,))
    ts, ys, n_values = simulate_sde(
        drift, y0, sigma, control_fn, total_time, dt, key,
        burn_time=burn_time, burn_control=burn_control, save_every=save_every,
    )
    return {
        "ys_dynamic": ys.astype(np.float32),  # [T, 2]
        "ts_dynamic": ts.astype(np.float32),
        "N_values": np.asarray(n_values, np.float32),
    }
