"""Loss registry, evaluation-score registry, and the CEP contrastive loss.

Parity: /root/reference/loss_functions/loss_functions.py:8-63 (train_loss /
loss_wrapper / evaluation_score dispatch) and loss_functions/CEP/
(CEPLoss:9-65; GaussianDiffusion / CategoricalDiffusion / DiscreteFlowDiffusion
forward processes, diffusion_schedulers.py:37-220).  These drive the legacy
supervised graph-regression loop (train/vanilla.py) — the four diffusion
families carry their losses inside their wrappers.

JAX-native: forward corruption processes are keyed jnp ops; the CEP loss is a
softmax contrast between true and predicted graph energies across the batch.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "train_loss",
    "loss_wrapper",
    "evaluation_score",
    "CEPLoss",
    "CEPGaussianDiffusion",
    "CategoricalDiffusion",
    "DiscreteFlowDiffusion",
]


# ---------------------------------------------------------------------------
# simple losses
# ---------------------------------------------------------------------------

def mse_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def bce_loss(pred, target):
    p = jnp.clip(pred, 1e-7, 1 - 1e-7)
    return -jnp.mean(target * jnp.log(p) + (1 - target) * jnp.log(1 - p))


def cross_entropy_loss(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


# ---------------------------------------------------------------------------
# CEP forward corruption processes
# ---------------------------------------------------------------------------

def _linear_or_cosine_beta(T, schedule):
    if schedule == "linear":
        return np.linspace(1e-4, 2e-2, T)
    if schedule == "cosine":
        offset = 0.008

        def cos_noise(t):
            return np.cos(math.pi * 0.5 * (t / T + offset) / (1 + offset)) ** 2

        alphabar = cos_noise(np.arange(0, T + 1, 1)) / cos_noise(0)
        return np.clip(1 - (alphabar[1:] / alphabar[:-1]), None, 0.999)
    raise ValueError(f"unknown schedule {schedule!r}")


class CEPGaussianDiffusion:
    """Gaussian corruption (1-indexed), diffusion_schedulers.py:37-88."""

    def __init__(self, T, schedule="linear", loss_weight_schedule="constant", **_):
        self.T = T
        self.loss_weight_schedule = loss_weight_schedule
        self.beta = _linear_or_cosine_beta(T, schedule)
        self.alpha = np.concatenate([[1.0], 1.0 - self.beta])
        self.alphabar = np.cumprod(self.alpha)

    def sample(self, x0, t, key):
        atbar = jnp.asarray(self.alphabar, x0.dtype)[t]
        atbar = atbar.reshape(atbar.shape + (1,) * (x0.ndim - atbar.ndim))
        eps = jax.random.normal(key, x0.shape, x0.dtype)
        return jnp.sqrt(atbar) * x0 + jnp.sqrt(1.0 - atbar) * eps


class CategoricalDiffusion:
    """Binary categorical corruption via uniform-flip transition matrices
    (diffusion_schedulers.py:90-147)."""

    def __init__(self, T, schedule="linear", loss_weight_schedule="constant", **_):
        self.T = T
        self.loss_weight_schedule = loss_weight_schedule
        self.beta = _linear_or_cosine_beta(T, schedule)
        beta = self.beta.reshape(-1, 1, 1)
        eye = np.eye(2)[None]
        ones = np.ones((1, 2, 2))
        Qs = (1 - beta) * eye + (beta / 2) * ones
        Q_bar = [np.eye(2)]
        for Q in Qs:
            Q_bar.append(Q_bar[-1] @ Q)
        self.Q_bar = np.stack(Q_bar, axis=0)  # [T+1, 2, 2]

    def sample(self, x0, t, key):
        """x0 in {0,1} (or [0,1] probabilities); returns corrupted P(x_t = 1)."""
        x0_onehot = jnp.stack([1.0 - x0, x0], axis=-1)  # [..., 2]
        Q_bar = jnp.asarray(self.Q_bar, x0.dtype)[t]  # [..., 2, 2]
        probs = jnp.einsum("...i,...ij->...j", x0_onehot, Q_bar)
        return jnp.clip(probs[..., 1], 0.0, 1.0)


class DiscreteFlowDiffusion:
    """Discrete-flow interpolation toward uniform (diffusion_schedulers.py:149-220)."""

    def __init__(self, T, loss_weight_schedule="constant", discrete_classes=2, **_):
        self.T = T
        self.loss_weight_schedule = loss_weight_schedule
        self.S = discrete_classes

    def sample(self, x0, t, key):
        """p(x_t | x_1) = t/T * onehot(x0) + (1 - t/T)/S; sample and return class-1 prob."""
        frac = (jnp.asarray(t, jnp.float32) / self.T)
        frac = frac.reshape(frac.shape + (1,) * (x0.ndim - frac.ndim))
        p1 = frac * x0 + (1.0 - frac) / self.S
        return jnp.clip(p1, 0.0, 1.0)


class CEPLoss:
    """Contrastive energy prediction loss over a batch of noisy graphs.

    Mirrors CEP.py:30-65: corrupt each graph's node features at a per-graph
    timestep, predict energies, and contrast the softmax of the predicted
    energies against the softmax of the true energies across the batch.

    model_fn(noisy_x, t) -> predicted energy per graph [B].
    """

    def __init__(self, diffusion_type, diffusion_params, **_):
        cls = {
            "GaussianDiffusion": CEPGaussianDiffusion,
            "CategoricalDiffusion": CategoricalDiffusion,
            "DiscreteFlowDiffusion": DiscreteFlowDiffusion,
        }.get(diffusion_type)
        if cls is None:
            raise ValueError("Invalid diffusion type")
        self.diffusion = cls(**diffusion_params)

    def __call__(self, model_fn: Callable, x, y, key):
        """x: [B, V, ...] node features in [0, 1]; y: [B] graph energies."""
        B = x.shape[0]
        kt, ks = jax.random.split(key)
        t = jax.random.randint(kt, (B,), 1, self.diffusion.T + 1)
        t_nodes = t.reshape((B,) + (1,) * (x.ndim - 1))  # per-graph t over nodes
        noisy_x = self.diffusion.sample(x, t_nodes, ks)
        pred_energy = model_fn(noisy_x, t.astype(jnp.float32))  # [B]
        energy_matrix = jnp.broadcast_to(y[None, :], (B, B))
        pred_matrix = jnp.broadcast_to(pred_energy[None, :], (B, B))
        weights = jax.nn.softmax(-energy_matrix, axis=1)
        log_probs = jax.nn.log_softmax(-pred_matrix, axis=1)
        return -jnp.sum(weights * log_probs) / B


# ---------------------------------------------------------------------------
# registries
# ---------------------------------------------------------------------------

def train_loss(loss_metric: str, loss_param: Optional[dict] = None):
    loss_param = loss_param or {}
    if loss_metric == "MSELoss":
        return mse_loss
    if loss_metric == "BCELoss":
        return bce_loss
    if loss_metric == "CrossEntropyLoss":
        return cross_entropy_loss
    if loss_metric == "CEPLoss":
        return CEPLoss(**loss_param)
    raise ValueError("the definition don't exit\n\tyou can define it before using it")


def loss_wrapper(loss_metric, criterion, input, target=None, model_fn=None, key=None, **_):
    if loss_metric in ("MSELoss", "BCELoss", "CrossEntropyLoss"):
        return criterion(input, target)
    if loss_metric == "CEPLoss":
        x, y = input
        return criterion(model_fn, x, y, key)
    raise ValueError("the definition don't exit\n\tyou can define it before using it")


def evaluation_score(score_metric: str):
    import sklearn.metrics as M

    registry = {
        "mse": M.mean_squared_error,
        "r2": M.r2_score,
        "accuracy": M.accuracy_score,
        "f1": M.f1_score,
        "roc_auc": M.roc_auc_score,
        "kendall_rank": _kendall_rank,
        "rank_accuracy": _rank_accuracy,
        "set_correlation": _set_correlation,
        "Min_nodes": None,
    }
    if score_metric not in registry:
        raise ValueError(f"the definition {score_metric} don't exit")
    return registry[score_metric]


def _kendall_rank(pred, target, **_):
    from scipy import stats

    tau, _p = stats.kendalltau(np.asarray(pred).ravel(), np.asarray(target).ravel())
    return tau


def _rank_accuracy(pred, target, top_fraction=0.6, **_):
    pred = np.asarray(pred).ravel()
    target = np.asarray(target).ravel()
    c = int(np.ceil(len(pred) * top_fraction))
    return float(np.mean(np.argsort(pred)[:c] == np.argsort(target)[:c]))


def _set_correlation(pred, target, **_):
    pred_set = set(np.flatnonzero(np.asarray(pred) == 1).tolist())
    target_set = set(np.flatnonzero(np.asarray(target) == 1).tolist())
    union = len(pred_set | target_set)
    return len(pred_set & target_set) / union if union else 0.0
