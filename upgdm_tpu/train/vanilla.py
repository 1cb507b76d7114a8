"""Legacy supervised graph-regression training loop.

Parity: /root/reference/train/train_vanilla.py:11-148 — per-epoch metric
registry (train/val per score metric), MSE/BCE/CE/CEP loss dispatch, PNA
degree-histogram precompute, checkpointing, record_scores JSON.  The
reference's version is dead code (it imports an absent ``graph_models``
module); this one takes the model's pure apply/energy function directly so it
actually runs — used for CEP-style energy models on dense graph batches.
"""
from __future__ import annotations

from pathlib import Path
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import io as uio
from .losses import evaluation_score, loss_wrapper, train_loss
from .optimizers import make_optimizer

__all__ = ["run_training_vanilla", "deg_histogram"]


def deg_histogram(adjs: np.ndarray) -> np.ndarray:
    """Degree histogram across a stack of dense adjacencies (PNA precompute,
    train_vanilla.py:132-147)."""
    degrees = np.asarray(adjs).sum(axis=-1).astype(int).ravel()
    return np.bincount(degrees, minlength=int(degrees.max()) + 1 if len(degrees) else 1)


def run_training_vanilla(
    trainset: Dict[str, np.ndarray],
    validationset: Dict[str, np.ndarray],
    train_param: dict,
    net_param: dict,
    loss_param: dict,
    optimizer_param: dict,
    records_path,
    model_init: Callable,
    model_apply: Callable,
    seed: int = 0,
):
    """Supervised loop over dense graph batches.

    trainset/validationset: {"x": [N, V, F], "adj": [N, V, V], "y": [N]}.
    model_init(key, x, adj[, t]) -> params;
    model_apply(params, x, adj[, t]) -> prediction (or energy for CEP).
    """
    records_path = Path(records_path)
    records_path.mkdir(parents=True, exist_ok=True)
    record_scores = {"epoch": []}
    metrics = {}
    for score_metric in train_param.get("score_metrics", ["mse"]):
        metrics[score_metric] = evaluation_score(score_metric)
        record_scores[score_metric] = {"train_scores": [], "val_scores": []}

    criterion = train_loss(loss_param["loss_metric"], loss_param)
    is_cep = loss_param["loss_metric"] == "CEPLoss"
    key = jax.random.key(seed)
    key, k0 = jax.random.split(key)
    x0 = jnp.asarray(trainset["x"][:1])
    adj0 = jnp.asarray(trainset["adj"][:1])
    if is_cep:
        params = model_init(k0, x0, adj0, jnp.zeros((1,)))
    else:
        params = model_init(k0, x0, adj0)
    tx = make_optimizer(optimizer_param)
    opt_state = tx.init(params)

    def loss_fn(p, x, adj, y, k):
        if is_cep:
            return loss_wrapper(
                "CEPLoss", criterion, (x, y),
                model_fn=lambda nx, t: model_apply(p, nx, adj, t), key=k,
            )
        pred = model_apply(p, x, adj).squeeze()
        return loss_wrapper(loss_param["loss_metric"], criterion, pred, y)

    @jax.jit
    def train_step(p, o, x, adj, y, k):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, adj, y, k)
        updates, o = tx.update(grads, o, p)
        return jax.tree.map(lambda a, b: a + b, p, updates), o, loss

    bs = train_param.get("batch_size", 32)
    rng = np.random.default_rng(seed)
    n = trainset["x"].shape[0]
    for epoch in range(train_param["train_epochs"]):
        idx = rng.permutation(n)
        losses = []
        for start in range(0, n, bs):
            sel = idx[start : start + bs]
            key, k = jax.random.split(key)
            params, opt_state, loss = train_step(
                params, opt_state, jnp.asarray(trainset["x"][sel]),
                jnp.asarray(trainset["adj"][sel]), jnp.asarray(trainset["y"][sel]), k,
            )
            losses.append(float(loss))
        record_scores["epoch"].append(epoch)
        for score_metric, fn in metrics.items():
            if fn is None or is_cep:
                tr = va = float(np.mean(losses))
            else:
                tr = float(fn(
                    np.asarray(model_apply(params, jnp.asarray(trainset["x"]),
                                           jnp.asarray(trainset["adj"]))).squeeze(),
                    trainset["y"],
                ))
                va = float(fn(
                    np.asarray(model_apply(params, jnp.asarray(validationset["x"]),
                                           jnp.asarray(validationset["adj"]))).squeeze(),
                    validationset["y"],
                ))
            record_scores[score_metric]["train_scores"].append(tr)
            record_scores[score_metric]["val_scores"].append(va)

    uio.save_record(records_path / "record_scores.json", record_scores)
    flat = uio.flatten_params(jax.tree.map(np.asarray, params))
    uio.save_checkpoint(records_path, "model_trained", flat, net_param)
    return record_scores
