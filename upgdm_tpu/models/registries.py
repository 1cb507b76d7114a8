"""Activation / graph-norm / global-pool name registries.

Parity: /root/reference/models/act/gnn_act.py, models/norm/gnn_norm.py,
models/pool/gnn_pool.py — tiny name->op dispatchers used by configurable GNN
stacks.  Dense-batch form: features [..., V, C] with an optional node mask.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["gnn_act", "gnn_norm", "gnn_pool"]


def gnn_act(act_name: str):
    registry = {
        "relu": nn.relu,
        "leaky_relu": nn.leaky_relu,
        "elu": nn.elu,
        "gelu": nn.gelu,
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
        "softplus": nn.softplus,
        "identity": lambda x: x,
    }
    if act_name not in registry:
        raise ValueError(f"unknown activation {act_name!r}")
    return registry[act_name]


class GraphNorm(nn.Module):
    """GraphNorm (Cai et al. 2021): per-graph mean shift with a learnable
    alpha, then scale/bias — over the node axis of [..., V, C]."""

    @nn.compact
    def __call__(self, x, node_mask=None):
        C = x.shape[-1]
        alpha = self.param("alpha", nn.initializers.ones, (C,))
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        if node_mask is not None:
            m = node_mask[..., None].astype(x.dtype)
            denom = jnp.maximum(m.sum(axis=-2, keepdims=True), 1.0)
            mean = (x * m).sum(axis=-2, keepdims=True) / denom
            centered = (x - alpha * mean) * m
            var = (centered**2).sum(axis=-2, keepdims=True) / denom
        else:
            mean = x.mean(axis=-2, keepdims=True)
            centered = x - alpha * mean
            var = (centered**2).mean(axis=-2, keepdims=True)
        return scale * centered * jax.lax.rsqrt(var + 1e-5) + bias


def gnn_norm(norm_name: str, **kwargs):
    """name -> norm module over node features."""
    if norm_name in ("BatchNorm", "batch"):
        return nn.BatchNorm(use_running_average=True, **kwargs)
    if norm_name in ("LayerNorm", "layer"):
        return nn.LayerNorm(**kwargs)
    if norm_name in ("GraphNorm", "graph"):
        return GraphNorm(**kwargs)
    if norm_name in (None, "None", "identity"):
        return lambda x: x
    raise ValueError(f"unknown norm {norm_name!r}")


def gnn_pool(pool_name: str):
    """name -> global pooling over the node axis of [..., V, C] (+ mask)."""

    def mean_pool(x, node_mask=None):
        if node_mask is None:
            return x.mean(axis=-2)
        m = node_mask[..., None].astype(x.dtype)
        return (x * m).sum(axis=-2) / jnp.maximum(m.sum(axis=-2), 1.0)

    def max_pool(x, node_mask=None):
        if node_mask is None:
            return x.max(axis=-2)
        big = jnp.where(node_mask[..., None], x, -jnp.inf)
        return big.max(axis=-2)

    def add_pool(x, node_mask=None):
        if node_mask is None:
            return x.sum(axis=-2)
        return (x * node_mask[..., None].astype(x.dtype)).sum(axis=-2)

    registry = {
        "global_mean_pool": mean_pool, "mean": mean_pool,
        "global_max_pool": max_pool, "max": max_pool,
        "global_add_pool": add_pool, "add": add_pool, "sum": add_pool,
    }
    if pool_name not in registry:
        raise ValueError(f"unknown pool {pool_name!r}")
    return registry[pool_name]
