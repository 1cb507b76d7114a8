"""Dense-adjacency GNN convolutions + the name registry.

Rebuilds the reference's PyG layer registry
(/root/reference/models/layer/gnn_conv.py:4-28) as Flax modules over a dense
adjacency.  Node features are [..., V, C] with adjacency [V, V] broadcast over
all leading axes — every aggregation is an einsum on the MXU, attention
(GAT/GATv2) uses neighbor-masked softmax on the VPU.  The graphs here are
<= ~100 nodes so the dense form dominates scatter message passing on TPU.

Semantics follow torch-geometric defaults for each layer (sum/mean aggregation,
self-root weights, negative_slope etc.); AGNNConv follows the repo-local gated
GraphConv (/root/reference/models/layer/AGNNConv.py:33-210).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["gnn_conv", "GCNConv", "GraphConv", "SAGEConv", "GATConv", "GATv2Conv",
           "ResGatedGraphConv", "GatedGraphConv", "AGNNConv", "PNAConv"]

_NEG_INF = -1e9


def _agg(adj, x):
    """Sum-aggregate neighbor features: [..., V, C] with [V, V] (or [..., V, V])."""
    return jnp.einsum("...vu,...uc->...vc", adj, x)


class GCNConv(nn.Module):
    out_channels: int
    add_self_loops: bool = True
    bias: bool = True

    @nn.compact
    def __call__(self, x, adj):
        V = adj.shape[-1]
        a = adj + jnp.eye(V, dtype=adj.dtype) if self.add_self_loops else adj
        deg = a.sum(axis=-1)
        dinv = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
        a_hat = a * dinv[..., :, None] * dinv[..., None, :]
        h = nn.Dense(self.out_channels, use_bias=False)(x)
        out = _agg(a_hat, h)
        if self.bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return out


class GraphConv(nn.Module):
    out_channels: int
    aggr: str = "add"

    @nn.compact
    def __call__(self, x, adj):
        msg = _agg(adj, nn.Dense(self.out_channels, use_bias=False, name="lin_rel")(x))
        if self.aggr == "mean":
            deg = jnp.maximum(adj.sum(axis=-1), 1.0)
            msg = msg / deg[..., :, None]
        return msg + nn.Dense(self.out_channels, name="lin_root")(x)


class SAGEConv(nn.Module):
    out_channels: int
    aggr: str = "mean"

    @nn.compact
    def __call__(self, x, adj):
        if self.aggr == "mean":
            deg = jnp.maximum(adj.sum(axis=-1), 1.0)
            neigh = _agg(adj, x) / deg[..., :, None]
        elif self.aggr == "max":
            big = jnp.where(adj[..., :, :, None] > 0, x[..., None, :, :], _NEG_INF)
            neigh = big.max(axis=-2)
            neigh = jnp.where(adj.sum(axis=-1)[..., :, None] > 0, neigh, 0.0)
        else:
            neigh = _agg(adj, x)
        return nn.Dense(self.out_channels, name="lin_l")(neigh) + nn.Dense(
            self.out_channels, use_bias=False, name="lin_r"
        )(x)


class GATConv(nn.Module):
    """Multi-head graph attention; out = concat of heads (out_channels total).

    The registry divides out_channels by heads like the reference factory
    (gnn_conv.py:7).
    """

    out_channels: int  # per-head
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    dropout: float = 0.0
    add_self_loops: bool = True

    @nn.compact
    def __call__(self, x, adj, deterministic: bool = True):
        H, C = self.heads, self.out_channels
        V = adj.shape[-1]
        a = adj + jnp.eye(V, dtype=adj.dtype) if self.add_self_loops else adj
        h = nn.Dense(H * C, use_bias=False, name="lin")(x)
        h = h.reshape(h.shape[:-1] + (H, C))  # [..., V, H, C]
        att_src = self.param("att_src", nn.initializers.glorot_uniform(), (H, C))
        att_dst = self.param("att_dst", nn.initializers.glorot_uniform(), (H, C))
        alpha_src = (h * att_src).sum(-1)  # [..., V, H]
        alpha_dst = (h * att_dst).sum(-1)
        # score for edge (i <- j): leaky_relu(alpha_dst_i + alpha_src_j)
        scores = alpha_dst[..., :, None, :] + alpha_src[..., None, :, :]  # [..., V, V, H]
        scores = nn.leaky_relu(scores, self.negative_slope)
        scores = jnp.where(a[..., :, :, None] > 0, scores, _NEG_INF)
        attn = nn.softmax(scores, axis=-2)
        attn = jnp.where(a[..., :, :, None] > 0, attn, 0.0)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("...vuh,...uhc->...vhc", attn, h)
        if self.concat:
            out = out.reshape(out.shape[:-2] + (H * C,))
            bias = self.param("bias", nn.initializers.zeros, (H * C,))
        else:
            out = out.mean(axis=-2)
            bias = self.param("bias", nn.initializers.zeros, (C,))
        return out + bias


class GATv2Conv(nn.Module):
    out_channels: int  # per-head
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    dropout: float = 0.0
    add_self_loops: bool = True

    @nn.compact
    def __call__(self, x, adj, deterministic: bool = True):
        H, C = self.heads, self.out_channels
        V = adj.shape[-1]
        a = adj + jnp.eye(V, dtype=adj.dtype) if self.add_self_loops else adj
        hl = nn.Dense(H * C, use_bias=False, name="lin_l")(x).reshape(x.shape[:-1] + (H, C))
        hr = nn.Dense(H * C, use_bias=False, name="lin_r")(x).reshape(x.shape[:-1] + (H, C))
        att = self.param("att", nn.initializers.glorot_uniform(), (H, C))
        pair = hl[..., :, None, :, :] + hr[..., None, :, :, :]  # [..., V, V, H, C]
        scores = (nn.leaky_relu(pair, self.negative_slope) * att).sum(-1)
        scores = jnp.where(a[..., :, :, None] > 0, scores, _NEG_INF)
        attn = nn.softmax(scores, axis=-2)
        attn = jnp.where(a[..., :, :, None] > 0, attn, 0.0)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("...vuh,...uhc->...vhc", attn, hr)
        if self.concat:
            out = out.reshape(out.shape[:-2] + (H * C,))
            bias = self.param("bias", nn.initializers.zeros, (H * C,))
        else:
            out = out.mean(axis=-2)
            bias = self.param("bias", nn.initializers.zeros, (C,))
        return out + bias


class ResGatedGraphConv(nn.Module):
    """Residual gated graph conv (Bresson & Laurent 2017), PyG semantics:
    out = W1 x_i + sum_j eta_ij * (W2 x_j), eta_ij = sigmoid(W3 x_i + W4 x_j)."""

    out_channels: int
    bias: bool = True
    root_weight: bool = True

    @nn.compact
    def __call__(self, x, adj):
        k = nn.Dense(self.out_channels, use_bias=False, name="lin_key")(x)  # W3 x_i
        q = nn.Dense(self.out_channels, use_bias=False, name="lin_query")(x)  # W4 x_j
        v = nn.Dense(self.out_channels, use_bias=False, name="lin_value")(x)  # W2 x_j
        eta = jax.nn.sigmoid(k[..., :, None, :] + q[..., None, :, :])  # [..., V, V, C]
        gated = eta * v[..., None, :, :]
        out = jnp.einsum("...vu,...vuc->...vc", adj, gated)
        if self.root_weight:
            out = out + nn.Dense(self.out_channels, use_bias=False, name="lin_skip")(x)
        if self.bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return out


class GatedGraphConv(nn.Module):
    """GRU-based gated graph conv (Li et al. 2016), PyG semantics."""

    out_channels: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x, adj):
        C = self.out_channels
        if x.shape[-1] < C:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, C - x.shape[-1])])
        h = x[..., :C]
        gru = nn.GRUCell(features=C)
        for i in range(self.num_layers):
            m = _agg(adj, nn.Dense(C, use_bias=False, name=f"weight_{i}")(h))
            flat_m = m.reshape(-1, C)
            flat_h = h.reshape(-1, C)
            new_h, _ = gru(flat_h, flat_m)
            h = new_h.reshape(h.shape)
        return h


class AGNNConv(nn.Module):
    """Gated GraphConv with node gating (models/layer/AGNNConv.py:33-210),
    dense no-edge-feature form: h_i' = norm(U h_i + aggr_j sigma_ij * V h_j),
    sigma_ij = sigmoid(A h_i + B h_j), residual when shapes allow."""

    out_channels: int
    aggregation: str = "sum"
    mode: str = "residual"

    @nn.compact
    def __call__(self, x, adj):
        Uh = nn.Dense(self.out_channels, name="U")(x)
        Vh = nn.Dense(self.out_channels, name="V")(x)
        Ah = nn.Dense(self.out_channels, name="A")(x)
        Bh = nn.Dense(self.out_channels, name="B")(x)
        gate = jax.nn.sigmoid(Ah[..., :, None, :] + Bh[..., None, :, :])
        msg = gate * Vh[..., None, :, :]
        out = jnp.einsum("...vu,...vuc->...vc", adj, msg)
        if self.aggregation == "mean":
            deg = jnp.maximum(adj.sum(axis=-1), 1.0)
            out = out / deg[..., :, None]
        h = Uh + out
        h = nn.LayerNorm()(h)
        h = nn.relu(h)
        if self.mode == "residual" and x.shape[-1] == self.out_channels:
            h = h + x
        return h


class PNAConv(nn.Module):
    """Principal Neighbourhood Aggregation (Corso et al. 2020), dense form.

    Registry parity with the reference's PyG dispatch
    (models/layer/gnn_conv.py:20-21).  Pairwise messages pre_nn(x_i || x_j)
    are reduced with every aggregator, rescaled by every degree scaler
    (delta = mean log-degree from the training histogram ``deg``, as PyG
    precomputes from ``utils.deg_histogram``), concatenated with x_i, and
    mapped by post_nn — per tower, with a final linear mix.  The [V, V]
    pairwise tensor is fine at this workload's <=100-node graphs.
    """

    out_channels: int
    aggregators: Sequence[str] = ("mean", "min", "max", "std")
    scalers: Sequence[str] = ("identity", "amplification", "attenuation")
    deg: Optional[Sequence[float]] = None
    towers: int = 1
    pre_layers: int = 1
    post_layers: int = 1
    divide_input: bool = False

    @nn.compact
    def __call__(self, x, adj):
        if self.out_channels % self.towers:
            raise ValueError("out_channels must be divisible by towers")
        f_out = self.out_channels // self.towers
        if self.deg is not None:
            hist = np.asarray(self.deg, dtype=float)
            d = np.arange(len(hist), dtype=float)
            delta = float((hist * np.log(d + 1)).sum() / max(hist.sum(), 1.0))
        else:
            delta = 1.0
        delta = max(delta, 1e-6)
        # adj may carry fewer leading axes than x (e.g. [B,V,V] vs [B,T,V,C]
        # inside UGnet) — align them so the pairwise mask broadcasts.
        V = adj.shape[-1]
        lead = jnp.broadcast_shapes(adj.shape[:-2], x.shape[:-2])
        mask = jnp.broadcast_to(adj > 0, (*lead, V, V))
        n_neigh = jnp.maximum(mask.sum(axis=-1), 1)  # clamp(1) as in PyG
        log_deg = jnp.log(n_neigh.astype(x.dtype) + 1.0)[..., :, None]

        if self.divide_input:
            if x.shape[-1] % self.towers:
                raise ValueError("in features must be divisible by towers")
            xs = jnp.split(x, self.towers, axis=-1)
        else:
            xs = [x] * self.towers

        tower_outs = []
        for t, xt in enumerate(xs):
            f_t = xt.shape[-1]
            pair = jnp.concatenate([
                jnp.broadcast_to(xt[..., :, None, :], (*xt.shape[:-1], xt.shape[-2], f_t)),
                jnp.broadcast_to(xt[..., None, :, :], (*xt.shape[:-1], xt.shape[-2], f_t)),
            ], axis=-1)
            m = nn.Dense(f_t, name=f"pre_{t}_0")(pair)
            for i in range(1, self.pre_layers):
                m = nn.Dense(f_t, name=f"pre_{t}_{i}")(nn.relu(m))

            w = mask[..., :, :, None].astype(m.dtype)
            mean = (m * w).sum(axis=-2) / n_neigh[..., :, None]
            aggs = []
            for name in self.aggregators:
                if name == "mean":
                    aggs.append(mean)
                elif name == "sum":
                    aggs.append((m * w).sum(axis=-2))
                elif name == "min":
                    aggs.append(jnp.where(
                        mask[..., :, :, None], m, jnp.inf).min(axis=-2))
                elif name == "max":
                    aggs.append(jnp.where(
                        mask[..., :, :, None], m, -jnp.inf).max(axis=-2))
                elif name in ("std", "var"):
                    sq = (m * m * w).sum(axis=-2) / n_neigh[..., :, None]
                    var = jnp.maximum(sq - mean * mean, 0.0)
                    aggs.append(jnp.sqrt(var + 1e-5) if name == "std" else var)
                else:
                    raise ValueError(f"unknown aggregator: {name!r}")
            # min/max over empty neighborhoods produce +/-inf — zero them
            aggs = [jnp.where(mask.any(axis=-1)[..., :, None], a, 0.0) for a in aggs]
            agg = jnp.concatenate(aggs, axis=-1)

            scaled = []
            for name in self.scalers:
                if name == "identity":
                    scaled.append(agg)
                elif name == "amplification":
                    scaled.append(agg * (log_deg / delta))
                elif name == "attenuation":
                    scaled.append(agg * (delta / log_deg))
                else:
                    raise ValueError(f"unknown scaler: {name!r}")
            h = jnp.concatenate([xt] + scaled, axis=-1)
            h = nn.Dense(f_out, name=f"post_{t}_0")(h)
            for i in range(1, self.post_layers):
                h = nn.Dense(f_out, name=f"post_{t}_{i}")(nn.relu(h))
            tower_outs.append(h)
        out = jnp.concatenate(tower_outs, axis=-1)
        return nn.Dense(self.out_channels, name="lin")(out)


def gnn_conv(gnn_name: str, out_channels: int, gnn_param: Optional[dict] = None) -> nn.Module:
    """Name -> dense conv module (registry parity with gnn_conv.py:4-28)."""
    p = dict(gnn_param or {})
    if gnn_name == "GATConv":
        heads = p.pop("heads", 1)
        p.pop("aggr", None)
        return GATConv(out_channels // heads, heads=heads, **p)
    if gnn_name == "GATv2Conv":
        heads = p.pop("heads", 1)
        return GATv2Conv(out_channels // heads, heads=heads, **p)
    if gnn_name == "GCNConv":
        return GCNConv(out_channels, **p)
    if gnn_name == "SAGEConv":
        return SAGEConv(out_channels, **p)
    if gnn_name == "GraphConv":
        return GraphConv(out_channels, **p)
    if gnn_name == "GatedGraphConv":
        return GatedGraphConv(out_channels, **p)
    if gnn_name == "ResGatedGraphConv":
        return ResGatedGraphConv(out_channels, **p)
    if gnn_name == "AGNNConv":
        return AGNNConv(out_channels, **p)
    if gnn_name == "PNAConv":
        for k in ("aggregators", "scalers"):
            if k in p:
                p[k] = tuple(p[k])
        if "deg" in p and p["deg"] is not None:
            p["deg"] = tuple(float(v) for v in np.asarray(p["deg"]).ravel())
        return PNAConv(out_channels, **p)
    if gnn_name == "FGNNConv":
        from .fgnn import FGNNConv

        return FGNNConv(output_vdim=out_channels, **p)
    raise ValueError(f"unknown gnn layer: {gnn_name!r}")
