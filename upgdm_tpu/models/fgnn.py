"""Factor-graph neural network convolution (FGNN), dense edge-list form.

Parity: /root/reference/models/layer/FGNNConv.py:13-135 — bipartite message
passing between variable and factor nodes: per-edge Q networks map edge
features to [k, l] mixing matrices, M networks map concatenated endpoint
features to vectors, and the message is the Q @ M product; plus the clique
finders used to build factor graphs (find_cliques / find_maximal_cliques).
Present-but-unused by the four diffusion families in the reference; kept for
inventory completeness.
"""
from __future__ import annotations

from typing import List, Sequence, Set

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["QNetwork", "MNetwork", "FGNNConv", "find_cliques", "find_maximal_cliques"]


class QNetwork(nn.Module):
    """edge features -> [k, l] mixing matrix per edge."""

    k: int
    l: int
    num_layers: int = 2
    hidden: int = 64

    @nn.compact
    def __call__(self, edge_features):
        h = edge_features
        for _ in range(self.num_layers - 1):
            h = nn.relu(nn.Dense(self.hidden)(h))
        h = nn.Dense(self.k * self.l)(h)
        return h.reshape(h.shape[:-1] + (self.k, self.l))


class MNetwork(nn.Module):
    """concatenated endpoint features -> message vector."""

    output_dim: int
    num_layers: int = 2
    hidden: int = 64

    @nn.compact
    def __call__(self, node_features):
        h = node_features
        for _ in range(self.num_layers - 1):
            h = nn.relu(nn.Dense(self.hidden)(h))
        return nn.Dense(self.output_dim)(h)


class FGNNConv(nn.Module):
    """Bipartite variable<->factor message passing over explicit edge lists.

    __call__(var_features [Nv, Dv], factor_features [Nf, Df],
             v2f_edge_index [2, E], edge_attr [E, De], f2v_edge_index [2, E])
      -> (var_out [Nv, Df], factor_out [Nf, Dv_out], edge_attr)
    Messages: (Q(edge) @ M(concat(x_dst, x_src))) summed at the destination.
    """

    output_vdim: int
    factor_dim: int
    net_num_layers: int = 2

    @nn.compact
    def __call__(self, var_features, factor_features, v2f_edge_index, edge_attr,
                 f2v_edge_index):
        nv = var_features.shape[0]
        nf = factor_features.shape[0]

        # variable -> factor
        src, dst = v2f_edge_index
        x_j = var_features[src]          # source (variable) endpoints
        x_i = factor_features[dst]       # destination (factor) endpoints
        q = QNetwork(self.factor_dim, self.output_vdim, self.net_num_layers, name="Q_vf")(
            edge_attr
        )
        m = MNetwork(self.output_vdim, self.net_num_layers, name="M_vf")(
            jnp.concatenate([x_i, x_j], axis=-1)
        )
        msg = jnp.einsum("ekl,el->ek", q, m)
        out_vf = jnp.zeros((nf, self.factor_dim), msg.dtype).at[dst].add(msg)

        # factor -> variable
        src, dst = f2v_edge_index
        x_j = factor_features[src]
        x_i = var_features[dst]
        q = QNetwork(self.output_vdim, self.factor_dim, self.net_num_layers, name="Q_fv")(
            edge_attr
        )
        m = MNetwork(self.factor_dim, self.net_num_layers, name="M_fv")(
            jnp.concatenate([x_i, x_j], axis=-1)
        )
        msg = jnp.einsum("ekl,el->ek", q, m)
        out_fv = jnp.zeros((nv, self.output_vdim), msg.dtype).at[dst].add(msg)

        return out_fv, out_vf, edge_attr


def find_cliques(adj: np.ndarray) -> List[Set[int]]:
    """All triangle cliques of a dense adjacency (FGNNConv.py:102-124)."""
    adj = np.asarray(adj)
    n = adj.shape[0]
    neighbors = [set(np.flatnonzero(adj[i]).tolist()) for i in range(n)]
    triangles = []
    for node in range(n):
        nb = sorted(neighbors[node])
        for i in range(len(nb)):
            for j in range(i + 1, len(nb)):
                u, v = nb[i], nb[j]
                if v in neighbors[u]:
                    tri = {node, u, v}
                    if tri not in triangles:
                        triangles.append(tri)
    return triangles


def find_maximal_cliques(adj: np.ndarray) -> List[Set[int]]:
    """Bron–Kerbosch maximal cliques (FGNNConv.py:127-150)."""
    adj = np.asarray(adj)
    n = adj.shape[0]
    neighbors = [set(np.flatnonzero(adj[i]).tolist()) for i in range(n)]
    cliques: List[Set[int]] = []

    def bk(R, P, X):
        if not P and not X:
            cliques.append(R)
        P = set(P)
        while P:
            v = P.pop()
            bk(R | {v}, P & neighbors[v], X & neighbors[v])
            X.add(v)

    bk(set(), set(range(n)), set())
    return cliques
