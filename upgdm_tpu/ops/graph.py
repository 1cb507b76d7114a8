"""Dense-adjacency graph utilities.

TPU-first design: the reference's graphs are <= ~100 nodes (SURVEY.md §2), so
PyG's scatter/gather message passing (torch-geometric + torch-sparse CUDA
kernels) lowers to dense ``A @ X`` matmuls on the MXU.  A graph is carried as a
dense adjacency [V, V] plus an optional node mask for padded batching; there is
no edge_index anywhere on the device path, and sample-parallel inference needs
no ``duplicate_edge_index`` (graph_diffusion_model.py:77-100) because the
adjacency broadcasts across vmap axes.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

__all__ = ["DenseGraph", "edge_index_to_adjacency", "graphml_to_adjacency"]


@dataclasses.dataclass(frozen=True)
class DenseGraph:
    """Dense symmetric adjacency (no self loops) + optional validity mask."""

    adj: np.ndarray  # [V, V] float32
    node_mask: Optional[np.ndarray] = None  # [V] bool; None = all valid

    @property
    def num_nodes(self) -> int:
        return int(self.adj.shape[0])

    @property
    def degree(self) -> np.ndarray:
        return self.adj.sum(axis=1)

    def padded(self, max_nodes: int) -> "DenseGraph":
        V = self.num_nodes
        if V == max_nodes:
            mask = self.node_mask if self.node_mask is not None else np.ones(V, bool)
            return DenseGraph(self.adj, mask)
        adj = np.zeros((max_nodes, max_nodes), np.float32)
        adj[:V, :V] = self.adj
        mask = np.zeros(max_nodes, bool)
        mask[:V] = self.node_mask if self.node_mask is not None else True
        return DenseGraph(adj, mask)


def edge_index_to_adjacency(edge_index: np.ndarray, num_nodes: int, symmetric: bool = True) -> DenseGraph:
    """[2, E] int edge list -> DenseGraph (duplicate edges collapse to 1)."""
    adj = np.zeros((num_nodes, num_nodes), np.float32)
    src, dst = np.asarray(edge_index)
    adj[src, dst] = 1.0
    if symmetric:
        adj[dst, src] = 1.0
    np.fill_diagonal(adj, 0.0)
    return DenseGraph(adj)


def graphml_to_adjacency(path) -> DenseGraph:
    """Load a .graphml topology as a dense adjacency (utils/utils.py:322-326)."""
    import networkx as nx

    g = nx.read_graphml(path)
    g = nx.convert_node_labels_to_integers(g)
    adj = nx.to_numpy_array(g, dtype=np.float32)
    adj = ((adj + adj.T) > 0).astype(np.float32)
    np.fill_diagonal(adj, 0.0)
    return DenseGraph(adj)
