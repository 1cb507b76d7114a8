"""Graph topology generation.

Parity: /root/reference/dataset/graph_generate.py:55-123 (igraph ER / WS /
BA / static-power-law / K-regular with connectivity retry, .graphml export)
and the networkx generators of the SDE scripts
(spdata_sde_*_gene.py generate_network).  Uses networkx (baked in) — igraph
generators are mapped to their networkx equivalents.
"""
from __future__ import annotations

import random
from pathlib import Path

import networkx as nx
import numpy as np

from ..ops.graph import DenseGraph

__all__ = ["gen_graph", "generate_network", "save_graphml", "generate_graph_library"]


def gen_graph(g_type: str, num_min: int = 20, num_max: int = 40, rng: random.Random = None) -> nx.Graph:
    """Random graph of the requested family with connectivity retry
    (graph_generate.py:55-103)."""
    rng = rng or random.Random()
    cur_n = rng.randint(num_min, num_max)
    while True:
        if g_type == "erdos_renyi":
            g = nx.erdos_renyi_graph(cur_n, rng.uniform(0.1, 0.9))
        elif g_type == "small-world":
            nei = rng.randint(round(0.15 * cur_n), round(0.35 * cur_n))
            g = nx.watts_strogatz_graph(cur_n, max(2, 2 * nei), rng.uniform(0, 0.15))
        elif g_type == "barabasi_albert":
            m = rng.randint(max(1, round(0.1 * cur_n)), max(1, round(0.25 * cur_n)))
            g = nx.barabasi_albert_graph(cur_n, m)
        elif g_type == "static_power_law":
            exp = rng.uniform(2, 3)
            seq = [min(cur_n - 1, max(1, int(x))) for x in nx.utils.powerlaw_sequence(cur_n, exp)]
            if sum(seq) % 2:
                seq[0] += 1
            g = nx.Graph(nx.configuration_model(seq))
            g.remove_edges_from(nx.selfloop_edges(g))
        elif g_type == "K_Regular":
            k = rng.randint(round(0.2 * cur_n), cur_n - 2)
            if (k * cur_n) % 2 or cur_n < k + 1:
                continue
            g = nx.random_regular_graph(k, cur_n)
        else:
            raise ValueError(f"unknown graph type {g_type!r}")
        if nx.is_connected(g):
            return g


def generate_network(net_type: str, num_nodes: int, **params) -> DenseGraph:
    """ER/BA/WS generator used by the SDE scripts (spdata_sde_*:69-93)."""
    if net_type == "ER":
        g = nx.erdos_renyi_graph(num_nodes, params.get("p", 0.1), seed=params.get("seed"))
    elif net_type == "BA":
        g = nx.barabasi_albert_graph(num_nodes, params.get("m", 3), seed=params.get("seed"))
    elif net_type == "WS":
        g = nx.watts_strogatz_graph(
            num_nodes, params.get("k", 4), params.get("p", 0.1), seed=params.get("seed")
        )
    else:
        raise ValueError(f"unknown network type: {net_type}")
    adj = nx.to_numpy_array(g, dtype=np.float32)
    np.fill_diagonal(adj, 0.0)
    return DenseGraph(adj)


def graph_properties(adj: np.ndarray, node_mask: np.ndarray, targets: str) -> float:
    """Graph statistics of the masked subgraph (utils/utils.py:260-283):
    LCC size, transitivity, average clustering, natural connectivity,
    global efficiency, density."""
    adj = np.asarray(adj)
    keep = np.flatnonzero(np.asarray(node_mask))
    sub = nx.from_numpy_array(adj[np.ix_(keep, keep)])
    if targets == "LCC":
        return float(len(max(nx.connected_components(sub), key=len))) if sub.number_of_nodes() else 0.0
    if targets == "global_CC":
        return float(nx.transitivity(sub))
    if targets == "average_CC":
        return float(nx.average_clustering(sub))
    if targets == "natural_connectivity":
        n = nx.number_of_nodes(sub)
        return float(np.log(nx.estrada_index(sub) / n))
    if targets == "global_efficiency":
        return float(nx.global_efficiency(sub))
    if targets == "density":
        return float(nx.density(sub))
    raise ValueError(f"Error fitness_func_type:{targets}")


def save_graphml(g: nx.Graph, path):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    nx.write_graphml(g, path)


def generate_graph_library(
    out_dir, types=("erdos_renyi", "small-world", "barabasi_albert"),
    sizes=(30, 50, 70, 100), seeds=range(10),
):
    """Reproduce the shipped graph library layout: <type>_<n>_<seed>.graphml
    (graph_generate.py:114-123, 120 files)."""
    out_dir = Path(out_dir)
    for g_type in types:
        for n in sizes:
            for seed in seeds:
                rng = random.Random(hash((g_type, n, seed)) & 0xFFFFFFFF)
                g = gen_graph(g_type, n, n, rng=rng)
                save_graphml(g, out_dir / f"{g_type}_{n}_{seed}.graphml")
