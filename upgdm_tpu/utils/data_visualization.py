"""Training-curve visualisation (parity: /root/reference/utils/data_visualization.py)."""
from __future__ import annotations

import numpy as np

__all__ = ["model_evaluation_metrics_curves", "model_evaluation_metrics_curves_vanilla"]


def model_evaluation_metrics_curves(fig, record_scores):
    ax = fig.add_subplot(111)
    ax.plot(record_scores["epoch"], record_scores["train_scores"], color="red", label="train")
    ax.plot(record_scores["epoch"], record_scores["val_scores"], color="skyblue",
            label="validation")
    ax.set_title("train and validation ")
    ax.legend()


def visualization_evalution(pred, adj, target, save_path=None):
    """2-panel network visualisation of predictions vs labels
    (utils/utils.py:510-551): node colors = sigmoid(pred) / target on a
    kamada-kawai layout of the dense adjacency."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import networkx as nx

    g = nx.from_numpy_array(np.asarray(adj))
    pos = nx.kamada_kawai_layout(g)
    out = 1.0 / (1.0 + np.exp(-np.asarray(pred, float)))
    fig = plt.figure("2d visualization of predict")
    ax = fig.add_subplot(211)
    ax.set(title="Prediction")
    nodes = nx.draw_networkx_nodes(g, pos=pos, node_color=out, ax=ax)
    nx.draw_networkx_edges(g, pos=pos, width=1, ax=ax)
    fig.colorbar(nodes, ax=ax)
    ax = fig.add_subplot(212)
    ax.set(title="Labels of network key nodes")
    nodes = nx.draw_networkx_nodes(g, pos=pos, node_color=np.asarray(target, float), ax=ax)
    nx.draw_networkx_edges(g, pos=pos, width=1, ax=ax)
    fig.colorbar(nodes, ax=ax)
    if save_path is not None:
        fig.savefig(save_path, dpi=200, bbox_inches="tight")
    return fig


def model_evaluation_metrics_curves_vanilla(fig, record_scores, score_metrics,
                                            subplot_numCols=2):
    n_rows = int(np.ceil(len(score_metrics) / subplot_numCols))
    for i, score_metric in enumerate(score_metrics, start=1):
        ax = fig.add_subplot(n_rows, subplot_numCols, i)
        ax.plot(record_scores["epoch"], record_scores[score_metric]["train_scores"],
                color="red", label="train")
        ax.plot(record_scores["epoch"], record_scores[score_metric]["val_scores"],
                color="skyblue", label="validation")
        ax.set_title(score_metric)
        ax.legend()
