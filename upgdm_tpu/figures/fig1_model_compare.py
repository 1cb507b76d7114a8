"""Paper Fig. 1: diffusion-model uncertainty signals across network dynamics.

Parity: /root/reference/paper_figures/"diffusion mdoel compare_experiment.py" —
for each dynamics (biomass / neuronal / SIS) on the BA-30 test graph, plot the
raw mean state and the four models' relative MPV signals (normalised by the
first-10% baseline) with the raw-state transition marked.
"""
from __future__ import annotations

import argparse
import gc
from pathlib import Path

import numpy as np

from ..eval.uncertainty import uncertainty_ews
from .common import (
    DATASETS,
    FIG1_MODELS,
    MODEL_COLORS,
    RAW_COLOR,
    TRANSITION_COLOR,
    add_common_args,
    dynamics_title,
    ensure_output,
    graph_file,
    load_raw_trace,
    relative_uncertainty,
    set_nature_style,
    thin_for_plot,
)

__all__ = ["load_model_signal", "collect_fig1_data", "main"]


def load_model_signal(ews_root, source_root, model_name, dataset_type, data_file, graph,
                      force_recompute=False) -> dict:
    model_dir = Path(ews_root) / "model_compare" / model_name / dataset_type
    if not model_dir.exists():
        raise FileNotFoundError(f"model folder not found: {model_dir}")
    result = uncertainty_ews(
        model_save_file=model_dir,
        data_file=data_file,
        dynamic_type=dataset_type,
        task_model=model_name if model_name == "DiffSTG" else None,
        graph_file=graph_file(source_root, graph) if model_name == "DiffSTG" else None,
        cache_path=model_dir,
        force_recompute=force_recompute,
    )
    signal = {
        "time": np.asarray(result["time_points"]),
        "ews": np.asarray(result["ews"], float),
        "cache_path": result["cache_path"],
        "sample_window_step": result["sample_window_step"],
    }
    del result
    gc.collect()
    return signal


def collect_fig1_data(ews_root, source_root, data_trend, graph, models, force_recompute=False):
    fig_data = {}
    for dataset_type in DATASETS:
        raw = load_raw_trace(source_root, dataset_type, data_trend, graph)
        model_signals = {
            m: load_model_signal(ews_root, source_root, m, dataset_type,
                                 raw["data_file"], graph, force_recompute)
            for m in models
        }
        fig_data[dataset_type] = {"raw": raw, "models": model_signals}
    return fig_data


def plot_fig1(fig_data, models, output_dir, data_trend):
    import matplotlib.pyplot as plt

    set_nature_style()
    n_cols = len(fig_data)
    fig, axes = plt.subplots(
        2, n_cols, figsize=(3.2 * n_cols, 4.6), sharex="col",
        gridspec_kw={"hspace": 0.08, "wspace": 0.28},
    )
    if n_cols == 1:
        axes = axes.reshape(2, 1)
    for col, (dataset_type, data) in enumerate(fig_data.items()):
        raw = data["raw"]
        t, m = thin_for_plot(raw["time"][: len(raw["mean"])], raw["mean"])
        axes[0, col].plot(t, m, color=RAW_COLOR, linewidth=1.4)
        axes[0, col].set_title(dynamics_title(dataset_type))
        axes[0, col].axvline(raw["transition_time"], color=TRANSITION_COLOR,
                             linestyle="--", linewidth=0.9)
        if col == 0:
            axes[0, col].set_ylabel("State")
        for model_name, sig in data["models"].items():
            rel = relative_uncertainty(sig["ews"])
            axes[1, col].plot(sig["time"][: len(rel)], rel,
                              color=MODEL_COLORS.get(model_name, "#333333"),
                              linewidth=1.1, label=model_name)
        axes[1, col].axvline(raw["transition_time"], color=TRANSITION_COLOR,
                             linestyle="--", linewidth=0.9)
        axes[1, col].set_xlabel("Time")
        if col == 0:
            axes[1, col].set_ylabel("Relative uncertainty")
            axes[1, col].legend(fontsize=7, ncol=2)
    fig.tight_layout()
    out = ensure_output(output_dir)
    png = out / f"fig1_model_compare_{data_trend}.png"
    fig.savefig(png, dpi=300, bbox_inches="tight")
    fig.savefig(out / f"fig1_model_compare_{data_trend}.pdf", bbox_inches="tight")
    plt.close(fig)
    return png


def main(argv=None):
    parser = argparse.ArgumentParser(description="Fig 1: model comparison")
    add_common_args(parser)
    parser.add_argument("--graph", default="barabasi_albert_30_0")
    parser.add_argument("--models", nargs="+", default=list(FIG1_MODELS))
    parser.add_argument("--force-recompute", action="store_true")
    args = parser.parse_args(argv)
    fig_data = collect_fig1_data(
        args.ews_root, args.source_root, args.trend, args.graph, tuple(args.models),
        args.force_recompute,
    )
    png = plot_fig1(fig_data, args.models, args.output_dir, args.trend)
    print(f"saved: {png}")


if __name__ == "__main__":
    main()
