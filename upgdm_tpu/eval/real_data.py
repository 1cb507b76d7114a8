"""Real-data EWS pipeline.

Parity with /root/reference/evaluation_and_analysis/real_data_analysis.py
(608 LoC): loads empirical `.pt` records, optionally interpolates to the model
window, detrends (Lowess/Gaussian, in-house — ewstools is not available here),
computes classic EWS (variance/AR1/sample entropy), the NsDiff gx uncertainty
signal + its rolling trend slope, overlays Bury-2021 ML probabilities, and
writes per-dataset CSV/PNG/SVG.

TPU-first: the gx sweep runs as one fused batched forward over all rolling
windows (eval.uncertainty.batched_gx) instead of a per-window loop
(real_data_analysis.py:336-345).
"""
from __future__ import annotations

import argparse
from pathlib import Path
from types import SimpleNamespace
from typing import Optional

import numpy as np
import pandas as pd

from ..ops.windows import sampling_interval_from_t
from ..utils import io as uio
from .ews_classic import (
    compute_classic_ews,
    compute_variance_trend,
    detrend,
    normalize_by_head_mean,
)
from .uncertainty import batched_gx, load_model_from_dir

BURY_ML_PROB_COLUMNS = ["fold_prob", "hopf_prob", "branch_prob", "null_prob"]
VALID_SIGNALS = {
    "model_uncertainty", "model_trend", "ar1", "variance", "sample-entropy-1", "bury_ml",
}

__all__ = [
    "resolve_real_data_path",
    "get_transition_time_from_record",
    "ensure_min_time_points_linear_interp",
    "prepare_model_input_series",
    "run_model_uncertainty",
    "load_or_run_model_uncertainty",
    "parse_model_uncertainty_cache",
    "infer_model_times",
    "load_bury_ml_probabilities",
    "build_signal_data",
    "plot_real_data_subfigure",
    "run_one",
    "main",
]


def resolve_real_data_path(name, data_root):
    path = Path(name)
    if path.suffix == ".pt" and path.exists():
        return path
    matches = sorted(Path(data_root).rglob(f"{name}.pt"))
    if not matches:
        raise FileNotFoundError(f"Could not find real-data file for {name} under {data_root}")
    return matches[0]


def data_name_from_record(record, data_path):
    return str(record.get("name", Path(data_path).stem))


def get_transition_time_from_record(record):
    """transition_index / transition_time / transition_age resolution
    (real_data_analysis.py:59-72)."""
    ts = np.asarray(record.get("ts_dynamic", []), float).ravel()
    if len(ts) == 0:
        return None
    if "transition_index" in record:
        idx = max(0, min(int(record["transition_index"]), len(ts) - 1))
        return float(ts[idx])
    if "transition_time" in record:
        return float(record["transition_time"])
    if "transition_age" in record:
        age = float(record["transition_age"])
        return float(ts[int(np.argmin(np.abs(ts - age)))])
    return None


def ensure_min_time_points_linear_interp(record, min_sampled_points=200, sampling_interval=1):
    """Interpolate a record when the model window needs more points
    (real_data_analysis.py:75-115)."""
    ys = np.asarray(record["ys_dynamic"], np.float32)
    ts = np.asarray(record["ts_dynamic"], np.float32).ravel()
    if ys.ndim == 1:
        ys = ys[:, None]
    sampling_interval = max(1, int(sampling_interval))
    if len(ts[::sampling_interval]) >= int(min_sampled_points):
        record["ys_dynamic"] = ys
        record["ts_dynamic"] = ts
        return record, False
    if len(ts) < 2:
        raise ValueError("At least two time points are required for interpolation.")
    order = np.argsort(ts)
    ts_s, ys_s = ts[order], ys[order]
    uniq, uidx = np.unique(ts_s, return_index=True)
    ys_u = ys_s[uidx]
    target_len = max(len(uniq), (int(min_sampled_points) - 1) * sampling_interval + 1)
    new_ts = np.linspace(uniq[0], uniq[-1], target_len, dtype=np.float32)
    new_ys = np.stack(
        [np.interp(new_ts, uniq, ys_u[:, d]) for d in range(ys_u.shape[1])], axis=1
    ).astype(np.float32)
    old_transition = get_transition_time_from_record(record)
    record["ys_dynamic"] = new_ys
    record["ts_dynamic"] = new_ts
    record["num_time_points"] = int(target_len)
    if old_transition is not None:
        idx = int(np.argmin(np.abs(new_ts - old_transition)))
        record["transition_index"] = idx
        record["transition_time"] = float(new_ts[idx])
    if "tp_values" in record:
        record["tp_values"] = np.zeros(target_len, np.float32)
    return record, True


def prepare_model_input_series(ys, model_input, detrend_method, detrend_span, detrend_bandwidth):
    ys = np.asarray(ys, np.float32)
    if ys.ndim == 1:
        ys = ys[:, None]
    if model_input == "raw":
        return ys
    if model_input != "detrended":
        raise ValueError(f"Unsupported model input: {model_input}")
    cols = [
        detrend(ys[:, d], method=detrend_method, span=detrend_span, bandwidth=detrend_bandwidth)
        for d in range(ys.shape[1])
    ]
    return np.stack(cols, axis=1).astype(np.float32)


def model_cache_path(data_name, real_data_result_root):
    return Path(real_data_result_root) / "data" / data_name / "model_uncertainty.pt"


def parse_model_uncertainty_cache(cache_path, pred_dim):
    """Cache parsing with the dict/list fallbacks (real_data_analysis.py:241-262)."""
    obj = uio.load_pt(cache_path)
    if isinstance(obj, dict):
        if "model_uncertainty" in obj and "time" in obj:
            return np.asarray(obj["time"], float), np.asarray(obj["model_uncertainty"], float)
        if "values" in obj and "time" in obj:
            return np.asarray(obj["time"], float), np.asarray(obj["values"], float)
        if "data_save_list" in obj:
            obj = obj["data_save_list"]
        else:
            raise ValueError(
                f"Unsupported model uncertainty dict keys in {cache_path}: {list(obj.keys())}"
            )
    if not isinstance(obj, list):
        raise ValueError(f"Expected list[Tensor] in {cache_path}, got {type(obj)}")
    values = []
    for gx in obj:
        gx = np.asarray(gx)
        ews = gx.mean(axis=-1)
        if pred_dim >= len(ews):
            raise ValueError(f"pred_dim={pred_dim} invalid for cached gx shape {gx.shape}")
        values.append(float(ews[pred_dim]))
    return None, np.asarray(values, float)


def infer_model_times(time_data, num_values, sample_window_step=1, sampling_t=0.1, model_window=None):
    """(real_data_analysis.py:264-283)"""
    interval = sampling_interval_from_t(sampling_t)
    sampled_time = np.asarray(time_data, float).ravel()[::interval]
    if model_window is None:
        model_window = len(sampled_time) - (int(num_values) - 1) * int(sample_window_step)
    model_window = int(model_window)
    if model_window < 1:
        raise ValueError(
            f"Cannot infer model window from sampled length={len(sampled_time)}, "
            f"num_values={num_values}, sample_window_step={sample_window_step}."
        )
    return sampled_time[model_window - 1 :: int(sample_window_step)][:num_values]


def run_model_uncertainty(record, data_name, cache_path, model_dir, args):
    """gx sweep over rolling windows -> cache (real_data_analysis.py:298-348)."""
    model_config = uio.read_model_config(model_dir)
    windows = int(model_config["dataset"]["windows"])
    sampling_t = float(model_config["dataset"].get("sampling_t", args.sampling_t))
    record, interpolated = ensure_min_time_points_linear_interp(
        record, min_sampled_points=windows,
        sampling_interval=sampling_interval_from_t(sampling_t),
    )
    if interpolated:
        print(f"{data_name}: interpolated to {record['num_time_points']} points for "
              f"model window={windows}")
    model_input = prepare_model_input_series(
        record["ys_dynamic"], args.model_input, args.model_detrend_method,
        args.model_detrend_span, args.model_detrend_bandwidth,
    )
    series = model_input.T[:, :, None]  # [Node(dims), T, 1]
    infer_params = {"parallel_sample": args.parallel_sample, "n_z_samples": args.n_z_samples}
    model, _np_ = load_model_from_dir(model_dir, infer_params=infer_params)

    interval = sampling_interval_from_t(sampling_t)
    sampled = series[:, ::interval, :]
    sampled_time = np.asarray(record["ts_dynamic"], float).ravel()[::interval]
    n = (sampled.shape[1] - windows) // args.sample_window_step + 1
    starts = np.arange(n) * args.sample_window_step
    idx = starts[:, None] + np.arange(windows)[None, :]
    windows_array = np.ascontiguousarray(sampled[:, idx, :].transpose(1, 0, 2, 3))
    model_times = sampled_time[windows - 1 :: args.sample_window_step]

    g_list = batched_gx(model, windows_array)  # list of [Node, pred_len, F]
    data_save_list = [g[:, :, 0] if g.shape[-1] == 1 else g.squeeze(-1) for g in g_list]
    values = [float(g.mean(axis=1)[args.pred_dim]) for g in data_save_list]
    Path(cache_path).parent.mkdir(parents=True, exist_ok=True)
    uio.save_tensor_list(data_save_list, cache_path)
    return model_times[: len(values)], np.asarray(values, float)


def load_or_run_model_uncertainty(record, data_name, args):
    cache_path = model_cache_path(data_name, args.real_data_result_root)
    model_dir = Path(args.model_dir) if args.model_dir is not None else None
    if cache_path.exists():
        cached_time, values = parse_model_uncertainty_cache(cache_path, args.pred_dim)
        if cached_time is None:
            model_window = None
            if model_dir is not None:
                model_window = int(uio.read_model_config(model_dir)["dataset"]["windows"])
            cached_time = infer_model_times(
                record["ts_dynamic"], len(values),
                sample_window_step=args.sample_window_step,
                sampling_t=args.sampling_t, model_window=model_window,
            )
        return cached_time, values, cache_path
    if model_dir is None:
        raise FileNotFoundError(
            f"Missing {cache_path}. Specify --model-dir to regenerate it."
        )
    times, values = run_model_uncertainty(record, data_name, cache_path, model_dir, args)
    return times, values, cache_path


def load_bury_ml_probabilities(data_name, bury_prob_root):
    matches = sorted(Path(bury_prob_root).rglob(f"{data_name}_bury_ml_probs.csv"))
    if not matches:
        raise FileNotFoundError(
            f"Missing Bury ML probabilities for {data_name} under {bury_prob_root}"
        )
    df = pd.read_csv(matches[0])
    missing = [c for c in ["time", *BURY_ML_PROB_COLUMNS] if c not in df.columns]
    if missing:
        raise ValueError(f"{matches[0]} misses columns {missing}")
    return df, matches[0]


def append_signal_rows(rows, data_name, signal, times, values, component="value"):
    for t, v in zip(np.asarray(times, float), np.asarray(values, float)):
        rows.append(
            {"data_name": data_name, "signal": signal, "component": component,
             "time": t, "value": v}
        )


def build_signal_data(record, data_name, args):
    """All requested signals + the tidy CSV table (real_data_analysis.py:413-467)."""
    ts = np.asarray(record["ts_dynamic"], float).ravel()
    ys = np.asarray(record["ys_dynamic"], np.float32)
    if ys.ndim == 1:
        ys = ys[:, None]
    if args.pred_dim >= ys.shape[1]:
        raise ValueError(f"pred_dim={args.pred_dim} invalid for ys_dynamic shape {ys.shape}")
    y = ys[:, args.pred_dim]

    signal_data = {}
    csv_rows = []
    classic_signals = ["ar1", "variance", "sample-entropy-1"]
    if any(sig in args.signals for sig in classic_signals):
        classic = compute_classic_ews(
            ts, y, method=args.ews_detrend_method, span=args.ews_detrend_span,
            bandwidth=args.ews_detrend_bandwidth, rolling_window=args.rolling_window,
        )
        for key in classic_signals:
            if key in args.signals:
                signal_data[key] = (
                    classic[key].index.to_numpy(dtype=float),
                    classic[key].to_numpy(dtype=float),
                )

    if any(sig in args.signals for sig in ["model_uncertainty", "model_trend"]):
        model_time, model_values, cache_path = load_or_run_model_uncertainty(
            record, data_name, args
        )
        model_values = normalize_by_head_mean(model_values, head_points=args.model_normalize_head)
        signal_data["model_uncertainty"] = (model_time, model_values)
        trend_time, trend_values = compute_variance_trend(
            model_time, model_values, trend_window=args.trend_window,
            min_points=args.trend_min_points, normalize_time=True,
        )
        signal_data["model_trend"] = (trend_time, trend_values)
        print(f"{data_name}: model uncertainty from {cache_path}")

    if "bury_ml" in args.signals:
        bury_df, bury_path = load_bury_ml_probabilities(data_name, args.bury_prob_root)
        signal_data["bury_ml"] = bury_df
        print(f"{data_name}: Bury ML probabilities from {bury_path}")

    append_signal_rows(csv_rows, data_name, "trajectory", ts, y, component=f"dim_{args.pred_dim}")
    for signal in args.signals:
        if signal == "bury_ml" and signal in signal_data:
            bdf = signal_data[signal]
            for col in BURY_ML_PROB_COLUMNS:
                append_signal_rows(csv_rows, data_name, signal, bdf["time"], bdf[col], col)
        elif signal in signal_data:
            times, values = signal_data[signal]
            append_signal_rows(csv_rows, data_name, signal, times, values)
    return ts, y, signal_data, pd.DataFrame(csv_rows)


def plot_real_data_subfigure(data_name, ts, y, signal_data, transition_time, args):
    """Stacked panel figure (real_data_analysis.py:470-531)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n_axes = 1 + len(args.signals)
    fig, axes = plt.subplots(
        n_axes, 1, figsize=(args.fig_width, max(2.2 * n_axes, 5.5)), sharex=True
    )
    if n_axes == 1:
        axes = [axes]
    axes[0].plot(ts, y, color="#1f4e79", linewidth=1.5)
    axes[0].set_ylabel(args.trajectory_ylabel)
    axes[0].set_title(data_name)

    styles = {
        "model_uncertainty": ("#d62728", ".", "Model uncertainty"),
        "model_trend": ("#1f77b4", "-.", "Uncertainty trend"),
        "ar1": ("#d62728", "-", "AR(1)"),
        "variance": ("#2ca02c", "-", "Variance"),
        "sample-entropy-1": ("#9467bd", "-", "Sample Entropy"),
    }
    for axis_index, signal in enumerate(args.signals, start=1):
        ax = axes[axis_index]
        if signal not in signal_data:
            ax.text(0.5, 0.5, f"missing: {signal}", transform=ax.transAxes,
                    ha="center", va="center")
            ax.set_ylabel(signal)
            continue
        if signal == "bury_ml":
            bdf = signal_data[signal]
            colors = {"fold_prob": "#1f77b4", "hopf_prob": "#ff7f0e",
                      "branch_prob": "#2ca02c", "null_prob": "#6c757d"}
            labels = {"fold_prob": "fold", "hopf_prob": "Hopf",
                      "branch_prob": "branch", "null_prob": "null"}
            for col in BURY_ML_PROB_COLUMNS:
                ax.plot(bdf["time"], bdf[col], color=colors[col], linewidth=1.1,
                        label=labels[col])
            ax.set_ylim(-0.03, 1.03)
            ax.legend(loc="best", frameon=False, ncol=4, fontsize=8)
            ax.set_ylabel("Bury ML")
        else:
            times, values = signal_data[signal]
            color, style, label = styles[signal]
            ax.plot(times, values,
                    linestyle=style if style != "." else "None",
                    marker="." if style == "." else None,
                    color=color, linewidth=1.0, markersize=3)
            ax.set_ylabel(label)

    if transition_time is not None:
        for ax in axes:
            ax.axvline(transition_time, color="black", linestyle="--", linewidth=1.0, alpha=0.75)
    for ax in axes:
        ax.grid(alpha=0.18, linewidth=0.6)
        ax.spines["top"].set_visible(False)
        ax.spines["right"].set_visible(False)
    axes[-1].set_xlabel("Time")
    axes[-1].set_xlim(float(np.nanmin(ts)), float(np.nanmax(ts)))
    fig.tight_layout()
    return fig


def run_one(data_name_or_path, args):
    import matplotlib.pyplot as plt

    data_path = resolve_real_data_path(data_name_or_path, args.data_root)
    record = uio.load_pt(data_path)
    data_name = data_name_from_record(record, data_path)
    ts, y, signal_data, signal_table = build_signal_data(record, data_name, args)
    transition_time = get_transition_time_from_record(record)
    output_dir = Path(args.output_root) / data_name
    output_dir.mkdir(parents=True, exist_ok=True)
    fig = plot_real_data_subfigure(data_name, ts, y, signal_data, transition_time, args)
    png_path = output_dir / f"{data_name}_real_data_ews.png"
    fig.savefig(png_path, dpi=args.dpi)
    fig.savefig(output_dir / f"{data_name}_real_data_ews.svg")
    plt.close(fig)
    if not args.no_save_csv:
        signal_table.to_csv(output_dir / f"{data_name}_real_data_ews_signals.csv", index=False)
    print(f"saved: {png_path}")
    return png_path


def default_args(**overrides) -> SimpleNamespace:
    args = SimpleNamespace(
        data_root="dataset/real_data",
        real_data_result_root="ews_results/real_data",
        bury_prob_root="ews_results/bury_2021_ml_probs",
        output_root="ews_results/real_data/figures",
        signals=["model_uncertainty", "model_trend", "ar1", "variance", "bury_ml"],
        pred_dim=0,
        model_dir=None,
        model_input="detrended",
        model_detrend_method="Lowess",
        model_detrend_span=0.2,
        model_detrend_bandwidth=0.2,
        sampling_t=0.1,
        sample_window_step=1,
        parallel_sample=50,
        n_z_samples=100,
        ews_detrend_method="Gaussian",
        ews_detrend_span=0.2,
        ews_detrend_bandwidth=0.2,
        rolling_window=0.5,
        trend_window=40,
        trend_min_points=5,
        model_normalize_head=40,
        trajectory_ylabel="Time Series",
        fig_width=8.0,
        dpi=300,
        no_save_csv=False,
    )
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


def main(argv=None):
    d = default_args()
    parser = argparse.ArgumentParser(description="Create real-data EWS subfigures.")
    parser.add_argument("--data-root", default=d.data_root)
    parser.add_argument("--real-data-result-root", default=d.real_data_result_root)
    parser.add_argument("--bury-prob-root", default=d.bury_prob_root)
    parser.add_argument("--output-root", default=d.output_root)
    parser.add_argument("--data-real-names", nargs="+", default=["bury_2021_anoxia_tsid_1"])
    parser.add_argument("--signals", nargs="+", default=d.signals)
    parser.add_argument("--pred-dim", type=int, default=0, dest="pred_dim")
    parser.add_argument("--model-dir", default=None, dest="model_dir")
    parser.add_argument("--model-input", choices=["raw", "detrended"], default="detrended",
                        dest="model_input")
    parser.add_argument("--model-detrend-method", default="Lowess", dest="model_detrend_method")
    parser.add_argument("--sample-window-step", type=int, default=1, dest="sample_window_step")
    parser.add_argument("--sampling-t", type=float, default=0.1, dest="sampling_t")
    parser.add_argument("--no-save-csv", action="store_true", dest="no_save_csv")
    ns = parser.parse_args(argv)
    args = default_args(**vars(ns))
    unknown = [s for s in args.signals if s not in VALID_SIGNALS]
    if unknown:
        raise ValueError(f"Unknown signals {unknown}. Valid signals: {sorted(VALID_SIGNALS)}")
    for name in ns.data_real_names:
        run_one(name, args)


if __name__ == "__main__":
    main()
