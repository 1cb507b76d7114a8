"""Dataset preparation: file discovery, decimation, windowing, augmentation.

Parity with /root/reference/utils/utils.py:
  - pre_dataset_timeseries      <- pre_DataSet_Timeseries (:399-443)
  - pre_dataset_timeseries_real <- pre_DataSet_Timeseries_real (:447-494)
  - pre_dataset_spdata          <- pre_DataSet_spdata (:310-370)
  - flip augmentation           <- preprocess_data_sequence /
                                   preprocess_gdata_sequence (:371-397)

TPU-first: windows come out as STACKED numpy arrays (one [num, ..., T, F]
tensor per call) so training/inference consume whole batches — not python
lists of tensors.  Graph datasets return per-window graph ids + a padded
adjacency stack for dense mixed-topology batching.
"""
from __future__ import annotations

from glob import glob
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from ..ops.graph import DenseGraph, graphml_to_adjacency
from .io import load_pt

__all__ = [
    "unfold_windows",
    "flip_augment",
    "pre_dataset_timeseries",
    "pre_dataset_timeseries_real",
    "pre_dataset_spdata",
]


def unfold_windows(series: np.ndarray, length: int, step: int, axis: int = 0) -> np.ndarray:
    """Strided windows along `axis`: returns [n, ..., length, ...] stacked copy."""
    series = np.asarray(series)
    T = series.shape[axis]
    n = (T - length) // step + 1
    if n <= 0:
        raise ValueError("data length is not enough!!!")
    starts = np.arange(n) * step
    idx = starts[:, None] + np.arange(length)[None, :]
    return np.take(series, idx, axis=axis)  # inserts [n, length] at `axis`


def flip_augment(window: np.ndarray, data_filter: str = "*", file_name: Optional[str] = None,
                 time_axis: int = 0):
    """Trend-aware reversal augmentation (utils/utils.py:377-397).

    '*' -> (flipped, original); '*_increase'/'*_decrease' -> single window,
    flipped when the file's trend doesn't match.
    """
    if data_filter == "*":
        return np.flip(window, axis=time_axis).copy(), window
    trend = data_filter.replace("*_", "")
    if file_name is not None and trend in file_name:
        return (window,)
    return (np.flip(window, axis=time_axis).copy(),)


def _decimation_interval(sampling_t) -> int:
    sampling_t_min = 0.1
    if sampling_t < sampling_t_min:
        raise AssertionError("Error: sampling_t should be greater than or equal to 0.1")
    return int(sampling_t / sampling_t_min)


def pre_dataset_timeseries(
    file_path,
    windows: int,
    pred_len: int,
    interval_step: int,
    sampling_t: float,
    filter: str = "*",
    STG_exist: bool = True,
    data_dropout: Optional[float] = None,
    rng: Optional[np.random.Generator] = None,
    **_,
) -> np.ndarray:
    """Flat time-series dataset -> stacked [num, windows+pred_len, F] float32.

    Mirrors pre_DataSet_Timeseries (utils/utils.py:399-443): glob
    <file_path>/*/*.pt, decimate by sampling_t/0.1, unfold windows, optionally
    split features into univariate series (STG_exist), apply flip augmentation.
    """
    rng = rng or np.random.default_rng(0)
    out = []
    interval = _decimation_interval(sampling_t)
    for file in sorted(glob(str(Path(file_path) / "*/*.pt"))):
        rec = load_pt(file)
        file_name = Path(file).parent.name
        series = np.asarray(rec["ys_dynamic"], np.float32)  # [T, F]
        sampled = series[::interval, :]
        wins = unfold_windows(sampled, windows + pred_len, interval_step)  # [n, L, F]
        if STG_exist:
            wins = wins.transpose(0, 2, 1).reshape(-1, windows + pred_len, 1)
        for w in wins:
            if data_dropout is not None and rng.uniform() > data_dropout:
                continue
            out.extend(flip_augment(w, data_filter=filter, file_name=file_name))
    if not out:
        return np.zeros((0, windows + pred_len, 1), np.float32)
    return np.stack(out).astype(np.float32)


def pre_dataset_timeseries_real(
    file_path,
    windows: int,
    pred_len: int,
    interval_step: int,
    sampling_t: float,
    filter: str = "*",
    STG_exist: bool = True,
    data_dropout: Optional[float] = None,
    rng: Optional[np.random.Generator] = None,
    **_,
) -> np.ndarray:
    """Real-data variant (utils/utils.py:447-494): glob
    <file_path>/<filter>/pt/*.pt, no flip augmentation."""
    rng = rng or np.random.default_rng(0)
    out = []
    interval = _decimation_interval(sampling_t)
    for file in sorted(glob(str(Path(file_path) / filter / "pt" / "*.pt"))):
        if file.endswith(".py"):
            continue
        rec = load_pt(file)
        series = np.asarray(rec["ys_dynamic"], np.float32)
        sampled = series[::interval, :]
        wins = unfold_windows(sampled, windows + pred_len, interval_step)
        if STG_exist:
            wins = wins.transpose(0, 2, 1).reshape(-1, windows + pred_len, 1)
        for w in wins:
            if data_dropout is not None and rng.uniform() > data_dropout:
                continue
            out.append(w)
    if not out:
        return np.zeros((0, windows + pred_len, 1), np.float32)
    return np.stack(out).astype(np.float32)


def pre_dataset_spdata(
    spdata_file_path,
    graph_file_path,
    windows: int,
    pred_len: int,
    interval_step: int,
    sampling_t: float,
    filter: str = "*",
    **_,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Graph dataset -> (x [num, V, L, 1], adjs [G, V, V], graph_ids [num]).

    Mirrors pre_DataSet_spdata (utils/utils.py:310-370): each trajectory dir
    <spdata_file_path>/<name> pairs with <graph_file_path>/<name>.graphml;
    records hold ys_dynamic [T, Node].  All graphs are padded to the max node
    count (masked nodes have zero adjacency rows and zero features) — the
    dense-batch replacement for PyG block-diagonal batching.  Every window is
    emitted (flipped, original) like preprocess_gdata_sequence (:371-375).
    """
    dirs = sorted(glob(str(Path(spdata_file_path) / filter)))
    dirs = [d for d in dirs if Path(d).is_dir()]
    interval = _decimation_interval(sampling_t)
    L = windows + pred_len

    graphs = []
    windows_per_graph = []
    for d in dirs:
        name = Path(d).name
        gpath = Path(graph_file_path) / f"{name}.graphml"
        graph = graphml_to_adjacency(gpath)
        wins_for_graph = []
        for spdata_file in sorted(glob(str(Path(d) / "*.pt"))):
            rec = load_pt(spdata_file)
            series = np.asarray(rec["ys_dynamic"], np.float32).T[:, :, None]  # [V, T, 1]
            if not np.isfinite(series).all():
                # fail at data prep, not as a NaN loss mid-training: a
                # non-finite record means the SIMULATION diverged (the
                # flat-window builders drop such windows via their std
                # guard, but spatial batches would poison the whole run)
                raise ValueError(
                    f"non-finite ys_dynamic in {spdata_file} — regenerate the "
                    "record (divergence-guarded simulate_network_system)")
            sampled = series[:, ::interval, :]
            wins = unfold_windows(sampled, L, interval_step, axis=1)  # [V, n, L, 1]
            wins = wins.transpose(1, 0, 2, 3)  # [n, V, L, 1]
            for w in wins:
                flipped = np.flip(w, axis=1).copy()
                wins_for_graph.extend([flipped, w])
        graphs.append(graph)
        windows_per_graph.append(wins_for_graph)

    if not graphs:
        return (
            np.zeros((0, 0, L, 1), np.float32),
            np.zeros((0, 0, 0), np.float32),
            np.zeros((0,), np.int32),
        )
    vmax = max(g.num_nodes for g in graphs)
    adjs = np.stack([g.padded(vmax).adj for g in graphs])
    xs, gids = [], []
    for gi, wins in enumerate(windows_per_graph):
        for w in wins:
            V = w.shape[0]
            if V < vmax:
                w = np.concatenate(
                    [w, np.zeros((vmax - V,) + w.shape[1:], w.dtype)], axis=0
                )
            xs.append(w)
            gids.append(gi)
    return np.stack(xs).astype(np.float32), adjs, np.asarray(gids, np.int32)
