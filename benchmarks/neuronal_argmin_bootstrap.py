"""Argmin-lead sign stability under curve-level noise (VERDICT r4 next #3).

NEURONAL_LEAD_NOTE.md claims the argmin-lead sign on neuronal/increase is
noise-dominated (the metric's target is near-flat there, so the global-MPV
argmin lands on noise and its sign is arbitrary).  The requested 3-seed
retrain needs TPU-hours this round spent on the fig1 sweeps (VERDICT r4
next #1 — "run the sweeps FIRST"); this is the device-free measurement of
the same claim: bootstrap the COMMITTED fig1 MPV curves (the `.mpv.json`
sidecars are the measurement of record) at their own residual noise scale
and watch the argmin-lead sign.

Procedure per curve: decompose MPV(t) into a centered moving-average trend
plus residual, estimate the noise scale robustly (MAD), then redraw the
curve B times — both iid Gaussian at that scale and circular block
resampling of the actual residuals (preserves autocorrelation) — and run
the EXACT committed metric (`figures/mpv_collapse.py::metric_row_from_mpv`,
spec: reference mpv_collapse_summary.py:313-369) on each draw.

Expected contrast: neuronal/increase (near-flat curve) → P(lead>0) near the
noise null, sign unstable; biomass/increase (sharp learned collapse) →
P(lead>0) pinned at 1.0.  A seed retrain samples *additional* sources of
variation (init, data order) on top of this floor, so sign instability here
is a lower bound on seed instability.

Usage: python benchmarks/neuronal_argmin_bootstrap.py
Writes demo_zoo/mpv_collapse/argmin_bootstrap.json.
"""
from __future__ import annotations

import json
import sys
import zlib
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from upgdm_tpu.figures.common import load_raw_trace  # noqa: E402
from upgdm_tpu.figures.mpv_collapse import metric_row_from_mpv  # noqa: E402

ZOO = REPO / "demo_zoo"
B = 20_000
TREND_WINDOW = 15  # centered MA width (points); curves are 181/41 points


def sidecar_curve(model: str, dynamic: str, name: str) -> tuple:
    """(ews, step, sampling_t, windows) from the committed sidecar + yaml."""
    import yaml

    mdir = ZOO / "ews_results/model_compare" / model / dynamic
    sc = json.loads((mdir / f"{name}.pt.mpv.json").read_text())
    assert sc.get("complete"), f"{model}/{dynamic} sidecar incomplete"
    cfg = yaml.safe_load((mdir / "model_trained.yaml").read_text())["dataset"]
    # window i ends at sampled index (windows-1) + step*i on the sampling_t
    # grid (time starts at 0) — same axis reconstruction as
    # figures.fig1_model_compare.load_partial_signal
    return (np.asarray(sc["ews"], float), int(sc["sample_window_step"]),
            float(cfg["sampling_t"]), int(cfg["windows"]))


def moving_average_trend(y: np.ndarray, w: int) -> np.ndarray:
    pad = w // 2
    ypad = np.pad(y, pad, mode="edge")
    kernel = np.ones(w) / w
    return np.convolve(ypad, kernel, mode="valid")[: len(y)]


def bootstrap_sign(ews: np.ndarray, step: int, sampling_t: float,
                   windows: int, transition_time: float, seed: int) -> dict:
    t = sampling_t * ((windows - 1) + step * np.arange(len(ews)))
    trend = moving_average_trend(ews, TREND_WINDOW)
    resid = ews - trend
    sigma = 1.4826 * float(np.median(np.abs(resid - np.median(resid))))
    rng = np.random.default_rng(seed)

    def leads(draw_resid):
        out = np.empty(len(draw_resid))
        for i, r in enumerate(draw_resid):
            row = metric_row_from_mpv(t, trend + r, transition_time)
            out[i] = row.get("lead_time", np.nan)
        return out

    iid = leads(rng.normal(0.0, sigma, size=(B, len(ews))))
    # circular block bootstrap of the real residuals (block ~ trend window)
    blk = TREND_WINDOW
    starts = rng.integers(0, len(ews), size=(B, -(-len(ews) // blk)))
    idx = (starts[:, :, None] + np.arange(blk)[None, None, :]) % len(ews)
    block = leads(resid[idx.reshape(B, -1)[:, : len(ews)]])

    def stats(ld):
        ld = ld[np.isfinite(ld)]
        return {
            "n": int(ld.size),
            "p_lead_positive": float((ld > 0).mean()),
            "lead_median": float(np.median(ld)),
            "lead_q10": float(np.quantile(ld, 0.1)),
            "lead_q90": float(np.quantile(ld, 0.9)),
        }

    return {
        "noise_sigma": sigma,
        "trend_range": float(trend.max() - trend.min()),
        "sigma_over_trend_range": float(sigma / (trend.max() - trend.min())),
        "measured_lead": float(
            transition_time
            - t[int(np.nanargmin(ews))]),
        "iid": stats(iid),
        "block": stats(block),
    }


def main():
    # Transition times from the committed locator on the BA-30 raw traces
    # (the ramp-driven transition time is a property of the control schedule,
    # stable across noise realizations of the regenerated corpus).
    cases = {
        # neuronal BA-30 increase: near-flat gx curve (the note's subject)
        "neuronal_increase_gx": dict(
            model="NsDiff", dynamic="neuronal",
            name="neuronal_dynamic_eta0.01tau2.0_increase_gx"),
        "neuronal_increase_mpv": dict(
            model="NsDiff", dynamic="neuronal",
            name="neuronal_dynamic_eta0.01tau2.0_increase"),
        # biomass BA-30 increase: sharp learned collapse (control)
        "biomass_increase_gx": dict(
            model="NsDiff", dynamic="biomass",
            name="biomass_dynamic_eta0.005r0.7_increase_gx"),
    }
    out = {"B": B, "trend_window": TREND_WINDOW, "cases": {}}
    for key, c in cases.items():
        raw = load_raw_trace(ZOO / "dataset", c["dynamic"], "increase",
                             "barabasi_albert_30_0")
        ews, step, sampling_t, windows = sidecar_curve(
            c["model"], c["dynamic"], c["name"])
        res = bootstrap_sign(ews, step, sampling_t, windows,
                             float(raw["transition_time"]),
                             seed=zlib.crc32(key.encode()))
        res["transition_time"] = float(raw["transition_time"])
        out["cases"][key] = res
        print(key, json.dumps(res["iid"]), "block:",
              json.dumps(res["block"]), flush=True)
    path = ZOO / "mpv_collapse" / "argmin_bootstrap.json"
    path.write_text(json.dumps(out, indent=1))
    print("->", path)


if __name__ == "__main__":
    main()
