"""Model-independent oracle for the MPV-collapse lead-time metric.

VERDICT r3 item 2 asks whether the neuronal corpus' negative lead times are a
framework defect.  This experiment removes the model entirely: NsDiff's g(x) is
trained to predict the rolling variance of the future window (reference
sigma.py:5-31, our ops/rolling.py::wv_sigma), so the best any *calibrated*
variance model can possibly score under the mpv_collapse lead-time metric is
the metric applied to the TRUE variance of each prediction window.  We compute
that oracle MPV directly from the raw corpus with the exact sweep geometry
(ops/windows.py::slbp_sensitivity_windows, per-dynamic sample_window_step /
sampling_t) and the exact locator + metric used by the corpus summary
(figures/mpv_collapse.py, a re-derivation of the reference's
paper_figures/mpv_collapse_summary.py:213-369), then summarizes by dynamic and
trend.

Reading: if the oracle itself scores a negative lead on a trajectory, the
global MPV minimum genuinely lies after the raw-state transition (the system's
true variance keeps falling into the post-transition state), and NO variance
model — ours or the reference's torch NsDiff — can score a positive lead
there.  The statistic is then a property of the dynamics + the metric
definition ("lead_time = transition_time - global argmin time"), shared by the
reference's own summary script, not of this framework.

Run (CPU-only, numpy):
    python benchmarks/neuronal_lead_oracle.py --source-root demo_zoo/dataset \
        --out demo_zoo/mpv_collapse/oracle_summary.json
"""
from __future__ import annotations

import argparse
import json
import statistics
from collections import defaultdict
from pathlib import Path

import numpy as np

from upgdm_tpu.figures.mpv_collapse import (
    load_raw_state,
    locate_transition,
    metric_row_from_mpv,
)
from upgdm_tpu.ops.windows import (
    DEFAULT_SAMPLE_WINDOW_STEP,
    DEFAULT_SAMPLING_T,
    slbp_sensitivity_windows,
)

WINDOWS = 100
PRED_LEN = 100
ROLLING_LENGTH = 50  # g's training-target window (configs/grid_search/*NsDiff*.yaml)


def _trailing_var(x: np.ndarray, window: int) -> np.ndarray:
    """Trailing-window population variance along axis 0 (ops/rolling.py parity).

    x: [T, N] -> [T, N]; position t uses samples (t-window, t].  Replicate-pads
    the head like wv_sigma_trailing(discard_rep=False) — irrelevant here since
    we only read positions >= WINDOWS > window.
    """
    pad = np.repeat(x[:1], window - 1, axis=0)
    xp = np.concatenate([pad, x], axis=0)
    c1 = np.cumsum(xp, axis=0)
    c2 = np.cumsum(xp * xp, axis=0)
    z = np.zeros((1, x.shape[1]), dtype=x.dtype)
    s1 = np.concatenate([z, c1], axis=0)
    s2 = np.concatenate([z, c2], axis=0)
    mean = (s1[window:] - s1[:-window]) / window
    mean_sq = (s2[window:] - s2[:-window]) / window
    return np.maximum(mean_sq - mean * mean, 0.0)


def oracle_mpv_for_file(data_file: Path, dynamic_type: str, causal: bool = False):
    """g's true training target at the exact MPV sweep positions.

    Returns (time_points [n], oracle_mpv [n]).  The g target is
    wv_sigma_trailing(concat(x, y), rolling_length=50) over the prediction
    window (models/nsdiff.py::loss_fn, ref NsDiff_model.py:128); gx-MPV reduces
    it by mean over horizon then nodes (summarize_nsdiff_g_list).  We compute
    the identical quantity from the raw decimated series: for positions >=
    WINDOWS the per-window trailing variance equals the global one, so one
    global pass suffices.
    """
    import torch

    record = torch.load(data_file, map_location="cpu", weights_only=False)
    ys = np.asarray(record["ys_dynamic"], dtype=np.float64)  # [T, N]
    ts = np.asarray(record["ts_dynamic"], dtype=np.float64)
    step = DEFAULT_SAMPLE_WINDOW_STEP[dynamic_type]
    sampling_t = DEFAULT_SAMPLING_T[dynamic_type]
    _inp, _pred, time_points = slbp_sensitivity_windows(
        ys, ts, windows=WINDOWS, pred_len=PRED_LEN,
        sampling_t=sampling_t, sample_window_step=step,
    )
    from upgdm_tpu.ops.windows import sampling_interval_from_t

    sampled = ys[:: sampling_interval_from_t(sampling_t)]
    tv = _trailing_var(sampled, ROLLING_LENGTH).mean(axis=-1)  # [T_dec]
    # Prediction windows start at WINDOWS + i*step (slbp_sensitivity_windows).
    m = (sampled.shape[0] - WINDOWS - PRED_LEN) // step + 1
    if m <= 0:
        return np.asarray([]), np.asarray([])
    if causal:
        # Causal variant: the same statistic over the INPUT window (ending at
        # the sweep time point) — the best a variance-martingale predictor can
        # do from information actually available to a model.  The non-causal
        # oracle peeks one full window (PRED_LEN steps) into the future, an
        # advantage no model has.  Skip the replicate-padded trailing-var
        # warm-up (positions < ROLLING_LENGTH-1 average fewer effective
        # samples and bias the first windows' variance low, which plants a
        # spurious global argmin at the first time point).
        starts = np.arange(m) * step
        mpv = np.asarray([
            tv[max(s, ROLLING_LENGTH - 1) : s + WINDOWS].mean() for s in starts
        ])
    else:
        starts = WINDOWS + np.arange(m) * step
        mpv = np.asarray([tv[s : s + PRED_LEN].mean() for s in starts])
    n = min(len(time_points), len(mpv))
    return time_points[:n], mpv[:n]


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--source-root", type=Path, default=Path("demo_zoo/dataset"))
    parser.add_argument("--dynamics", nargs="+", default=["biomass", "neuronal", "SIS"])
    parser.add_argument("--causal", action="store_true",
                        help="Use the causal (input-window) oracle instead of the "
                             "future-window one.")
    parser.add_argument("--out", type=Path, default=None)
    args = parser.parse_args()

    rows = []
    for dynamic_type in args.dynamics:
        root = args.source_root / f"spdata_sde_{dynamic_type}"
        for data_file in sorted(root.glob("*/*.pt")):
            trend = "increase" if data_file.stem.endswith("_increase") else "decrease"
            time, state_mean = load_raw_state(data_file)
            transition = locate_transition(time, state_mean, dynamic_type=dynamic_type, trend=trend)
            if not transition.get("is_transition", False):
                continue
            tpts, mpv = oracle_mpv_for_file(data_file, dynamic_type, causal=args.causal)
            if len(mpv) == 0:
                continue
            metrics = metric_row_from_mpv(tpts, mpv, transition_time=float(transition["transition_time"]))
            if metrics.get("skip_reason"):
                continue
            rows.append({
                "dynamic_type": dynamic_type,
                "trend": trend,
                "file": str(data_file),
                "transition_time": float(transition["transition_time"]),
                "lead_time": float(metrics["lead_time"]),
                "pre_transition_drop_percent": float(metrics["pre_transition_drop_percent"]),
                "global_drop_percent": float(metrics["global_drop_percent"]),
            })

    summary = {"n_files": len(rows), "by_dynamic_trend": {}}
    groups = defaultdict(list)
    for r in rows:
        groups[(r["dynamic_type"], r["trend"])].append(r)
    for (dyn, trend), g in sorted(groups.items()):
        leads = [r["lead_time"] for r in g]
        summary["by_dynamic_trend"][f"{dyn}/{trend}"] = {
            "n": len(g),
            "lead_time_positive_frac": sum(1 for v in leads if v > 0) / len(leads),
            "lead_time_median": statistics.median(leads),
            "pre_transition_drop_percent_median": statistics.median(
                r["pre_transition_drop_percent"] for r in g),
            "global_drop_percent_median": statistics.median(
                r["global_drop_percent"] for r in g),
        }
    text = json.dumps(summary, indent=2)
    print(text)
    if args.out is not None:
        args.out.parent.mkdir(parents=True, exist_ok=True)
        payload = {"summary": summary, "rows": rows}
        args.out.write_text(json.dumps(payload, indent=2))


if __name__ == "__main__":
    main()
