"""Round-5 regression guards.

1. SIS/increase locator asymmetry: why only 1/60 increase files yields a
   valid MPV-collapse row while all 60 decrease files do (see
   demo_zoo/mpv_collapse/SIS_INCREASE_LOCATOR_NOTE.md).  Metric spec parity:
   /root/reference/paper_figures/mpv_collapse_summary.py:213-252 (locator)
   and :313-369 (metrics).
2. corpus_summary.json per-trend resolution: headline per-dynamics rows can
   no longer silently lean on one trend.
"""
import json
from pathlib import Path

import numpy as np

from upgdm_tpu.figures.mpv_collapse import (
    SIS_THRESHOLD,
    locate_transition,
    metric_row_from_mpv,
)

REPO = Path(__file__).resolve().parents[1]


def _sis_trajectory(cross_t, trend, T=400, dt=0.1):
    """Mean infection level crossing SIS_THRESHOLD at ``cross_t``: a sharp
    sigmoid ignition (increase) or extinction (decrease)."""
    t = np.arange(T) * dt
    level = 0.2 / (1.0 + np.exp(-(t - cross_t) / 0.2))
    if trend == "decrease":
        level = level[::-1].copy()
        cross_idx = np.flatnonzero(level < SIS_THRESHOLD)
    else:
        cross_idx = np.flatnonzero(level > SIS_THRESHOLD)
    assert cross_idx.size
    return t, level


def test_sis_increase_locator_asymmetry():
    """Early up-crossing: transition is LOCATED but the metric stage skips
    it (no MPV points before it); late down-crossing of the same geometry
    produces a valid row.  This is the 59/60-skip mechanism on the corpus."""
    # MPV scan convention at zoo scale: first point at sampled index
    # w + p - 1 = 199 (t = 19.9), stepping 5 -> exactly the corpus geometry
    t_scan = 19.9 + 0.5 * np.arange(41)
    mpv = 1.0 + 0.01 * np.sin(t_scan)

    t, level = _sis_trajectory(cross_t=8.0, trend="increase")
    loc = locate_transition(t, level, "SIS", "increase")
    assert loc["is_transition"] and loc["transition_method"] == "sis_threshold"
    assert loc["transition_time"] < t_scan[0]  # ignition before first MPV point
    row = metric_row_from_mpv(t_scan, mpv, loc["transition_time"])
    assert row["skip_reason"] == "too_few_pre_transition_mpv_points"

    t, level = _sis_trajectory(cross_t=8.0, trend="decrease")  # extinction late
    loc = locate_transition(t, level, "SIS", "decrease")
    assert loc["is_transition"] and loc["transition_method"] == "sis_threshold"
    assert loc["transition_time"] > t_scan[0] + 2.0  # pre-transition signal exists
    row = metric_row_from_mpv(t_scan, mpv, loc["transition_time"])
    assert row["skip_reason"] == ""
    assert np.isfinite(row["lead_time"])


def test_corpus_summary_by_dynamic_trend():
    """The committed corpus summary surfaces per-trend n / skip counts, and
    the SIS/increase cell records the documented 1-valid / 59-skipped split."""
    summary = json.loads(
        (REPO / "demo_zoo/mpv_collapse/corpus_summary.json").read_text())
    cells = summary["by_dynamic_trend"]
    assert set(cells) == {f"{d}/{tr}" for d in ("SIS", "biomass", "neuronal")
                          for tr in ("increase", "decrease")}
    for cell in cells.values():
        assert cell["n"] + sum(cell["n_skipped_by_reason"].values()) == cell["n_files"]
    sis_inc = cells["SIS/increase"]
    assert sis_inc["n"] == 1
    assert sis_inc["n_skipped_by_reason"] == {
        "too_few_pre_transition_mpv_points": 59}
    assert cells["SIS/decrease"]["n"] == 60
    # the note explaining the asymmetry ships beside the summary
    assert (REPO / "demo_zoo/mpv_collapse/SIS_INCREASE_LOCATOR_NOTE.md").exists()


def test_train_bench_regression_gate():
    """bench_train emits regression:true below the floor and exits 2 via
    main(); the gate itself is pure and testable without a device."""
    import bench_train as bt

    ok = bt.bench_result(2300.0, 7.6)
    assert ok["regression"] is False
    assert ok["unit"] == "samples/sec"
    assert ok["vs_baseline"] == round(2300.0 / 7.6, 2)

    bad = bt.bench_result(1500.0, 7.6)
    assert bad["regression"] is True

    # missing CPU baseline file must not mask the gate
    nan_base = bt.bench_result(2300.0, float("nan"))
    assert nan_base["regression"] is False and nan_base["vs_baseline"] is None
    assert bt.bench_result(1.0, float("nan"))["regression"] is True


def test_fig1_arm_driver_skips_complete_arms(tmp_path, capsys, monkeypatch):
    """The round-5 arm driver must skip arms whose sidecar says complete —
    a retry after a tunnel kill costs a skip, not a re-sweep."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "fig1_arm_driver", REPO / "examples/fig1_arm_driver.py")
    drv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(drv)

    ews = tmp_path / "ews_results"
    arm_dir = ews / "model_compare" / "TMDM" / "SIS"
    arm_dir.mkdir(parents=True)
    name = "SIS_dynamic_eta0.0001d0.5_increase.pt"
    (arm_dir / f"{name}.mpv.json").write_text(json.dumps(
        {"complete": True, "n_windows_done": 7, "n_windows_total": 7,
         "fingerprint": "x", "pred_mean": [1.0] * 7, "ews": [1.0] * 7}))
    assert drv.arm_complete(ews, "TMDM", "SIS", "increase") is True
    assert drv.arm_complete(ews, "TMDM", "neuronal", "increase") is False

    # a complete arm must not touch the model/data at all
    drv.main(["--ews-root", str(ews), "--source-root", str(tmp_path),
              "--arms", "TMDM:SIS"])
    out = capsys.readouterr().out
    assert "already complete, skipping" in out and "all requested arms complete" in out
