"""Figure-layer analytics: transition location, MPV metrics, summary tables."""
import importlib
import json
from pathlib import Path

import numpy as np
import pytest

from upgdm_tpu.figures import mpv_collapse as M


def test_all_figure_modules_import():
    for mod in [
        "common", "mpv_collapse", "fig1_model_compare", "fig2_graph_generalization",
        "fig3_dynamics_transfer", "fig4_model_sensitivity", "fig5_tipping_types",
        "fig6_slbp_model_analysis", "fig7_train_analysis", "fig8_train_source",
        "fig9_smoothing", "figure_composer", "real_systems", "plot_bury_transitions",
    ]:
        importlib.import_module(f"upgdm_tpu.figures.{mod}")


def test_locate_transition_step():
    t = np.arange(200, dtype=float)
    state = np.concatenate([np.ones(120), 5 * np.ones(80)])
    res = M.locate_transition(t, state, "biomass", "increase")
    assert res["is_transition"]
    # the max-window-change score flags the window *ending* at the jump, so
    # the located index trails the jump by up to window_size (ref behavior)
    assert 105 <= res["transition_time"] <= 125


def test_locate_transition_sis_threshold():
    t = np.arange(300, dtype=float)
    state = np.concatenate([np.zeros(200), 0.5 * np.ones(100)])
    res = M.locate_transition(t, state, "SIS", "increase")
    assert res["is_transition"]
    assert res["transition_method"] == "sis_threshold"
    assert 190 <= res["transition_time"] <= 210


def test_locate_transition_too_short():
    res = M.locate_transition(np.arange(5.0), np.ones(5), "biomass", "increase")
    assert not res["is_transition"]
    assert res["skip_reason"] == "too_short"


def test_metric_row_from_mpv_collapse():
    # MPV flat at 1.0, collapses to 0.1 before the transition at t=80
    t = np.arange(100, dtype=float)
    mpv = np.ones(100)
    mpv[60:] = 0.1
    m = M.metric_row_from_mpv(t, mpv, transition_time=80.0, slope_window_points=10)
    assert m["skip_reason"] == ""
    assert m["baseline_mpv"] == pytest.approx(1.0)
    assert m["pre_transition_drop_percent"] == pytest.approx(90.0)
    assert m["global_drop_percent"] == pytest.approx(90.0)
    assert m["lead_time"] == pytest.approx(80.0 - 60.0)
    assert m["min_slope_global"] < 0


def test_metric_row_skip_reasons():
    t = np.arange(100, dtype=float)
    assert M.metric_row_from_mpv(t[:2], np.ones(2), 50)["skip_reason"] == "too_few_mpv_points"
    # no pre-transition points
    assert (
        M.metric_row_from_mpv(t, np.ones(100), -5.0)["skip_reason"]
        == "too_few_pre_transition_mpv_points"
    )


def test_compute_local_slopes_linear():
    t = np.arange(50, dtype=float)
    y = 2.0 * t
    st, s = M.compute_local_slopes(t, y, 10)
    assert len(s) == 50 - 10 + 1
    np.testing.assert_allclose(s, 2.0, rtol=1e-6)


def test_build_summary_rows_and_matrix():
    rows = [
        {"dynamic_type": "SIS", "topology_type": "BA", "trend": "increase",
         "skip_reason": "", "pre_transition_drop_percent": 80.0,
         "global_drop_percent": 85.0, "lead_time": 100.0,
         "min_slope_before_transition": -1.0, "min_slope_global": -2.0,
         "slope_lead_time": 50.0},
        {"dynamic_type": "SIS", "topology_type": "BA", "trend": "increase",
         "skip_reason": "", "pre_transition_drop_percent": 90.0,
         "global_drop_percent": 95.0, "lead_time": 120.0,
         "min_slope_before_transition": -1.5, "min_slope_global": -2.5,
         "slope_lead_time": 60.0},
        {"dynamic_type": "SIS", "topology_type": "ER", "trend": "increase",
         "skip_reason": "bad", "pre_transition_drop_percent": 0.0},
    ]
    summary = M.build_summary_rows(rows)
    drop = [r for r in summary if r["metric"] == "pre_transition_drop_percent"]
    assert len(drop) == 1  # only the valid BA group
    assert drop[0]["n_valid"] == 2
    assert drop[0]["mean"] == pytest.approx(85.0)
    fields, matrix = M.build_metric_matrix(summary, "pre_transition_drop_percent")
    assert matrix[0]["dynamic_type"] == "SIS"
    assert "85.00% +/- " in matrix[0]["BA | increase"]


def test_count_matrix_and_markdown_summary(tmp_path):
    rows = [
        {"dynamic_type": "SIS", "topology_type": "BA", "trend": "increase",
         "skip_reason": "", "pre_transition_drop_percent": 80.0,
         "global_drop_percent": 85.0, "lead_time": 100.0,
         "min_slope_before_transition": -1.0, "min_slope_global": -2.0,
         "slope_lead_time": 50.0},
        {"dynamic_type": "SIS", "topology_type": "BA", "trend": "increase",
         "skip_reason": "", "pre_transition_drop_percent": 90.0,
         "global_drop_percent": 95.0, "lead_time": 120.0,
         "min_slope_before_transition": -1.5, "min_slope_global": -2.5,
         "slope_lead_time": 60.0},
        {"dynamic_type": "SIS", "topology_type": "ER", "trend": "decrease",
         "skip_reason": "no_transition"},
    ]
    summary = M.build_summary_rows(rows)
    fields, matrix = M.build_count_matrix(summary)
    assert fields[0] == "dynamic_type"
    assert matrix[0]["BA | increase"] == 2
    assert matrix[0]["ER | decrease"] == ""  # skipped group never summarized

    md = tmp_path / "summary.md"
    M.write_markdown_summary(md, summary, rows)
    text = md.read_text()
    assert "Total scanned samples: 3" in text
    assert "Valid transition samples with MPV metrics: 2" in text
    assert "`mpv_collapse_n_valid.csv`" in text
    for metric in M.METRICS:
        assert f"`mpv_collapse_{metric}.csv`" in text


def test_summarize_xy_records_groups_by_x():
    records = [
        {"threshold": 0.1, "lead_time": 10.0},
        {"threshold": 0.1, "lead_time": 30.0},
        {"threshold": 0.2, "lead_time": 5.0},
        {"threshold": 0.3, "lead_time": float("nan")},  # dropped
    ]
    rows = M.summarize_xy_records(records, "threshold", "lead_time")
    assert [r["threshold"] for r in rows] == [0.1, 0.2]
    assert rows[0]["mean_lead_time"] == pytest.approx(20.0)
    assert rows[0]["std_lead_time"] == pytest.approx(np.std([10, 30], ddof=1))
    assert rows[0]["n_valid"] == 2
    assert rows[1]["std_lead_time"] == 0.0  # single sample


def test_threshold_and_slope_relation_records(tmp_path):
    t = np.arange(10, dtype=float) * 10.0
    mpv = np.array([1.0, 1.0, 0.9, 0.8, 0.6, 0.4, 0.3, 0.2, 0.2, 0.2])
    rows = [
        {"dynamic_type": "SIS", "trend": "increase", "skip_reason": "",
         "baseline_mpv": 1.0, "transition_time": 80.0,
         "mpv_time": t, "mpv_values": mpv,
         "min_slope_global": -0.02, "slope_lead_time": 35.0},
        {"dynamic_type": "SIS", "trend": "increase", "skip_reason": "no_transition"},
    ]
    records = M.threshold_records_from_runtime(rows)
    # 8 thresholds in [0.1, max_drop=0.8]; every threshold is reached
    assert len(records) == 8
    thresholds = sorted({r["threshold"] for r in records})
    assert thresholds[0] == pytest.approx(0.1)
    assert thresholds[-1] == pytest.approx(0.8)
    # threshold 0.1 first reached at t=30 (drop 0.2; the t=20 drop is
    # 0.0999... in float) -> lead 50
    low = min(records, key=lambda r: r["threshold"])
    assert low["lead_time"] == pytest.approx(50.0)
    # the deepest threshold (0.8) first reached at t=70 -> lead 10
    high = max(records, key=lambda r: r["threshold"])
    assert high["lead_time"] == pytest.approx(10.0)

    slope_recs = M.slope_relation_records(rows)
    assert slope_recs == [{"dynamic_type": "SIS", "trend": "increase",
                           "min_slope_global": -0.02, "lead_time": 35.0}]

    csv_path = tmp_path / "rel.csv"
    M.write_relation_csv(csv_path, records, "threshold")
    text = csv_path.read_text()
    assert text.splitlines()[0] == (
        "dynamic_type,trend,threshold,mean_lead_time,std_lead_time,n_valid")
    assert len(text.splitlines()) == 9  # header + 8 thresholds

    png = tmp_path / "rel.png"
    M.plot_six_panel_relation(records, "threshold", "lead_time", png,
                              xlabel="thr", ylabel="lead")
    assert png.exists() and png.stat().st_size > 0


def test_iter_data_files(tmp_path):
    root = tmp_path
    d = root / "spdata_sde_SIS" / "barabasi_albert_30_0"
    d.mkdir(parents=True)
    (d / "SIS_dynamic_eta0.01d0.5_increase.pt").write_bytes(b"x")
    (d / "SIS_dynamic_eta0.5d0.5_decrease.pt").write_bytes(b"x")
    files = list(M.iter_data_files(root, ["SIS"], ["increase", "decrease"],
                                   exclude_eta=["0.5"]))
    assert len(files) == 1
    dyn, ttype, topo, trend, eta, _f = files[0]
    assert (dyn, ttype, trend, eta) == ("SIS", "BA", "increase", "0.01")


def test_figure_composer_crop():
    from upgdm_tpu.figures.figure_composer import crop_white_margin

    img = np.full((100, 100, 4), 255, np.uint8)
    img[40:60, 30:70, :3] = 0
    out = crop_white_margin(img, pad=2)
    assert out.shape[0] <= 26 and out.shape[1] <= 46


def test_common_helpers():
    from upgdm_tpu.figures.common import (
        dynamics_filename, graph_name, parameters, relative_uncertainty, transition_time,
    )

    assert dynamics_filename("SIS", "increase") == "SIS_dynamic_eta0.0001d0.5_increase.pt"
    assert graph_name("BA") == "barabasi_albert_30_0"
    assert parameters("SIS") == (20, 0.1)
    rel = relative_uncertainty(np.array([2.0] * 10 + [4.0] * 10))
    np.testing.assert_allclose(rel[:10], 1.0)
    t = np.arange(200, dtype=float)
    state = np.concatenate([np.zeros(150), np.ones(50)])
    tt = transition_time(t, state, "biomass", "increase")
    assert 140 <= tt <= 160


def test_fig9_causal_moving_average():
    from upgdm_tpu.figures.fig9_smoothing import causal_moving_average

    x = np.arange(10, dtype=np.float32)[:, None]
    out = causal_moving_average(x, window=3)
    assert out[0, 0] == 0
    assert out[1, 0] == pytest.approx(0.5)
    assert out[5, 0] == pytest.approx((3 + 4 + 5) / 3)


def test_compat_alias_module():
    from upgdm_tpu.eval import diffusion_model_uncertainy as compat

    assert hasattr(compat, "uncertainty_ews")
    assert hasattr(compat, "slbp_mpv_analysis")
    wins, tp = compat.build_sliding_windows(
        np.zeros((2, 30, 1), np.float32), np.arange(30.0), 10, 5
    )
    assert len(wins) == 5 and wins[0].shape == (2, 10, 1)


def test_graph_properties():
    from upgdm_tpu.data.graphs import graph_properties

    adj = np.zeros((5, 5))
    for i, j in [(0, 1), (1, 2), (0, 2), (3, 4)]:
        adj[i, j] = adj[j, i] = 1
    mask = np.ones(5, bool)
    assert graph_properties(adj, mask, "LCC") == 3.0
    assert graph_properties(adj, mask, "global_CC") == 1.0
    assert 0 < graph_properties(adj, mask, "density") < 1


def test_compute_local_slopes_matches_naive_polyfit():
    """Oracle check of the batched rolling OLS: per-window np.polyfit over the
    finite points, including windows with NaN gaps and degenerate-x windows."""
    import upgdm_tpu.figures.mpv_collapse as M

    rng = np.random.default_rng(3)
    t = np.cumsum(rng.uniform(0.5, 1.5, size=60))
    v = np.sin(t / 3.0) + rng.normal(scale=0.05, size=60)
    v[[7, 8, 20]] = np.nan           # gap windows take the masked path
    t2 = t.copy()
    t2[30:33] = t2[30]               # zero x-spread inside some windows is fine (denom>0 overall)

    W = 7
    times, slopes = M.compute_local_slopes(t2, v, W)
    exp_t, exp_s = [], []
    for end in range(W, len(v) + 1):
        x, y = t2[end - W:end], v[end - W:end]
        ok = np.isfinite(x) & np.isfinite(y)
        if ok.sum() < 3 or np.ptp(x[ok]) == 0:
            continue
        exp_t.append(t2[end - 1])
        exp_s.append(np.polyfit(x[ok], y[ok], 1)[0])
    np.testing.assert_allclose(times, exp_t)
    np.testing.assert_allclose(slopes, exp_s, rtol=1e-8)


def test_plot_fig1_smoke(tmp_path):
    """plot_fig1 renders synthetic signals end-to-end — derisks the plotting
    stage so a long TPU sweep cannot be wasted by a plot-layer bug."""
    from upgdm_tpu.figures.fig1_model_compare import plot_fig1
    from upgdm_tpu.figures.common import DATASETS, FIG1_MODELS

    rng = np.random.default_rng(0)
    fig_data = {}
    for ds in DATASETS:
        t = np.linspace(0.0, 100.0, 200)
        fig_data[ds] = {
            "raw": {"time": t, "mean": np.tanh((t - 60) / 5.0),
                    "transition_time": 60.0},
            "models": {
                m: {"time": t[::5], "ews": 1.0 + 0.1 * rng.normal(size=40),
                    "cache_path": "x", "sample_window_step": 5}
                for m in FIG1_MODELS
            },
        }
    png = plot_fig1(fig_data, list(FIG1_MODELS), tmp_path, "increase")
    assert png.exists() and png.stat().st_size > 10_000
    assert (tmp_path / "fig1_model_compare_increase.pdf").exists()


def test_fig1_partial_sidecar_signal(tmp_path):
    """`--allow-partial` fallback: an unfinished arm renders from its
    committed `.mpv.json` sidecar alone — no checkpoint binary, no device —
    with the time axis rebuilt by the sweep's own sampling/windowing."""
    import yaml

    from upgdm_tpu.figures.fig1_model_compare import arm_state, load_partial_signal
    from upgdm_tpu.utils.io import save_pt

    ews_root = tmp_path / "ews_results"
    model_dir = ews_root / "model_compare" / "NsDiff" / "biomass"
    model_dir.mkdir(parents=True)
    (model_dir / "model_trained.yaml").write_text(yaml.safe_dump({
        "dataset": {"windows": 16, "pred_len": 8, "sampling_t": 0.1},
        "net": {"task_model": "NsDiff"},
    }))
    t = np.arange(400, dtype=np.float64) * 0.1
    ys = np.cumsum(np.ones((400, 3), np.float32) * 0.01, axis=0)
    data_file = tmp_path / "biomass_dynamic_eta0.005r0.7_increase.pt"
    save_pt({"ts_dynamic": t, "ys_dynamic": ys}, data_file)

    cache_path, sidecar, complete = arm_state(ews_root, "NsDiff", "biomass", data_file)
    assert sidecar is None and not complete

    n_done, step = 10, 5
    json_path = cache_path.with_name(cache_path.name + ".mpv.json")
    json_path.write_text(json.dumps({
        "version": 1, "fingerprint": "x", "n_windows_total": 77,
        "n_windows_done": n_done, "sample_window_step": step,
        "pred_mean": list(np.linspace(1.0, 2.0, n_done)),
        "ews": list(np.linspace(0.5, 0.6, n_done)), "complete": False,
    }))
    _cp, sidecar, complete = arm_state(ews_root, "NsDiff", "biomass", data_file)
    assert sidecar is not None and not complete

    sig = load_partial_signal(ews_root, tmp_path, "NsDiff", "biomass", data_file)
    assert sig["partial"] == (n_done, 77)
    assert len(sig["time"]) == n_done and len(sig["ews"]) == n_done
    np.testing.assert_allclose(sig["ews"], np.linspace(0.5, 0.6, n_done))
    assert np.all(np.diff(sig["time"]) > 0)
    # window i ends at sampled index 15 + 5*i -> time 0.1 * that
    np.testing.assert_allclose(sig["time"], 0.1 * (15 + step * np.arange(n_done)))

    # a complete sidecar flips the arm to "no device work needed" and renders
    # the FULL curve device-free with no partial tag (trusted even when its
    # fingerprint lags a regenerated corpus — see load_partial_signal)
    json_path.write_text(json.dumps({
        "version": 1, "fingerprint": "x", "n_windows_total": 77,
        "n_windows_done": 77, "sample_window_step": step,
        "pred_mean": [1.0] * 77, "ews": [0.5] * 77, "complete": True,
    }))
    _cp, _sc, complete = arm_state(ews_root, "NsDiff", "biomass", data_file)
    assert complete
    sig = load_partial_signal(ews_root, tmp_path, "NsDiff", "biomass", data_file)
    assert "partial" not in sig
    assert len(sig["ews"]) == 77 and len(sig["time"]) == 77
