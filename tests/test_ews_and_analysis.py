"""Classic EWS indicators, detrending, and the real-data helpers."""
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from upgdm_tpu.eval import ews_classic as E


def test_gaussian_detrend_removes_trend(rng):
    t = np.linspace(0, 10, 400)
    trend = 3 * t
    noise = rng.normal(size=400) * 0.1
    res = E.detrend(trend + noise, method="Gaussian", bandwidth=0.2)
    # gaussian smoothing tracks a linear trend exactly away from the
    # boundaries (reflect-mode edge bias is inherent to the method)
    interior = res[100:-100]
    assert abs(interior.mean()) < 0.2
    assert interior.std() < 0.5


def test_lowess_detrend_removes_trend(rng):
    t = np.linspace(0, 10, 200)
    y = np.sin(t * 0.2) * 5 + rng.normal(size=200) * 0.1
    res = E.detrend(y, method="Lowess", span=0.3)
    assert res.std() < 1.0


def test_rolling_variance_detects_increase(rng):
    # variance ramps up -> indicator increases
    n = 400
    scale = np.linspace(0.1, 2.0, n)
    y = rng.normal(size=n) * scale
    v = E.rolling_variance(y, rolling_window=0.25)
    valid = v[~np.isnan(v)]
    assert valid[-1] > valid[0] * 3


def test_rolling_ar1_detects_correlation(rng):
    n = 600
    white = rng.normal(size=n)
    red = np.zeros(n)
    for i in range(1, n):
        red[i] = 0.95 * red[i - 1] + rng.normal() * 0.1
    ar_white = E.rolling_ar1(white, 0.5)
    ar_red = E.rolling_ar1(red, 0.5)
    assert np.nanmean(ar_red) > 0.7
    assert abs(np.nanmean(ar_white)) < 0.3


def test_sample_entropy_orders_regular_vs_random(rng):
    regular = np.sin(np.linspace(0, 20 * np.pi, 300))
    random = rng.normal(size=300)
    se_reg = E._sample_entropy(regular)
    se_rand = E._sample_entropy(random)
    assert se_reg < se_rand


def test_compute_classic_ews_contract(rng):
    t = np.arange(300, dtype=float)
    y = rng.normal(size=300)
    out = E.compute_classic_ews(t, y, method="Gaussian", rolling_window=0.5)
    assert set(out) == {"variance", "ar1", "sample-entropy-1"}
    for s in out.values():
        assert isinstance(s, pd.Series)
        assert len(s) == 300
        np.testing.assert_array_equal(s.index.to_numpy(), t)


def test_variance_trend_slope_sign():
    t = np.arange(100, dtype=float)
    rising = t * 0.01
    tt, tv = E.compute_variance_trend(t, rising, trend_window=40)
    assert len(tv) == 100 - 40 + 1
    assert (tv > 0).all()


def test_normalize_by_head_mean():
    v = np.array([2.0, 2.0, 4.0, 8.0])
    out = E.normalize_by_head_mean(v, head_points=2)
    np.testing.assert_allclose(out, [1, 1, 2, 4])


# ---------------------------------------------------------------------------


def test_real_data_record_helpers(tmp_path):
    from upgdm_tpu.eval import real_data as R

    rec = {
        "ys_dynamic": np.random.default_rng(0).normal(size=(50, 2)).astype(np.float32),
        "ts_dynamic": np.arange(50, dtype=np.float32),
        "transition_index": 30,
    }
    assert R.get_transition_time_from_record(rec) == 30.0
    rec2, interp = R.ensure_min_time_points_linear_interp(dict(rec), min_sampled_points=200)
    assert interp
    assert rec2["ys_dynamic"].shape[0] >= 200
    assert "transition_time" in rec2
    # raw passthrough
    rec3, interp3 = R.ensure_min_time_points_linear_interp(dict(rec), min_sampled_points=10)
    assert not interp3


def test_infer_model_times():
    from upgdm_tpu.eval.real_data import infer_model_times

    times = infer_model_times(np.arange(100, dtype=float), num_values=5,
                              sample_window_step=10, sampling_t=0.1, model_window=20)
    np.testing.assert_allclose(times, np.arange(100.0)[19::10][:5])


@pytest.mark.slow
def test_bury_classifier_loader_and_inc(tmp_path, rng):
    tf = pytest.importorskip("tensorflow")
    from upgdm_tpu.eval.bury import DEFAULT_MODEL_ROOT, apply_bury_classifiers, load_classifiers

    # the released classifier binaries are vendored with the repo
    classifiers = load_classifiers(DEFAULT_MODEL_ROOT, 500, max_models=1)
    assert len(classifiers) == 1
    series = pd.Series(rng.normal(size=120), index=np.arange(120, dtype=float))
    table = apply_bury_classifiers(series, classifiers, inc_points=40, classifier_len=500)
    assert list(table.columns) == ["time", "fold_prob", "hopf_prob", "branch_prob",
                                   "null_prob", "transition_prob"]
    assert len(table) == 3
    probs = table[["fold_prob", "hopf_prob", "branch_prob", "null_prob"]].to_numpy()
    assert ((probs >= 0) & (probs <= 1)).all()
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=0.05)
