"""wv_sigma / wv_sigma_trailing vs a direct numpy reference; window builders."""
import numpy as np
import pytest

from upgdm_tpu.ops import rolling as R
from upgdm_tpu.ops import windows as W


def np_wv_sigma(x, w):
    # spec of sigma.py:5-31 (centered, replicate pad, population variance)
    B, T, N = x.shape
    if w % 2 == 0:
        pl, pr = w // 2, w // 2 - 1
    else:
        pl = pr = w // 2
    xp = np.concatenate([np.repeat(x[:, :1], pl, 1), x, np.repeat(x[:, -1:], pr, 1)], axis=1)
    out = np.zeros_like(x)
    for t in range(T):
        out[:, t] = xp[:, t : t + w].var(axis=1)
    return out


def np_wv_sigma_trailing(x, w, discard_rep=False):
    # spec of sigma.py:34-72
    B, T, N = x.shape
    if not discard_rep:
        x = np.concatenate([np.repeat(x[:, :1], w - 1, 1), x], axis=1)
    n = x.shape[1] - w + 1
    out = np.zeros((B, n, N), dtype=x.dtype)
    for t in range(n):
        out[:, t] = x[:, t : t + w].var(axis=1)
    return out


@pytest.mark.parametrize("w", [1, 2, 5, 24, 50])
def test_wv_sigma(rng, w):
    x = rng.normal(size=(3, 60, 4)).astype(np.float32)
    got = np.asarray(R.wv_sigma(x, w))
    want = np_wv_sigma(x, w)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("w", [1, 2, 5, 24])
@pytest.mark.parametrize("discard", [False, True])
def test_wv_sigma_trailing(rng, w, discard):
    x = rng.normal(size=(2, 40, 3)).astype(np.float32)
    got = np.asarray(R.wv_sigma_trailing(x, w, discard_rep=discard))
    want = np_wv_sigma_trailing(x, w, discard_rep=discard)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_window_variance_1d(rng):
    x = rng.normal(size=(200,)).astype(np.float32)
    got = np.asarray(R.window_variance_1d(x, 50, 10))
    n = (200 - 50) // 10 + 1
    want = np.array([x[i * 10 : i * 10 + 50].var() for i in range(n)])
    np.testing.assert_allclose(got, want, atol=1e-5)


# ---------------------------------------------------------------------------


def test_normalize_time_series_network():
    x = np.arange(12, dtype=np.float32).reshape(4, 3)  # [T=4, Node=3]
    out = W.normalize_time_series(x, "SIS")
    assert out.shape == (3, 4, 1)
    np.testing.assert_allclose(out[:, :, 0], x.T)


def test_normalize_time_series_slbp():
    x = np.arange(12, dtype=np.float32).reshape(6, 2)  # [T, F]
    out = W.normalize_time_series(x, "SLBP")
    assert out.shape == (1, 6, 2)


def test_sampling_interval():
    assert W.sampling_interval_from_t(None) == 1
    assert W.sampling_interval_from_t(0.1) == 1
    assert W.sampling_interval_from_t(10) == 100
    assert W.sampling_interval_from_t(100) == 1000


def test_sliding_windows_shapes_and_times():
    T, node, F, w, step = 100, 5, 1, 20, 7
    series = np.random.default_rng(1).normal(size=(node, T, F)).astype(np.float32)
    tdata = np.arange(T) * 0.5
    wins, tp = W.sliding_windows(series, tdata, w, step)
    n = (T - w) // step + 1
    assert wins.shape == (n, node, w, F)
    np.testing.assert_allclose(tp, tdata[w - 1 :: step][:n])
    # window contents
    np.testing.assert_allclose(wins[2, 3], series[3, 2 * step : 2 * step + w])


def test_infer_sample_window_step_roundtrip():
    for L, w, step in [(1000, 100, 5), (1000, 100, 50), (3000, 200, 10), (500, 200, 13)]:
        n = W.sliding_window_count(L, w, step)
        got = W.infer_sample_window_step_from_cache(L, w, n, fallback_step=999)
        assert W.sliding_window_count(L, w, got) == n


def test_infer_sample_window_step_prefers_fallback():
    # if fallback already matches, keep it
    assert W.infer_sample_window_step_from_cache(1000, 100, W.sliding_window_count(1000, 100, 5), 5) == 5
    # degenerate cases fall back
    assert W.infer_sample_window_step_from_cache(50, 100, 7, 3) == 3
    assert W.infer_sample_window_step_from_cache(1000, 100, 0, 3) == 3
    assert W.infer_sample_window_step_from_cache(1000, 100, 1, 3) == 3


def test_slbp_sensitivity_windows():
    T, F = 1000, 2
    series = np.random.default_rng(2).normal(size=(T, F)).astype(np.float32)
    tdata = np.arange(T, dtype=np.float64)
    inp, pred, tp = W.slbp_sensitivity_windows(series, tdata, 200, 200, sampling_t=0.1, sample_window_step=10)
    n = (T - 200) // 10 + 1
    assert inp.shape == (n, 200, F)
    m = (T - 200 - 200) // 10 + 1
    assert pred.shape == (m, 200, F)
    np.testing.assert_allclose(tp, tdata[199::10][:n])
    np.testing.assert_allclose(inp[1], series[10:210])
    np.testing.assert_allclose(pred[0], series[200:400])
