"""Tests for the model-independent MPV lead-time oracle (VERDICT r3 item 2).

The oracle's numpy trailing variance must match the framework's
ops/rolling.py::wv_sigma_trailing (the g training target, ref sigma.py:34-72),
and the lead metric must behave as documented on synthetic MPV shapes.
"""
import numpy as np
import pytest

from benchmarks.neuronal_lead_oracle import _trailing_var, oracle_mpv_for_file
from upgdm_tpu.figures.mpv_collapse import metric_row_from_mpv
from upgdm_tpu.ops.rolling import wv_sigma_trailing


def test_trailing_var_matches_wv_sigma_trailing():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(240, 3)).astype(np.float64)
    got = _trailing_var(x, 50)
    want = np.asarray(wv_sigma_trailing(x[None], 50)[0])
    # Compare past the replicate-padded head (the only region the oracle
    # reads); inside it the fp32 E[x^2]-E[x]^2 cancellation dominates.
    np.testing.assert_allclose(got[50:], want[50:], rtol=1e-4, atol=1e-6)


def test_trailing_var_window_edge():
    x = np.linspace(0.0, 1.0, 60)[:, None]
    got = _trailing_var(x, 5)
    assert got.shape == x.shape
    # Replicate-padded head: first position sees a constant window.
    assert got[0, 0] == pytest.approx(0.0, abs=1e-12)
    # Interior: variance of 5 consecutive equally-spaced points.
    step = x[1, 0] - x[0, 0]
    np.testing.assert_allclose(got[10, 0], np.var(x[6:11, 0]), atol=1e-12)
    assert got[10, 0] == pytest.approx(2.0 * step**2, rel=1e-6)


def test_lead_metric_sign_convention():
    """lead_time = transition_time - global argmin time (ref :353)."""
    t = np.arange(100, dtype=float)
    mpv = np.ones(100)
    mpv[30] = 0.1  # pre-transition global min -> positive lead
    row = metric_row_from_mpv(t, mpv, transition_time=50.0)
    assert row["lead_time"] == pytest.approx(20.0)
    mpv2 = np.ones(100)
    mpv2[80] = 0.1  # post-transition global min -> negative lead
    row2 = metric_row_from_mpv(t, mpv2, transition_time=50.0)
    assert row2["lead_time"] == pytest.approx(-30.0)


def test_oracle_on_synthetic_file(tmp_path):
    """Oracle on a variance-ramp series: argmin of the g target lands where
    the injected noise amplitude is smallest."""
    import torch

    rng = np.random.default_rng(1)
    T, N = 60000, 4
    ts = np.arange(T) * 0.1
    # Noise amplitude decays to a minimum at 60% then recovers.
    amp = 1.0 + 0.9 * np.abs(np.linspace(-0.6, 0.4, T))[:, None]
    ys = rng.normal(size=(T, N)) * amp
    f = tmp_path / "neuronal_dynamic_eta0.01tau2.0_increase.pt"
    torch.save({"ys_dynamic": torch.tensor(ys), "ts_dynamic": torch.tensor(ts)}, f)
    tpts, mpv = oracle_mpv_for_file(f, "neuronal")
    assert len(tpts) == len(mpv) > 10
    t_min = tpts[int(np.argmin(mpv))]
    assert 0.5 * ts[-1] < t_min < 0.75 * ts[-1]
    # Causal variant: same argmin location (the amplitude ramp is symmetric
    # in time), shifted at most one window later; warm-up positions must not
    # plant a spurious minimum at the first scan point.
    ctpts, cmpv = oracle_mpv_for_file(f, "neuronal", causal=True)
    assert len(ctpts) == len(cmpv) == len(tpts)
    ct_min = ctpts[int(np.argmin(cmpv))]
    assert 0.5 * ts[-1] < ct_min < 0.85 * ts[-1]
    assert int(np.argmin(cmpv)) != 0
