"""Argmin-lead bootstrap (benchmarks/neuronal_argmin_bootstrap.py): the
device-free sign-stability measurement behind NEURONAL_LEAD_NOTE.md §5.

Synthetic contract: on a near-flat curve the block bootstrap scatters the
argmin (wide lead quantiles, sign not pinned); on a curve with a sharp
pre-transition dip the argmin stays pinned at the dip.  Metric spec:
reference mpv_collapse_summary.py:313-369 (lead = transition - argmin t).
"""
import numpy as np

from benchmarks.neuronal_argmin_bootstrap import (
    bootstrap_sign,
    moving_average_trend,
)


def test_moving_average_trend_preserves_length_and_level():
    y = np.linspace(1.0, 2.0, 101)
    tr = moving_average_trend(y, 15)
    assert tr.shape == y.shape
    assert abs(tr[50] - y[50]) < 1e-6  # interior of a linear ramp is exact


def _run(curve, transition_time, seed=7):
    import benchmarks.neuronal_argmin_bootstrap as M

    old_b = M.B
    M.B = 300  # keep the test fast; quantiles are coarse but signs stable
    try:
        return bootstrap_sign(curve, step=5, sampling_t=10.0, windows=100,
                              transition_time=transition_time, seed=seed)
    finally:
        M.B = old_b


def test_flat_curve_argmin_scatters():
    rng = np.random.default_rng(0)
    curve = 1.0 + 0.001 * rng.normal(size=181)  # flat + noise
    res = _run(curve, transition_time=8000.0)
    spread = res["block"]["lead_q90"] - res["block"]["lead_q10"]
    assert spread > 2000.0  # argmin wanders over a large span
    assert 0.05 < res["block"]["p_lead_positive"] < 1.0


def test_deep_dip_argmin_pinned():
    rng = np.random.default_rng(1)
    curve = 1.0 + 0.001 * rng.normal(size=181)
    # smooth collapse centered on window 120 (wider than the MA window, so
    # it lives in the TREND, not the residual the bootstrap resamples)
    curve -= 0.5 * np.exp(-0.5 * ((np.arange(181) - 120) / 12.0) ** 2)
    res = _run(curve, transition_time=8000.0)
    # window 120 ends at t = (99 + 5*120)*10 = 6990 -> lead = +1010
    assert res["iid"]["p_lead_positive"] == 1.0
    assert abs(res["iid"]["lead_median"] - 1010.0) < 400.0
    assert res["block"]["p_lead_positive"] > 0.9
    spread = res["block"]["lead_q90"] - res["block"]["lead_q10"]
    assert spread < 1500.0  # argmin stays in the collapse
