"""SDE simulators: shapes, record contracts, stationarity sanity, retry guard."""
import numpy as np
import pytest

from upgdm_tpu.data import sde
from upgdm_tpu.data.graphs import generate_network


def test_slbp_record_contract():
    rec = sde.simulate_slbp(total_time=50.0, burn_time=5.0, dt=0.1, seed=0)
    assert set(rec) == {"ys_dynamic", "ts_dynamic", "N_values"}
    T = int(50.0 / 0.1)
    assert rec["ys_dynamic"].shape == (T, 2)
    assert rec["ts_dynamic"].shape == (T,)
    assert rec["N_values"].shape == (T,)
    assert np.isfinite(rec["ys_dynamic"]).all()
    # increase trend ramps N from 0 to 3.5
    assert rec["N_values"][0] == pytest.approx(0.0, abs=1e-3)
    assert rec["N_values"][-1] == pytest.approx(3.5, rel=1e-2)


def test_slbp_decrease_and_constant():
    rec = sde.simulate_slbp(total_time=20.0, burn_time=0.0, dt=0.1, trend="decrease")
    assert rec["N_values"][0] > rec["N_values"][-1]
    rec2 = sde.simulate_slbp(total_time=20.0, burn_time=0.0, dt=0.1, constant_n=1.5)
    np.testing.assert_allclose(rec2["N_values"], 1.5)


@pytest.mark.parametrize("system", ["SIS", "biomass", "neuronal"])
def test_network_systems(system):
    graph = generate_network("BA", 10, m=2, seed=0)
    ranges = {"SIS": (1e-4, 0.3), "biomass": (0.0, 2.0), "neuronal": (0.0, 0.8)}
    rec = sde.simulate_network_system(
        system, graph.adj, total_time=50.0, burn_time=5.0, dt=0.1, seed=1,
        control_range=ranges[system],
    )
    T = int(50.0 / 0.1)
    assert rec["ys_dynamic"].shape == (T, 10)
    assert rec["tp_values"].shape == (T,)
    assert np.isfinite(rec["ys_dynamic"]).all()
    assert -10.0 < rec["ys_dynamic"].mean() < 100.0


def test_save_every_decimation():
    rec = sde.simulate_slbp(total_time=40.0, burn_time=0.0, dt=0.1, save_every=4)
    assert rec["ys_dynamic"].shape[0] == int(40.0 / 0.1) // 4
    assert rec["ts_dynamic"].shape[0] == rec["ys_dynamic"].shape[0]


def test_divergence_guard_rejects_partial_nan(monkeypatch):
    """A trajectory that diverges PART-way (finite head, NaN tail) must be
    retried, not accepted: the guard checks the per-timestep node-mean over
    the whole trajectory (ref spdata_sde_biomass_dynamic_gene.py:146), so a
    NaN-tolerant global mean that ignores the diverged tail is a bug the
    zoo corpus actually hit (11/360 SIS records shipped 50-80% NaN)."""
    graph = generate_network("BA", 6, m=2, seed=0)
    T = 100
    calls = {"n": 0}
    real = sde.simulate_sde

    def fake_simulate_sde(*args, **kwargs):
        calls["n"] += 1
        ts, ys, eps = real(*args, **kwargs)
        if calls["n"] == 1:  # first attempt: finite head, diverged tail
            ys = np.asarray(ys).copy()
            ys[T // 2:] = np.nan
        return ts, ys, eps

    monkeypatch.setattr(sde, "simulate_sde", fake_simulate_sde)
    rec = sde.simulate_network_system(
        "SIS", graph.adj, total_time=10.0, burn_time=1.0, dt=0.1, seed=3,
        control_range=(1e-4, 0.3),
    )
    assert calls["n"] == 2  # attempt 0 rejected, attempt 1 accepted
    assert np.isfinite(rec["ys_dynamic"]).all()

    # per-timestep bound: one excursion beyond 100 anywhere must retry too
    calls["n"] = 0

    def fake_excursion(*args, **kwargs):
        calls["n"] += 1
        ts, ys, eps = real(*args, **kwargs)
        if calls["n"] == 1:
            ys = np.asarray(ys).copy()
            ys[T // 3] = 500.0
        return ts, ys, eps

    monkeypatch.setattr(sde, "simulate_sde", fake_excursion)
    rec = sde.simulate_network_system(
        "SIS", graph.adj, total_time=10.0, burn_time=1.0, dt=0.1, seed=3,
        control_range=(1e-4, 0.3),
    )
    assert calls["n"] == 2
    assert np.isfinite(rec["ys_dynamic"]).all()


def test_determinism():
    a = sde.simulate_slbp(total_time=10.0, burn_time=0.0, dt=0.1, seed=7)
    b = sde.simulate_slbp(total_time=10.0, burn_time=0.0, dt=0.1, seed=7)
    np.testing.assert_array_equal(a["ys_dynamic"], b["ys_dynamic"])
