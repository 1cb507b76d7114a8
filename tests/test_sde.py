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


def test_determinism():
    a = sde.simulate_slbp(total_time=10.0, burn_time=0.0, dt=0.1, seed=7)
    b = sde.simulate_slbp(total_time=10.0, burn_time=0.0, dt=0.1, seed=7)
    np.testing.assert_array_equal(a["ys_dynamic"], b["ys_dynamic"])
