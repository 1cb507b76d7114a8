"""Round-4 guards: bench regression floor, two-trend zoo figure jobs,
probe timeouts sized above the measured TPU cold start."""
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "examples"))


def test_bench_regression_gate():
    """bench_result flags (and main exits nonzero on) sub-floor throughput so
    refactors can't silently give back the measured 117-119k windows/hr."""
    import bench

    ok = bench.bench_result(118_000.0, 205.0)
    assert ok["regression"] is False
    assert ok["unit"] == "windows/hr" and ok["vs_baseline"] > 500

    bad = bench.bench_result(bench.REGRESSION_FLOOR_WINDOWS_HR - 1, 205.0)
    assert bad["regression"] is True
    # the floor leaves honest headroom below the measured band
    assert 100_000 <= bench.REGRESSION_FLOOR_WINDOWS_HR <= 117_000


def test_probe_timeouts_cover_cold_start():
    """Accelerator probes must outlast the measured ~10 min (600 s) cold
    start: a probe killed mid-grant leaves a stale session grant that blocks
    the next probe (ADVICE round 3)."""
    import inspect

    import bench
    import reference_zoo as Z

    for fn in (bench.wait_for_accelerator, Z._wait_for_tpu):
        sig = inspect.signature(fn)
        assert sig.parameters["probe_timeout"].default > 600, fn


def test_neuronal_params_match_reference_generator():
    """Zoo + CLI neuronal physics must match the reference generator
    (spdata_sde_neuronal_dynamic_gene.py:268-273: tau 2.0 grid head, mu=1.5,
    eta 1e-2): mu=3.0 kills the bistability — sigmoid coupling never ignites,
    no transition exists, and MPV collapse has nothing to detect (the
    round-3 neuronal weakness)."""
    import reference_zoo as Z
    from upgdm_tpu.data.generate import _SYSTEM_DEFAULTS

    for cfg in (Z.SYSTEMS["neuronal"], _SYSTEM_DEFAULTS["neuronal"]):
        assert cfg["base_params"]["mu"] == 1.5
        assert cfg["base_params"]["tau"] == 2.0
        assert cfg["eta"] == 0.01


def test_neuronal_mu15_transitions():
    """With mu=1.5 the neuronal system starts on the high-activity branch and
    tips to the low state inside the eps in (0,1) ramp (increase trend)."""
    import networkx as nx
    import numpy as np

    from upgdm_tpu.data.sde import simulate_network_system

    adj = nx.to_numpy_array(nx.barabasi_albert_graph(20, 3, seed=0))
    rec = simulate_network_system(
        "neuronal", adj, trend="increase", control_range=(0.0, 1.0),
        base_params={"tau": 2.0, "mu": 1.5}, eta=0.01,
        total_time=2000.0, burn_time=100.0, dt=0.1, seed=3, save_every=10)
    m = np.asarray(rec["ys_dynamic"]).mean(axis=1)
    assert m[:50].mean() > 2.0, "high-activity branch not reached after burn-in"
    assert m[-50:].mean() < 0.5, "no collapse to the low state before eps=1"


def test_load_model_from_dir_cache(tmp_path):
    """Repeat loads of the same checkpoint return the SAME model object
    (weights + jit caches shared across a corpus sweep); a touched
    checkpoint or different infer_params misses; config dicts are copies."""
    import os

    import upgdm_tpu.eval.uncertainty as U

    src = REPO / "demo_artifacts/model"
    if not (src / "model_trained").exists():
        import pytest

        pytest.skip("demo_artifacts fixture not present")
    m1, np1 = U.load_model_from_dir(src)
    m2, np2 = U.load_model_from_dir(src)
    assert m1 is m2
    assert np1 == np2 and np1 is not np2
    np1["windows"] = -99  # caller mutation must not poison the cache
    _, np3 = U.load_model_from_dir(src)
    assert np3["windows"] != -99
    m4, _ = U.load_model_from_dir(src, infer_params={"n_z_samples": 7})
    assert m4 is not m1
    # touching the checkpoint invalidates
    os.utime(src / "model_trained")
    m5, _ = U.load_model_from_dir(src)
    assert m5 is not m1


def test_bury_sim_corpus_properties(tmp_path):
    """Bury-protocol training series: standardized residuals, deterministic
    resume, forced runs show rising variance toward the tip."""
    import numpy as np

    from upgdm_tpu.data.bury_sim import generate_bury_training_corpus
    from upgdm_tpu.utils.io import load_pt

    paths = generate_bury_training_corpus(tmp_path, n_series=6, seed=1)
    assert len(paths) == 6
    rec = load_pt(paths[0])
    ys = np.asarray(rec["ys_dynamic"])
    assert ys.shape == (500, 1) and np.isfinite(ys).all()
    assert abs(ys.std() - 1.0) < 1e-3
    # resume keeps names and is a no-op on existing files
    again = generate_bury_training_corpus(tmp_path, n_series=6, seed=1)
    assert [p.name for p in again] == [p.name for p in paths]


def test_zoo_real_chain_tiny(tmp_path):
    """The zoo 'real' stage end-to-end at tiny dims: bury-sim corpus ->
    simulation NsDiff -> bury classifier probs -> real-systems composite
    (real_systems_experiment.py + run_bury_ml_baseline.py surfaces)."""
    import numpy as np

    import reference_zoo as Z
    from upgdm_tpu.data.sde import simulate_slbp
    from upgdm_tpu.figures.common import slbp_source_path
    from upgdm_tpu.utils.io import save_pt

    saved = {k: getattr(Z, k) for k in
             ("REF_NET", "SLBP_TOTAL", "N_BURY_SERIES", "BURY_MAX_MODELS")}
    try:
        Z.REF_NET = dict(Z.REF_NET, d_model=16, n_heads=2, e_layers=1,
                         d_layers=1, d_ff=16, p_hidden_dims=[8, 8],
                         n_z_samples=4, parallel_sample=2)
        Z.SLBP_TOTAL = "40000.0"
        Z.N_BURY_SERIES = 6
        Z.BURY_MAX_MODELS = 2
        rec = simulate_slbp(params={"D": 1e-05}, trend="increase",
                            total_time=40000.0, burn_time=100.0, dt=0.1,
                            seed=0, save_every=10)
        save_pt(rec, slbp_source_path(tmp_path / "dataset", Z.SLBP_TOTAL,
                                      "increase", Z.SLBP_D))
        Z.gen_real_data(tmp_path)
        for name in Z.REAL_DATA_NAMES:
            assert (tmp_path / "dataset/real_data" / f"{name}.pt").exists()
        Z.train_real_model(tmp_path, epochs=1)
        model_dir = tmp_path / "ews_results/real_data/model/simulation"
        assert (model_dir / "model_trained").exists()
        Z.run_real_chain(tmp_path)
        probs = list((tmp_path / "ews_results/bury_2021_ml_probs").rglob(
            "*_bury_ml_probs.csv"))
        assert len(probs) == len(Z.REAL_DATA_NAMES)
        fig = tmp_path / "figures/real_systems_figure.png"
        assert fig.exists() and fig.stat().st_size > 0
    finally:
        for k, v in saved.items():
            setattr(Z, k, v)


def test_zoo_figure_jobs_render_both_trends(tmp_path):
    """figs 2/3/7 (and fig4 once its tree exists) schedule one render per
    trend, matching the reference CLIs' two-trend contract
    (paper_figures/common.py:24-28)."""
    import reference_zoo as Z

    jobs = Z.figure_jobs(tmp_path)

    def trends_of(stem):
        return sorted(
            a[a.index("--trend") + 1]
            for m, a in jobs if stem in m and "--trend" in a
        )

    for stem in ("fig2", "fig3", "fig7"):
        assert trends_of(stem) == ["decrease", "increase"], stem

    pred = tmp_path / "ews_results" / "NsDiff_pred" / "models"
    pred.mkdir(parents=True)
    (pred / "dataset__w200p1000st100").write_bytes(b"ckpt")
    jobs = Z.figure_jobs(tmp_path)
    assert trends_of("fig4") == ["decrease", "increase"]
