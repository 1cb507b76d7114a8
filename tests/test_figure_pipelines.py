"""Per-figure smoke tests: every paper-figure CLI runs end-to-end to a PNG
over a micro artifact tree (tiny SLBP/network data + tiny trained models laid
out in the reference ews_results conventions).  This is the VERDICT-r1 gap:
figure modules used to be import-tested only."""
import shutil
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

TT = "100.0"           # micro total_time tag used in slbp_source_path names
DV = ("1e-05", "5e-06")
W, P = 16, 8


def _slbp_record(seed, n=4000):
    rng = np.random.default_rng(seed)
    ys = (rng.normal(size=(n, 2)) * 0.05).astype(np.float32).cumsum(axis=0) + 1.0
    ys[3 * n // 4 :] += np.linspace(0, 3, n - 3 * n // 4, dtype=np.float32)[:, None]
    return {"ys_dynamic": ys, "ts_dynamic": (np.arange(n) * 0.1).astype(np.float32),
            "N_values": np.linspace(0, 3.5, n).astype(np.float32)}


def _train_slbp_model(select, task_model, seed=0, nf=2):
    from upgdm_tpu.train.loop import run_training

    rng = np.random.default_rng(seed)
    data = (rng.normal(size=(24, W + P, nf)) * 0.1).astype(np.float32).cumsum(axis=1)
    net = dict(
        dataset_nf=nf, windows=W, pred_len=P, rolling_length=4, diffusion_steps=5,
        scaler_type="StandardScaler", d_model=16, n_heads=2, e_layers=1, d_layers=1,
        d_ff=16, p_hidden_dims=[8, 8], p_hidden_layers=2, n_z_samples=4,
        parallel_sample=2, task_model=task_model,
    )
    import tempfile

    d = Path(tempfile.mkdtemp())
    run_training(
        data[:16], data[16:],
        dict(train_model_select=select, train_batch_size=8, val_batch_size=8,
             train_epochs=1, test_set=True, ckpt=False),
        net, {"loss_metric": "KL divergence"},
        dict(optimizer_name="Adam", lr=1e-3), d,
        dataset_param=dict(windows=W, pred_len=P, sampling_t=0.1),
    )
    return d / "trained_model"


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    """Micro dataset + ews_results tree in the reference layout."""
    from upgdm_tpu.figures.common import slbp_source_path
    from upgdm_tpu.utils.io import save_pt

    root = tmp_path_factory.mktemp("figtree")
    ds, ews = root / "dataset", root / "ews_results"

    # SLBP records for every (total, trend, D) the figures touch
    for trend in ("increase", "decrease"):
        for d in DV:
            save_pt(_slbp_record(hash((trend, d)) % 1000),
                    slbp_source_path(ds, TT, trend, d))

    # tiny trained models
    full = _train_slbp_model("NsDiff_model", "NsDiff")
    preg = _train_slbp_model("pretrain_g", "NsDiff")
    cvar = _train_slbp_model("cond_var", "NsDiff_model_variants")

    def install(src, target_dir, name="model_trained"):
        target_dir.mkdir(parents=True, exist_ok=True)
        shutil.copy(src / "model_trained", target_dir / name)
        shutil.copy(src / "model_trained.yaml", target_dir / f"{name}.yaml")

    # sensitivity banks (names keyed by reference patterns; yaml defines sizes)
    for bank, names in (
        ("NsDiff_pred", [f"dataset__w200p{p}st100" for p in (200, 500)]),
        ("NsDiff_windows", [f"dataset__w{w}p200st100" for w in (200, 500)]),
        ("NsDiff_trends", ["dataset__w200p200st100"]),
        ("NsDiff_machine/NsDiff", ["dataset_w200p200st100"]),
    ):
        for name in names:
            install(full, ews / bank / "models", name)
    install(preg, ews / "NsDiff_machine/preg/models", "dataset_w200p200st100")
    for folder in ("wo_gx", "wo_fx", "wo_UANS"):
        install(cvar, ews / "NsDiff_machine" / folder)
    for folder in ("D_0.001", "D_0.0001", "D_1e-05",
                   "D_0.001_N_0.5", "D_0.001_N_2.5", "D_0.001_N_5"):
        install(cvar, ews / "NsDiff_dataset_contant" / folder)
    for folder in ("1000000.0_radio_0.5_decrease", "1000000.0_radio_0.5_increase",
                   "1000000.0_N__radio_0.5_all"):
        install(cvar, ews / "NsDiff_dataset" / folder)

    # network data + models for figs 2/3 (tiny V under reference graph names)
    from upgdm_tpu.figures.common import dynamics_filename, graph_name

    uni = _train_slbp_model("NsDiff_model", "NsDiff", nf=1)
    rng = np.random.default_rng(0)
    for dyn, sampling_t in (("biomass", 10), ("neuronal", 10), ("SIS", 0.1)):
        interval = max(1, int(sampling_t / 0.1))
        n = (W + P + 40) * interval
        for gt in ("BA", "ER", "WS"):
            ys = (rng.normal(size=(n, 6)) * 0.05).astype(np.float32).cumsum(axis=0) + 1.0
            ys[2 * n // 3 :] += np.linspace(0, 2, n - 2 * n // 3, dtype=np.float32)[:, None]
            save_pt({"ys_dynamic": ys, "ts_dynamic": (np.arange(n) * 0.1).astype(np.float32),
                     "tp_values": np.linspace(0, 1, n).astype(np.float32)},
                    ds / f"spdata_sde_{dyn}" / graph_name(gt)
                    / dynamics_filename(dyn, "increase"))
        install(uni, ews / "ews_generalization/graph" / dyn)
        install(uni, ews / "ews_generalization/dynamic" / dyn)

    # empirical record + model for real_systems
    rec = _slbp_record(5, n=600)
    save_pt({"name": "demo_emp", "ys_dynamic": rec["ys_dynamic"][:, :1],
             "ts_dynamic": rec["ts_dynamic"], "transition_time": 45.0,
             "data_type": "demo"}, ds / "real_data/demo_emp.pt")
    install(uni, ews / "real_data/model/simulation")
    return root


def _base(tree, out):
    return ["--ews-root", str(tree / "ews_results"),
            "--source-root", str(tree / "dataset"), "--output-dir", str(out)]


def test_fig2(tree, tmp_path):
    from upgdm_tpu.figures import fig2_graph_generalization as M

    M.main(_base(tree, tmp_path) + ["--trend", "increase"])
    assert (tmp_path / "fig2_graph_generalization_increase.png").stat().st_size > 0


def test_fig3(tree, tmp_path):
    from upgdm_tpu.figures import fig3_dynamics_transfer as M

    M.main(_base(tree, tmp_path) + ["--trend", "increase"])
    pngs = list(tmp_path.glob("fig3*.png"))
    assert pngs and pngs[0].stat().st_size > 0


def test_fig4(tree, tmp_path):
    from upgdm_tpu.figures import fig4_model_sensitivity as M

    M.main(_base(tree, tmp_path) + ["--trend", "increase", "--total-time", TT,
                                    "--d-value", "1e-05",
                                    "--pred-lens", "200", "500",
                                    "--window-lens", "200", "500"])
    assert list(tmp_path.glob("fig4*.png"))


def test_fig5(tree, tmp_path):
    from upgdm_tpu.figures import fig5_tipping_types as M

    M.main(_base(tree, tmp_path) + ["--d-values", *DV,
                                    "--time-rows", f"{TT}:t1e2:10"])
    assert list(tmp_path.glob("fig5*.png"))


def test_fig6(tree, tmp_path):
    from upgdm_tpu.figures import fig6_slbp_model_analysis as M

    M.main(_base(tree, tmp_path) + ["--total-time", TT, "--d-value", "1e-05"])
    assert list(tmp_path.glob("fig6*.png"))


def test_fig7(tree, tmp_path):
    from upgdm_tpu.figures import fig7_train_analysis as M

    M.main(_base(tree, tmp_path) + ["--trend", "increase", "--total-time", TT,
                                    "--d-value", "1e-05"])
    assert list(tmp_path.glob("fig7*.png"))


def test_fig8(tree, tmp_path):
    from upgdm_tpu.figures import fig8_train_source as M

    M.main(_base(tree, tmp_path) + ["--total-time", TT, "--d-value", "1e-05",
                                    "--train-end", "200.0"])
    assert list(tmp_path.glob("fig8*.png"))


def test_fig9(tree, tmp_path):
    from upgdm_tpu.figures import fig9_smoothing as M

    M.main(_base(tree, tmp_path) + ["--trend", "increase", "--total-time", TT,
                                    "--noises", *DV])
    assert list(tmp_path.glob("fig9*.png"))


def test_real_systems(tree, tmp_path):
    from upgdm_tpu.figures import real_systems as M

    M.main([
        "--data-real-names", "demo_emp", "--output-dir", str(tmp_path),
        "--data-root", str(tree / "dataset/real_data"),
        "--real-data-result-root", str(tree / "ews_results/real_data"),
        "--bury-prob-root", str(tree / "ews_results/bury_2021_ml_probs"),
        "--model-dir", str(tree / "ews_results/real_data/model/simulation"),
        "--signals", "model_uncertainty", "model_trend", "ar1", "variance",
    ])
    assert (tmp_path / "real_systems_figure.png").stat().st_size > 0
