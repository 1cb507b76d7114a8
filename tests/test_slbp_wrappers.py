"""End-to-end coverage of the SLBP analysis wrappers against a trained tiny
model laid out in the reference's models/<name>(+.yaml) convention."""
import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.slow

MODEL_NAME = "dataset_w16p8st0.1"


@pytest.fixture(scope="module")
def model_root(tmp_path_factory):
    from upgdm_tpu.train.loop import run_training
    from upgdm_tpu.utils.io import save_config_yaml

    root = tmp_path_factory.mktemp("slbp_models")
    rng = np.random.default_rng(0)
    data = (rng.normal(size=(40, 24, 2)) * 0.1).astype(np.float32).cumsum(axis=1)
    net_param = dict(
        dataset_nf=2, windows=16, pred_len=8, rolling_length=4, diffusion_steps=5,
        scaler_type="StandardScaler", d_model=16, n_heads=2, e_layers=1, d_layers=1,
        d_ff=16, p_hidden_dims=[8, 8], p_hidden_layers=2, n_z_samples=6,
        parallel_sample=3, task_model="NsDiff",
    )
    dataset_param = dict(windows=16, pred_len=8, sampling_t=0.1)
    run_training(
        data[:32], data[32:],
        dict(train_model_select="NsDiff_model", train_batch_size=16, val_batch_size=8,
             train_epochs=1, test_set=False, ckpt=False),
        net_param, {}, dict(optimizer_name="Adam", lr=1e-3), root / "tmp",
        dataset_param=dataset_param,
    )
    (root / "models").mkdir()
    shutil.copy(root / "tmp/trained_model/model_trained", root / "models" / MODEL_NAME)
    save_config_yaml(
        root / "models" / f"{MODEL_NAME}.yaml",
        {"dataset": dataset_param, "train": {"train_model_select": "NsDiff_model"},
         "net": net_param},
    )
    return root


@pytest.fixture(scope="module")
def slbp_series():
    rng = np.random.default_rng(1)
    series = (rng.normal(size=(150, 2)) * 0.1).astype(np.float32).cumsum(axis=0)
    tdata = np.arange(150, dtype=np.float64) * 0.1
    return series, tdata


def test_slbp_sensitivity_ews(model_root, slbp_series):
    from upgdm_tpu.eval.uncertainty import slbp_sensitivity_ews

    series, tdata = slbp_series
    res = slbp_sensitivity_ews(
        model_root, MODEL_NAME, series, tdata, data_trend="increase",
        sample_window_step=20,
    )
    assert len(res["mpv"]) > 0
    assert len(res["prediction_error"]) > 0
    assert all(np.isfinite(res["mpv"]))
    assert (model_root / "datas").exists()


def test_slbp_sampling_and_gx_analysis(model_root, slbp_series):
    from upgdm_tpu.eval.uncertainty import slbp_gx_analysis, slbp_sampling_analysis

    series, tdata = slbp_series
    res = slbp_sampling_analysis(
        model_root, MODEL_NAME, series, tdata, data_trend="increase",
        sample_window_step=25, allow_unavailable=False,
    )
    assert res["available"]
    assert len(res["mpv"]) == len(res["intrinsic_dimension"])
    assert all(np.isfinite(res["mpv"]))

    gx = slbp_gx_analysis(
        model_root, MODEL_NAME, series, tdata, data_trend="increase",
        sample_window_step=25,
    )
    assert len(gx["gx_mpv"]) == len(res["mpv"])
    assert all(np.isfinite(gx["gx_mpv"]))


def test_slbp_mpv_and_direct_cache_analysis(model_root, slbp_series, tmp_path):
    from upgdm_tpu.eval.uncertainty import (
        slbp_direct_model_cache_analysis,
        slbp_mpv_analysis,
    )
    from upgdm_tpu.utils.io import save_config_yaml

    series, tdata = slbp_series
    res = slbp_mpv_analysis(
        model_root, MODEL_NAME, series, tdata, cache_path=tmp_path / "fig5.pt",
        sample_window_step=30,
    )
    assert res["uncertainty_source"] == "sampling"
    # cache-hit path re-summarises with inferred step
    res2 = slbp_mpv_analysis(
        model_root, MODEL_NAME, series, tdata, cache_path=tmp_path / "fig5.pt",
        sample_window_step=30,
    )
    np.testing.assert_allclose(res2["mpv"], res["mpv"], rtol=1e-6)

    # direct model-dir form (fig7/fig8): model_trained + yaml in one dir
    model_dir = tmp_path / "direct"
    model_dir.mkdir()
    import shutil

    shutil.copy(model_root / "models" / MODEL_NAME, model_dir / "model_trained")
    import yaml

    cfg = yaml.safe_load((model_root / "models" / f"{MODEL_NAME}.yaml").read_text())
    save_config_yaml(model_dir / "model_trained.yaml", cfg)
    direct = slbp_direct_model_cache_analysis(
        model_dir, series, tdata, cache_path=tmp_path / "direct_gx.pt",
        sample_window_step=30, cache_kind="gx",
    )
    assert direct["uncertainty_source"] == "gx"
    assert len(direct["mpv"]) > 0
    sampling = slbp_direct_model_cache_analysis(
        model_dir, series, tdata, cache_path=tmp_path / "fig5.pt",
        sample_window_step=30, cache_kind="sampling", compute_prediction_error=True,
    )
    assert sampling["uncertainty_source"] == "sampling"
    assert "prediction_error" in sampling
