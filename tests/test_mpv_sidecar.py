"""MPV summary sidecars (`<cache>.pt.mpv.json`): durable per-arm MPV
summaries that survive the loss of the (gitignored, multi-GB) sample-ensemble
caches — a fresh machine re-renders figures from committed sidecars with no
checkpoint and no TPU, and a half-finished sweep resumes at the MPV level.

TPU-extra on top of the reference cache contract (the reference keeps only
the ensemble `.pt`s: evaluation_and_analysis/diffusion_model_uncertainy.py);
the `.pt` semantics are unchanged and win whenever the file exists."""
import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def trained_model_dir(tmp_path_factory):
    from upgdm_tpu.train.loop import run_training

    d = tmp_path_factory.mktemp("nsdiff_sidecar")
    rng = np.random.default_rng(0)
    data = (rng.normal(size=(40, 24, 2)) * 0.1).astype(np.float32).cumsum(axis=1)
    net_param = dict(
        dataset_nf=2, windows=16, pred_len=8, rolling_length=4, diffusion_steps=5,
        scaler_type="StandardScaler", d_model=16, n_heads=2, e_layers=1, d_layers=1,
        d_ff=16, p_hidden_dims=[8, 8], p_hidden_layers=2, n_z_samples=6,
        parallel_sample=3, task_model="NsDiff",
    )
    train_param = dict(
        train_model_select="NsDiff_model", train_batch_size=16, val_batch_size=16,
        train_epochs=2, test_set=True, ckpt=False, ckpt_period=2,
    )
    opt_param = dict(optimizer_name="Adam", lr=1e-3, weight_decay=0.0, scheduler_set=False)
    run_training(
        data[:32], data[32:], train_param, net_param, {"loss_metric": "KL divergence"},
        opt_param, d, dataset_param=dict(windows=16, pred_len=8, sampling_t=0.1),
    )
    import shutil

    model_dir = d / "model"
    model_dir.mkdir()
    shutil.copy(d / "trained_model/model_trained", model_dir / "model_trained")
    shutil.copy(d / "trained_model/model_trained.yaml", model_dir / "model_trained.yaml")
    return model_dir


def _series(seed=1, T=120):
    rng = np.random.default_rng(seed)
    series = (rng.normal(size=(T, 2)) * 0.1).astype(np.float32).cumsum(axis=0)
    return series, np.arange(T, dtype=np.float64) * 0.1


def _call(model_dir, series, tdata, cache, **kw):
    from upgdm_tpu.eval.uncertainty import uncertainty_ews

    kwargs = dict(
        model_save_file=model_dir, torch_time_series=series, time_data=tdata,
        dynamic_type="SLBP", cache_path=cache, sampling_t=0.1,
        uncertainty_method="sampling", save_nsdiff_g=False,
    )
    kwargs.update(kw)
    return uncertainty_ews(**kwargs)


def test_sidecar_written_and_round_trips_without_checkpoint(
        trained_model_dir, tmp_path):
    """Fresh compute writes a complete sidecar; after the machine 'wipe'
    (ensemble cache AND checkpoint deleted) the arm reproduces exactly from
    the sidecar alone — including the inferred window step."""
    series, tdata = _series()
    cache = tmp_path / "arm.pt"
    res = _call(trained_model_dir, series, tdata, cache, sample_window_step=20)

    side = cache.with_name("arm.pt.mpv.json")
    assert side.exists()
    d = json.loads(side.read_text())
    assert d["complete"] and d["raw_space"]
    assert d["sample_window_step"] == 20
    np.testing.assert_allclose(d["ews"], res["ews"], rtol=1e-6)
    assert d["n_windows_done"] == d["n_windows_total"] == len(res["ews"])

    # simulate the cross-round wipe: ensembles + checkpoint gone, sidecar kept
    cache.unlink()
    import shutil

    wiped = tmp_path / "wiped_model"
    shutil.copytree(trained_model_dir, wiped)
    (wiped / "model_trained").unlink()

    res2 = _call(wiped, series, tdata, cache)  # no step given: from sidecar
    assert res2["pred_future_list"] is None
    assert res2["sample_window_step"] == 20
    np.testing.assert_allclose(res2["ews"], res["ews"], rtol=1e-6)
    np.testing.assert_allclose(res2["pred_mean"], res["pred_mean"], rtol=1e-6)
    assert not cache.exists()  # nothing recomputed


def test_stale_sidecar_discarded_on_corpus_change(trained_model_dir, tmp_path):
    """A sidecar from a different corpus (fingerprint mismatch) must be
    recomputed over, never spliced in."""
    series, tdata = _series(seed=1)
    cache = tmp_path / "arm.pt"
    _call(trained_model_dir, series, tdata, cache, sample_window_step=20)
    fp_old = json.loads(cache.with_name("arm.pt.mpv.json").read_text())["fingerprint"]

    cache.unlink()  # ensembles gone; only the (now-stale) sidecar remains
    series2, tdata2 = _series(seed=2)
    res = _call(trained_model_dir, series2, tdata2, cache, sample_window_step=20)
    d = json.loads(cache.with_name("arm.pt.mpv.json").read_text())
    assert d["fingerprint"] != fp_old  # recomputed + rewritten
    assert cache.exists()  # full ensemble sweep ran
    np.testing.assert_allclose(d["ews"], res["ews"], rtol=1e-6)


def test_partial_sidecar_mpv_level_resume(trained_model_dir, tmp_path):
    """Ensembles for the done prefix gone, sidecar partial: only the tail is
    recomputed; the prefix MPVs are kept verbatim and the sidecar completes."""
    series, tdata = _series(seed=3)
    cache = tmp_path / "arm.pt"
    res = _call(trained_model_dir, series, tdata, cache, sample_window_step=20)
    n = len(res["ews"])
    assert n >= 4

    side = cache.with_name("arm.pt.mpv.json")
    d = json.loads(side.read_text())
    k = 2
    # sentinel-perturb the prefix to prove it is kept verbatim, not recomputed
    d.update(pred_mean=[v + 123.0 for v in d["pred_mean"][:k]],
             ews=[v + 123.0 for v in d["ews"][:k]],
             n_windows_done=k, complete=False)
    side.write_text(json.dumps(d))
    cache.unlink()

    res2 = _call(trained_model_dir, series, tdata, cache, sample_window_step=20)
    assert res2["pred_future_list"] is None
    assert len(res2["ews"]) == n
    np.testing.assert_allclose(res2["ews"][:k],
                               [v + 123.0 for v in res["ews"][:k]], rtol=1e-6)
    # the tail was genuinely recomputed (fresh RNG draws: statistical match)
    tail_new, tail_ref = np.asarray(res2["ews"][k:]), np.asarray(res["ews"][k:])
    assert np.all(np.isfinite(tail_new)) and np.all(tail_new > 0)
    d2 = json.loads(side.read_text())
    assert d2["complete"] and d2["n_windows_done"] == n
    assert not cache.exists()  # MPV-level resume does not materialize ensembles


def test_flush_time_sidecars_during_sweep(trained_model_dir, tmp_path):
    """run_evaluation_cache keeps the sidecar flushed mid-sweep (incomplete),
    so even a killed multi-hour arm leaves committable progress."""
    from upgdm_tpu.eval.uncertainty import load_model_from_dir, run_evaluation_cache

    model, _ = load_model_from_dir(trained_model_dir, device="cpu")
    rng = np.random.default_rng(7)
    wins = (rng.normal(size=(5, 1, 16, 2)) * 0.1).astype(np.float32).cumsum(axis=2)
    cache = tmp_path / "sweep.pt"
    run_evaluation_cache(model, wins, 8, cache, chunk_windows=2,
                         checkpoint_every=2, sample_window_step=20)
    side = cache.with_name("sweep.pt.mpv.json")
    assert side.exists()
    d = json.loads(side.read_text())
    # written at the last mid-sweep flush (4/5); completion is stamped by
    # uncertainty_ews, which owns the arm-level summary
    assert not d["complete"] and d["n_windows_done"] == 4
    assert d["sample_window_step"] == 20


def test_gx_sidecar_round_trip(trained_model_dir, tmp_path):
    """uncertainty_method='both': the gx summary also survives the wipe."""
    series, tdata = _series(seed=4)
    cache = tmp_path / "arm.pt"
    gx = tmp_path / "arm_gx.pt"
    res = _call(trained_model_dir, series, tdata, cache, sample_window_step=20,
                uncertainty_method="both", save_nsdiff_g=True, nsdiff_g_path=gx)
    gx_side = gx.with_name("arm_gx.pt.mpv.json")
    assert gx_side.exists()
    d = json.loads(gx_side.read_text())
    assert d["complete"] and d["pred_dim"] == 0
    np.testing.assert_allclose(d["ews"], res["nsdiff_g"]["ews"], rtol=1e-6)

    cache.unlink()
    gx.unlink()
    import shutil

    wiped = tmp_path / "wiped_model"
    shutil.copytree(trained_model_dir, wiped)
    (wiped / "model_trained").unlink()
    res2 = _call(wiped, series, tdata, cache, uncertainty_method="both",
                 save_nsdiff_g=True, nsdiff_g_path=gx)
    np.testing.assert_allclose(res2["ews"], res["ews"], rtol=1e-6)
    np.testing.assert_allclose(res2["nsdiff_g"]["ews"], res["nsdiff_g"]["ews"],
                               rtol=1e-6)
    assert res2["nsdiff_g"]["pred_future_list"] is None


def test_sampling_sidecar_skips_unavailable_gx_side_artifact(
        trained_model_dir, tmp_path):
    """method='sampling' with save_nsdiff_g=True (the fig1 NsDiff arm): a
    sidecar-only render on a wiped machine must not crash trying to load the
    missing checkpoint for the gx side artifact — it renders the sampling
    MPV and skips gx."""
    series, tdata = _series(seed=5)
    cache = tmp_path / "arm.pt"
    gx = tmp_path / "arm_gx.pt"
    res = _call(trained_model_dir, series, tdata, cache, sample_window_step=20,
                save_nsdiff_g=True, nsdiff_g_path=gx)
    assert "nsdiff_g" in res
    cache.unlink()
    gx.unlink()
    gx.with_name("arm_gx.pt.mpv.json").unlink()  # gx summary ALSO gone
    import shutil

    wiped = tmp_path / "wiped_model"
    shutil.copytree(trained_model_dir, wiped)
    (wiped / "model_trained").unlink()
    res2 = _call(wiped, series, tdata, cache, save_nsdiff_g=True, nsdiff_g_path=gx)
    np.testing.assert_allclose(res2["ews"], res["ews"], rtol=1e-6)
    assert "nsdiff_g" not in res2  # skipped, not fatal


def test_pt_cache_still_wins_over_sidecar(trained_model_dir, tmp_path):
    """Reference semantics: when the ensemble cache exists it is the source
    of truth; a (tampered) sidecar must not shadow it."""
    series, tdata = _series(seed=6)
    cache = tmp_path / "arm.pt"
    res = _call(trained_model_dir, series, tdata, cache, sample_window_step=20)
    side = cache.with_name("arm.pt.mpv.json")
    d = json.loads(side.read_text())
    d["ews"] = [v + 999.0 for v in d["ews"]]
    side.write_text(json.dumps(d))

    res2 = _call(trained_model_dir, series, tdata, cache, sample_window_step=20)
    assert res2["pred_future_list"] is not None
    np.testing.assert_allclose(res2["ews"], res["ews"], rtol=1e-6)
    # and the completion pass heals the tampered sidecar from the .pt
    d2 = json.loads(side.read_text())
    np.testing.assert_allclose(d2["ews"], res["ews"], rtol=1e-6)
