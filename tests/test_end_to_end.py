"""End-to-end slice: train tiny NsDiff -> checkpoint + yaml -> uncertainty_ews
(sampling + gx) -> MPV curves + .pt caches, plus cache-hit reload."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def trained_model_dir(tmp_path_factory):
    from upgdm_tpu.train.loop import run_training

    d = tmp_path_factory.mktemp("nsdiff_e2e")
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
    dataset_param = dict(windows=16, pred_len=8, sampling_t=0.1)
    run_training(
        data[:32], data[32:], train_param, net_param, {"loss_metric": "KL divergence"},
        opt_param, d, dataset_param=dataset_param,
    )
    # uncertainty_ews reads <dir>/model_trained + model_trained.yaml
    import shutil

    model_dir = d / "model"
    model_dir.mkdir()
    shutil.copy(d / "trained_model/model_trained", model_dir / "model_trained")
    shutil.copy(d / "trained_model/model_trained.yaml", model_dir / "model_trained.yaml")
    return model_dir


def test_uncertainty_ews_sampling_and_gx(trained_model_dir, tmp_path):
    from upgdm_tpu.eval.uncertainty import uncertainty_ews

    rng = np.random.default_rng(1)
    T = 120
    series = (rng.normal(size=(T, 2)) * 0.1).astype(np.float32).cumsum(axis=0)
    tdata = np.arange(T, dtype=np.float64) * 0.1

    res = uncertainty_ews(
        model_save_file=trained_model_dir,
        torch_time_series=series,
        time_data=tdata,
        dynamic_type="SLBP",
        cache_path=tmp_path / "cache.pt",
        sample_window_step=20,
        sampling_t=0.1,
        uncertainty_method="both",
        nsdiff_g_path=tmp_path / "cache_gx.pt",
    )
    n_windows = (T - 16) // 20 + 1
    assert len(res["ews"]) == n_windows
    assert len(res["time_points"]) == n_windows
    assert all(np.isfinite(res["ews"]))
    assert res["uncertainty_source"] == "sampling"
    # gx pathway present
    assert "nsdiff_g" in res
    assert len(res["nsdiff_g"]["ews"]) == n_windows
    # cache files exist with reference shapes
    from upgdm_tpu.utils.io import load_tensor_list

    cache = load_tensor_list(tmp_path / "cache.pt")
    assert len(cache) == n_windows
    assert cache[0].shape == (1, 8, 2, 6)  # [Node, pred_len, F, n_z_samples]
    gx_cache = load_tensor_list(tmp_path / "cache_gx.pt")
    assert gx_cache[0].shape == (1, 8, 2)

    # cache-hit path reproduces the summary without a model
    res2 = uncertainty_ews(
        model_save_file=trained_model_dir,
        torch_time_series=series,
        time_data=tdata,
        dynamic_type="SLBP",
        cache_path=tmp_path / "cache.pt",
        sampling_t=0.1,
        uncertainty_method="sampling",
        save_nsdiff_g=False,
        # cache-hit summary must land in the same (raw, inverse-scaled)
        # space as the fresh compute — via the checkpoint scaler view
    )
    # step inferred from cache length (ambiguous here: any step reproducing the
    # cache length is acceptable; the reference tie-breaks the same way)
    from upgdm_tpu.ops.windows import sliding_window_count

    assert sliding_window_count(120, 16, res2["sample_window_step"]) == n_windows
    np.testing.assert_allclose(res2["ews"], res["ews"], rtol=1e-6)

    # the scale-consistency guard: cache-hit summaries must land in raw
    # (inverse-scaled) space WITHOUT constructing the model — the scaler
    # view recovers the statistics from the checkpoint alone, while a bare
    # model=None summarize of the same cache stays in scaled space
    from upgdm_tpu.eval.uncertainty import load_scaler_view, summarize_pred_future_list

    view = load_scaler_view(trained_model_dir)
    assert view is not None and view.scaler is not None
    _, scaled_ews = summarize_pred_future_list(cache, model=None)
    _, viewed_ews = summarize_pred_future_list(cache, model=view)
    np.testing.assert_allclose(viewed_ews, res["ews"], rtol=1e-5)
    assert not np.allclose(scaled_ews, res["ews"], rtol=0.2)


def test_uncertainty_ews_cache_mode_none(trained_model_dir, tmp_path):
    """cache_mode='none' reduces MPV on device; no ensemble cache on disk."""
    from upgdm_tpu.eval.uncertainty import uncertainty_ews

    rng = np.random.default_rng(2)
    T = 120
    series = (rng.normal(size=(T, 2)) * 0.1).astype(np.float32).cumsum(axis=0)
    tdata = np.arange(T, dtype=np.float64) * 0.1

    kwargs = dict(
        model_save_file=trained_model_dir, torch_time_series=series,
        time_data=tdata, dynamic_type="SLBP", sample_window_step=20,
        sampling_t=0.1, uncertainty_method="sampling", save_nsdiff_g=False,
    )
    res_fast = uncertainty_ews(
        cache_path=tmp_path / "none.pt", cache_mode="none", **kwargs)
    n_windows = (T - 16) // 20 + 1
    assert len(res_fast["ews"]) == n_windows
    assert res_fast["pred_future_list"] is None
    assert not (tmp_path / "none.pt").exists()

    res_cache = uncertainty_ews(cache_path=tmp_path / "write.pt", **kwargs)
    assert (tmp_path / "write.pt").exists()
    # different RNG draws -> statistical agreement only (6 samples/window)
    fast, ref = np.asarray(res_fast["ews"]), np.asarray(res_cache["ews"])
    assert np.all(fast > 0) and np.all(np.isfinite(fast))
    assert np.median(np.abs(fast - ref) / ref) < 1.0

    import pytest

    with pytest.raises(ValueError, match="cache_mode"):
        uncertainty_ews(cache_path=tmp_path / "x.pt", cache_mode="bogus", **kwargs)


def test_run_evaluation_cache_resume(trained_model_dir, tmp_path):
    """Mid-sweep partials: resumed runs keep finished ensembles verbatim,
    finish the tail, land the final cache, and clean the partial up."""
    from upgdm_tpu.eval.uncertainty import load_model_from_dir, run_evaluation_cache
    from upgdm_tpu.utils.io import load_tensor_list, save_tensor_list

    model, _ = load_model_from_dir(trained_model_dir, device="cpu")
    rng = np.random.default_rng(7)
    wins = (rng.normal(size=(5, 1, 16, 2)) * 0.1).astype(np.float32).cumsum(axis=2)

    cache = tmp_path / "resume.pt"
    out = run_evaluation_cache(model, wins, 8, cache, chunk_windows=2,
                               checkpoint_every=2)
    assert len(out) == 5 and cache.exists()
    assert not cache.with_name("resume.pt.partial").exists()

    # seed a partial with recognizable sentinels for the first 3 windows
    cache2 = tmp_path / "resume2.pt"
    sentinels = [np.full((1, 8, 2, 6), float(i), np.float32) for i in range(3)]
    save_tensor_list(sentinels, cache2.with_name("resume2.pt.partial"))
    out2 = run_evaluation_cache(model, wins, 8, cache2, chunk_windows=2,
                                checkpoint_every=2)
    assert len(out2) == 5
    for i in range(3):
        np.testing.assert_array_equal(out2[i], sentinels[i])
    assert cache2.exists()
    assert not cache2.with_name("resume2.pt.partial").exists()
    assert len(load_tensor_list(cache2)) == 5

    # a corrupt partial is discarded, not fatal
    cache3 = tmp_path / "resume3.pt"
    cache3.with_name("resume3.pt.partial").write_bytes(b"not a torch file")
    out3 = run_evaluation_cache(model, wins, 8, cache3, chunk_windows=2,
                                checkpoint_every=2)
    assert len(out3) == 5 and cache3.exists()


def test_run_evaluation_cache_partial_fingerprint(trained_model_dir, tmp_path):
    """A .partial carrying a fingerprint sidecar resumes only against the
    SAME sweep inputs: regenerating the source corpus between runs must
    discard the stale prefix instead of silently splicing it into the
    cache (sidecar-less legacy partials keep resuming — covered above)."""
    from upgdm_tpu.eval.uncertainty import (
        _sweep_fingerprint, load_model_from_dir, run_evaluation_cache)
    from upgdm_tpu.utils.io import save_tensor_list

    model, _ = load_model_from_dir(trained_model_dir, device="cpu")
    rng = np.random.default_rng(11)
    wins = (rng.normal(size=(5, 1, 16, 2)) * 0.1).astype(np.float32).cumsum(axis=2)

    # matching sidecar -> sentinel prefix kept verbatim
    cache = tmp_path / "fp.pt"
    sentinels = [np.full((1, 8, 2, 6), float(i), np.float32) for i in range(3)]
    save_tensor_list(sentinels, cache.with_name("fp.pt.partial"))
    fp = _sweep_fingerprint(wins, 8, 5)
    cache.with_name("fp.pt.partial.meta").write_text(fp)
    out = run_evaluation_cache(model, wins, 8, cache, chunk_windows=2,
                               checkpoint_every=2)
    for i in range(3):
        np.testing.assert_array_equal(out[i], sentinels[i])
    # both the partial and its sidecar are cleaned up once the cache lands
    assert not cache.with_name("fp.pt.partial").exists()
    assert not cache.with_name("fp.pt.partial.meta").exists()

    # mismatching sidecar (corpus changed) -> stale prefix discarded
    cache2 = tmp_path / "fp2.pt"
    save_tensor_list(sentinels, cache2.with_name("fp2.pt.partial"))
    cache2.with_name("fp2.pt.partial.meta").write_text("0" * 64)
    out2 = run_evaluation_cache(model, wins, 8, cache2, chunk_windows=2,
                                checkpoint_every=2)
    assert len(out2) == 5
    assert not np.array_equal(out2[0], sentinels[0])

    # the fingerprint is sensitive to window values and geometry
    assert _sweep_fingerprint(wins + 1.0, 8, 5) != fp
    assert _sweep_fingerprint(wins, 9, 5) != fp


def test_load_scaler_view_edges(tmp_path):
    """No checkpoint / no fitted scaler -> None (summaries stay unscaled
    rather than crashing a cache-only render)."""
    from upgdm_tpu.eval.uncertainty import load_scaler_view
    from upgdm_tpu.utils.io import save_pt

    assert load_scaler_view(tmp_path) is None  # nothing on disk
    save_pt({"net_param": {"task_model": "NsDiff"},
             "state_dict": {"w": np.zeros(3, np.float32)}},
            tmp_path / "model_trained")
    assert load_scaler_view(tmp_path) is None  # checkpoint without scaler


def test_uncertainty_ews_gx_only(trained_model_dir, tmp_path):
    from upgdm_tpu.eval.uncertainty import uncertainty_ews

    rng = np.random.default_rng(2)
    series = (rng.normal(size=(100, 2)) * 0.1).astype(np.float32).cumsum(axis=0)
    tdata = np.arange(100, dtype=np.float64) * 0.1
    res = uncertainty_ews(
        model_save_file=trained_model_dir,
        torch_time_series=series,
        time_data=tdata,
        dynamic_type="SLBP",
        cache_path=tmp_path / "c.pt",
        nsdiff_g_path=tmp_path / "c_gx.pt",
        sample_window_step=30,
        sampling_t=0.1,
        uncertainty_method="gx",
    )
    assert res["uncertainty_source"] == "gx"
    assert len(res["ews"]) == (100 - 16) // 30 + 1


def test_slbp_raw_window_variance():
    from upgdm_tpu.eval.uncertainty import slbp_raw_window_variance

    rng = np.random.default_rng(3)
    series = rng.normal(size=(500, 2)).astype(np.float32)
    tdata = np.arange(500, dtype=np.float64)
    res = slbp_raw_window_variance(
        series, tdata, windows=100, sampling_t=0.1, sample_window_step=50
    )
    n = (500 - 100) // 50 + 1
    assert len(res["variance"]) == n
    want = np.array([series[i * 50 : i * 50 + 100, 0].var() for i in range(n)])
    np.testing.assert_allclose(res["variance"], want, rtol=1e-4)


def test_fast_mpv_sweep_matches_cache_path(trained_model_dir, tmp_path):
    from upgdm_tpu.eval.uncertainty import (
        batched_window_ensemble,
        fast_mpv_sweep,
        load_model_from_dir,
        summarize_pred_future_list,
    )

    model, _np = load_model_from_dir(trained_model_dir)
    rng = np.random.default_rng(5)
    wins = (rng.normal(size=(6, 1, 16, 2)) * 0.1).astype(np.float32).cumsum(axis=2)

    # same rng stream for both paths
    model._rng_counter = 100
    pred_list = batched_window_ensemble(model, wins.copy(), 8, chunk_windows=3)
    pm, mpv_cache = summarize_pred_future_list(pred_list, model=model)

    model._rng_counter = 100
    mpv_fast, mean_fast = fast_mpv_sweep(model, wins.copy(), 8, chunk_windows=3)
    np.testing.assert_allclose(mpv_fast, mpv_cache, rtol=2e-4)
    np.testing.assert_allclose(mean_fast, pm, rtol=2e-3, atol=1e-4)


def test_uncertainty_ews_diffstg_path(tmp_path):
    """DiffSTG through the facade: graphml topology + dense eval + cache."""
    import networkx as nx

    from upgdm_tpu.data.graphs import save_graphml
    from upgdm_tpu.models.diffstg import DiffSTGModel
    from upgdm_tpu.eval.uncertainty import uncertainty_ews
    from upgdm_tpu.utils.io import save_checkpoint, save_config_yaml, save_pt

    V = 6
    g = nx.erdos_renyi_graph(V, 0.5, seed=0)
    graph_file = tmp_path / "graph.graphml"
    save_graphml(g, graph_file)

    net_param = dict(
        T_h=8, T_p=8, F=1, windows=8, pred_len=8, dataset_nf=1, diffusion_steps=20,
        inference_diffusion_steps=3, inference_trick="ddim", inference_schedule="cosine",
        diffusion_schedule="linear", scaler_type="StandardScaler", d_h=4, Td_h=6,
        channel_multipliers=[1, 2], n_blocks=1, gnn_name="GCNConv",
        parallel_sampling=2, sequential_sampling=2, mask_ratio=0.0,
        init_num_nodes=V, task_model="DiffSTG",
    )
    model = DiffSTGModel(net_param)
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    save_checkpoint(model_dir, "model_trained", model.state_dict(), net_param)
    save_config_yaml(
        model_dir / "model_trained.yaml",
        {"dataset": {"windows": 8, "pred_len": 8, "sampling_t": 0.1, "interval_step": 10},
         "train": {"train_model_select": None}, "net": net_param},
    )
    rng = np.random.default_rng(0)
    rec_file = tmp_path / "SIS_dynamic_increase.pt"
    save_pt(
        {"ys_dynamic": (rng.normal(size=(60, V)) * 0.1).astype(np.float32),
         "ts_dynamic": np.arange(60, dtype=np.float32) * 0.1,
         "tp_values": np.zeros(60, np.float32)},
        rec_file,
    )
    res = uncertainty_ews(
        model_save_file=model_dir,
        data_file=rec_file,
        dynamic_type="SIS",
        task_model="DiffSTG",
        graph_file=graph_file,
        cache_path=tmp_path / "cache.pt",
        sample_window_step=10,
        sampling_t=0.1,
        infer_params={"parallel_sampling": 2, "sequential_sampling": 2,
                      "n_z_samples": 4, "diffusion_steps": 20},
    )
    n_windows = (60 - 8) // 10 + 1
    assert len(res["ews"]) == n_windows
    assert all(np.isfinite(res["ews"]))
    from upgdm_tpu.utils.io import load_tensor_list

    cache = load_tensor_list(tmp_path / "cache.pt")
    assert cache[0].shape == (V, 8, 1, 4)  # [Node, pred_len, F, all_sampling]
    # legacy 3-D cache normalisation path
    legacy = [c[:, :, 0, :] for c in cache]
    from upgdm_tpu.eval.uncertainty import normalize_diffstg_pred_future_list

    norm = normalize_diffstg_pred_future_list(legacy)
    assert norm[0].shape == (V, 8, 1, 4)

    # mid-sweep partial resume mirrors run_evaluation_cache semantics
    from upgdm_tpu.eval.uncertainty import run_diffstg_evaluation_cache
    from upgdm_tpu.ops.graph import graphml_to_adjacency
    from upgdm_tpu.utils.io import save_tensor_list

    graph = graphml_to_adjacency(graph_file)
    wins = (rng.normal(size=(4, V, 8, 1)) * 0.1).astype(np.float32)
    cache2 = tmp_path / "stg_resume.pt"
    sentinels = [np.full((V, 8, 1, 4), float(i), np.float32) for i in range(2)]
    save_tensor_list(sentinels, cache2.with_name("stg_resume.pt.partial"))
    out2 = run_diffstg_evaluation_cache(model, wins, 8, graph, cache2,
                                        checkpoint_every=1)
    assert len(out2) == 4
    for i in range(2):
        np.testing.assert_array_equal(out2[i], sentinels[i])
    assert cache2.exists()
    assert not cache2.with_name("stg_resume.pt.partial").exists()


def test_emergency_checkpoint_resume(tmp_path):
    """run_training resumes from an emergency checkpoint at the saved epoch."""
    from flax import serialization

    from upgdm_tpu.models.factory import diffusion_models
    from upgdm_tpu.train.loop import run_training
    from upgdm_tpu.train.optimizers import make_optimizer
    from upgdm_tpu.utils import io as uio

    rng = np.random.default_rng(0)
    data = (rng.normal(size=(24, 24, 1)) * 0.1).astype(np.float32).cumsum(axis=1)
    net_param = dict(
        dataset_nf=1, windows=16, pred_len=8, rolling_length=4, diffusion_steps=4,
        scaler_type=None, d_model=16, n_heads=2, e_layers=1, d_layers=1, d_ff=16,
        p_hidden_dims=[8, 8], p_hidden_layers=2, n_z_samples=2, task_model="NsDiff",
    )
    model = diffusion_models("NsDiff", dict(net_param), train_model_select="NsDiff_model")
    tx = make_optimizer({"optimizer_name": "Adam", "lr": 1e-3}, model.trainable_mask())
    opt_state = tx.init(model.params)
    uio.emergency_checkpoint(
        tmp_path, model.state_dict(), net_param,
        serialization.to_bytes(opt_state), step=3,
        record_scores={"epoch": [0, 1, 2], "train_scores": [9.0, 8.0, 7.0],
                       "val_scores": [9.0, 8.0, 7.0]},
    )
    rs = run_training(
        data[:16], data[16:],
        dict(train_model_select="NsDiff_model", train_batch_size=8, val_batch_size=8,
             train_epochs=5, test_set=True, ckpt=False),
        net_param, {}, dict(optimizer_name="Adam", lr=1e-3), tmp_path,
    )
    # epochs 0-2 come from the checkpoint, 3-4 were trained now
    assert rs["epoch"] == [0, 1, 2, 3, 4]
    assert rs["train_scores"][:3] == [9.0, 8.0, 7.0]
    assert all(np.isfinite(rs["train_scores"][3:]))
