"""Round-3 fixes: ADVICE r2 items (precision-knob coupling, jit-cache reuse)."""
import jax.numpy as jnp
import numpy as np
import pytest


def _tiny_nsdiff(**extra):
    from upgdm_tpu.models.nsdiff import NsDiffModel

    net = dict(
        dataset_nf=1, windows=12, pred_len=4, rolling_length=4,
        diffusion_steps=5, scaler_type=None, d_model=8, n_heads=2,
        e_layers=1, d_layers=1, d_ff=8, p_hidden_dims=[4, 4],
        p_hidden_layers=2, n_z_samples=2, task_model="NsDiff",
        diffusion_schedule="linear", beta_start=1e-4, beta_end=2e-2,
        output_attention=False, dropout=0.05, factor=3, activation="gelu",
        load_pretrain=False, freeze_pretrain=False,
    )
    net.update(extra)
    return NsDiffModel(net)


def test_pallas_arm_matmul_dtype_follows_sampling_dtype(monkeypatch):
    """ADVICE r2: sampling_dtype="float32" must reach the Pallas arm's
    matmul dtype instead of being silently overridden by a bf16 default."""
    from upgdm_tpu.ops.pallas import fused_denoiser as fd

    seen = {}

    def stub(params, y, y0_hat, gx, t, *, matmul_dtype, act_dtype, tile_m):
        seen["matmul_dtype"] = matmul_dtype
        B = y.shape[0]
        O, N = y.shape[1], y.shape[2]
        return jnp.zeros((B, O, N)), jnp.ones((B, O, N))

    monkeypatch.setattr(fd, "fused_nsdiff_denoiser", stub)

    for sdt, expect in [("float32", "float32"), ("bfloat16", "bfloat16")]:
        model = _tiny_nsdiff(use_pallas_denoiser=True, sampling_dtype=sdt)
        x = jnp.zeros((2, 12, 1), jnp.float32)
        model.sample_fn(model.params, x, model.next_key())
        assert seen["matmul_dtype"] == expect, (sdt, seen)

    # an explicit override still wins
    model = _tiny_nsdiff(
        use_pallas_denoiser=True,
        sampling_dtype="float32",
        sampling_matmul_dtype="bfloat16",
    )
    x = jnp.zeros((2, 12, 1), jnp.float32)
    model.sample_fn(model.params, x, model.next_key())
    assert seen["matmul_dtype"] == "bfloat16"


def test_sharded_sweep_caches_jitted_reduce():
    """ADVICE r2: sharded_fast_mpv_sweep must reuse its jitted reduce across
    calls (per-call rebuilds recompile under the remote-compile backend)."""
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    from upgdm_tpu.parallel.data_parallel import sharded_fast_mpv_sweep
    from upgdm_tpu.parallel.mesh import make_mesh

    model = _tiny_nsdiff()
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    wins = rng.normal(size=(mesh.devices.size, 1, 12, 1)).astype(np.float32)
    sharded_fast_mpv_sweep(model, wins, pred_len=4, mesh=mesh, chunk_windows=1)
    cache = model.__dict__.get("_fast_sweep_jit_cache", {})
    keys = [k for k in cache if isinstance(k, tuple) and k and k[0] == "sharded"]
    assert keys, "sharded reduce was not cached on the model"
    before = {k: cache[k] for k in keys}
    sharded_fast_mpv_sweep(model, wins, pred_len=4, mesh=mesh, chunk_windows=1)
    for k in keys:
        assert cache[k] is before[k], "jitted reduce was rebuilt on the second call"


def test_dts_langevin_dynamic_loop_matches_unrolled():
    """VERDICT r2 #6: the Langevin corrector moved from a lax.switch over 4
    unrolled K-branches to ONE dynamic-bound fori_loop (cuts the compiled
    grad-of-transformer instances per scan body from 6 to 1).  For every K
    the loop must reproduce the unrolled fresh-Adagrad semantics exactly."""
    import jax
    import jax.numpy as jnp

    from upgdm_tpu.models.diffusionts import DiffusionTSModel

    net_param = dict(
        dataset_nf=2, windows=16, pred_len=8, scaler_type=None,
        d_model=16, n_heads=2, e_layers=1, d_layers=1, d_ff=16,
        p_hidden_dims=[8, 8], p_hidden_layers=2,
        task_model="DiffusionTS", diffusion_steps=4, timesteps=8,
        n_layer_enc=1, n_layer_dec=2, n_z_samples=3,
    )
    m = DiffusionTSModel(net_param)
    rng = np.random.default_rng(0)
    shape = (2, 24, 2)  # [B, windows+pred, F]
    target = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    sample = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    # the corrector update is effectively lr*sign(g), so ANY fp reassociation
    # difference between the replica below and the model's internal loss can
    # flip an update sign wherever the logp and infill gradient terms cancel.
    # Use an all-False mask (infill gradient exactly zero -> the gradient is
    # the pure logp polynomial) and a mean shifted a constant away from the
    # sample so every gradient element is far from zero.
    mask = jnp.zeros(shape, bool)
    mean = sample - 2.0
    sigma = jnp.float32(0.3)
    t = jnp.full((shape[0],), 5, jnp.int32)
    lr = jnp.float32(0.05)

    params = m._sampling_params(m.params)
    langevin = m._langevin_fn(params, target, mask)

    # independent unrolled replica of the reference semantics
    # (fresh Adagrad per inner iteration: update = lr*g/(sqrt(g^2)+1e-10))
    coef = m.infill_coef

    def loss(z):
        x_start = m._output(params, z, t)
        logp = coef * jnp.sum(jnp.mean((mean - z) ** 2 / sigma, axis=0))
        diff = jnp.where(mask, x_start - target, 0.0) ** 2
        infill = jnp.sum(jnp.mean(diff / jnp.mean(sigma), axis=0))
        return logp + infill

    gradf = jax.grad(loss)
    for K in range(4):
        got = np.asarray(jax.jit(langevin)(sample, mean, sigma, t, lr, jnp.int32(K)))
        z = sample
        for _ in range(K):
            g = gradf(z)
            z = z - lr * g / (jnp.sqrt(g * g) + 1e-10)
        want = np.asarray(jnp.where(mask, sample, z))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
        if K > 0:
            assert not np.allclose(got, np.asarray(sample)), "loop never ran"

    # masking behavior: known (mask=True) positions pass through untouched
    mask2 = jnp.asarray(rng.random(shape) < 0.5)
    langevin2 = m._langevin_fn(params, target, mask2)
    got2 = np.asarray(jax.jit(langevin2)(sample, mean, sigma, t, lr, jnp.int32(2)))
    m2 = np.asarray(mask2)
    np.testing.assert_array_equal(got2[m2], np.asarray(sample)[m2])
    assert not np.allclose(got2[~m2], np.asarray(sample)[~m2])


def test_train_dtype_bf16_knob():
    """Opt-in bf16-compute training (fp32 master weights): loss must track
    the fp32 step closely on the same batch, and typos must raise."""
    import jax

    from upgdm_tpu.train.loop import make_train_step
    from upgdm_tpu.train.optimizers import make_optimizer

    batch = np.random.default_rng(0).normal(size=(8, 16, 1)).astype(np.float32)

    def one_step(dtype):
        model = _tiny_nsdiff(windows=12, pred_len=4, train_dtype=dtype)
        tx = make_optimizer({"optimizer_name": "Adam", "lr": 1e-3},
                            model.trainable_mask())
        step = make_train_step(model, tx, None, with_adj=False)
        params, opt = model.params, tx.init(model.params)
        _, _, loss = step(params, opt, jnp.asarray(batch), jax.random.key(0))
        return float(loss)

    l32, l16 = one_step("float32"), one_step("bfloat16")
    assert np.isfinite(l16)
    assert abs(l16 - l32) / abs(l32) < 0.05, (l32, l16)

    model = _tiny_nsdiff(train_dtype="bfloat17")
    tx = make_optimizer({"optimizer_name": "Adam", "lr": 1e-3}, model.trainable_mask())
    with pytest.raises(ValueError, match="train_dtype"):
        make_train_step(model, tx, None, with_adj=False)


def test_bury_shape_only_bind_refuses_cross_type(tmp_path):
    """ADVICE r2: positional shape-signature binding must not silently pair
    weight groups across layer types."""
    import re

    from upgdm_tpu.eval import bury

    natural = lambda name: (
        re.match(r"(.*?)(\d+)?$", name).group(1),
        int(re.match(r"(.*?)(\d+)?$", name).group(2) or 0),
    )
    # same base: ok ("lstm_1" model layer vs "lstm_14" h5 group)
    assert natural("lstm_1")[0].rstrip("_") == natural("lstm_14")[0].rstrip("_")
    # cross-type: must differ, which load-time now turns into a ValueError
    assert natural("dense_1")[0].rstrip("_") != natural("lstm_3")[0].rstrip("_")


def test_nsdiff_fg_bf16_sampling_mpv_parity():
    """fg_sampling_dtype="bfloat16" (f(x)/g(x) backbones in bf16; denoiser,
    chain state, PRNG unchanged) keeps ensemble MPV within the 1% budget.
    VERDICT r2 #5 — the precision risk is the NS-Transformer's de-stationary
    tau/delta statistics; measured on TPU in benchmarks/ab_fg_bf16.py."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    cfg = dict(windows=40, pred_len=20, rolling_length=10,
               diffusion_steps=20, n_z_samples=48, d_model=32)
    rng = np.random.default_rng(3)
    x = jnp.asarray((rng.normal(size=(12, 40, 1)) * 0.05 + 1.0).astype(np.float32))
    key = jax.random.key(0)

    m32 = _tiny_nsdiff(**cfg)
    m16 = _tiny_nsdiff(**cfg, fg_sampling_dtype="bfloat16")
    m16.params = m32.params
    e32 = np.asarray(jax.jit(
        lambda p, b, k: m32.sample_fn(p, b, k, 48))(m32.params, x, key))
    e16 = np.asarray(jax.jit(
        lambda p, b, k: m16.sample_fn(p, b, k, 48))(m16.params, x, key))
    mpv32 = e32.var(axis=-1).mean()
    mpv16 = e16.var(axis=-1).mean()
    assert abs(mpv16 - mpv32) / mpv32 < 0.01, (mpv32, mpv16)

    # typos in the knob must raise, same as sampling_dtype
    import pytest as _pytest
    bad = _tiny_nsdiff(**cfg, fg_sampling_dtype="fp16")
    with _pytest.raises(ValueError, match="fg_sampling_dtype"):
        bad.sample_fn(bad.params, x, key)


def test_zoo_manifest_excludes_scratch_and_self(tmp_path):
    """reference_zoo.write_manifest must not hash _scratch bulk or a prior
    run's MANIFEST.json into the new manifest (idempotent re-runs)."""
    import json
    import sys as _sys
    from pathlib import Path

    _sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
    import reference_zoo as Z

    (tmp_path / "figures").mkdir()
    (tmp_path / "figures" / "fig2.png").write_bytes(b"png")
    (tmp_path / "_scratch" / "deep").mkdir(parents=True)
    (tmp_path / "_scratch" / "deep" / "trace.json").write_text("{}")
    (tmp_path / "MANIFEST.json").write_text("[]")  # stale prior manifest

    Z.write_manifest(tmp_path)
    rows = json.loads((tmp_path / "MANIFEST.json").read_text())
    paths = {r["path"] for r in rows}
    assert paths == {"figures/fig2.png"}

    # re-run converges to a fixed point (same rows, no self-entry)
    Z.write_manifest(tmp_path)
    assert json.loads((tmp_path / "MANIFEST.json").read_text()) == rows


def test_zoo_figure_jobs_gate_on_model_trees(tmp_path):
    """figure_jobs only schedules fig1/fig4 once their model trees exist
    (partial zoos keep rendering the always-available figures)."""
    import sys as _sys
    from pathlib import Path

    _sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
    import reference_zoo as Z

    mods = [m for m, _ in Z.figure_jobs(tmp_path)]
    assert not any("fig1" in m or "fig4" in m for m in mods)
    assert any("fig2" in m for m in mods) and any("fig8" in m for m in mods)

    for fam in ("NsDiff", "DiffSTG", "DiffusionTS", "TMDM"):
        d = tmp_path / "ews_results" / "model_compare" / fam / "SIS"
        d.mkdir(parents=True)
        (d / "model_trained").write_bytes(b"ckpt")
    pred = tmp_path / "ews_results" / "NsDiff_pred" / "models"
    pred.mkdir(parents=True)
    (pred / "dataset__w200p1000st100").write_bytes(b"ckpt")

    mods = [m for m, _ in Z.figure_jobs(tmp_path)]
    # fig1 renders LAST (its DiffusionTS/TMDM n_z=100 sweeps dwarf every
    # other figure; fast full-coverage figures land first)
    assert mods[-1].endswith("fig1_model_compare")
    assert mods[0].endswith("fig4_model_sensitivity")


def test_zoo_figure_jobs_gate_fig569(tmp_path):
    """figs 5/6/9 schedule only once their SLBP trees AND grid corpora exist
    (fig5 needs the full D x total_time grid, fig9 only the increase cells)."""
    import sys as _sys
    from pathlib import Path

    _sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
    import reference_zoo as Z
    from upgdm_tpu.figures.common import slbp_source_path

    mods = [m for m, _ in Z.figure_jobs(tmp_path)]
    assert not any(f"fig{n}" in m for m in mods for n in (5, 6, 9))

    # models alone schedule fig6 but not the data-gated fig5/fig9
    for m in ("NsDiff", "preg"):
        d = tmp_path / "ews_results/NsDiff_machine" / m / "models"
        d.mkdir(parents=True)
        (d / "dataset_w200p200st100").write_bytes(b"ckpt")
    t = tmp_path / "ews_results/NsDiff_trends/models"
    t.mkdir(parents=True)
    (t / "dataset__w200p200st100").write_bytes(b"ckpt")
    mods = [m for m, _ in Z.figure_jobs(tmp_path)]
    assert any("fig6" in m for m in mods)
    assert not any("fig5" in m or "fig9" in m for m in mods)

    # increase-only grid data unlocks fig9 but not fig5 (needs both trends)
    for total, _f, _s in Z.FIG5_TIME_ROWS:
        for dv in Z.FIG59_D_VALUES:
            p = slbp_source_path(tmp_path / "dataset", total, "increase", dv)
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_bytes(b"pt")
    mods = [m for m, _ in Z.figure_jobs(tmp_path)]
    assert any("fig9" in m for m in mods)
    assert not any("fig5" in m for m in mods)

    for total, _f, _s in Z.FIG5_TIME_ROWS:
        for dv in Z.FIG59_D_VALUES:
            p = slbp_source_path(tmp_path / "dataset", total, "decrease", dv)
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_bytes(b"pt")
    jobs = {m: a for m, a in Z.figure_jobs(tmp_path)}
    fig5 = next(a for m, a in jobs.items() if "fig5" in m)
    assert "--time-rows" in fig5 and "800000.0:t8e5:20" in fig5
    fig9 = next(a for m, a in jobs.items() if "fig9" in m)
    assert "--noises" in fig9 and "5e-06" in fig9

    # --stage slbpfigs selects exactly the three SLBP-tree figures
    sel = sorted(m.split(".")[-1] for m, _ in
                 Z.select_figure_jobs(tmp_path, "slbpfigs"))
    assert sel == ["fig5_tipping_types", "fig6_slbp_model_analysis",
                   "fig9_smoothing"]


def test_zoo_stage_fig1_selects_only_fig1(tmp_path):
    """--stage fig1 renders exactly the fig1 job once the model_compare tree
    is complete, and selects nothing (stage fails) while it is incomplete;
    other stages keep the full schedulable job list."""
    import sys as _sys
    from pathlib import Path

    _sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
    import reference_zoo as Z

    # incomplete tree: fig1 unschedulable, figures stage still has fig2/fig8
    assert Z.select_figure_jobs(tmp_path, "fig1") == []
    assert len(Z.select_figure_jobs(tmp_path, "figures")) >= 2

    for fam in ("NsDiff", "DiffSTG", "DiffusionTS", "TMDM"):
        d = tmp_path / "ews_results" / "model_compare" / fam / "SIS"
        d.mkdir(parents=True)
        (d / "model_trained").write_bytes(b"ckpt")

    jobs = Z.select_figure_jobs(tmp_path, "fig1")
    assert len(jobs) == 1 and jobs[0][0].endswith("fig1_model_compare")
    # full stages are unaffected by the fig1 filter
    full = [m for m, _ in Z.select_figure_jobs(tmp_path, "figures")]
    assert any("fig2" in m for m in full) and full[-1].endswith("fig1_model_compare")


def test_bounded_chunk_windows():
    """DiffusionTS-style models cap window-rows per sampling call; models
    without the attribute keep the caller's chunk (uncertainty sweeps on
    30-node corpus records must not put 240 rows in one Langevin program)."""
    from upgdm_tpu.eval.uncertainty import bounded_chunk_windows

    class Capped:
        eval_rows_per_call = 32

    class Uncapped:
        pass

    net30 = np.zeros((100, 30, 100, 1), np.float32)  # [n, node, W, F]
    flat = np.zeros((100, 1, 100, 1), np.float32)
    assert bounded_chunk_windows(Capped(), net30, 8) == 1
    assert bounded_chunk_windows(Capped(), flat, 8) == 8
    assert bounded_chunk_windows(Capped(), flat, 64) == 32
    assert bounded_chunk_windows(Uncapped(), net30, 8) == 8
    # node > cap still dispatches one window at a time, never zero
    net64 = np.zeros((10, 64, 100, 1), np.float32)
    assert bounded_chunk_windows(Capped(), net64, 8) == 1


def test_diffusionts_declares_eval_rows_cap():
    from upgdm_tpu.models.diffusionts import DiffusionTSModel

    m = DiffusionTSModel(dict(
        dataset_nf=1, windows=8, pred_len=8, d_model=8, n_heads=2,
        n_layer_enc=1, n_layer_dec=1, timesteps=4, diffusion_steps=4,
        n_z_samples=4, task_model="DiffusionTS", scaler_type=None))
    assert m.eval_rows_per_call == 32
    assert m.eval_checkpoint_every == 4
    m2 = DiffusionTSModel(dict(
        dataset_nf=1, windows=8, pred_len=8, d_model=8, n_heads=2,
        n_layer_enc=1, n_layer_dec=1, timesteps=4, diffusion_steps=4,
        n_z_samples=4, task_model="DiffusionTS", scaler_type=None,
        eval_rows_per_call=8))
    assert m2.eval_rows_per_call == 8


def test_run_until_stalled(tmp_path):
    """Zoo render attempts stream to a log and are killed only when the log
    stops growing (silent tunnel hang), not while making progress."""
    import sys as _sys
    from pathlib import Path

    _sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
    import reference_zoo as Z

    logf = tmp_path / "r.log"
    # healthy fast exit
    code = Z._run_until_stalled(
        [_sys.executable, "-c", "print('ok')"], logf, stall_timeout=5,
        poll_s=1)
    assert code == 0 and "ok" in logf.read_text()
    # nonzero exit propagates
    code = Z._run_until_stalled(
        [_sys.executable, "-c", "raise SystemExit(3)"], logf,
        stall_timeout=5, poll_s=1)
    assert code == 3
    # silent hang -> stalled kill; prior output is preserved in the log
    code = Z._run_until_stalled(
        [_sys.executable, "-c",
         "import time; print('start', flush=True); time.sleep(60)"],
        logf, stall_timeout=2, poll_s=1)
    assert code == "stalled" and "start" in logf.read_text()
