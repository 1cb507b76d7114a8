"""Regression tests for the round-1 advisor findings (ADVICE.md)."""
import numpy as np
import pytest


NET_PARAM = dict(
    dataset_nf=1, windows=16, pred_len=8, rolling_length=4, diffusion_steps=5,
    scaler_type="StandardScaler", d_model=16, n_heads=2, e_layers=1, d_layers=1,
    d_ff=16, p_hidden_dims=[8, 8], p_hidden_layers=2, n_z_samples=4,
    parallel_sample=2, task_model="NsDiff",
)


def test_scheduler_enabled_training_runs(tmp_path):
    """scheduler_set=true used to crash at optimizer construction because the
    loop pre-resolves lr into a per-step schedule callable that make_optimizer
    then float()-ed; also covers YAML-string lr through the scheduler path."""
    import yaml

    from upgdm_tpu.train.loop import run_training

    rng = np.random.default_rng(0)
    data = (rng.normal(size=(12, 24, 1)) * 0.1).astype(np.float32).cumsum(axis=1)
    opt_param = yaml.safe_load(
        "optimizer_name: Adam\nlr: 1e-3\nweight_decay: 0.0\n"
        "scheduler_set: true\nscheduler: StepLR\nstepLR_stepsize: 1\nstepLR_gamma: 0.5\n"
    )
    assert isinstance(opt_param["lr"], str)  # the YAML-1.1 quirk under test
    train_param = dict(
        train_model_select="NsDiff_model", train_batch_size=8, val_batch_size=8,
        train_epochs=2, test_set=True, ckpt=False,
    )
    scores = run_training(
        data[:8], data[8:], train_param, NET_PARAM,
        {"loss_metric": "KL divergence"}, opt_param, tmp_path,
        dataset_param=dict(windows=16, pred_len=8, sampling_t=0.1),
    )
    assert np.isfinite(scores["train_scores"]).all()


def test_reference_scheduler_key_names():
    """The reference config schema (optimizers/optimizers.py:18-25) uses
    stepLR_stepsize/stepLR_gamma, CALR_Tmax/CALR_minlr, CyclicLR_blr/mlr/upsteps;
    these must not silently fall back to defaults."""
    from upgdm_tpu.train.optimizers import make_lr_schedule

    s = make_lr_schedule(dict(
        scheduler_set=True, scheduler="StepLR", lr="1e-2",
        stepLR_stepsize=2, stepLR_gamma=0.5,
    ))
    assert np.isclose(float(s(0)), 1e-2) and np.isclose(float(s(2)), 5e-3)

    s = make_lr_schedule(dict(
        scheduler_set=True, scheduler="CosineAnnealingLR", lr=1e-2,
        CALR_Tmax=10, CALR_minlr="1e-3",
    ))
    assert np.isclose(float(s(10)), 1e-3, rtol=1e-5)

    s = make_lr_schedule(dict(
        scheduler_set=True, scheduler="CyclicLR", lr=1e-2,
        CyclicLR_blr="1e-4", CyclicLR_mlr="1e-2", CyclicLR_upsteps=5,
    ))
    assert np.isclose(float(s(0)), 1e-4) and np.isclose(float(s(5)), 1e-2)


def test_pretrain_load_filters_foreign_subtrees(tmp_path):
    """The pretrain stages save the FULL model state; loading must take only
    the prefixed subtree — previously every other tensor leaked in as dead
    duplicates under cond_pred_model_g/ and bloated the final checkpoint."""
    from upgdm_tpu.models.nsdiff import NsDiffModel
    from upgdm_tpu.utils.io import flatten_params, save_checkpoint

    donor = NsDiffModel(dict(NET_PARAM))
    save_checkpoint(tmp_path, "model_trained", donor.state_dict(), dict(NET_PARAM))

    loaded = NsDiffModel(dict(
        NET_PARAM, load_pretrain=True, load_pretrain_f=True,
        pretrain_g_path=str(tmp_path), pretrain_f_path=str(tmp_path),
    ))
    for sub in ("cond_pred_model", "cond_pred_model_g"):
        got = set(flatten_params(loaded.params[sub]))
        want = set(flatten_params(donor.params[sub]))
        assert got == want, f"{sub} keys drifted: extra={sorted(got - want)[:5]}"
        for k, v in flatten_params(donor.params[sub]).items():
            np.testing.assert_array_equal(flatten_params(loaded.params[sub])[k], v)


def test_fast_mpv_sweep_tracks_scaler_refit():
    """The cached jitted reduction must not capture scaler stats as constants:
    a scaler_fit after the first sweep has to change the inverse-scaling."""
    from upgdm_tpu.eval.uncertainty import fast_mpv_sweep
    from upgdm_tpu.models.nsdiff import NsDiffModel

    model = NsDiffModel(dict(NET_PARAM))
    rng = np.random.default_rng(0)
    model.scaler_fit(rng.normal(size=(64, 1)).astype(np.float32))
    win = rng.normal(size=(3, 1, 16, 1)).astype(np.float32)
    mpv1, _ = fast_mpv_sweep(model, win, pred_len=8)
    # refit with 10x spread: inverse-scaled variance must scale by ~100
    model.scaler_fit((rng.normal(size=(64, 1)) * 10).astype(np.float32))
    mpv2, _ = fast_mpv_sweep(model, win, pred_len=8)
    assert not np.allclose(mpv1, mpv2), "stale scaler stats in cached reduction"


def test_network_sde_noise_is_product_normal():
    """The networked reference hands torchsde g = eta*randn_like(x), so the
    Euler increments are the product-normal eta*z1*z2*sqrt(dt): variance
    eta^2*dt but excess kurtosis 6 (vs 0 for a plain normal)."""
    import jax

    from upgdm_tpu.data.sde import _segment_scan

    eta, dt, n = 0.5, 0.1, 40_000
    zero_drift = lambda y, eps: 0.0 * y
    _, ys = _segment_scan(
        zero_drift, np.zeros(4, np.float32), np.zeros(n, np.float32),
        eta, dt, jax.random.key(0), n, noise="scale_mixture",
    )
    inc = np.diff(np.asarray(ys), axis=0, prepend=0.0).ravel()
    var = inc.var()
    kurt = (inc**4).mean() / var**2 - 3.0
    assert np.isclose(var, eta**2 * dt, rtol=0.05)
    assert 4.0 < kurt < 8.0, f"expected product-normal excess kurtosis ~6, got {kurt}"
