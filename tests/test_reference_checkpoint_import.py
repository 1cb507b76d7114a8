"""Validation against REAL reference-shipped checkpoints.

The reference ships trained torch binaries; loading them through
utils/torch_import.py and comparing every compute stage against the measured
torch replica (benchmarks/torch_reference.py) loaded with the SAME weights is
the only non-circular check of the importer's key map / layout transforms and
of the forward-math parity (g(x) head, denoiser, full sampling MPV).

Skipped when the reference checkout is absent (external artifact).
"""
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/ews_results")
CKPTS = {
    "real_data_simulation": REF / "real_data/model/simulation",
    "machine_wo_fx": REF / "NsDiff_machine/wo_fx",
}

pytestmark = pytest.mark.skipif(not REF.exists(), reason="no reference checkout")


@pytest.fixture(scope="module", params=sorted(CKPTS))
def loaded(request):
    """(our NsDiffVariants model, raw torch state_dict, net_param)."""
    import torch

    from upgdm_tpu.eval.uncertainty import load_model_from_dir

    path = CKPTS[request.param]
    model, net_param = load_model_from_dir(path)
    raw = torch.load(path / "model_trained", map_location="cpu", weights_only=False)
    return model, raw["state_dict"], net_param


def _torch_g(state_dict, net_param):
    import torch

    from benchmarks.torch_reference import SigmaEstimation

    g = SigmaEstimation(
        net_param["windows"], net_param["pred_len"], net_param["dataset_nf"],
        512, net_param["rolling_length"],
    ).eval()
    sub = {k[len("cond_pred_model_g."):]: v for k, v in state_dict.items()
           if k.startswith("cond_pred_model_g.")}
    g.load_state_dict(sub, strict=True)
    return g


def _torch_denoiser(state_dict, net_param):
    import torch

    from benchmarks.torch_reference import Denoiser

    d = Denoiser(net_param["diffusion_steps"], net_param["dataset_nf"]).eval()
    sub = {k[len("model.diffussion_model."):]: v for k, v in state_dict.items()
           if k.startswith("model.diffussion_model.")}
    d.load_state_dict(sub, strict=True)
    return d


def _window(net_param, seed=0):
    rng = np.random.default_rng(seed)
    W, F = net_param["windows"], net_param["dataset_nf"]
    return (rng.normal(size=(2, W, F)) * 0.05).astype(np.float32).cumsum(axis=1) + 1.0


def test_gx_forward_parity(loaded):
    import torch

    model, sd, net_param = loaded
    x = _window(net_param)
    ours = np.asarray(model._apply_g(model.params, x))
    theirs = _torch_g(sd, net_param)(torch.from_numpy(x)).detach().numpy()
    # fp32 XLA-vs-torch accumulation noise in the 512-wide MLP: <4e-4 rel
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-6)


def test_denoiser_forward_parity(loaded):
    import torch

    model, sd, net_param = loaded
    rng = np.random.default_rng(1)
    O, F = net_param["pred_len"], net_param["dataset_nf"]
    y_t = rng.normal(size=(4, O, F)).astype(np.float32)
    y0 = np.zeros_like(y_t)  # cond_var variant: f(x) is absent -> zeros
    gx = np.abs(rng.normal(size=(4, O, F))).astype(np.float32) + 0.01
    t = np.array([0, 3, 7, net_param["diffusion_steps"] - 1], np.int32)

    eps, sig = model.denoiser.apply(
        {"params": model.params["model"]},
        np.asarray(y_t), np.asarray(y0), np.asarray(gx), t,
    )
    t_eps, t_sig = _torch_denoiser(sd, net_param)(
        torch.from_numpy(y_t), torch.from_numpy(y0), torch.from_numpy(gx),
        torch.from_numpy(t.astype(np.int64)),
    )
    np.testing.assert_allclose(np.asarray(eps), t_eps.detach().numpy(), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sig), t_sig.detach().numpy(), rtol=2e-4, atol=1e-5)


def test_pretrain_g_sensitivity_checkpoint(tmp_path):
    """The third shipped binary (NsDiff_preg/models/dataset_w200p200st100) is
    a pretrain_g-stage checkpoint: g-submodule-only state dict, loaded via the
    sensitivity-model layout (ref diffusion_model_uncertainy.py:425-455)."""
    import shutil

    import torch

    from upgdm_tpu.eval.uncertainty import load_sensitivity_model

    src = REF / "NsDiff_preg/models"
    (tmp_path / "models").mkdir()
    shutil.copy(src / "dataset_w200p200st100", tmp_path / "models/dataset_w200p200st100")
    shutil.copy(src / "dataset_w200p200st100.yaml",
                tmp_path / "models/dataset_w200p200st100.yaml")
    model, method_config, net_param = load_sensitivity_model(
        tmp_path, "dataset_w200p200st100")
    assert model.denoiser is None and model.cond_pred_model is None

    x = _window(net_param, seed=3)
    ours = np.asarray(model._apply_g(model.params, x))
    sd = torch.load(src / "dataset_w200p200st100", map_location="cpu",
                    weights_only=False)["state_dict"]
    theirs = _torch_g(sd, net_param)(torch.from_numpy(x)).detach().numpy()
    # rolling-variance cancellation (var ~1e-2 of inputs ~1: ~1e-4 fp32 rel)
    # is amplified by this checkpoint's LayerNorm over ~0.03-std activations;
    # the first-linear outputs agree to 9e-7 abs, so the key map is exact.
    np.testing.assert_allclose(ours, theirs, rtol=2e-2, atol=1e-6)


@pytest.mark.slow
def test_sampling_mpv_parity(loaded):
    """End-to-end: 100-sample MPV through our scan sampler vs the torch
    replica's chunked p_sample_loop, both on the SAME imported weights.
    Distribution-level check (different RNGs), tolerance from the S=100
    estimator noise."""
    import torch

    from benchmarks.torch_reference import NsDiffSchedule, p_sample_loop

    model, sd, net_param = loaded
    x = _window(net_param, seed=2)
    if model.scaler is not None:
        x_in = np.asarray(model.scaler_transform(x), np.float32)
    else:
        x_in = x

    outs, _ = model.evaluation_step(x_in)  # [B, O, F, S]
    ours_mpv = float(np.asarray(outs).var(axis=-1).mean())

    den = _torch_denoiser(sd, net_param)
    g = _torch_g(sd, net_param)
    sched = NsDiffSchedule.create(
        net_param.get("diffusion_schedule", "linear"), net_param["diffusion_steps"],
        float(net_param.get("beta_start", 1e-4)), float(net_param.get("beta_end", 2e-2)),
    )
    with torch.no_grad():
        xb = torch.from_numpy(x_in)
        gx = g(xb) + 1e-7
        y0_hat = torch.zeros(xb.shape[0], net_param["pred_len"], net_param["dataset_nf"])
        torch.manual_seed(0)
        preds = []
        for _ in range(net_param["n_z_samples"] // 10):
            y0_t = y0_hat.repeat(10, 1, 1, 1).transpose(0, 1).flatten(0, 1)
            gx_t = gx.repeat(10, 1, 1, 1).transpose(0, 1).flatten(0, 1)
            y0 = p_sample_loop(den, y0_t, gx_t, sched)
            preds.append(y0.reshape(xb.shape[0], 10, net_param["pred_len"], -1))
        pf = torch.cat(preds, dim=1).permute(0, 2, 3, 1)
    theirs_mpv = float(pf.var(dim=-1, unbiased=False).mean())

    assert np.isfinite(ours_mpv) and np.isfinite(theirs_mpv)
    assert abs(ours_mpv - theirs_mpv) / theirs_mpv < 0.05, (ours_mpv, theirs_mpv)
