"""Reference-checkpoint importer: torch NsDiff state_dicts -> flax params."""
import numpy as np
import pytest

from upgdm_tpu.models.nsdiff import NsDiffModel
from upgdm_tpu.utils.io import flatten_params
from upgdm_tpu.utils.torch_import import (
    convert_reference_nsdiff_state_dict,
    looks_like_reference_nsdiff_state_dict,
    nsdiff_reference_key_map,
)

NET_PARAM = dict(
    dataset_nf=1, windows=16, pred_len=8, rolling_length=8, diffusion_steps=4,
    diffusion_schedule="linear", beta_start=1e-4, beta_end=2e-2,
    scaler_type=None, d_model=16, n_heads=2, e_layers=2, d_layers=1, d_ff=32,
    dropout=0.0, p_hidden_dims=[8, 8], p_hidden_layers=2, n_z_samples=4,
    parallel_sample=2, task_model="NsDiff", load_pretrain=False,
    freeze_pretrain=False, output_attention=False, factor=3, activation="gelu",
)

# inverse layout transforms (flax -> torch) used to synthesize a reference dict
_INV = {
    "linear": lambda k: np.asarray(k).T,
    "conv1d": lambda k: np.transpose(np.asarray(k), (2, 1, 0)),
    "ffn_conv": lambda k: np.asarray(k).T[..., None],
    "copy": lambda k: np.asarray(k),
}


def _synthesize_reference_dict(model, prefix=""):
    flat = flatten_params(model.params)
    key_map = nsdiff_reference_key_map(
        NET_PARAM["e_layers"], NET_PARAM["d_layers"], NET_PARAM["p_hidden_layers"])
    ref = {}
    for torch_key, (flax_key, tf) in key_map.items():
        ref[prefix + torch_key] = _INV[tf](flat[flax_key])
    return ref, key_map


def test_key_map_covers_every_model_parameter():
    model = NsDiffModel(NET_PARAM)
    key_map = nsdiff_reference_key_map(2, 1, 2)
    mapped = {dst for dst, _tf in key_map.values()}
    have = set(flatten_params(model.params))
    assert mapped == have, (sorted(have - mapped)[:5], sorted(mapped - have)[:5])


def test_reference_state_dict_roundtrip():
    src = NsDiffModel(NET_PARAM, seed=1)
    ref, _ = _synthesize_reference_dict(src)
    # buffers in real checkpoints must be ignored
    ref["cond_pred_model.enc_embedding.position_embedding.pe"] = np.zeros((1, 50, 16))
    assert looks_like_reference_nsdiff_state_dict(ref)

    dst = NsDiffModel(NET_PARAM, seed=2)  # different init
    before = flatten_params(dst.params)
    dst.load_state_dict(ref)  # auto-detects + converts
    after = flatten_params(dst.params)
    src_flat = flatten_params(src.params)
    assert any(np.abs(np.asarray(before[k]) - np.asarray(after[k])).max() > 1e-6
               for k in after)
    for k in after:
        np.testing.assert_allclose(np.asarray(after[k]), np.asarray(src_flat[k]),
                                   rtol=1e-6, err_msg=k)


def test_dataparallel_module_prefix_is_stripped():
    src = NsDiffModel(NET_PARAM, seed=3)
    ref, _ = _synthesize_reference_dict(src, prefix="module.")
    out = convert_reference_nsdiff_state_dict(ref, NET_PARAM)
    src_flat = flatten_params(src.params)
    for k, v in out.items():
        np.testing.assert_allclose(v, np.asarray(src_flat[k]), rtol=1e-6, err_msg=k)


def test_strict_mode_rejects_unknown_and_missing_keys():
    src = NsDiffModel(NET_PARAM, seed=0)
    ref, _ = _synthesize_reference_dict(src)
    bad = dict(ref)
    bad["model.diffussion_model.lin9.lin.weight"] = np.zeros((4, 4))
    with pytest.raises(ValueError, match="unrecognized"):
        convert_reference_nsdiff_state_dict(bad, NET_PARAM)
    incomplete = dict(ref)
    incomplete.pop("model.diffussion_model.lin4.weight")
    with pytest.raises(ValueError, match="missing"):
        convert_reference_nsdiff_state_dict(incomplete, NET_PARAM)


def test_tmdm_key_map_and_roundtrip():
    from upgdm_tpu.models.tmdm import TMDMModel
    from upgdm_tpu.utils.torch_import import tmdm_reference_key_map

    net_param = dict(NET_PARAM, task_model="TMDM", timesteps=4, k_z=1e-2,
                     k_cond=1.0)
    net_param.pop("rolling_length")
    src = TMDMModel(net_param, seed=1)
    key_map = tmdm_reference_key_map(2, 1, 2)
    flat = flatten_params(src.params)
    assert {dst for dst, _ in key_map.values()} == set(flat)

    ref = {tk: _INV[tf](flat[fk]) for tk, (fk, tf) in key_map.items()}
    # fixed temporal embeddings present in real TMDM checkpoints are skipped
    ref["model.enc_embedding.temporal_embedding.hour_embed.emb.weight"] = (
        np.zeros((24, 16)))
    dst = TMDMModel(net_param, seed=2)
    dst.load_state_dict(ref)
    for k, v in flatten_params(dst.params).items():
        np.testing.assert_allclose(np.asarray(v), np.asarray(flat[k]),
                                   rtol=1e-6, err_msg=k)


def test_native_state_dicts_pass_through_unchanged():
    model = NsDiffModel(NET_PARAM, seed=4)
    native = model.state_dict()
    assert not looks_like_reference_nsdiff_state_dict(native)
    model2 = NsDiffModel(NET_PARAM, seed=5)
    model2.load_state_dict(native)
    for k, v in flatten_params(model2.params).items():
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flatten_params(model.params)[k]), rtol=1e-6)
