"""Import reference-trained NsDiff checkpoints (torch state_dicts) into flax.

The reference saves ``{net_param, state_dict}`` where ``state_dict`` is the
``NsDiff_model`` nn.Module tree (NsDiff_model.py:43-93, utils/utils.py:611-622):

- ``model.diffussion_model.*``  — ConditionalGuidedModel (denoise.py:23-51):
  lin1/lin2/lin3 ConditionalLinear (``.lin`` Linear + ``.embed`` Embedding),
  lin4 and sigma_lin Linear heads.
- ``cond_pred_model.*``         — NS-Transformer f(x) (mu_backbone.py:53-183)
  built from torch_timeseries layers with the canonical Nonstationary-
  Transformer naming: DataEmbedding ``value_embedding.tokenConv``; Encoder
  ``attn_layers.{i}`` with AttentionLayer ``{query,key,value,out}_projection``,
  ``conv1``/``conv2`` 1x1 Conv1d FFN, ``norm1``/``norm2``; Decoder
  ``layers.{i}`` with ``self_attention``/``cross_attention`` + ``norm1/2/3``,
  final ``norm`` + ``projection``; tau/delta Projector ``series_conv`` +
  ``backbone.{0,2,...}`` (mu_backbone.py:12-41, last Linear bias-free).
- ``cond_pred_model_g.*``       — SigmaEstimation (g_backbone.py:19-72):
  ``mlp.{0,3,6}`` Linear, ``mlp.{2,5}`` LayerNorm over [enc_in, hidden].

Tensor layout transforms: torch Linear ``weight [out,in]`` -> flax ``kernel
(in,out)``; Conv1d ``weight [out,in,k]`` -> flax ``(k,in,out)``; the FFN 1x1
convs squeeze to plain Dense kernels; LayerNorm ``weight`` -> ``scale``.
Buffers (positional-encoding ``pe``, attention masks) carry no learned state
and are skipped.  ``module.`` DataParallel prefixes are stripped like the
reference loader does (utils/utils.py:677-679).

Scope: the flagship ``NsDiff_model``.  The naming of the torch_timeseries pip
layers is the canonical public NS-Transformer naming its version pins; strict
mode fails loudly listing any unmapped key, so a divergent checkpoint is
detected rather than silently mis-imported.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = [
    "nsdiff_reference_key_map",
    "tmdm_reference_key_map",
    "convert_reference_nsdiff_state_dict",
    "convert_reference_tmdm_state_dict",
    "looks_like_reference_nsdiff_state_dict",
]

# transforms: name -> fn(np.ndarray) -> np.ndarray
_T = {
    "linear": lambda w: np.ascontiguousarray(np.asarray(w).T),
    "conv1d": lambda w: np.ascontiguousarray(np.transpose(np.asarray(w), (2, 1, 0))),
    "ffn_conv": lambda w: np.ascontiguousarray(np.asarray(w)[..., 0].T),
    "copy": lambda w: np.asarray(w),
}

_SKIP_SUBSTRINGS = (".pe", "position_embedding", "temporal_embedding", "mask")


def _attention(src: str, dst: str, out: dict):
    for name in ("query", "key", "value", "out"):
        out[f"{src}.{name}_projection.weight"] = (f"{dst}.{name}.kernel", "linear")
        out[f"{src}.{name}_projection.bias"] = (f"{dst}.{name}.bias", "copy")


def _ffn_and_norms(src: str, dst: str, n_norms: int, out: dict):
    out[f"{src}.conv1.weight"] = (f"{dst}.Dense_0.kernel", "ffn_conv")
    out[f"{src}.conv1.bias"] = (f"{dst}.Dense_0.bias", "copy")
    out[f"{src}.conv2.weight"] = (f"{dst}.Dense_1.kernel", "ffn_conv")
    out[f"{src}.conv2.bias"] = (f"{dst}.Dense_1.bias", "copy")
    for j in range(n_norms):
        out[f"{src}.norm{j + 1}.weight"] = (f"{dst}.LayerNorm_{j}.scale", "copy")
        out[f"{src}.norm{j + 1}.bias"] = (f"{dst}.LayerNorm_{j}.bias", "copy")


def _projector(src: str, dst: str, p_hidden_layers: int, out: dict):
    out[f"{src}.series_conv.weight"] = (f"{dst}.series_conv_kernel", "conv1d")
    # backbone Sequential: Linear,ReLU interleaved; final Linear bias-free
    for j in range(p_hidden_layers):
        out[f"{src}.backbone.{2 * j}.weight"] = (f"{dst}.Dense_{j}.kernel", "linear")
        out[f"{src}.backbone.{2 * j}.bias"] = (f"{dst}.Dense_{j}.bias", "copy")
    out[f"{src}.backbone.{2 * p_hidden_layers}.weight"] = (
        f"{dst}.Dense_{p_hidden_layers}.kernel", "linear",
    )


def _conditional_linears(prefix: str, dst_prefix: str, heads, out: dict):
    """ConditionalGuidedModel linears (denoise.py:23-51, tmdm_model.py:23-64)."""
    for i in (1, 2, 3):
        out[f"{prefix}.lin{i}.lin.weight"] = (f"{dst_prefix}.lin{i}.Dense_0.kernel", "linear")
        out[f"{prefix}.lin{i}.lin.bias"] = (f"{dst_prefix}.lin{i}.Dense_0.bias", "copy")
        out[f"{prefix}.lin{i}.embed.weight"] = (f"{dst_prefix}.lin{i}.embed", "copy")
    for head in heads:
        out[f"{prefix}.{head}.weight"] = (f"{dst_prefix}.{head}.kernel", "linear")
        out[f"{prefix}.{head}.bias"] = (f"{dst_prefix}.{head}.bias", "copy")


def _token_embedding(src: str, dst: str, out: dict):
    out[f"{src}.value_embedding.tokenConv.weight"] = (
        f"{dst}.TokenEmbedding_0.CircularConv1d_0.Conv_0.kernel", "conv1d")


def _ns_transformer(f: str, e_layers: int, d_layers: int, p_hidden_layers: int,
                    out: dict):
    """Canonical NS-Transformer tree (mu_backbone.py:53-110 and the TMDM twin)."""
    for emb in ("enc_embedding", "dec_embedding"):
        _token_embedding(f"{f}.{emb}", f"{f}.{emb}", out)
    for i in range(e_layers):
        src = f"{f}.encoder.attn_layers.{i}"
        dst = f"{f}.encoder.NSEncoderLayer_{i}"
        _attention(f"{src}.attention", f"{dst}.AttentionLayer_0", out)
        _ffn_and_norms(src, dst, 2, out)
    out[f"{f}.encoder.norm.weight"] = (f"{f}.encoder.LayerNorm_0.scale", "copy")
    out[f"{f}.encoder.norm.bias"] = (f"{f}.encoder.LayerNorm_0.bias", "copy")
    for i in range(d_layers):
        src = f"{f}.decoder.layers.{i}"
        dst = f"{f}.decoder.NSDecoderLayer_{i}"
        _attention(f"{src}.self_attention", f"{dst}.self_attn", out)
        _attention(f"{src}.cross_attention", f"{dst}.cross_attn", out)
        _ffn_and_norms(src, dst, 3, out)
    out[f"{f}.decoder.norm.weight"] = (f"{f}.decoder.LayerNorm_0.scale", "copy")
    out[f"{f}.decoder.norm.bias"] = (f"{f}.decoder.LayerNorm_0.bias", "copy")
    out[f"{f}.decoder.projection.weight"] = (f"{f}.decoder.Dense_0.kernel", "linear")
    out[f"{f}.decoder.projection.bias"] = (f"{f}.decoder.Dense_0.bias", "copy")
    _projector(f"{f}.tau_learner", f"{f}.tau_learner", p_hidden_layers, out)
    _projector(f"{f}.delta_learner", f"{f}.delta_learner", p_hidden_layers, out)


def nsdiff_reference_key_map(e_layers: int, d_layers: int,
                             p_hidden_layers: int) -> Dict[str, tuple]:
    """torch checkpoint key -> (flax flat key, transform name)."""
    out: Dict[str, tuple] = {}
    _conditional_linears("model.diffussion_model", "model",
                         ("lin4", "sigma_lin"), out)
    # g(x) (g_backbone.py:32-41): Sequential Linear,ReLU,LN,Linear,ReLU,LN,Linear
    g = "cond_pred_model_g"
    for idx, j in ((0, 0), (3, 1), (6, 2)):
        out[f"{g}.mlp.{idx}.weight"] = (f"{g}.Dense_{j}.kernel", "linear")
        out[f"{g}.mlp.{idx}.bias"] = (f"{g}.Dense_{j}.bias", "copy")
    for idx, j in ((2, 0), (5, 1)):
        out[f"{g}.mlp.{idx}.weight"] = (f"{g}.LayerNorm_{j}.scale", "copy")
        out[f"{g}.mlp.{idx}.bias"] = (f"{g}.LayerNorm_{j}.bias", "copy")
    _ns_transformer("cond_pred_model", e_layers, d_layers, p_hidden_layers, out)
    return out


def tmdm_reference_key_map(e_layers: int, d_layers: int,
                           p_hidden_layers: int) -> Dict[str, tuple]:
    """TMDM wrapper tree (tmdm_adapter.py:68-71, TMDM.py:88-91,
    tmdm_ns_transformer.py:40-114): CARD denoiser + x-embedding on the core,
    VAE z heads on the NS-Transformer."""
    out: Dict[str, tuple] = {}
    _conditional_linears("model.diffussion_model", "model", ("lin4",), out)
    _token_embedding("model.enc_embedding", "enc_embedding", out)
    _ns_transformer("cond_pred_model", e_layers, d_layers, p_hidden_layers, out)
    for z in ("z_mean", "z_logvar", "z_out"):  # Sequential Linear,ReLU,Linear
        for idx, j in ((0, 0), (2, 1)):
            out[f"cond_pred_model.{z}.{idx}.weight"] = (
                f"cond_pred_model.{z}_{j}.kernel", "linear")
            out[f"cond_pred_model.{z}.{idx}.bias"] = (
                f"cond_pred_model.{z}_{j}.bias", "copy")
    return out


def _strip_module(key: str) -> str:
    while key.startswith("module."):  # DataParallel prefix (utils.py:677-679)
        key = key[len("module."):]
    return key


def looks_like_reference_nsdiff_state_dict(flat: Dict[str, np.ndarray]) -> bool:
    return any(
        _strip_module(k).startswith(("model.diffussion_model.", "cond_pred_model_g.mlp."))
        or "_projection." in k
        for k in flat
    )


def _layer_counts(net_param: dict):
    return (
        int(net_param.get("e_layers", 2)),
        int(net_param.get("d_layers", 1)),
        int(net_param.get("p_hidden_layers",
                          len(net_param.get("p_hidden_dims", [64, 64])))),
    )


def convert_reference_nsdiff_state_dict(
    flat: Dict[str, np.ndarray], net_param: dict, strict: bool = True,
    components=("model", "cond_pred_model", "cond_pred_model_g"),
) -> Dict[str, np.ndarray]:
    """Reference torch state_dict -> our flat param dict (NsDiff).

    ``components`` restricts the expected tree for the ablation variants
    (NsDiff_model.py:271-313: Guassian/cond_mean/cond_var drop f and/or g),
    whose checkpoints legitimately lack those subtrees."""
    key_map = {
        src: dst for src, dst in nsdiff_reference_key_map(*_layer_counts(net_param)).items()
        if src.split(".")[0] in components
    }
    return _convert(flat, key_map, strict)


def convert_reference_tmdm_state_dict(
    flat: Dict[str, np.ndarray], net_param: dict, strict: bool = True,
) -> Dict[str, np.ndarray]:
    """Reference torch state_dict -> our flat param dict (TMDM)."""
    return _convert(flat, tmdm_reference_key_map(*_layer_counts(net_param)), strict)


def _convert(
    flat: Dict[str, np.ndarray], key_map: Dict[str, tuple], strict: bool = True,
) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    unmapped = []
    for key, value in flat.items():
        k = _strip_module(key)
        if k in key_map:
            dst, tf = key_map[k]
            out[dst] = _T[tf](value).astype(np.float32)
        elif k in ("scaler_mean", "scaler_std"):  # our sidecar scaler entries
            out[k] = np.asarray(value)
        elif any(s in k for s in _SKIP_SUBSTRINGS):
            continue
        else:
            unmapped.append(key)
    if strict and unmapped:
        raise ValueError(
            "unrecognized reference checkpoint keys (naming drift?): "
            + ", ".join(sorted(unmapped)[:10])
        )
    missing = [k for k in key_map.values() if k[0] not in out]
    if strict and missing:
        raise ValueError(
            "reference checkpoint is missing expected parameters: "
            + ", ".join(sorted(m[0] for m in missing)[:10])
        )
    return out
