"""Inference / uncertainty engine — the public evaluation API.

Function-for-function parity with /root/reference/evaluation_and_analysis/
diffusion_model_uncertainy.py (1623 LoC), rebuilt TPU-first:

  - the rolling-window MPV sweep batches MANY windows into each device call
    (``chunk_windows`` at a time, padded to a fixed shape so ONE compiled
    program serves the whole trajectory) instead of looping window-by-window
    with host-side sample chunking (ref :323-339 + NsDiff_model.py:227-257);
  - the gx fast path evaluates ALL windows in a single batched forward;
  - `.pt` cache files remain bit-compatible lists of per-window tensors
    ([Node, pred_len, F, n_z_samples] sampling / [Node, pred_len, F] gx,
    SLBP variants without the Node axis), including the legacy-shape
    normalisers and the cache-step inference logic.

Public surface kept: uncertainty_ews, slbp_sensitivity_ews,
slbp_sampling_analysis, slbp_gx_analysis, slbp_mpv_analysis,
slbp_direct_model_cache_analysis, slbp_raw_window_variance, the summarizers,
and the window/cache helpers re-exported from ops.windows.
"""
from __future__ import annotations

import os
import sys
from pathlib import Path
from typing import List, Optional

import numpy as np

from ..models.factory import diffusion_models
from ..ops.graph import graphml_to_adjacency
from ..ops.rolling import window_variance_1d
from ..ops.windows import (
    DEFAULT_SAMPLE_WINDOW_STEP,
    DEFAULT_SAMPLING_T,
    NETWORK_DYNAMICS,
    dynamic_name,
    infer_sample_window_step_from_cache,
    normalize_time_series,
    sample_time_series,
    sliding_windows,
    slbp_sensitivity_windows,
)
from ..utils import io as uio

PROJECT_ROOT = Path(os.environ.get("UPGDM_PROJECT_ROOT", Path(__file__).resolve().parents[2]))

__all__ = [
    "uncertainty_ews",
    "slbp_sensitivity_ews",
    "slbp_sampling_analysis",
    "slbp_gx_analysis",
    "slbp_mpv_analysis",
    "slbp_direct_model_cache_analysis",
    "slbp_raw_window_variance",
    "summarize_pred_future_list",
    "summarize_nsdiff_g_list",
    "load_dynamic_data",
    "load_model_from_dir",
    "run_evaluation_cache",
    "run_nsdiff_g_cache",
    "batched_window_ensemble",
]


# ---------------------------------------------------------------------------
# Data loading (ref :69-134)
# ---------------------------------------------------------------------------

def _resolve_project_path(path):
    if path is None:
        return None
    path = Path(path)
    return path if path.is_absolute() else PROJECT_ROOT / path


def _infer_dynamic_type(data_file=None, loaded_data=None):
    if loaded_data is not None and "N_values" in loaded_data:
        return "SLBP"
    if loaded_data is not None and "tp_values" in loaded_data:
        return None
    if data_file is None:
        return None
    text = str(data_file).replace("\\", "/").lower()
    for name in ("slbp", "sis", "neuronal", "biomass"):
        if name in text:
            return dynamic_name(name)
    return None


def load_dynamic_data(data_file, dynamic_type=None):
    loaded = uio.load_pt(data_file)
    inferred = _infer_dynamic_type(data_file=data_file, loaded_data=loaded)
    dynamic_type = dynamic_name(dynamic_type) or inferred
    if "ys_dynamic" not in loaded or "ts_dynamic" not in loaded:
        raise KeyError("data_file must contain 'ys_dynamic' and 'ts_dynamic'.")
    series = normalize_time_series(loaded["ys_dynamic"], dynamic_type=dynamic_type)
    return {
        "torch_time_series": series,
        "time_data": np.asarray(loaded["ts_dynamic"]),
        "dynamic_type": dynamic_type,
        "loaded_data": loaded,
    }


# ---------------------------------------------------------------------------
# Model loading (ref :185-215) — our checkpoints, same file contract
# ---------------------------------------------------------------------------

def read_model_config(model_save_file):
    return uio.read_model_config(model_save_file)


#: corpus sweeps (figures/mpv_collapse.py) call uncertainty_ews once per
#: trajectory with the same per-dynamics model dir — without a cache every
#: call rebuilds the d512 model and re-ships ~42 MB of weights through the
#: tunnel (TPU-extra; the reference reloads per file too,
#: mpv_collapse_summary.py:482-571).  Keyed by checkpoint identity
#: (path + mtime + size) and infer_params, so retrained checkpoints and
#: differing inference overrides never alias.  Small LRU: the corpus
#: alternates between at most a few per-dynamics models.
_MODEL_CACHE: "OrderedDict" = None  # initialized below
_MODEL_CACHE_SIZE = 3


def load_model_from_dir(model_save_file, device=None, infer_params=None,
                        method_config=None, use_cache=True):
    global _MODEL_CACHE
    if _MODEL_CACHE is None:
        from collections import OrderedDict

        _MODEL_CACHE = OrderedDict()
    model_save_file = Path(model_save_file)
    ckpt = model_save_file / "model_trained"
    key = None
    if use_cache and method_config is None and ckpt.exists():
        st = ckpt.stat()
        key = (
            str(model_save_file.resolve()), st.st_mtime_ns, st.st_size,
            None if infer_params is None
            else repr(sorted(infer_params.items())),
        )
        hit = _MODEL_CACHE.get(key)
        if hit is not None:
            _MODEL_CACHE.move_to_end(key)
            model, net_param = hit
            # callers may mutate the returned config dict; the model (params
            # + jit caches) is deliberately shared
            return model, dict(net_param)
    method_config = method_config or read_model_config(model_save_file)
    train_model_select = None
    if method_config.get("train") is not None:
        train_model_select = method_config["train"].get("train_model_select")
    net_param, state_dict = uio.load_checkpoint(
        model_save_file / "model_trained", infer_para=infer_params
    )
    model = diffusion_models(
        task_model=net_param["task_model"],
        net_param=net_param,
        train_model_select=train_model_select,
    )
    model.load_state_dict(state_dict)
    if key is not None:
        _MODEL_CACHE[key] = (model, dict(net_param))
        while len(_MODEL_CACHE) > _MODEL_CACHE_SIZE:
            _MODEL_CACHE.popitem(last=False)
    return model, net_param


def load_sensitivity_model(model_root, model_name, device=None, infer_params=None):
    """models/<name> + models/<name>.yaml layout (ref :425-455)."""
    model_root = _resolve_project_path(model_root)
    config_path = model_root / "models" / f"{model_name}.yaml"
    model_path = model_root / "models" / model_name
    if not config_path.exists():
        raise FileNotFoundError(f"model config not found: {config_path}")
    if not model_path.exists():
        raise FileNotFoundError(f"model checkpoint not found: {model_path}")
    import yaml

    with open(config_path, "r", encoding="utf-8") as f:
        method_config = yaml.safe_load(f)
    train_model_select = None
    if method_config.get("train") is not None:
        train_model_select = method_config["train"].get("train_model_select")
    net_param, state_dict = uio.load_checkpoint(model_path, infer_para=infer_params)
    model = diffusion_models(
        task_model=net_param["task_model"],
        net_param=net_param,
        train_model_select=train_model_select,
    )
    model.load_state_dict(state_dict)
    return model, method_config, net_param


# ---------------------------------------------------------------------------
# Cache paths (ref :218-264, :458-464, :624-651)
# ---------------------------------------------------------------------------

def default_cache_dir(model_save_file, dynamic_type):
    if model_save_file is not None:
        return Path(model_save_file)
    return (
        PROJECT_ROOT
        / "ews_results/model_uncertainy_cache/model"
        / (dynamic_name(dynamic_type) or "unknown")
    )


def data_cache_name(data_file, suffix=""):
    if data_file is None:
        return f"data{suffix}.pt"
    data_path = Path(data_file)
    return f"{data_path.stem}{suffix}{data_path.suffix or '.pt'}"


def resolve_cache_path(cache_path, model_save_file, data_file, dynamic_type, suffix=""):
    if cache_path is None:
        return default_cache_dir(model_save_file, dynamic_type) / data_cache_name(
            data_file, suffix
        )
    cache_path = _resolve_project_path(cache_path)
    if cache_path.suffix == ".pt":
        return cache_path
    return cache_path / data_cache_name(data_file, suffix)


def resolve_figure_path(cache_file_path):
    return Path(cache_file_path).with_suffix(".png")


def slbp_sensitivity_cache_path(model_root, model_name, data_trend, sample_window_step=10):
    model_root = _resolve_project_path(model_root)
    return model_root / "datas" / f"{model_name}_pred_future_{data_trend}_{sample_window_step}.pt"


def slbp_fig6_cache_path(
    model_root, model_name, data_trend, sample_window_step=10, cache_subdir=None, kind="pred_future"
):
    model_root = _resolve_project_path(model_root)
    cache_dir = model_root / "datas"
    if cache_subdir:
        cache_dir = cache_dir / cache_subdir
    return cache_dir / f"{model_name}_{kind}_{data_trend}_{sample_window_step}.pt"


def slbp_fig6_pred_future_gx_cache_path(
    model_root, model_name, data_trend, sample_window_step=10, cache_subdir=None
):
    model_root = _resolve_project_path(model_root)
    cache_dir = model_root / "datas"
    if cache_subdir:
        cache_dir = cache_dir / cache_subdir
    return cache_dir / f"{model_name}_pred_future_{data_trend}_{sample_window_step}_gx.pt"


def _legacy_single_underscore_model_name(model_name):
    return str(model_name).replace("dataset__", "dataset_", 1)


# ---------------------------------------------------------------------------
# Summaries (ref :267-320, :529-550, :686-728)
# ---------------------------------------------------------------------------

def load_scaler_view(model_save_file):
    """Scaler statistics only — no model construction, no device arrays.

    Cache-hit summaries need just ``scaler_mean``/``scaler_std`` for the
    inverse feature transform (ref :267-291); building the full model would
    put parameters on the default backend, which a CPU-only figure re-render
    from committed caches must not require.  Returns None when no checkpoint
    exists or it carries no fitted scaler.
    """
    from types import SimpleNamespace

    try:
        _, sd = uio.load_checkpoint(Path(model_save_file) / "model_trained")
    except Exception:
        # no/corrupt checkpoint: summarize unscaled (the pre-existing cache
        # is still renderable) rather than failing the whole figure
        return None
    if "scaler_mean" not in sd or "scaler_std" not in sd:
        return None
    return SimpleNamespace(
        scaler="standard",
        scaler_mean=np.asarray(sd["scaler_mean"], np.float32),
        scaler_std=np.asarray(sd["scaler_std"], np.float32),
    )


def _feature_inverse_transform(pred_future: np.ndarray, model=None) -> np.ndarray:
    """Inverse-scale along whichever axis matches the feature count (ref :267-283)."""
    if model is None or getattr(model, "scaler", None) is None:
        return pred_future
    mean = np.asarray(model.scaler_mean)
    std = np.asarray(model.scaler_std)
    if pred_future.ndim >= 3 and pred_future.shape[-2] == mean.size:
        shape = [1] * pred_future.ndim
        shape[-2] = mean.size
        return pred_future * std.reshape(shape) + mean.reshape(shape)
    if pred_future.shape[-1] == mean.size:
        return pred_future * std + mean
    return pred_future


def summarize_pred_future_list(pred_future_list, model=None):
    """Per-window MPV: mean over (nodes, horizon, F) of the across-sample
    population variance (ref :286-303)."""
    pred_mean_list, ews_list = [], []
    for pred_future in pred_future_list:
        pf = np.asarray(pred_future)
        pf = _feature_inverse_transform(pf, model=model)
        if pf.ndim == 3:
            pf = pf[None]
        if pf.ndim != 4:
            raise ValueError(
                f"pred_future must have shape [Node, pred_len, F, n_z_samples], got {pf.shape}"
            )
        ews_list.append(pf.var(axis=-1).mean())
        pred_mean_list.append(pf.mean())
    return pred_mean_list, ews_list


def summarize_nsdiff_g_list(g_list, pred_dim=0):
    """gx-MPV: mean over horizon then nodes of gx[..., pred_dim] (ref :306-320)."""
    ews_list, pred_mean_list = [], []
    for gx in g_list:
        gx = np.asarray(gx)
        if gx.ndim == 2:
            gx = gx[None]
        if gx.ndim != 3:
            raise ValueError("NsDiff-g cache elements must have shape [Node, pred_len, F].")
        if pred_dim >= gx.shape[-1]:
            raise IndexError(f"pred_dim {pred_dim} out of bounds for F={gx.shape[-1]}.")
        ews_list.append(gx.mean(axis=1)[:, pred_dim].mean())
        pred_mean_list.append(gx.mean())
    return pred_mean_list, ews_list


def normalize_diffstg_pred_future_list(pred_future_list):
    """Insert the F axis into legacy [Node, pred_len, samples] caches (ref :354-366)."""
    out = []
    for pf in pred_future_list:
        pf = np.asarray(pf)
        if pf.ndim == 3:
            pf = pf[:, :, None, :]
        if pf.ndim != 4:
            raise ValueError(
                "DiffSTG pred_future must have shape [Node, pred_len, F, samples] "
                f"or legacy [Node, pred_len, samples], got {pf.shape}"
            )
        out.append(pf)
    return out


# ---------------------------------------------------------------------------
# Batched window sweeps — THE 20x lever
# ---------------------------------------------------------------------------

def batched_window_ensemble(
    model,
    windows_array: np.ndarray,
    pred_len: int,
    chunk_windows: int = 8,
    max_windows: Optional[int] = None,
    use_gx_directly: bool = False,
) -> List[np.ndarray]:
    """All rolling windows -> per-window sample ensembles, chunked on device.

    windows_array: [n, Node, W, F].  Each device call processes
    ``chunk_windows`` windows at once (flattened into the batch axis with the
    node rows, like the reference feeds [Node, W, F] batches per window); the
    final chunk is padded to keep ONE compiled shape.  Returns a python list
    of [Node, pred_len, F, S] arrays (the cache element contract).

    The loop is double-buffered: JAX dispatch is async, so chunk i+1's
    reverse-diffusion computes on device while chunk i's ensemble streams back
    to the host (``copy_to_host_async``).  With the ensemble transfer and the
    sampling compute of the same order of magnitude, overlapping them is worth
    ~1.5x end-to-end (bench.py).
    """
    import jax.numpy as jnp

    n, node, W, F = windows_array.shape
    if max_windows is not None:
        n = min(n, max_windows)
        windows_array = windows_array[:n]
    if n == 0:
        return []
    chunk = min(chunk_windows, n)
    out: List[np.ndarray] = []

    def dispatch(start):
        block = windows_array[start : start + chunk]
        valid = block.shape[0]
        if valid < chunk:  # pad to the compiled shape
            pad = np.repeat(block[-1:], chunk - valid, axis=0)
            block = np.concatenate([block, pad], axis=0)
        flat = block.reshape(chunk * node, W, F)
        if model.scaler is not None:
            flat = model.scaler_transform(flat)
        if use_gx_directly and getattr(model, "has_g", False):
            # NsDiff-only `_pe` variant: gx replaces the per-step sigma solve
            outs = model._jitted_sample(
                model.params, jnp.asarray(flat), model.next_key(), model.n_z_samples, True
            )
        else:
            outs, _ = model.evaluation_step(jnp.asarray(flat))
        try:  # start the device->host copy as soon as the compute finishes
            outs.copy_to_host_async()
        except AttributeError:
            pass
        return outs, valid

    def drain(outs, valid):
        outs = np.asarray(outs)  # [chunk*node, O, F, S]
        outs = outs[:, -pred_len:, :, :].reshape(chunk, node, pred_len, F, outs.shape[-1])
        for i in range(valid):
            out.append(outs[i])

    pending = None
    for start in range(0, n, chunk):
        nxt = dispatch(start)
        if pending is not None:
            drain(*pending)
        pending = nxt
    drain(*pending)
    return out


def fast_mpv_sweep(
    model,
    windows_array: np.ndarray,
    pred_len: int,
    chunk_windows: int = 8,
) -> tuple:
    """MPV sweep with the across-sample variance reduced ON DEVICE.

    TPU-extra capability (not part of the reference API): when the `.pt`
    ensemble cache is not needed, only two scalars per window leave the chip —
    the mean predictive variance and the prediction mean (both inverse-scaled,
    matching summarize_pred_future_list).  Returns (mpv [n], pred_mean [n]).

    Implementation note: sampling reuses the model's OWN compiled program
    (``evaluation_step``) and the reduction is a separate tiny jit — fusing
    both into one program makes XLA pick a markedly slower schedule for the
    sampling scan.  Numerically verified against the cache path in
    tests/test_end_to_end.py.
    """
    import jax
    import jax.numpy as jnp

    n, node, W, F = windows_array.shape
    if n == 0:
        return np.zeros(0), np.zeros(0)
    chunk = min(chunk_windows, n)
    std = jnp.asarray(model.scaler_std if model.scaler is not None else np.ones(F, np.float32))
    mean = jnp.asarray(model.scaler_mean if model.scaler is not None else np.zeros(F, np.float32))

    # cache the jitted reduce per (chunk, node, pred_len) on the model —
    # rebuilding the jit wrapper per call would recompile inside the sweep
    cache = model.__dict__.setdefault("_fast_sweep_jit_cache", {})
    # F in the key: the reshape below bakes in the feature dim, so a sweep
    # with a different trailing dim must not reuse the cached closure
    cache_key = (chunk, node, pred_len, F)
    if cache_key not in cache:

        @jax.jit
        def _reduce(outs, std, mean):
            # std/mean are traced arguments (NOT captured constants) so a
            # later scaler_fit on the same model can't leave the cached
            # program inverse-scaling with stale statistics.
            outs = outs[:, -pred_len:, :, :]  # [chunk*node, O, F, S]
            outs = outs * std[None, None, :, None] + mean[None, None, :, None]
            var = outs.var(axis=-1)  # [chunk*node, O, F]
            var = var.reshape(chunk, node, pred_len, F)
            pm = outs.reshape(chunk, node, pred_len, F, -1)
            return var.mean(axis=(1, 2, 3)), pm.mean(axis=(1, 2, 3, 4))

        cache[cache_key] = _reduce
    _cached_reduce = cache[cache_key]

    def reduce_summary(outs):
        return _cached_reduce(outs, std, mean)

    def dispatch(start):
        block = windows_array[start : start + chunk]
        valid = block.shape[0]
        if valid < chunk:
            block = np.concatenate(
                [block, np.repeat(block[-1:], chunk - valid, axis=0)], axis=0
            )
        flat = block.reshape(chunk * node, W, F)
        if model.scaler is not None:
            flat = model.scaler_transform(flat)
        outs, _ = model.evaluation_step(jnp.asarray(flat))
        return reduce_summary(outs), valid

    mpv_out, mean_out = [], []

    def drain(vm, valid):
        v, m = vm
        mpv_out.append(np.asarray(v)[:valid])
        mean_out.append(np.asarray(m)[:valid])

    pending = None  # only two scalars per window cross the tunnel
    for start in range(0, n, chunk):
        nxt = dispatch(start)
        if pending is not None:
            drain(*pending)
        pending = nxt
    drain(*pending)
    return np.concatenate(mpv_out), np.concatenate(mean_out)


def batched_gx(model, windows_array: np.ndarray, chunk_windows: int = 64) -> List[np.ndarray]:
    """gx for all windows in large fused batches: list of [Node, pred_len, F]."""
    import jax
    import jax.numpy as jnp

    n, node, W, F = windows_array.shape
    if n == 0:
        return []
    gx_call = jax.jit(lambda p, x: model.gx_fn(p, x))
    out = []
    chunk = min(chunk_windows, n)

    def dispatch(start):
        block = windows_array[start : start + chunk]
        valid = block.shape[0]
        if valid < chunk:
            block = np.concatenate(
                [block, np.repeat(block[-1:], chunk - valid, axis=0)], axis=0
            )
        flat = block.reshape(chunk * node, W, F)
        if model.scaler is not None:
            flat = model.scaler_transform(flat)
        gx = gx_call(model.params, jnp.asarray(flat))
        try:
            gx.copy_to_host_async()
        except AttributeError:
            pass
        return gx, valid

    def drain(gx, valid):
        gx = np.asarray(gx)
        gx = gx.reshape(chunk, node, gx.shape[-2], gx.shape[-1])
        for i in range(valid):
            out.append(gx[i])

    pending = None  # overlap the next chunk's forward with this transfer
    for start in range(0, n, chunk):
        nxt = dispatch(start)
        if pending is not None:
            drain(*pending)
        pending = nxt
    drain(*pending)
    return out


# ---------------------------------------------------------------------------
# Cache-first runners (ref :323-422, :502-526, :731-765)
# ---------------------------------------------------------------------------

def bounded_chunk_windows(model, windows_array, chunk_windows):
    """Per-call window chunk bounded by the model's validated program scale.

    DiffusionTS declares ``eval_rows_per_call``: its Langevin sampler's
    per-call memory and device time scale with window-rows x draws, and
    network records multiply rows by the node count.  At the default
    chunk_windows=8 a 30-node corpus record puts 240 rows x parallel_sample
    draws in ONE device program — past the measured cliff where the remote
    compile helper / 16 GB HBM give out (BENCH_DTS_SCALE.json: 32 rows x 100
    draws crashes, 32 x 50 survives) and minutes of single-call device time
    the TPU tunnel does not reliably survive.  Models without the attribute
    keep the caller's chunk unchanged.
    """
    cap = getattr(model, "eval_rows_per_call", None)
    if not cap:
        return chunk_windows
    node = windows_array.shape[1]
    return max(1, min(chunk_windows, int(cap) // max(1, node)))


def _sweep_fingerprint(windows_array, pred_len, n) -> str:
    """Content hash binding a ``.partial`` checkpoint to its sweep inputs.

    A resumed sweep silently concatenates cached and fresh ensembles; if the
    source corpus was regenerated between runs the stale prefix would be
    WRONG, not just slow. The hash covers the raw window values plus the
    sweep geometry so any corpus/windowing change discards the partial."""
    import hashlib

    h = hashlib.sha256()
    arr = np.ascontiguousarray(np.asarray(windows_array, dtype=np.float32))
    h.update(repr((arr.shape, int(pred_len), int(n))).encode())
    h.update(arr.tobytes())
    return h.hexdigest()


def _load_partial(partial_path: Path, fingerprint: str, n: int) -> List[np.ndarray]:
    """Resume list from a ``.partial`` if its sidecar fingerprint matches.

    Legacy partials without a sidecar are accepted (pre-fingerprint format);
    a mismatching or unreadable partial is discarded, never fatal."""
    meta_path = partial_path.with_name(partial_path.name + ".meta")
    try:
        if meta_path.exists() and meta_path.read_text().strip() != fingerprint:
            return []
        return uio.load_tensor_list(partial_path)[:n]
    except Exception:
        return []


def _flush_partial(partial_path: Path, data: List[np.ndarray], fingerprint: str,
                   n: int) -> None:
    """Atomic (tmp-then-rename) partial checkpoint + fingerprint sidecar."""
    tmp = partial_path.with_name(partial_path.name + ".tmp")
    uio.save_tensor_list(data, tmp)
    tmp.replace(partial_path)
    meta_path = partial_path.with_name(partial_path.name + ".meta")
    meta_tmp = meta_path.with_name(meta_path.name + ".tmp")
    meta_tmp.write_text(fingerprint)
    meta_tmp.replace(meta_path)
    print(f"[sweep] {len(data)}/{n} windows -> {partial_path.name}",
          file=sys.stderr, flush=True)


def _clear_partial(partial_path: Path) -> None:
    partial_path.unlink(missing_ok=True)
    partial_path.with_name(partial_path.name + ".meta").unlink(missing_ok=True)


# --- MPV summary sidecars (TPU-extra; not part of the reference API) -------
#
# The per-window sample-ensemble `.pt` caches are gigabytes (n_z x pred x
# node floats per window) and are gitignored as regenerable; the per-arm MPV
# summary they reduce to is a few KB.  Writing that summary to a committable
# `<cache>.pt.mpv.json` sidecar — updated at every partial flush and marked
# complete at the end — makes figure renders durable across machine wipes:
# a fresh clone re-renders from sidecars with no model checkpoint, no TPU,
# and a half-finished multi-hour sweep resumes at the MPV level (only the
# remaining windows are recomputed).  The fingerprint binds a sidecar to the
# exact window values + geometry, so a regenerated corpus discards it.

def _mpv_sidecar_path(cache_path: Path) -> Path:
    cache_path = Path(cache_path)
    return cache_path.with_name(cache_path.name + ".mpv.json")


def _load_mpv_sidecar(cache_path) -> Optional[dict]:
    import json

    p = _mpv_sidecar_path(cache_path)
    if not p.exists():
        return None
    try:
        d = json.loads(p.read_text())
    except Exception:
        return None
    if not isinstance(d, dict) or "ews" not in d or "fingerprint" not in d:
        return None
    return d


def _save_mpv_sidecar(cache_path, *, fingerprint: str, n_total: int,
                      sample_window_step, pred_mean, ews,
                      complete: bool, extra: Optional[dict] = None) -> None:
    import json

    payload = {
        "version": 1,
        "fingerprint": fingerprint,
        "n_windows_total": int(n_total),
        "n_windows_done": len(ews),
        "sample_window_step": (None if sample_window_step is None
                               else int(sample_window_step)),
        "pred_mean": [float(v) for v in pred_mean],
        "ews": [float(v) for v in ews],
        "complete": bool(complete),
    }
    if extra:
        payload.update(extra)
    p = _mpv_sidecar_path(cache_path)
    tmp = p.with_name(p.name + ".tmp")
    tmp.write_text(json.dumps(payload))
    tmp.replace(p)


def run_evaluation_cache(
    model, windows_array, pred_len, cache_path, device=None, force_recompute=False,
    max_windows=None, chunk_windows=8, checkpoint_every=32, sample_window_step=None,
):
    """Sweep -> `.pt` ensemble cache, with mid-sweep checkpointing.

    Long sweeps (DiffusionTS at n_z=100 runs ~minutes of device time per
    window chunk) survive a transport drop: every ``checkpoint_every``
    windows the finished ensembles are flushed to ``<cache>.partial`` and a
    rerun resumes from them instead of recomputing the whole trajectory.
    The partial file is atomic (tmp-then-rename) and deleted once the real
    cache lands; a corrupt/unreadable partial is discarded, not fatal.
    """
    cache_path = Path(cache_path)
    if cache_path.exists() and not force_recompute:
        return uio.load_tensor_list(cache_path)
    n = len(windows_array)
    if max_windows is not None:
        n = min(n, max_windows)
    partial_path = cache_path.with_name(cache_path.name + ".partial")
    fingerprint = _sweep_fingerprint(windows_array[:n], pred_len, n)
    pred_future_list: List[np.ndarray] = []
    if partial_path.exists() and not force_recompute:
        pred_future_list = _load_partial(partial_path, fingerprint, n)
    while len(pred_future_list) < n:
        stop = min(len(pred_future_list) + max(int(checkpoint_every), 1), n)
        pred_future_list.extend(batched_window_ensemble(
            model, windows_array[len(pred_future_list):stop], pred_len,
            chunk_windows=chunk_windows,
        ))
        if stop < n:
            _flush_partial(partial_path, pred_future_list, fingerprint, n)
            pm, ews = summarize_pred_future_list(pred_future_list, model=model)
            _save_mpv_sidecar(cache_path, fingerprint=fingerprint, n_total=n,
                              sample_window_step=sample_window_step,
                              pred_mean=pm, ews=ews, complete=False)
    uio.save_tensor_list(pred_future_list, cache_path)
    _clear_partial(partial_path)
    return pred_future_list


def resume_mpv_sweep(model, windows_array, pred_len, cache_path, sidecar, n,
                     chunk_windows=8, checkpoint_every=32,
                     sample_window_step=None):
    """MPV-level sweep resume from a partial sidecar (TPU-extra).

    The ensemble ``.pt``/``.partial`` for the done prefix is gone (machine
    wipe between rounds) but the committed sidecar holds its per-window
    MPVs: compute ensembles only for the remaining windows, summarize them
    with the live model's scaler, concatenate, and keep the sidecar flushed.
    The full ensemble cache is NOT materialized (its prefix no longer
    exists) — the completed sidecar becomes the arm's durable artifact.
    """
    fingerprint = sidecar["fingerprint"]
    pred_mean = [float(v) for v in sidecar["pred_mean"]]
    ews = [float(v) for v in sidecar["ews"]]
    while len(ews) < n:
        stop = min(len(ews) + max(int(checkpoint_every), 1), n)
        chunk = batched_window_ensemble(
            model, windows_array[len(ews):stop], pred_len,
            chunk_windows=chunk_windows,
        )
        pm_c, ews_c = summarize_pred_future_list(chunk, model=model)
        pred_mean.extend(pm_c)
        ews.extend(ews_c)
        _save_mpv_sidecar(cache_path, fingerprint=fingerprint, n_total=n,
                          sample_window_step=sample_window_step,
                          pred_mean=pred_mean, ews=ews,
                          complete=len(ews) >= n)
        print(f"[sweep] {len(ews)}/{n} windows (mpv-resume) -> "
              f"{_mpv_sidecar_path(cache_path).name}", file=sys.stderr, flush=True)
    return pred_mean, ews


def run_diffstg_evaluation_cache(
    model, windows_array, pred_len, graph, cache_path, device=None,
    force_recompute=False, max_windows=None, checkpoint_every=32,
    sample_window_step=None,
):
    """Per-window DiffSTG sweep with the same mid-sweep checkpointing as
    :func:`run_evaluation_cache` (atomic ``<cache>.partial``, resume on
    rerun, cleaned up once the cache lands)."""
    cache_path = Path(cache_path)
    if cache_path.exists() and not force_recompute:
        return normalize_diffstg_pred_future_list(uio.load_tensor_list(cache_path))
    import jax.numpy as jnp

    adj = jnp.asarray(graph.adj)
    iterable = windows_array[:max_windows] if max_windows is not None else windows_array
    partial_path = cache_path.with_name(cache_path.name + ".partial")
    fingerprint = _sweep_fingerprint(iterable, pred_len, len(iterable))
    out: List[np.ndarray] = []
    if partial_path.exists() and not force_recompute:
        out = _load_partial(partial_path, fingerprint, len(iterable))
    for i in range(len(out), len(iterable)):  # [Node, W, F] per window
        x = iterable[i]
        if getattr(model, "scaler", None) is not None:
            x = model.scaler_transform(x)
        pred_future, _ = model.evaluation_step({"x": jnp.asarray(x), "adj": adj})
        out.append(np.asarray(pred_future)[:, -pred_len:, :, :])
        if len(out) % max(int(checkpoint_every), 1) == 0 and len(out) < len(iterable):
            _flush_partial(partial_path, out, fingerprint, len(iterable))
            pm, ews = summarize_pred_future_list(
                normalize_diffstg_pred_future_list(out), model=model)
            _save_mpv_sidecar(cache_path, fingerprint=fingerprint,
                              n_total=len(iterable),
                              sample_window_step=sample_window_step,
                              pred_mean=pm, ews=ews, complete=False)
    uio.save_tensor_list(out, cache_path)
    _clear_partial(partial_path)
    return out


def run_nsdiff_g_cache(
    model, windows_array, cache_path, device=None, pred_dim=0, force_recompute=False,
    max_windows=None,
):
    cache_path = Path(cache_path)
    if cache_path.exists() and not force_recompute:
        return uio.load_tensor_list(cache_path)
    if not hasattr(model, "cond_pred_model_g") or model.cond_pred_model_g is None:
        return None
    arr = windows_array[:max_windows] if max_windows is not None else windows_array
    g_list = batched_gx(model, arr)
    for gx in g_list:
        if pred_dim >= gx.shape[-1]:
            raise IndexError(f"pred_dim {pred_dim} out of bounds for F={gx.shape[-1]}.")
    uio.save_tensor_list(g_list, cache_path)
    return g_list


# ---------------------------------------------------------------------------
# SLBP analyses (ref :458-1250)
# ---------------------------------------------------------------------------

def torch_data_preprocessing_like_slbp(time_data, sampling_t, return_numpy=False):
    from ..ops.windows import sampling_interval_from_t

    sampled = np.asarray(time_data)[:: sampling_interval_from_t(sampling_t)]
    return sampled


def _slbp_cache_elements_have_ndim(data_list, ndim):
    return bool(data_list) and all(np.asarray(item).ndim == ndim for item in data_list)


def _slbp_cache_elements_are_gx(data_list):
    return _slbp_cache_elements_have_ndim(data_list, 2) or (
        bool(data_list)
        and all(np.asarray(i).ndim == 3 and np.asarray(i).shape[0] == 1 for i in data_list)
    )


def _slbp_intrinsic_dimension(trajectories):
    """#principal components covering 80% variance (ref :686-698)."""
    t = np.asarray(trajectories, np.float64)
    if t.ndim != 2 or t.shape[0] < 2:
        return np.nan
    centered = t - t.mean(axis=0, keepdims=True)
    cov = centered.T @ centered / max(t.shape[0] - 1, 1)
    eig = np.sort(np.linalg.eigvalsh(cov))[::-1].clip(0)
    total = eig.sum()
    if total <= 0:
        return np.nan
    return int(np.argmax(np.cumsum(eig / total) >= 0.8) + 1)


def summarize_slbp_sensitivity(pred_future_list, pred_datas, model=None, device=None, pred_dim=0):
    mpv_list, pred_error_list = [], []
    for pf in pred_future_list:
        pf = np.asarray(pf)
        if pf.ndim != 3:
            raise ValueError("SLBP sensitivity cache elements must have shape [pred_len, F, n_z_samples].")
        if pred_dim >= pf.shape[1]:
            raise IndexError(f"pred_dim {pred_dim} out of bounds for F={pf.shape[1]}.")
        mpv_list.append(pf.var(axis=-1).mean(axis=0)[pred_dim])
    for pf, pd in zip(pred_future_list, pred_datas):
        pf, pd = np.asarray(pf), np.asarray(pd)
        if getattr(model, "scaler", None) is not None:
            pd = model.scaler_transform(pd)
        err = np.abs(pf.mean(axis=-1) - pd).mean(axis=0)
        pred_error_list.append(err[pred_dim])
    return mpv_list, pred_error_list


def summarize_slbp_sampling_for_fig6(pred_future_list, pred_dim=0):
    mpv_list, dim_list = [], []
    for pf in pred_future_list:
        pf = np.asarray(pf)
        if pf.ndim != 3:
            raise ValueError("SLBP sampling cache elements must have shape [pred_len, F, n_z_samples].")
        if pred_dim >= pf.shape[1]:
            raise IndexError(f"pred_dim {pred_dim} out of bounds for F={pf.shape[1]}.")
        mpv_list.append(float(pf.var(axis=-1).mean(axis=0)[pred_dim]))
        traj = pf.transpose(2, 0, 1).reshape(pf.shape[-1], -1)
        dim_list.append(_slbp_intrinsic_dimension(traj))
    return mpv_list, dim_list


def summarize_slbp_gx_for_fig6(gx_list, pred_dim=0):
    out = []
    for gx in gx_list:
        gx = np.asarray(gx)
        if gx.ndim == 3 and gx.shape[0] == 1:
            gx = gx[0]
        if gx.ndim != 2:
            raise ValueError("SLBP gx cache elements must have shape [pred_len, F] or [1, pred_len, F].")
        if pred_dim >= gx.shape[-1]:
            raise IndexError(f"pred_dim {pred_dim} out of bounds for F={gx.shape[-1]}.")
        out.append(float(gx[:, pred_dim].mean()))
    return out


def summarize_slbp_mpv_cache_for_fig5(data_list, pred_dim=0):
    if _slbp_cache_elements_have_ndim(data_list, 3):
        mpv, _dim = summarize_slbp_sampling_for_fig6(data_list, pred_dim=pred_dim)
        return mpv, "sampling"
    if _slbp_cache_elements_are_gx(data_list):
        return summarize_slbp_gx_for_fig6(data_list, pred_dim=pred_dim), "gx"
    shape = tuple(np.asarray(data_list[0]).shape) if data_list else None
    raise ValueError(f"Unsupported SLBP MPV cache element shape: {shape}")


def run_slbp_sensitivity_cache(
    model, input_windows, cache_path, device=None, force_recompute=False, max_windows=None,
    chunk_windows=16,
):
    """SLBP sampling cache: list of [pred_len, F, n_z_samples] (ref :502-526)."""
    cache_path = Path(cache_path)
    if cache_path.exists() and not force_recompute:
        try:
            return uio.load_tensor_list(cache_path)
        except Exception as exc:
            print(f"warning: failed to read cache {cache_path}, recomputing ({exc})")
    arr = np.asarray(input_windows)[:, None, :, :]  # [n, 1(Node), W, F]
    pred_len = model.pred_len
    out = batched_window_ensemble(
        model, arr, pred_len, chunk_windows=chunk_windows, max_windows=max_windows
    )
    out = [pf[0] for pf in out]  # strip the Node axis -> [pred_len, F, S]
    uio.save_tensor_list(out, cache_path)
    return out


def run_slbp_gx_cache_for_fig6(
    model, input_windows, cache_path, device=None, pred_dim=0, force_recompute=False,
    max_windows=None,
):
    cache_path = Path(cache_path)
    if cache_path.exists() and not force_recompute:
        gx_list = uio.load_tensor_list(cache_path)
        if _slbp_cache_elements_are_gx(gx_list):
            return gx_list
    if not hasattr(model, "cond_pred_model_g") or model.cond_pred_model_g is None:
        raise ValueError("model does not provide cond_pred_model_g for gx generation.")
    arr = np.asarray(input_windows)[:, None, :, :]
    if max_windows is not None:
        arr = arr[:max_windows]
    g_list = [g[0] for g in batched_gx(model, arr)]
    for gx in g_list:
        if pred_dim >= gx.shape[-1]:
            raise IndexError(f"pred_dim {pred_dim} out of bounds for F={gx.shape[-1]}.")
    uio.save_tensor_list(g_list, cache_path)
    return g_list


def _slbp_dataset_config(model_root, model_name, windows=None, pred_len=None, sampling_t=None):
    model_root = _resolve_project_path(model_root)
    config_path = model_root / "models" / f"{model_name}.yaml"
    method_config = None
    if config_path.exists():
        import yaml

        with open(config_path, "r", encoding="utf-8") as f:
            method_config = yaml.safe_load(f)
    dataset_config = method_config.get("dataset", {}) if method_config else {}
    return {
        "windows": windows if windows is not None else dataset_config.get("windows", 200),
        "pred_len": pred_len if pred_len is not None else dataset_config.get("pred_len", 200),
        "sampling_t": sampling_t if sampling_t is not None else dataset_config.get("sampling_t", 100),
        "method_config": method_config,
    }


def slbp_sensitivity_ews(
    model_root, model_name, torch_time_series, time_data, data_trend="increase", pred_dim=0,
    sample_window_step=10, infer_params=None, force_recompute=False, max_windows=None,
    device=None,
):
    """Window-length sensitivity sweep driver (ref :553-621)."""
    model_root = _resolve_project_path(model_root)
    model, method_config, loaded_net_param = load_sensitivity_model(
        model_root, model_name, device=device, infer_params=infer_params
    )
    dataset_config = method_config.get("dataset", {})
    windows = dataset_config["windows"]
    pred_len = dataset_config["pred_len"]
    sampling_t = dataset_config["sampling_t"]

    input_windows, pred_windows, time_points = slbp_sensitivity_windows(
        np.asarray(torch_time_series), time_data, windows, pred_len, sampling_t,
        sample_window_step,
    )
    cache_path = slbp_sensitivity_cache_path(model_root, model_name, data_trend, sample_window_step)
    pred_future_list = run_slbp_sensitivity_cache(
        model, input_windows, cache_path, device=device,
        force_recompute=force_recompute, max_windows=max_windows,
    )
    mpv_list, prediction_error_list = summarize_slbp_sensitivity(
        pred_future_list, pred_windows, model=model, device=device, pred_dim=pred_dim
    )
    return {
        "time_points": time_points,
        "mpv": mpv_list,
        "prediction_error": prediction_error_list,
        "pred_future_list": pred_future_list,
        "cache_path": str(cache_path),
        "windows": windows,
        "pred_len": pred_len,
        "sampling_t": sampling_t,
        "sample_window_step": sample_window_step,
        "model_root": str(model_root),
        "model_name": model_name,
        "loaded_net_param": loaded_net_param,
    }


def slbp_sampling_analysis(
    model_root, model_name, torch_time_series, time_data, data_trend="increase", pred_dim=0,
    sample_window_step=10, cache_subdir=None, windows=None, pred_len=None, sampling_t=None,
    infer_params=None, force_recompute=False, max_windows=None, device=None,
    allow_unavailable=True,
):
    """Fig-6 sampling-MPV + intrinsic dimension (ref :768-885)."""
    cfg = _slbp_dataset_config(model_root, model_name, windows, pred_len, sampling_t)
    input_windows, _pred, time_points = slbp_sensitivity_windows(
        np.asarray(torch_time_series), time_data, cfg["windows"], cfg["pred_len"],
        cfg["sampling_t"], sample_window_step,
    )
    cache_path = slbp_fig6_cache_path(
        model_root, model_name, data_trend, sample_window_step, cache_subdir, "pred_future"
    )
    sampling_cache_path = slbp_fig6_cache_path(
        model_root, model_name, data_trend, sample_window_step, cache_subdir,
        "sampling_pred_future",
    )
    try:
        active_cache_path = cache_path
        pred_future_list = None
        if not force_recompute:
            if cache_path.exists():
                candidate = uio.load_tensor_list(cache_path)
                if _slbp_cache_elements_have_ndim(candidate, 3):
                    pred_future_list = candidate
                else:
                    active_cache_path = sampling_cache_path
            if pred_future_list is None and sampling_cache_path.exists():
                candidate = uio.load_tensor_list(sampling_cache_path)
                if _slbp_cache_elements_have_ndim(candidate, 3):
                    pred_future_list = candidate
                    active_cache_path = sampling_cache_path
                else:
                    raise ValueError(
                        f"sampling cache exists but is not [pred_len, F, n_z_samples]: {sampling_cache_path}"
                    )
        if pred_future_list is None:
            if cache_path.exists() and active_cache_path == cache_path:
                active_cache_path = sampling_cache_path
            model, _mc, _np = load_sensitivity_model(
                model_root, model_name, device=device, infer_params=infer_params
            )
            pred_future_list = run_slbp_sensitivity_cache(
                model, input_windows, active_cache_path, device=device,
                force_recompute=force_recompute, max_windows=max_windows,
            )
            if not _slbp_cache_elements_have_ndim(pred_future_list, 3):
                raise ValueError(
                    f"generated sampling cache is not [pred_len, F, n_z_samples]: {active_cache_path}"
                )
        mpv, intrinsic_dimension = summarize_slbp_sampling_for_fig6(pred_future_list, pred_dim)
        return {
            "available": True,
            "time_points": time_points[: len(mpv)],
            "mpv": mpv,
            "intrinsic_dimension": intrinsic_dimension,
            "pred_future_list": pred_future_list,
            "cache_path": str(active_cache_path),
            "windows": cfg["windows"],
            "pred_len": cfg["pred_len"],
            "sampling_t": cfg["sampling_t"],
            "sample_window_step": sample_window_step,
            "reason": "",
        }
    except Exception as exc:
        if not allow_unavailable:
            raise
        return {
            "available": False,
            "time_points": time_points,
            "mpv": [],
            "intrinsic_dimension": [],
            "pred_future_list": None,
            "cache_path": str(sampling_cache_path if cache_path.exists() else cache_path),
            "windows": cfg["windows"],
            "pred_len": cfg["pred_len"],
            "sampling_t": cfg["sampling_t"],
            "sample_window_step": sample_window_step,
            "reason": str(exc),
        }


def slbp_gx_analysis(
    model_root, model_name, torch_time_series, time_data, data_trend="increase", pred_dim=0,
    sample_window_step=10, cache_subdir=None, windows=None, pred_len=None, sampling_t=None,
    infer_params=None, force_recompute=False, max_windows=None, device=None,
):
    """Fig-6 gx-MPV with the full legacy cache-name fallback chain (ref :888-1023)."""
    cfg = _slbp_dataset_config(model_root, model_name, windows, pred_len, sampling_t)
    input_windows, _pred, time_points = slbp_sensitivity_windows(
        np.asarray(torch_time_series), time_data, cfg["windows"], cfg["pred_len"],
        cfg["sampling_t"], sample_window_step,
    )
    gx_cache_path = slbp_fig6_pred_future_gx_cache_path(
        model_root, model_name, data_trend, sample_window_step, cache_subdir
    )
    old_gx_cache_path = slbp_fig6_cache_path(
        model_root, model_name, data_trend, sample_window_step, cache_subdir, "gx"
    )
    legacy_cache_path = slbp_fig6_cache_path(
        model_root, model_name, data_trend, sample_window_step, cache_subdir, "pred_future"
    )
    legacy_name_cache_path = slbp_fig6_cache_path(
        model_root, _legacy_single_underscore_model_name(model_name), data_trend,
        sample_window_step, cache_subdir, "pred_future",
    )

    def _generate():
        model, _mc, _np = load_sensitivity_model(
            model_root, model_name, device=device, infer_params=infer_params
        )
        return run_slbp_gx_cache_for_fig6(
            model, input_windows, gx_cache_path, device=device, pred_dim=pred_dim,
            force_recompute=force_recompute, max_windows=max_windows,
        )

    if gx_cache_path.exists() and not force_recompute:
        gx_list = uio.load_tensor_list(gx_cache_path)
    elif old_gx_cache_path.exists() and not force_recompute:
        gx_list = uio.load_tensor_list(old_gx_cache_path)
        if not _slbp_cache_elements_are_gx(gx_list):
            raise ValueError(f"gx cache exists but is not a gx cache: {old_gx_cache_path}")
        gx_cache_path = old_gx_cache_path
    elif legacy_cache_path.exists() and not force_recompute:
        gx_list = uio.load_tensor_list(legacy_cache_path)
        if _slbp_cache_elements_are_gx(gx_list):
            gx_cache_path = legacy_cache_path
        else:
            gx_list = _generate()
    elif legacy_name_cache_path.exists() and not force_recompute:
        gx_list = uio.load_tensor_list(legacy_name_cache_path)
        if _slbp_cache_elements_are_gx(gx_list):
            gx_cache_path = legacy_name_cache_path
        else:
            gx_list = _generate()
    else:
        gx_list = _generate()

    gx_mpv = summarize_slbp_gx_for_fig6(gx_list, pred_dim=pred_dim)
    return {
        "time_points": time_points[: len(gx_mpv)],
        "gx_mpv": gx_mpv,
        "gx_list": gx_list,
        "cache_path": str(gx_cache_path),
        "windows": cfg["windows"],
        "pred_len": cfg["pred_len"],
        "sampling_t": cfg["sampling_t"],
        "sample_window_step": sample_window_step,
    }


def slbp_mpv_analysis(
    model_root, model_name, torch_time_series, time_data, cache_path, pred_dim=0,
    sample_window_step=10, windows=None, pred_len=None, sampling_t=None, infer_params=None,
    force_recompute=False, max_windows=None, device=None,
):
    """Fig-5 MPV from an arbitrary cache path, shape-dispatched (ref :1039-1114)."""
    cfg = _slbp_dataset_config(model_root, model_name, windows, pred_len, sampling_t)
    cache_path = _resolve_project_path(cache_path)
    sampled_time = torch_data_preprocessing_like_slbp(time_data, cfg["sampling_t"])

    if cache_path.exists() and not force_recompute:
        data_list = uio.load_tensor_list(cache_path)
        inferred_step = infer_sample_window_step_from_cache(
            len(sampled_time), cfg["windows"], len(data_list), sample_window_step
        )
        mpv, source = summarize_slbp_mpv_cache_for_fig5(data_list, pred_dim=pred_dim)
        return {
            "time_points": sampled_time[cfg["windows"] - 1 :: inferred_step][: len(mpv)],
            "mpv": mpv,
            "pred_future_list": data_list,
            "cache_path": str(cache_path),
            "windows": cfg["windows"],
            "pred_len": cfg["pred_len"],
            "sampling_t": cfg["sampling_t"],
            "sample_window_step": inferred_step,
            "uncertainty_source": source,
        }

    model, _mc, _np = load_sensitivity_model(
        model_root, model_name, device=device, infer_params=infer_params
    )
    input_windows, _pred, time_points = slbp_sensitivity_windows(
        np.asarray(torch_time_series), time_data, cfg["windows"], cfg["pred_len"],
        cfg["sampling_t"], sample_window_step,
    )
    pred_future_list = run_slbp_sensitivity_cache(
        model, input_windows, cache_path, device=device,
        force_recompute=force_recompute, max_windows=max_windows,
    )
    mpv, source = summarize_slbp_mpv_cache_for_fig5(pred_future_list, pred_dim=pred_dim)
    return {
        "time_points": time_points[: len(mpv)],
        "mpv": mpv,
        "pred_future_list": pred_future_list,
        "cache_path": str(cache_path),
        "windows": cfg["windows"],
        "pred_len": cfg["pred_len"],
        "sampling_t": cfg["sampling_t"],
        "sample_window_step": sample_window_step,
        "uncertainty_source": source,
    }


def slbp_direct_model_cache_analysis(
    model_save_file, torch_time_series, time_data, cache_path, pred_dim=0,
    sample_window_step=10, cache_kind="auto", infer_params=None, force_recompute=False,
    max_windows=None, device=None, compute_prediction_error=False,
):
    """MPV from a model dir + explicit cache path (ref :1117-1230)."""
    method_config = read_model_config(model_save_file)
    dataset_cfg = method_config.get("dataset", {})
    windows = int(dataset_cfg.get("windows", method_config.get("net", {}).get("windows", 200)))
    pred_len = int(dataset_cfg.get("pred_len", method_config.get("net", {}).get("pred_len", 200)))
    sampling_t = int(dataset_cfg.get("sampling_t", 100))
    cache_path = _resolve_project_path(cache_path)
    sampled_time = torch_data_preprocessing_like_slbp(time_data, sampling_t)

    data_list = None
    model = None
    if cache_path.exists() and not force_recompute:
        data_list = uio.load_tensor_list(cache_path)
        mpv, source = summarize_slbp_mpv_cache_for_fig5(data_list, pred_dim=pred_dim)
    else:
        if cache_kind not in {"gx", "sampling"}:
            raise ValueError("cache_kind must be 'gx' or 'sampling' when cache is missing.")
        model, _np = load_model_from_dir(
            model_save_file, device=device, infer_params=infer_params,
            method_config=method_config,
        )
        input_windows, _pred, _tp = slbp_sensitivity_windows(
            np.asarray(torch_time_series), time_data, windows, pred_len, sampling_t,
            sample_window_step,
        )
        if cache_kind == "gx":
            data_list = run_slbp_gx_cache_for_fig6(
                model, input_windows, cache_path, device=device, pred_dim=pred_dim,
                force_recompute=force_recompute, max_windows=max_windows,
            )
        else:
            data_list = run_slbp_sensitivity_cache(
                model, input_windows, cache_path, device=device,
                force_recompute=force_recompute, max_windows=max_windows,
            )
        mpv, source = summarize_slbp_mpv_cache_for_fig5(data_list, pred_dim=pred_dim)

    inferred_step = infer_sample_window_step_from_cache(
        len(sampled_time), windows, len(data_list), sample_window_step
    )
    time_points = sampled_time[windows - 1 :: inferred_step][: len(mpv)]
    result = {
        "time_points": time_points,
        "mpv": mpv,
        "pred_future_list": data_list,
        "cache_path": str(cache_path),
        "windows": windows,
        "pred_len": pred_len,
        "sampling_t": sampling_t,
        "sample_window_step": inferred_step,
        "uncertainty_source": source,
    }
    if compute_prediction_error:
        if source != "sampling":
            raise ValueError(f"prediction_error requires a sampling cache, got '{source}'.")
        if model is None:
            model, _np = load_model_from_dir(
                model_save_file, device=device, infer_params=infer_params,
                method_config=method_config,
            )
        _inp, pred_windows, _tp = slbp_sensitivity_windows(
            np.asarray(torch_time_series), time_data, windows, pred_len, sampling_t,
            inferred_step,
        )
        _mpv, prediction_error = summarize_slbp_sensitivity(
            data_list, pred_windows[: len(data_list)], model=model, device=device,
            pred_dim=pred_dim,
        )
        result["prediction_error"] = prediction_error
    return result


def slbp_raw_window_variance(
    torch_time_series, time_data, windows=200, sampling_t=100, sample_window_step=10, pred_dim=0
):
    """Raw rolling variance control (ref :1233-1250) — one fused reduce_window."""
    import jax.numpy as jnp

    from ..ops.windows import sampling_interval_from_t

    series = np.asarray(torch_time_series)
    sampled = series[:: sampling_interval_from_t(sampling_t)]
    sampled_time = torch_data_preprocessing_like_slbp(time_data, sampling_t)
    if sampled.ndim != 2:
        raise ValueError("SLBP raw series must have shape [T, F].")
    if pred_dim >= sampled.shape[1]:
        raise IndexError(f"pred_dim {pred_dim} out of bounds for F={sampled.shape[1]}.")
    variances = np.asarray(
        window_variance_1d(jnp.asarray(sampled[:, pred_dim]), windows, sample_window_step)
    )
    time_points = sampled_time[windows - 1 :: sample_window_step][: len(variances)]
    return {
        "time_points": time_points,
        "variance": variances,
        "windows": windows,
        "sampling_t": sampling_t,
        "sample_window_step": sample_window_step,
    }


# ---------------------------------------------------------------------------
# The facade (ref :1253-1541)
# ---------------------------------------------------------------------------

def default_sample_window_step(dynamic_type, task_model=None, dataset_config=None):
    dataset_config = dataset_config or {}
    if task_model == "DiffSTG" and dataset_config.get("interval_step") is not None:
        return dataset_config["interval_step"]
    return DEFAULT_SAMPLE_WINDOW_STEP.get(dynamic_type, 10)


def uncertainty_ews(
    model_save_file=None,
    data_file=None,
    torch_time_series=None,
    time_data=None,
    dynamic_type=None,
    task_model=None,
    graph_file=None,
    cache_path=None,
    sample_window_step=None,
    sampling_t=None,
    infer_params=None,
    pred_dim=0,
    force_recompute=False,
    save_nsdiff_g=True,
    nsdiff_g_path=None,
    uncertainty_method="sampling",
    max_windows=None,
    device=None,
    load_model_when_cached=False,
    chunk_windows=8,
    cache_mode="write",
):
    """The single most important entry point (ref :1253-1541).

    cache_mode (TPU-extra, not part of the reference API):
      "write" — reference behavior: materialize the `.pt` sample-ensemble
      cache and summarize it on the host.
      "none"  — skip the ensemble cache entirely and reduce the MPV on
      device (fast_mpv_sweep): only two scalars per window leave the chip
      (~40% faster than the cache path on a tunneled v5e).  Sampling path of
      non-graph models only; `pred_future_list` is None in the result.

    Scale consistency (deliberate fix of a reference inconsistency): in the
    reference, a cache hit summarizes with model=None, which skips the
    scaler inverse transform (ref :267-291) and silently returns MPV in
    *scaled* space, while a fresh compute of the very same windows returns
    *raw*-space MPV — a re-rendered figure's y-axis changes by
    scaler_std**2.  Here, cache-hit summaries recover the scaler statistics
    from the checkpoint (``load_scaler_view`` — no model construction, no
    device arrays) so every path (fresh compute, cache reload, and the
    device-side fast_mpv_sweep) reports raw-space MPV.
    """
    dynamic_type = dynamic_name(dynamic_type)
    uncertainty_method = str(uncertainty_method).lower()
    aliases = {
        "variance": "sampling", "sampling_variance": "sampling", "pred_future": "sampling",
        "pred": "sampling", "g": "gx", "preg": "gx", "nsdiff_g": "gx",
    }
    uncertainty_method = aliases.get(uncertainty_method, uncertainty_method)
    if uncertainty_method not in {"sampling", "gx", "both"}:
        raise ValueError("uncertainty_method must be one of: sampling, gx, both.")
    if cache_mode not in {"write", "none"}:
        raise ValueError("cache_mode must be 'write' or 'none'.")

    if data_file is not None:
        data_file = _resolve_project_path(data_file)
        loaded = load_dynamic_data(data_file, dynamic_type=dynamic_type)
        torch_time_series = loaded["torch_time_series"]
        time_data = loaded["time_data"]
        dynamic_type = dynamic_name(dynamic_type) or loaded["dynamic_type"]
    elif torch_time_series is not None:
        torch_time_series = normalize_time_series(torch_time_series, dynamic_type=dynamic_type)
    else:
        raise ValueError("Provide data_file or torch_time_series.")
    if time_data is None:
        raise ValueError("time_data is required when data_file is not provided.")

    method_config = None
    model = None
    loaded_net_param = None
    if model_save_file is not None:
        model_save_file = _resolve_project_path(model_save_file)
        method_config = read_model_config(model_save_file)
    if task_model is None and method_config is not None:
        task_model = method_config.get("net", {}).get("task_model")

    dataset_config = method_config.get("dataset", {}) if method_config else {}
    windows = dataset_config.get("windows")
    pred_len = dataset_config.get("pred_len")
    if windows is None or pred_len is None:
        raise ValueError("model_trained.yaml must provide dataset.windows and dataset.pred_len.")

    cache_path = resolve_cache_path(cache_path, model_save_file, data_file, dynamic_type)
    need_sampling = uncertainty_method in {"sampling", "both"}
    need_gx = uncertainty_method in {"gx", "both"} or (
        save_nsdiff_g and uncertainty_method == "sampling"
    )
    nsdiff_path = None
    if need_gx:
        base = nsdiff_g_path if nsdiff_g_path is not None else cache_path.parent
        nsdiff_path = resolve_cache_path(base, model_save_file, data_file, dynamic_type, "_gx")

    cached_pred = None
    if need_sampling and cache_mode == "write" and cache_path.exists() and not force_recompute:
        cached_pred = (
            normalize_diffstg_pred_future_list(uio.load_tensor_list(cache_path))
            if task_model == "DiffSTG"
            else uio.load_tensor_list(cache_path)
        )
    cached_g = None
    if need_gx and nsdiff_path is not None and nsdiff_path.exists() and not force_recompute:
        cached_g = uio.load_tensor_list(nsdiff_path)

    # MPV summary sidecars: consulted only when the corresponding ensemble
    # cache is absent (reference `.pt` semantics win when present); verified
    # against the window fingerprint once windows are built below.
    sidecar = None
    gx_sidecar = None
    if not force_recompute:
        if need_sampling and cached_pred is None:
            sidecar = _load_mpv_sidecar(cache_path)
        if need_gx and nsdiff_path is not None and cached_g is None:
            gx_sidecar = _load_mpv_sidecar(nsdiff_path)
            if gx_sidecar is not None and gx_sidecar.get("pred_dim", 0) != pred_dim:
                gx_sidecar = None

    if sampling_t is None:
        sampling_t = dataset_config.get("sampling_t", DEFAULT_SAMPLING_T.get(dynamic_type, 0.1))
    sampled_series, sampled_time = sample_time_series(
        np.asarray(torch_time_series), time_data, sampling_t
    )

    step_from_sidecar = False
    fallback_step = default_sample_window_step(dynamic_type, task_model, dataset_config)
    if sample_window_step is None:
        cache_len = (
            len(cached_pred) if cached_pred is not None
            else (len(cached_g) if cached_g is not None else None)
        )
        sidecar_step = next((s.get("sample_window_step")
                             for s in (sidecar, gx_sidecar)
                             if s is not None and s.get("sample_window_step")), None)
        if cache_len is not None:
            sample_window_step = infer_sample_window_step_from_cache(
                sampled_series.shape[1], windows, cache_len, fallback_step
            )
        elif sidecar_step is not None:
            sample_window_step = int(sidecar_step)
            step_from_sidecar = True
        else:
            sample_window_step = fallback_step

    windows_array, time_points = sliding_windows(
        sampled_series, sampled_time, windows, sample_window_step
    )
    if sidecar is not None or gx_sidecar is not None:
        n_side = (len(windows_array) if max_windows is None
                  else min(len(windows_array), max_windows))
        fp = _sweep_fingerprint(windows_array[:n_side], pred_len, n_side)
        if sidecar is not None and sidecar.get("fingerprint") != fp:
            sidecar = None
        if gx_sidecar is not None and gx_sidecar.get("fingerprint") != fp:
            gx_sidecar = None
        if step_from_sidecar and sidecar is None and gx_sidecar is None:
            # the step itself came from a stale sidecar: rebuild the windows
            # at the normal fallback step as if no sidecar existed
            sample_window_step = fallback_step
            windows_array, time_points = sliding_windows(
                sampled_series, sampled_time, windows, sample_window_step
            )

    def _load_model():
        nonlocal model, loaded_net_param
        if model is None:
            model, loaded_net_param = load_model_from_dir(
                model_save_file, device=device, infer_params=infer_params,
                method_config=method_config,
            )
        return model

    mpv_from_sidecar = False
    if need_sampling:
        if sidecar is not None and sidecar.get("complete"):
            # cross-round durability: the ensemble cache is gone (machine
            # wipe) but the committed sidecar carries the finished arm's MPV
            pred_future_list = None
            pred_mean_list = [float(v) for v in sidecar["pred_mean"]]
            uncertainty_ews_list = [float(v) for v in sidecar["ews"]]
            mpv_from_sidecar = True
        elif task_model == "DiffSTG":
            if dynamic_type not in NETWORK_DYNAMICS:
                raise ValueError("DiffSTG only supports network dynamics: SIS, neuronal, biomass.")
            if graph_file is None:
                raise ValueError("graph_file is required for DiffSTG.")
            if cached_pred is not None:
                pred_future_list = cached_pred
                if model_save_file is not None and load_model_when_cached:
                    _load_model()
            else:
                if model_save_file is None:
                    raise ValueError(
                        "model_save_file is required when cache_path does not exist or force_recompute=True."
                    )
                if infer_params is None:
                    infer_params = {
                        "parallel_sampling": 10, "sequential_sampling": 1,
                        "n_z_samples": 10, "diffusion_steps": 20,
                    }
                _load_model()
                graph = graphml_to_adjacency(_resolve_project_path(graph_file))
                pred_future_list = run_diffstg_evaluation_cache(
                    model, windows_array, pred_len, graph, cache_path, device=device,
                    force_recompute=force_recompute, max_windows=max_windows,
                    sample_window_step=sample_window_step,
                )
        elif cached_pred is not None:
            pred_future_list = cached_pred
            if model_save_file is not None and load_model_when_cached:
                _load_model()
        elif cache_mode == "none":
            if model_save_file is None:
                raise ValueError("model_save_file is required with cache_mode='none'.")
            _load_model()
            arr = windows_array[:max_windows] if max_windows is not None else windows_array
            mpv, pm = fast_mpv_sweep(
                model, arr, pred_len,
                chunk_windows=bounded_chunk_windows(model, arr, chunk_windows))
            pred_future_list = None
            pred_mean_list = [float(v) for v in pm]
            uncertainty_ews_list = [float(v) for v in mpv]
        else:
            if model_save_file is None:
                raise ValueError(
                    "model_save_file is required when cache_path does not exist or force_recompute=True."
                )
            _load_model()
            n_arm = (len(windows_array) if max_windows is None
                     else min(len(windows_array), max_windows))
            ens_partial = Path(cache_path).with_name(Path(cache_path).name + ".partial")
            if (sidecar is not None and not ens_partial.exists()
                    and 0 < int(sidecar.get("n_windows_done", 0)) < n_arm):
                # the done prefix's ensembles are gone but its MPVs survive
                # in the sidecar: resume the sweep at the MPV level
                pred_mean_list, uncertainty_ews_list = resume_mpv_sweep(
                    model, windows_array, pred_len, cache_path, sidecar, n_arm,
                    chunk_windows=bounded_chunk_windows(model, windows_array,
                                                        chunk_windows),
                    checkpoint_every=getattr(model, "eval_checkpoint_every", 32),
                    sample_window_step=sample_window_step,
                )
                pred_future_list = None
                mpv_from_sidecar = True
            else:
                pred_future_list = run_evaluation_cache(
                    model, windows_array, pred_len, cache_path, device=device,
                    force_recompute=force_recompute, max_windows=max_windows,
                    chunk_windows=bounded_chunk_windows(model, windows_array,
                                                        chunk_windows),
                    checkpoint_every=getattr(model, "eval_checkpoint_every", 32),
                    sample_window_step=sample_window_step,
                )
        if pred_future_list is not None:
            summarize_model = model
            if summarize_model is None and model_save_file is not None:
                summarize_model = load_scaler_view(model_save_file)
            pred_mean_list, uncertainty_ews_list = summarize_pred_future_list(
                pred_future_list, model=summarize_model
            )
        if not mpv_from_sidecar and cache_path is not None:
            # durable per-arm summary (fresh compute AND `.pt` cache hits —
            # the latter backfills committable sidecars from legacy caches)
            n_arm = (len(windows_array) if max_windows is None
                     else min(len(windows_array), max_windows))
            raw_space = (pred_future_list is None  # fast path inverts on device
                         or model is not None
                         or (model_save_file is not None
                             and load_scaler_view(model_save_file) is not None))
            _save_mpv_sidecar(
                cache_path,
                fingerprint=_sweep_fingerprint(windows_array[:n_arm], pred_len, n_arm),
                n_total=n_arm, sample_window_step=sample_window_step,
                pred_mean=pred_mean_list, ews=uncertainty_ews_list,
                complete=len(uncertainty_ews_list) >= n_arm,
                extra={"raw_space": bool(raw_space)},
            )
    else:
        pred_future_list = None
        pred_mean_list = []
        uncertainty_ews_list = []

    valid_len = len(uncertainty_ews_list)
    result = {
        "pred_future_list": pred_future_list,
        "pred_mean": pred_mean_list,
        "ews": uncertainty_ews_list,
        "time_points": time_points[:valid_len],
        "cache_path": str(cache_path),
        "figure_path": str(resolve_figure_path(cache_path)),
        "torch_time_series": torch_time_series,
        "time_data": np.asarray(time_data),
        "dynamic_type": dynamic_type,
        "sampling_t": sampling_t,
        "sample_window_step": sample_window_step,
        "windows": windows,
        "pred_len": pred_len,
        "task_model": task_model,
        "uncertainty_method": uncertainty_method,
        "uncertainty_source": "sampling" if need_sampling else None,
        "graph_file": str(_resolve_project_path(graph_file)) if graph_file is not None else None,
        "model_save_file": str(model_save_file) if model_save_file is not None else None,
        "loaded_net_param": loaded_net_param,
    }

    has_g_model = (
        model is not None
        and hasattr(model, "cond_pred_model_g")
        and model.cond_pred_model_g is not None
    )
    should_handle_g = need_gx and ("NsDiff" in str(task_model) or has_g_model)
    g_list = None
    g_summary = None
    if should_handle_g:
        if cached_g is not None:
            g_list = cached_g
        elif gx_sidecar is not None and gx_sidecar.get("complete"):
            # durable gx summary from a wiped ensemble cache (sidecar doc
            # above); g arrays themselves are gone, the MPV signal survives
            g_summary = ([float(v) for v in gx_sidecar["pred_mean"]],
                         [float(v) for v in gx_sidecar["ews"]])
        elif (uncertainty_method == "sampling" and model is None
              and model_save_file is not None
              and not (Path(model_save_file) / "model_trained").exists()):
            # sampling came from a sidecar/cache and no checkpoint exists:
            # the gx side artifact is unavailable, but the render the caller
            # asked for (sampling MPV) is not — skip gx instead of failing
            pass
        else:
            if model is None and model_save_file is not None:
                _load_model()
                result["loaded_net_param"] = loaded_net_param
            if (
                model is not None
                and hasattr(model, "cond_pred_model_g")
                and model.cond_pred_model_g is not None
            ):
                g_list = run_nsdiff_g_cache(
                    model, windows_array, nsdiff_path, device=device, pred_dim=pred_dim,
                    force_recompute=force_recompute, max_windows=max_windows,
                )
        if g_list is not None:
            g_pred_mean, g_ews = summarize_nsdiff_g_list(g_list, pred_dim=pred_dim)
            n_arm = (len(windows_array) if max_windows is None
                     else min(len(windows_array), max_windows))
            _save_mpv_sidecar(
                nsdiff_path,
                fingerprint=_sweep_fingerprint(windows_array[:n_arm], pred_len, n_arm),
                n_total=n_arm, sample_window_step=sample_window_step,
                pred_mean=g_pred_mean, ews=g_ews,
                complete=len(g_ews) >= n_arm, extra={"pred_dim": pred_dim},
            )
        elif g_summary is not None:
            g_pred_mean, g_ews = g_summary
        if g_list is not None or g_summary is not None:
            result["nsdiff_g"] = {
                "pred_future_list": g_list,
                "pred_mean": g_pred_mean,
                "ews": g_ews,
                "time_points": time_points[: len(g_ews)],
                "cache_path": str(nsdiff_path),
            }
            if uncertainty_method == "gx":
                result["pred_future_list"] = None
                result["pred_mean"] = g_pred_mean
                result["ews"] = g_ews
                result["time_points"] = time_points[: len(g_ews)]
                result["cache_path"] = str(nsdiff_path)
                result["figure_path"] = str(resolve_figure_path(nsdiff_path))
                result["uncertainty_source"] = "gx"

    if uncertainty_method == "gx" and g_list is None and g_summary is None:
        raise ValueError(
            "uncertainty_method='gx' requires a task_model containing 'NsDiff' "
            "and a loaded model with cond_pred_model_g, or an existing _gx cache."
        )
    return result


def plot_single_model_check(result, pred_dim=0, title=None, save_path=None, axs=None):
    """Raw state + uncertainty two-panel check plot (ref :1544-1588)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    owns_figure = axs is None
    if axs is None:
        fig, axs = plt.subplots(2, 1, figsize=(6.2, 4.2), gridspec_kw={"hspace": 0.0})
    else:
        axs = np.asarray(axs, dtype=object).ravel()
        if len(axs) != 2:
            raise ValueError("plot_single_model_check expects 2 axes.")
        fig = axs[0].figure

    dynamic_type = result.get("dynamic_type")
    series = np.asarray(result["torch_time_series"])
    time_data = np.asarray(result["time_data"])
    if dynamic_type in NETWORK_DYNAMICS:
        y = series[:, :, 0].mean(axis=0)
    else:
        y = series[0, :, pred_dim]

    axs[0].plot(time_data[: len(y)], y, color="#2F5597", linewidth=1.4)
    axs[0].set_ylabel("State")
    if title:
        axs[0].set_title(title)
    axs[1].plot(
        result["time_points"][: len(result["ews"])], result["ews"], ".",
        color="#C44E52", markersize=3,
    )
    axs[1].set_ylabel("Uncertainty")
    axs[1].set_xlabel("Time")
    axs[1].sharex(axs[0])
    for ax in axs:
        ax.tick_params(labelsize=9)
    if owns_figure:
        fig.tight_layout()
    if save_path is not None:
        fig.savefig(save_path, dpi=300, bbox_inches="tight")
    return fig
