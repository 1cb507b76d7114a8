"""Bury et al. (PNAS 2021) deep-learning EWS baseline.

Parity with /root/reference/run_bury_ml_baseline.py (309 LoC): loads the
released Keras CNN-LSTM classifiers (including the robust HDF5 weight
re-binding fallback for .keras archives tf.keras fails to resolve,
run_bury_ml_baseline.py:35-92), applies them incrementally over the detrended
series, and saves per-dataset fold/hopf/branch/null probability CSV + pt +
metadata JSON.

The incremental application (``apply_classifier_inc`` in ewstools, which is
not installed here) is reimplemented to the Bury protocol: at each evaluation
time t the residual prefix up to t is normalised by its mean absolute value,
right-aligned into a zero-padded window of the classifier's input length, and
classified; per-time probabilities are averaged across the classifier
ensemble.

TensorFlow is imported lazily (only when classifiers are actually run).
"""
from __future__ import annotations

import argparse
import json
import re
import tempfile
import zipfile
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd

from ..utils import io as uio
from .ews_classic import detrend

PROBABILITY_COLUMNS = ["fold_prob", "hopf_prob", "branch_prob", "null_prob"]

# The released Bury et al. classifier binaries are vendored with the repo
# (run_bury_ml_baseline.py:24-30 layout), so the baseline runs standalone.
DEFAULT_MODEL_ROOT = (
    Path(__file__).resolve().parents[2]
    / "evaluation_and_analysis" / "bury_2021_ml_models" / "best_models_tf215"
)

__all__ = [
    "load_keras_model",
    "load_classifiers",
    "infer_classifier_length",
    "apply_bury_classifiers",
    "save_probability_outputs",
    "run_one",
    "main",
]


def load_keras_model(model_path: Path):
    """Load a released classifier; fall back to explicit HDF5 weight binding
    by shape when tf.keras cannot resolve the archive's layer paths."""
    try:
        from tensorflow.keras.models import load_model, model_from_json
    except Exception as exc:  # pragma: no cover
        raise RuntimeError(
            "TensorFlow/Keras is required to run Bury classifiers."
        ) from exc
    try:
        return load_model(model_path, compile=False, safe_mode=False)
    except (ValueError, TypeError):
        config_text = _archive_member(model_path, "config.json").decode("utf-8")
        try:
            model = model_from_json(config_text)
        except (ValueError, TypeError):
            # Keras 3 rejects Keras-2 layer kwargs (batch_input_shape,
            # time_major, ...): rebuild the Sequential graph layer by layer
            # from the sanitised legacy config.
            model = _rebuild_from_legacy_config(json.loads(config_text))
        _bind_archive_weights(model, model_path)
        return model


def _archive_member(model_path: Path, member: str) -> bytes:
    with zipfile.ZipFile(model_path) as archive:
        return archive.read(member)


def _bind_archive_weights(model, model_path: Path) -> None:
    """Assign HDF5 weight groups to model layers when tf.keras can't resolve
    the archive's internal layer paths itself.

    Two-phase global assignment (vs. a greedy per-layer scan): first every
    group whose name equals a layer name (and whose tensor shapes agree) is
    claimed; then each remaining layer takes the unique leftover group with a
    matching shape signature, erroring on ambiguity instead of guessing.
    """
    import h5py

    with tempfile.NamedTemporaryFile(suffix=".h5") as tmp:
        tmp.write(_archive_member(model_path, "model.weights.h5"))
        tmp.flush()
        with h5py.File(tmp.name, "r") as handle:
            groups = {}  # name -> list of arrays, in var order
            for name, group in handle["layers"].items():
                bank = group["cell"]["vars"] if "cell" in group else group["vars"]
                groups[name] = [bank[str(i)][()] for i in range(len(bank))]

    signature = lambda arrays: tuple(tuple(a.shape) for a in arrays)
    weighted = [l for l in model.layers if l.weights]
    assignment = {}

    # phase 1: trust matching names
    for layer in weighted:
        arrays = groups.get(layer.name)
        if arrays is not None and signature(arrays) == signature(layer.get_weights()):
            assignment[layer.name] = arrays

    # phase 2: remaining layers resolve by shape signature among leftovers.
    # Per signature, demanders (in model/topological order) pair with groups
    # in NATURAL name order ("lstm_2" before "lstm_10" — h5py iterates
    # alphabetically, which would misorder numeric suffixes); any count
    # mismatch is an error, never a guess.
    def natural(name: str):
        m = re.match(r"(.*?)(\d+)?$", name)
        return (m.group(1), int(m.group(2) or 0))

    leftovers = {n: a for n, a in groups.items() if n not in assignment}
    unresolved = [l for l in weighted if l.name not in assignment]
    by_sig = {}
    for layer in unresolved:
        by_sig.setdefault(signature(layer.get_weights()), []).append(layer)
    for want, demanders in by_sig.items():
        hits = sorted(
            (n for n, a in leftovers.items() if signature(a) == want), key=natural
        )
        if len(hits) != len(demanders):
            names = [l.name for l in demanders]
            raise ValueError(
                f"Cannot bind weight groups {hits} to layers {names} "
                f"(signature {want}) in {model_path}"
            )
        for layer, name in zip(demanders, hits):
            # positional pairing is only trustworthy when the layer types
            # agree: a rebuilt "lstm_1" may legitimately pair with group
            # "lstm_14" (fresh Keras name counter), but "dense" paired with
            # an "lstm_*" group of coincidentally equal signature would be a
            # silent mis-bind — refuse instead.
            if natural(layer.name)[0].rstrip("_") != natural(name)[0].rstrip("_"):
                raise ValueError(
                    f"Refusing shape-only bind of group {name!r} to layer "
                    f"{layer.name!r} (base names differ) in {model_path}"
                )
            assignment[layer.name] = leftovers.pop(name)

    for layer in weighted:
        layer.set_weights(assignment[layer.name])


_LEGACY_LAYER_KWARGS = {"batch_input_shape", "time_major"}


def _rebuild_from_legacy_config(cfg: dict):
    """Functional rebuild of a legacy Sequential config under Keras 3."""
    import keras

    layers_cfg = cfg.get("config", {}).get("layers", [])
    inp = None
    x = None
    for lc in layers_cfg:
        cls = lc["class_name"]
        c = dict(lc.get("config", {}))
        batch_shape = c.pop("batch_input_shape", None) or c.get("batch_shape")
        for k in _LEGACY_LAYER_KWARGS:
            c.pop(k, None)
        if cls == "InputLayer":
            inp = keras.Input(batch_shape=batch_shape)
            x = inp
            continue
        if inp is None:
            if batch_shape is None:
                raise ValueError("legacy config lacks an input shape")
            inp = keras.Input(batch_shape=batch_shape)
            x = inp
        layer = keras.layers.deserialize(
            {"module": "keras.layers", "class_name": cls, "config": c}
        )
        x = layer(x)
    if inp is None or x is None:
        raise ValueError("could not rebuild model from legacy config")
    return keras.Model(inp, x)


def load_classifiers(model_root: Path, classifier_len: int, max_models: Optional[int] = None):
    model_dir = Path(model_root) / f"len{classifier_len}"
    model_paths = sorted(model_dir.glob(f"best_model_*_len{classifier_len}.keras"))
    model_paths = [p for p in model_paths if p.stat().st_size > 100000]
    if max_models is not None:
        model_paths = model_paths[:max_models]
    if not model_paths:
        raise FileNotFoundError(f"No complete Keras models found in {model_dir}")
    return [(p.stem, load_keras_model(p)) for p in model_paths]


def infer_classifier_length(record: dict, data_name: str) -> int:
    """Dataset-name heuristic (run_bury_ml_baseline.py:124-137)."""
    text = " ".join(
        str(record.get(k, "")) for k in ["name", "data_type", "record", "source_file"]
    ).lower()
    text = f"{text} {data_name.lower()}"
    if "thermoacoustic" in text:
        return 1500
    if "anoxia" in text:
        return 500
    if "paleoclimate" in text and ("tsid_3" in text or "younger_dryas" in text):
        return 1500
    if "paleoclimate" in text:
        return 500
    return 1500 if int(record.get("num_time_points", 0)) >= 1500 else 500


def transition_time(record: dict):
    ts = np.asarray(record.get("ts_dynamic", []), float).ravel()
    if len(ts) == 0:
        return None
    if "transition_index" in record:
        idx = max(0, min(int(record["transition_index"]), len(ts) - 1))
        return float(ts[idx])
    if "transition_time" in record:
        return float(record["transition_time"])
    return None


def prepare_series(record, pred_dim, detrend_method, span, bandwidth):
    """Clean, sort, dedupe, detrend (run_bury_ml_baseline.py:140-172)."""
    values = np.asarray(record["ys_dynamic"], float)
    times = np.asarray(record["ts_dynamic"], float).ravel()
    if values.ndim == 1:
        values = values[:, None]
    if pred_dim >= values.shape[1]:
        raise ValueError(f"pred_dim={pred_dim} is invalid for data shape {values.shape}")
    y = values[:, pred_dim]
    finite = np.isfinite(y) & np.isfinite(times)
    y, times = y[finite], times[finite]
    order = np.argsort(times)
    y, times = y[order], times[order]
    _, uidx = np.unique(times, return_index=True)
    y, times = y[uidx], times[uidx]
    residuals = detrend(y, method=detrend_method, span=span, bandwidth=bandwidth, times=times)
    return pd.Series(residuals, index=times), y, times, transition_time(record)


def _classify_prefix(classifiers, residuals: np.ndarray, input_len: int) -> np.ndarray:
    """Bury protocol: normalise by mean |residual|, right-align into a
    zero-padded window, classify, return mean class probabilities [4]."""
    data = residuals[-input_len:] if len(residuals) > input_len else residuals
    denom = np.mean(np.abs(data))
    data = data / denom if denom > 0 else data
    window = np.zeros(input_len, np.float32)
    window[-len(data):] = data
    x = window.reshape(1, input_len, 1)
    probs = [np.asarray(clf(x))[0] for _name, clf in classifiers]
    probs = np.mean(np.stack(probs), axis=0)
    return probs[:4]


def apply_bury_classifiers(state: pd.Series, classifiers, inc_points: int,
                           classifier_len: int) -> pd.DataFrame:
    """Incremental ensemble classification (run_bury_ml_baseline.py:189-203)."""
    if len(state) < 2:
        raise ValueError("At least two time points are required.")
    residuals = state.to_numpy(float)
    times = state.index.to_numpy(float)
    rows = []
    for end in range(inc_points, len(residuals) + 1, inc_points):
        probs = _classify_prefix(classifiers, residuals[:end], classifier_len)
        rows.append({"time": times[end - 1], **dict(zip(PROBABILITY_COLUMNS, probs))})
    if not rows:
        raise RuntimeError("Bury classifiers did not produce predictions.")
    table = pd.DataFrame(rows)
    table["transition_prob"] = table[["fold_prob", "hopf_prob", "branch_prob"]].sum(axis=1)
    return table


def save_probability_outputs(output_dir: Path, basename: str, table: pd.DataFrame, metadata: dict):
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    csv_path = output_dir / f"{basename}_bury_ml_probs.csv"
    pt_path = output_dir / f"{basename}_bury_ml_probs.pt"
    json_path = output_dir / f"{basename}_bury_ml_probs_metadata.json"
    table.to_csv(csv_path, index=False)
    uio.save_pt(
        {
            "time": table["time"].to_numpy(np.float32),
            "probabilities": table[PROBABILITY_COLUMNS].to_numpy(np.float32),
            "transition_probability": table["transition_prob"].to_numpy(np.float32),
            "probability_columns": PROBABILITY_COLUMNS,
            **metadata,
        },
        pt_path,
    )
    json_path.write_text(json.dumps(metadata, indent=2, ensure_ascii=False), encoding="utf-8")
    return csv_path, pt_path, json_path


def run_one(args, data_name: str):
    from .real_data import resolve_real_data_path

    data_path = resolve_real_data_path(data_name, args.data_root)
    record = uio.load_pt(data_path)
    basename = Path(str(record.get("name", data_path.stem))).stem
    classifier_len = args.classifier_len or infer_classifier_length(record, basename)
    state, _raw, _times, trans_time = prepare_series(
        record, args.pred_dim, args.detrend_method, args.detrend_span, args.detrend_bandwidth
    )
    if not args.full_prefix:
        if trans_time is not None:
            pre = state[state.index <= trans_time]
            if len(pre) >= 2:
                state = pre.iloc[-classifier_len:].copy()
        else:
            state = state.iloc[-classifier_len:].copy()
    classifiers = load_classifiers(args.model_root, classifier_len, args.max_models)
    table = apply_bury_classifiers(state, classifiers, args.inc_points, classifier_len)
    metadata = {
        "name": basename,
        "source_pt": str(data_path),
        "data_type": record.get("data_type", ""),
        "record": record.get("record", ""),
        "pred_dim": args.pred_dim,
        "classifier_len": classifier_len,
        "num_classifiers": len(classifiers),
        "classifier_names": [n for n, _ in classifiers],
        "detrend_method": args.detrend_method,
        "detrend_span": args.detrend_span,
        "detrend_bandwidth": args.detrend_bandwidth,
        "inc_points": args.inc_points,
        "transition_time": trans_time,
        "probability_columns": PROBABILITY_COLUMNS,
    }
    return save_probability_outputs(Path(args.output_root) / basename, basename, table, metadata)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Run Bury et al. ML EWS classifiers.")
    parser.add_argument("--data-root", type=Path, default=Path("dataset/real_data"))
    parser.add_argument("--model-root", type=Path, default=DEFAULT_MODEL_ROOT,
                        help="dir with len500/len1500 subdirs of best_model_*.keras")
    parser.add_argument("--output-root", type=Path, default=Path("ews_results/bury_2021_ml_probs"))
    parser.add_argument("--data-real-names", nargs="+", required=True)
    parser.add_argument("--pred-dim", type=int, default=0)
    parser.add_argument("--classifier-len", type=int, choices=[500, 1500], default=None)
    parser.add_argument("--max-models", type=int, default=None)
    parser.add_argument("--inc-points", type=int, default=10)
    parser.add_argument("--detrend-method", choices=["lowess", "gaussian", "none"],
                        default="lowess")
    parser.add_argument("--detrend-span", type=float, default=0.2)
    parser.add_argument("--detrend-bandwidth", type=float, default=0.2)
    parser.add_argument("--full-prefix", action="store_true")
    args = parser.parse_args(argv)
    for data_name in args.data_real_names:
        csv_path, pt_path, json_path = run_one(args, data_name)
        print(f"saved: {csv_path}")
        print(f"saved: {pt_path}")
        print(f"saved: {json_path}")


if __name__ == "__main__":
    main()
