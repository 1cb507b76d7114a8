"""Real-data EWS pipeline demo — the L5 empirical-analysis surface end-to-end.

Builds an "empirical" record from the committed SLBP demo trajectory
(subsampled to a few hundred points, with the located state transition stamped
into the record like the reference's curated real datasets carry), trains a
small univariate NsDiff on the detrended pre-transition windows (the
reference's real-data models are univariate at sampling_t=0.1), then runs the
full real-data analysis CLI: linear interpolation to the model window, Lowess
detrending for the model input, the NsDiff gx uncertainty signal + its trend
slope, classic EWS (rolling variance / AR1) on Gaussian-detrended data, and
the per-dataset CSV + PNG/SVG subfigure.

Reference surface: evaluation_and_analysis/real_data_analysis.py:298-604.

CPU-friendly (gx pathway only; no sampling chains):
    python examples/real_data_demo.py --out-dir demo_real
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from upgdm_tpu.eval import real_data
from upgdm_tpu.figures.mpv_collapse import locate_transition
from upgdm_tpu.utils.io import load_pt, save_pt

SOURCE_TRACE = Path(
    "demo_artifacts/slbp_data/SLBP_dynamic_total_time_200000.0_N_increase/"
    "SLBP_dynamic_D_1e-05.pt"
)


def build_empirical_record(out_path: Path, n_points: int = 500) -> Path:
    """Subsample the SLBP demo trajectory into a sparse 'empirical' record."""
    rec = load_pt(SOURCE_TRACE)
    ys = np.asarray(rec["ys_dynamic"], np.float32)
    ts = np.asarray(rec["ts_dynamic"], np.float32).ravel()
    if ys.ndim == 1:
        ys = ys[:, None]
    transition = locate_transition(ts, ys[:, 0], "SLBP", "increase")
    # keep the pre-transition run-up plus a short post-transition tail
    t_end = float(transition["transition_time"]) + 0.1 * (ts[-1] - ts[0])
    keep = ts <= t_end
    ys, ts = ys[keep], ts[keep]
    stride = max(1, len(ts) // n_points)
    ys, ts = ys[::stride], ts[::stride]
    record = {
        "name": "slbp_empirical_demo",
        "ys_dynamic": ys,
        "ts_dynamic": ts,
        "transition_time": float(transition["transition_time"]),
        "data_type": "demo_slbp",
    }
    save_pt(record, out_path)
    print(f"empirical record: {out_path} ({len(ts)} points, "
          f"transition at t={record['transition_time']:.0f})")
    return out_path


def train_demo_model(data_path: Path, model_dir: Path, windows: int,
                     pred_len: int, epochs: int) -> None:
    """Small univariate NsDiff on the empirical series' detrended windows."""
    from upgdm_tpu.eval.ews_classic import detrend
    from upgdm_tpu.train.loop import run_training

    record = load_pt(data_path)
    ys = np.asarray(record["ys_dynamic"], np.float32)
    if ys.ndim == 1:
        ys = ys[:, None]
    series = detrend(ys[:, 0], method="Lowess", span=0.2).astype(np.float32)
    L = windows + pred_len
    starts = np.arange(0, len(series) - L + 1, 2)
    flat = series[starts[:, None] + np.arange(L)[None, :]][:, :, None]  # [n, L, 1]
    batch = 32
    n_train = max(batch, (int(len(flat) * 0.9) // batch) * batch)
    perm = np.random.default_rng(0).permutation(len(flat))
    dataset_param = dict(file_path=str(data_path), windows=windows,
                         pred_len=pred_len, sampling_t=0.1, interval_step=2)
    net_param = dict(
        dataset_nf=1, windows=windows, pred_len=pred_len, rolling_length=50,
        diffusion_steps=20, diffusion_schedule="linear", beta_start=1e-4,
        beta_end=2e-2, scaler_type="StandardScaler", d_model=32, n_heads=2,
        e_layers=1, d_layers=1, d_ff=64, dropout=0.05, p_hidden_dims=[32, 32],
        p_hidden_layers=2, n_z_samples=100, parallel_sample=10,
        task_model="NsDiff", load_pretrain=False, freeze_pretrain=False,
        output_attention=False, factor=3, activation="gelu",
    )
    run_training(
        flat[perm[:n_train]], flat[perm[n_train:]],
        dict(train_model_select="NsDiff_model", train_batch_size=batch,
             val_batch_size=max(1, len(flat) - n_train), train_epochs=epochs,
             test_set=True, ckpt=False),
        net_param, {"loss_metric": "KL divergence"},
        dict(optimizer_name="Adam", lr=1e-3, weight_decay=1e-5),
        model_dir.parent / "train", dataset_param=dataset_param,
    )
    model_dir.mkdir(parents=True, exist_ok=True)
    import shutil

    trained = model_dir.parent / "train" / "trained_model"
    shutil.copy(trained / "model_trained", model_dir / "model_trained")
    shutil.copy(trained / "model_trained.yaml", model_dir / "model_trained.yaml")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", type=Path, default=Path("demo_real"))
    ap.add_argument("--n-points", type=int, default=500)
    ap.add_argument("--windows", type=int, default=100)
    ap.add_argument("--pred-len", type=int, default=100)
    ap.add_argument("--epochs", type=int, default=8)
    args = ap.parse_args(argv)
    out = args.out_dir
    t0 = time.time()

    data_path = out / "data" / "slbp_empirical_demo.pt"
    if not data_path.exists():
        data_path.parent.mkdir(parents=True, exist_ok=True)
        build_empirical_record(data_path, args.n_points)

    model_dir = out / "model"
    if not (model_dir / "model_trained").exists():
        train_demo_model(data_path, model_dir, args.windows, args.pred_len,
                         args.epochs)
        print(f"model trained ({time.time()-t0:.0f}s)", flush=True)

    real_data.main([
        "--data-root", str(out / "data"),
        "--real-data-result-root", str(out / "ews_results"),
        "--output-root", str(out / "figures"),
        "--data-real-names", "slbp_empirical_demo",
        "--model-dir", str(model_dir),
        # bury_ml omitted: the Bury-2021 Keras classifier files are not shipped
        "--signals", "model_uncertainty", "model_trend", "ar1", "variance",
    ])
    print(f"total {time.time() - t0:.0f}s")
    for p in sorted((out / "figures").rglob("*")):
        if p.is_file():
            print("artifact:", p)


if __name__ == "__main__":
    main()
