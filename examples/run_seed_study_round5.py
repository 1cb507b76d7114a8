"""Round-5 neuronal seed study (VERDICT r4 next #3).

NEURONAL_LEAD_NOTE.md claims the argmin-lead sign on neuronal/increase is
seed/architecture-dependent (the metric's target is near-flat there, so the
global-MPV-argmin lands on noise) while the 10%-drop threshold lead stays
positive.  This measures it: retrain the neuronal corpus model at several
seeds with the EXACT zoo recipe (same data/windows/net/epochs as the
seed-23 model behind corpus_summary.json), run the corpus gx-MPV sweep +
lead metrics per seed, and emit a table for the note.

Metric parity: /root/reference/paper_figures/mpv_collapse_summary.py:313-369
(argmin lead) and :1000-1040 (threshold lead).

TPU job.  Usage:
    python examples/run_seed_study_round5.py [--seeds 101 202 303]
        [--max-files 20] [--epochs 15]
"""
import argparse
import importlib.util
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

spec = importlib.util.spec_from_file_location("zoo", REPO / "examples/reference_zoo.py")
zoo = importlib.util.module_from_spec(spec)
spec.loader.exec_module(zoo)

OUT = REPO / "demo_zoo"
STUDY = OUT / "seed_study"


def train_seed_model(seed: int) -> Path:
    """Neuronal corpus model at ``seed``: identical recipe to the zoo's
    generalization/corpus training (reference_zoo.train_models) except the
    permutation/init seed."""
    tree = STUDY / f"seed{seed}" / "ews_results/model_compare/NsDiff/neuronal"
    if (tree / "model_trained").exists():
        zoo.log(f"seed {seed}: model present, skipping train")
        return tree
    ds = OUT / "dataset"
    cfg = zoo.SYSTEMS["neuronal"]
    flat = zoo._corpus_windows(OUT, "neuronal", 100, 100, zoo.TRAINED_ON_TOPOLOGY)
    dataset_param = dict(
        spdata_file_path=str(ds / "spdata_sde_neuronal"),
        graph_file_path=str(ds / "test_graph"),
        windows=100, pred_len=100, interval_step=100,
        sampling_t=cfg["sampling_t"], filter=f"{zoo.TRAINED_ON_TOPOLOGY}_*",
    )
    net = dict(zoo.REF_NET, dataset_nf=1, windows=100, pred_len=100)
    trained = zoo._train(flat, net, "NsDiff_model",
                         STUDY / "_scratch" / f"seed{seed}", ARGS.epochs,
                         seed=seed, dataset_param=dataset_param)
    zoo._install(trained, tree)
    zoo.log(f"seed {seed}: trained ({len(flat)} windows)")
    return tree


def sweep_seed(seed: int):
    ews = STUDY / f"seed{seed}" / "ews_results"
    outdir = STUDY / f"seed{seed}" / "mpv_collapse"
    argv = [sys.executable, "-u", "-m", "upgdm_tpu.figures.mpv_collapse",
            "--ews-root", str(ews), "--source-root", str(OUT / "dataset"),
            "--output-dir", str(outdir), "--model-name", "NsDiff",
            "--dynamics", "neuronal", "--trends", "increase"]
    if ARGS.max_files:
        argv += ["--max-files", str(ARGS.max_files)]
    zoo.log(f"seed {seed}: corpus sweep")
    subprocess.run(argv, cwd=REPO, check=True)
    return outdir


def seed_row(seed: int, outdir: Path) -> dict:
    import pandas as pd

    df = pd.read_csv(outdir / "mpv_collapse_samples.csv")
    ok = df[df["skip_reason"].fillna("") == ""]
    lead = pd.to_numeric(ok["lead_time"], errors="coerce").dropna()
    row = {
        "seed": seed,
        "n": int(len(ok)),
        "argmin_lead_median": float(lead.median()),
        "argmin_lead_positive_frac": float((lead > 0).mean()),
        "pre_drop_median": float(pd.to_numeric(
            ok["pre_transition_drop_percent"], errors="coerce").dropna().median()),
    }
    thr = outdir / "mpv_drop_threshold_lead_time.csv"
    if thr.exists():
        tdf = pd.read_csv(thr)
        # thresholds are drop FRACTIONS (linspace(0.1, max, 8)); 0.1 = the
        # 10%-drop level quoted in NEURONAL_LEAD_NOTE.md
        t10 = tdf[np.isclose(tdf["threshold"], 0.1)] if "threshold" in tdf else tdf
        tl = pd.to_numeric(t10.get("lead_time"), errors="coerce").dropna()
        if len(tl):
            row["threshold10_lead_median"] = float(tl.median())
            row["threshold10_lead_positive_frac"] = float((tl > 0).mean())
    return row


def main():
    STUDY.mkdir(parents=True, exist_ok=True)
    rows = []
    for seed in ARGS.seeds:
        train_seed_model(seed)
        outdir = sweep_seed(seed)
        row = seed_row(seed, outdir)
        rows.append(row)
        zoo.log(f"seed {seed}: {json.dumps(row)}")
        (STUDY / "seed_study_summary.json").write_text(
            json.dumps({"max_files": ARGS.max_files, "epochs": ARGS.epochs,
                        "rows": rows}, indent=1))
    zoo.log("seed study done -> demo_zoo/seed_study/seed_study_summary.json")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", nargs="+", type=int, default=[101, 202, 303])
    ap.add_argument("--max-files", type=int, default=20)
    ap.add_argument("--epochs", type=int, default=15)
    ARGS = ap.parse_args()
    main()
