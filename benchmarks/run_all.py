"""Multi-model sampling-throughput benchmark harness (SURVEY.md §7 phase 4).

Measures steady-state ensemble-sampling throughput for all four model families
at reference-scale inference settings and writes a JSON report.  Run on the
real TPU: ``python benchmarks/run_all.py --out benchmarks/report.json``.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def bench_model(name, build, run, n_warm=1, n_iter=3):
    model = build()
    t0 = time.time()
    run(model)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n_iter):
        out = run(model)
    elapsed = (time.time() - t0) / n_iter
    return {"model": name, "compile_s": round(compile_s, 1),
            "steady_s": round(elapsed, 3), **out}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path, default=Path("benchmarks/report.json"))
    ap.add_argument("--windows", type=int, default=8, help="windows per device call")
    ap.add_argument("--only", nargs="*", default=None,
                    help="re-measure only these model rows; others are kept "
                         "from the existing --out report")
    args = ap.parse_args(argv)
    known = {"NsDiff", "TMDM", "DiffusionTS", "DiffSTG"}
    if args.only is not None:
        bad = set(args.only) - known
        if bad or not args.only:
            ap.error(f"--only got {sorted(bad) or 'nothing'}; "
                     f"choose from {sorted(known)}")
    rng = np.random.default_rng(0)
    W = P = 100
    NODE = 30
    results = []

    # ---- NsDiff (flat, per-node rows) -------------------------------------
    def build_nsdiff():
        from upgdm_tpu.models.nsdiff import NsDiffModel

        return NsDiffModel(dict(
            dataset_nf=1, windows=W, pred_len=P, rolling_length=50, diffusion_steps=20,
            scaler_type=None, d_model=512, n_heads=8, e_layers=4, d_layers=2, d_ff=256,
            p_hidden_dims=[64, 64], p_hidden_layers=2, n_z_samples=100,
            task_model="NsDiff",
        ))

    x_flat = rng.normal(size=(args.windows * NODE, W, 1)).astype(np.float32)

    def run_nsdiff(model):
        outs, _ = model.evaluation_step(x_flat)
        np.asarray(outs)
        n_traj = outs.shape[0] * outs.shape[-1]
        return {"windows": args.windows, "trajectories": int(n_traj)}

    if args.only is None or "NsDiff" in args.only:
        results.append(bench_model("NsDiff", build_nsdiff, run_nsdiff))

    # ---- TMDM --------------------------------------------------------------
    def build_tmdm():
        from upgdm_tpu.models.tmdm import TMDMModel

        return TMDMModel(dict(
            dataset_nf=1, windows=W, pred_len=P, diffusion_steps=100, scaler_type=None,
            d_model=64, n_heads=4, e_layers=2, d_layers=1, d_ff=128,
            p_hidden_dims=[64, 64], p_hidden_layers=2, n_z_samples=100,
            task_model="TMDM",
        ))

    if args.only is None or "TMDM" in args.only:
        results.append(bench_model("TMDM", build_tmdm, run_nsdiff))

    # ---- DiffusionTS --------------------------------------------------------
    def build_dts():
        from upgdm_tpu.models.diffusionts import DiffusionTSModel

        return DiffusionTSModel(dict(
            dataset_nf=1, windows=W, pred_len=P, diffusion_steps=20, timesteps=100,
            scaler_type=None, d_model=64, n_heads=4, n_layer_enc=3, n_layer_dec=6,
            n_z_samples=100, task_model="DiffusionTS",
        ))

    dts_x = rng.normal(size=(args.windows, W, 1)).astype(np.float32)

    def run_dts(model):
        outs, _ = model.evaluation_step(dts_x)
        np.asarray(outs)
        return {"windows": args.windows, "trajectories": int(outs.shape[0] * outs.shape[-1])}

    if args.only is None or "DiffusionTS" in args.only:
        results.append(bench_model("DiffusionTS", build_dts, run_dts))

    # ---- DiffSTG -------------------------------------------------------------
    def build_diffstg():
        from upgdm_tpu.models.diffstg import DiffSTGModel

        return DiffSTGModel(dict(
            T_h=W, T_p=P, F=1, diffusion_steps=200, inference_diffusion_steps=20,
            inference_trick="ddim", inference_schedule="cosine",
            diffusion_schedule="linear", scaler_type=None, d_h=4, Td_h=10,
            channel_multipliers=[1, 2], n_blocks=2, gnn_name="GCNConv",
            parallel_sampling=10, sequential_sampling=10, init_num_nodes=NODE,
            task_model="DiffSTG",
        ))

    adj = (rng.uniform(size=(NODE, NODE)) < 0.15).astype(np.float32)
    adj = ((adj + adj.T) > 0).astype(np.float32)
    np.fill_diagonal(adj, 0)
    n_gwin = max(16, args.windows)  # >=16 windows for a trustworthy number
    g_x = rng.normal(size=(n_gwin, NODE, W, 1)).astype(np.float32)

    def run_diffstg(model):
        # host loop over windows, one compiled per-window program: the
        # forced-sync A/B (ab_diffstg.py) measures it 2.3x faster per window
        # than vmapping the window axis into the sampling scan (XLA picks a
        # much worse schedule for the batched form)
        n_traj = 0
        for i in range(n_gwin):
            outs, _ = model.evaluation_step({"x": g_x[i], "adj": adj})
            n_traj += int(outs.shape[-1])
        np.asarray(outs)
        return {"windows": n_gwin, "trajectories": n_traj}

    if args.only is None or "DiffSTG" in args.only:
        results.append(bench_model("DiffSTG", build_diffstg, run_diffstg))

    for r in results:
        per_s = r["trajectories"] / r["steady_s"]
        r["trajectories_per_sec"] = round(per_s, 1)
        r["windows_per_hr"] = round(r["windows"] / r["steady_s"] * 3600, 1)
        print(json.dumps(r))
    if args.only is not None:
        if args.out.exists():
            prev = {r["model"]: r for r in json.loads(args.out.read_text())}
            prev.update({r["model"]: r for r in results})
            results = list(prev.values())
        else:
            # a partial report at a fresh path would read as the full
            # four-model report downstream — make the omission loud
            print(
                f"WARNING: --only given but {args.out} does not exist; "
                f"writing a PARTIAL report ({[r['model'] for r in results]} only)",
                file=sys.stderr,
            )
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(results, indent=2))
    print(f"report: {args.out}")


if __name__ == "__main__":
    main()
