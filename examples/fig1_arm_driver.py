"""Per-arm driver for the paper-Fig-1 model_compare MPV sweeps.

The fig1 render (`upgdm_tpu.figures.fig1_model_compare`) iterates datasets x
models in a fixed order, so a kill mid-run loses whatever arms were queued
behind the expensive DiffusionTS ones.  This driver sweeps arms one at a
time in an EXPLICIT order (cheapest first by default), reusing the figure
module's own `load_model_signal` (same `uncertainty_ews` call, same cache
layout, partial-resume intact), so each completed arm is durable before the
next starts.

Usage:
    python examples/fig1_arm_driver.py --arms NsDiff:SIS DiffSTG:SIS \
        TMDM:SIS TMDM:neuronal
    python examples/fig1_arm_driver.py --arms DiffusionTS:SIS
    python examples/fig1_arm_driver.py --arms DiffusionTS:neuronal

Parity: /root/reference/paper_figures/"diffusion mdoel compare_experiment.py"
:160-186 (the sweep loop this schedules arm-by-arm).
"""
from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from upgdm_tpu.figures.common import (  # noqa: E402
    dynamics_filename,
    spdata_source_path,
)
from upgdm_tpu.figures.fig1_model_compare import load_model_signal  # noqa: E402


def arm_sidecar(ews_root: Path, model: str, dataset: str, trend: str) -> Path:
    name = dynamics_filename(dataset, trend)
    return ews_root / "model_compare" / model / dataset / f"{name}.mpv.json"


def arm_complete(ews_root: Path, model: str, dataset: str, trend: str) -> bool:
    sc = arm_sidecar(ews_root, model, dataset, trend)
    if not sc.exists():
        return False
    try:
        return bool(json.loads(sc.read_text()).get("complete"))
    except (ValueError, OSError):
        return False


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ews-root", default="demo_zoo/ews_results")
    ap.add_argument("--source-root", default="demo_zoo/dataset")
    ap.add_argument("--trend", default="increase")
    ap.add_argument("--graph", default="barabasi_albert_30_0")
    ap.add_argument("--arms", nargs="+", required=True,
                    help="ordered Model:dataset pairs, e.g. NsDiff:SIS")
    args = ap.parse_args(argv)

    ews_root = Path(args.ews_root)
    for arm in args.arms:
        model, dataset = arm.split(":")
        if arm_complete(ews_root, model, dataset, args.trend):
            print(f"[arm] {arm}: already complete, skipping", flush=True)
            continue
        data_file = spdata_source_path(
            args.source_root, dataset, args.graph,
            dynamics_filename(dataset, args.trend))
        t0 = time.time()
        print(f"[arm] {arm}: sweeping {data_file.name}", flush=True)
        sig = load_model_signal(ews_root, args.source_root, model, dataset,
                                data_file, args.graph)
        print(f"[arm] {arm}: done, {len(sig['ews'])} windows in "
              f"{time.time() - t0:.0f}s", flush=True)
        del sig
        gc.collect()
    print("[arm] all requested arms complete", flush=True)


if __name__ == "__main__":
    main()
