"""Round-5 focused job: rebuild ONLY the DiffusionTS/neuronal fig1 arm's
model on a wiped machine, without retraining the other eight compare-tree
families whose sweeps are already complete (their arms render from committed
`.mpv.json` sidecars; see `upgdm_tpu/eval/uncertainty.py` sidecar notes).

Exactly the `train_compare_models` DiffusionTS cell from
`examples/reference_zoo.py` (same windows, same seed, same recipe) so the
retrained checkpoint reproduces the round-4 model and the 20/181 sidecar
prefix resumes consistently.

Parity: /root/reference/paper_figures/"diffusion mdoel compare_experiment.py"
:29 (model tree), reference model_compare yamls (net dims).
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "examples"))

import reference_zoo as Z  # noqa: E402


def main():
    out = REPO / "demo_zoo"
    fam, system = "DiffusionTS", "neuronal"
    target = out / "ews_results" / "model_compare" / fam / system
    if (target / "model_trained").exists():
        print(f"[dts-neuronal] {target} already present, nothing to do",
              flush=True)
        return
    cfg = Z.SYSTEMS[system]
    tp = Z.COMPARE_TRAIN[fam]
    t0 = time.time()
    flat = Z._corpus_windows(out, system, 100, 100, topology="",
                             max_windows=tp["max_windows"], stride=100)
    print(f"[dts-neuronal] {len(flat)} training windows "
          f"({time.time()-t0:.0f}s)", flush=True)
    dataset_param = dict(
        file_path=str(out / "dataset" / f"spdata_sde_{system}"), filter="*",
        windows=100, pred_len=100, interval_step=100,
        sampling_t=cfg["sampling_t"], STG_exist=True)
    trained = Z._train(
        flat, Z.COMPARE_NETS[fam], None,
        out / "_scratch" / f"compare_{fam}_{system}", tp["epochs"],
        seed=Z.stable_seed("compare", fam, system),
        dataset_param=dataset_param, task_model=fam,
        batch=tp["batch"], loss_metric=tp["loss"], lr=tp["lr"],
        scheduler_set=False)
    Z._install(trained, target)
    print(f"[dts-neuronal] trained + installed in {time.time()-t0:.0f}s",
          flush=True)


if __name__ == "__main__":
    main()
