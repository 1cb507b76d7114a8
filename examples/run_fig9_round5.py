"""Round-5 fig9 job: retrain the wiped machine model, render BOTH trends.

The NsDiff_machine/NsDiff/models/dataset_w200p200st100 checkpoint binary is
gitignored and was lost in the inter-round wipe (its yaml survived), so the
fig9 smoothing render (both trends — the reference renders increase AND
decrease, smoothing_experiment.py:26,126) first retrains it with the zoo's
own recipe (same seed/data/geometry as the original), then renders
fig9_smoothing_decrease and re-renders fig9_smoothing_increase so both
panels come from the same checkpoint.

TPU job — run it in a dedicated window (one TPU client at a time).
"""
import importlib.util
import os
import subprocess
import sys
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

spec = importlib.util.spec_from_file_location("zoo", REPO / "examples/reference_zoo.py")
zoo = importlib.util.module_from_spec(spec)
spec.loader.exec_module(zoo)


def ensure_machine_model(out: Path):
    ews, ds = out / "ews_results", out / "dataset"
    target = ews / "NsDiff_machine/NsDiff/models"
    name = "dataset_w200p200st100"
    if (target / name).exists():
        zoo.log(f"machine model {name} present, skipping retrain")
        return
    main_rec = [zoo.slbp_source_path(ds, zoo.SLBP_TOTAL, t, zoo.SLBP_D)
                for t in zoo.TRENDS]
    flat = zoo._slbp_windows(main_rec, 200, 200)
    net = dict(zoo.REF_NET, dataset_nf=2, windows=200, pred_len=200)
    dsp = dict(file_path=str(ds / "SLBP_model_data"), windows=200, pred_len=200,
               sampling_t=100, interval_step=100, STG_exist=False)
    trained = zoo._train(
        flat, net, "NsDiff_model", out / "_scratch/NsDiff_machine_NsDiff" / name,
        max(15, 40), seed=zoo.stable_seed("NsDiff_machine/NsDiff", name),
        dataset_param=dsp, batch=64)
    zoo._install(trained, target, name)
    zoo.log(f"retrained NsDiff_machine/NsDiff/models/{name} ({len(flat)} windows)")


def main():
    out = REPO / "demo_zoo"
    ensure_machine_model(out)
    for trend in ("decrease", "increase"):
        cmd = [sys.executable, "-m", "upgdm_tpu.figures.fig9_smoothing",
               "--ews-root", "demo_zoo/ews_results",
               "--source-root", "demo_zoo/dataset",
               "--output-dir", "demo_zoo/figures",
               "--trend", trend, "--total-time", "400000.0",
               "--noises", "1e-05", "5e-06"]
        zoo.log(f"render fig9 {trend}")
        subprocess.run(cmd, cwd=REPO, check=True)
    zoo.log("fig9 both trends done")


if __name__ == "__main__":
    main()
