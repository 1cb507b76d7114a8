#!/usr/bin/env python
"""Benchmark: NsDiff full-train-step throughput (samples/sec) + floor gate.

The training analog of bench.py's sampling gate (VERDICT r4 next #7): the
sampling headline had a regression floor since round 4, but nothing failed
if a refactor halved train-step throughput.  Workload = the train-bench
geometry profiled in BENCH_TRAIN_SPLIT.json: one fused fwd+bwd+Adam step of
the full 3-loss NsDiff stage at B=64, W/P=100/100, d512 e4/d2 (reference
main_SSLtrain_network.py's model at its yaml dims).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "regression"}
and exits 2 below the floor.  vs_baseline compares against the measured
torch-CPU train step (BENCH_TRAIN_BASELINE.json, 7.62 samples/s).

Floor: the committed tree measures 2,290-2,470 samples/s run-to-run
(BENCH_TRAIN_SPLIT.json: fp32 2292, B128 2468, B256 2405); 2,000 means a
real regression, not tunnel noise.
"""
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

B, W, P, F = 64, 100, 100, 1
REGRESSION_FLOOR_SAMPLES_PER_SEC = 2_000
NET_PARAM = dict(
    dataset_nf=F, windows=W, pred_len=P, rolling_length=50, diffusion_steps=20,
    scaler_type=None, d_model=512, n_heads=8, e_layers=4, d_layers=2, d_ff=256,
    p_hidden_dims=[64, 64], p_hidden_layers=2, n_z_samples=100, task_model="NsDiff",
)


def measure_train_step(reps: int = 5) -> float:
    """Best-of train-step seconds, forced-sync, RTT-corrected -> samples/s."""
    import jax
    import jax.numpy as jnp

    from benchmarks._common import best_of, sync
    from upgdm_tpu.models.nsdiff import NsDiffModel
    from upgdm_tpu.train.optimizers import make_optimizer

    model = NsDiffModel(NET_PARAM)
    tx = make_optimizer({"optimizer_name": "Adam", "lr": 1e-3}, model.trainable_mask())
    batch = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, W + P, F)).astype(np.float32))
    key = jax.random.key(0)

    ready = jnp.zeros((8,), jnp.float32) + 1.0
    bump = jax.jit(lambda v, s: v + s)
    sync(bump(ready, 0.0))
    rtt_s = best_of(lambda r: sync(bump(ready, float(r))), reps)

    @jax.jit
    def step(params, opt_state, b, k):
        loss, grads = jax.value_and_grad(model.loss_fn)(params, b, k, train=True)
        updates, opt_state = tx.update(grads, opt_state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), opt_state, loss

    params0, opt0 = model.params, tx.init(model.params)
    step_s = best_of(
        lambda r: sync(step(params0, opt0, batch, jax.random.fold_in(key, r))[2]),
        reps)
    return B / max(step_s - rtt_s, 1e-9)


def read_cpu_baseline() -> float:
    path = REPO / "BENCH_TRAIN_BASELINE.json"
    if path.exists():
        return float(json.loads(path.read_text())["cpu_samples_per_sec"])
    return float("nan")


def bench_result(tpu_rate: float, cpu_rate: float,
                 floor: float = REGRESSION_FLOOR_SAMPLES_PER_SEC) -> dict:
    """Headline JSON record incl. the regression gate (bench.py convention)."""
    vs = tpu_rate / cpu_rate if np.isfinite(cpu_rate) and cpu_rate > 0 else None
    return {
        "metric": "NsDiff train-step throughput",
        "value": round(tpu_rate, 1),
        "unit": "samples/sec",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "regression": bool(tpu_rate < floor),
    }


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    import bench as sampling_bench

    if not sampling_bench.wait_for_accelerator():
        print("# accelerator still unavailable; attempting the run anyway",
              file=sys.stderr)
    t0 = time.time()
    rate = measure_train_step(reps=args.reps)
    result = bench_result(rate, read_cpu_baseline())
    print(json.dumps(result))
    print(f"# measured in {time.time() - t0:.0f}s", file=sys.stderr)
    if result["regression"]:
        print(f"# REGRESSION: {rate:.0f} samples/s is below the "
              f"{REGRESSION_FLOOR_SAMPLES_PER_SEC} floor", file=sys.stderr)
        sys.exit(2)


if __name__ == "__main__":
    main()
