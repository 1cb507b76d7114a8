"""Training-throughput benchmark: jitted NsDiff train step (TPU) vs the
torch-CPU reference replica (full 3-loss training step + Adam), samples/sec.

Run: ``python benchmarks/train_bench.py``  (prints one JSON line).
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

B, W, P, F = 64, 100, 100, 1
NET_PARAM = dict(
    dataset_nf=F, windows=W, pred_len=P, rolling_length=50, diffusion_steps=20,
    scaler_type=None, d_model=512, n_heads=8, e_layers=4, d_layers=2, d_ff=256,
    p_hidden_dims=[64, 64], p_hidden_layers=2, n_z_samples=100, task_model="NsDiff",
)


def measure_jax(n_steps=10):
    import jax

    from upgdm_tpu.models.nsdiff import NsDiffModel
    from upgdm_tpu.train.loop import make_train_step
    from upgdm_tpu.train.optimizers import make_optimizer

    model = NsDiffModel(NET_PARAM)
    tx = make_optimizer({"optimizer_name": "Adam", "lr": 1e-3}, model.trainable_mask())
    params, opt_state = model.params, None
    opt_state = tx.init(params)
    step = make_train_step(model, tx, None, with_adj=False)
    batch = np.random.default_rng(0).normal(size=(B, W + P, F)).astype(np.float32)
    import jax.numpy as jnp

    jbatch = jnp.asarray(batch)
    t0 = time.time()
    params, opt_state, loss = step(params, opt_state, jbatch, model.next_key())
    float(loss)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(n_steps):
        params, opt_state, loss = step(params, opt_state, jbatch, model.next_key())
    float(loss)
    per_step = (time.time() - t0) / n_steps
    return B / per_step, compile_s


def measure_torch(n_steps=3):
    import torch

    from benchmarks.torch_reference import (
        Denoiser,
        NSTransformer,
        SigmaEstimation,
        nsdiff_train_loss,
    )
    from upgdm_tpu.ops.schedules import NsDiffSchedule

    torch.manual_seed(0)
    f = NSTransformer(W, W // 2, P, F, 512, 8, 4, 2, 256)
    g = SigmaEstimation(W, P, F, 512, 50)
    d = Denoiser(20, F)
    sched = NsDiffSchedule.create("linear", 20, 1e-4, 2e-2)
    params = list(f.parameters()) + list(g.parameters()) + list(d.parameters())
    opt = torch.optim.Adam(params, lr=1e-3)
    batch = torch.randn(B, W + P, F)
    # warmup
    loss = nsdiff_train_loss(f, g, d, sched, batch, W, P)
    loss.backward()
    opt.step()
    t0 = time.time()
    for _ in range(n_steps):
        opt.zero_grad()
        loss = nsdiff_train_loss(f, g, d, sched, batch, W, P)
        loss.backward()
        opt.step()
    per_step = (time.time() - t0) / n_steps
    return B / per_step


def main():
    cache = REPO / "BENCH_TRAIN_BASELINE.json"
    if cache.exists():
        cpu_rate = json.loads(cache.read_text())["cpu_samples_per_sec"]
    else:
        cpu_rate = measure_torch()
        cache.write_text(json.dumps({
            "cpu_samples_per_sec": cpu_rate,
            "workload": f"NsDiff full train step B={B} W={W} P={P} d512 (torch-CPU)",
        }, indent=2))
        print(f"# cpu train baseline: {cpu_rate:.1f} samples/s", file=sys.stderr)
    tpu_rate, compile_s = measure_jax()
    print(f"# tpu train: {tpu_rate:.1f} samples/s (compile {compile_s:.0f}s)",
          file=sys.stderr)
    print(json.dumps({
        "metric": "NsDiff training throughput",
        "value": round(tpu_rate, 1),
        "unit": "samples/sec",
        "vs_baseline": round(tpu_rate / cpu_rate, 2),
    }))


if __name__ == "__main__":
    main()
