#!/usr/bin/env python
"""Re-sweep fast_mpv_sweep's chunk_windows after the bf16 denoiser switch.

CHUNK=16 was measured as the sweet spot when the chain ran 0.833 s/chunk
(round 1); at 0.499 s/chunk the fixed per-chunk costs (dispatch, double-
buffer rotation, f/g) weigh relatively more, so larger chunks may win.
Times the full 64-window sweep end-to-end per chunk size.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import os  # noqa: E402

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import bench  # noqa: E402  (reuse the bench workload definition)

CHUNKS = (16, 32)
N_WIN = 64


def main():
    from upgdm_tpu.eval.uncertainty import fast_mpv_sweep
    from upgdm_tpu.models.nsdiff import NsDiffModel

    model = NsDiffModel(bench.NET_PARAM)
    wins = bench.make_windows(N_WIN)
    results = {}
    for chunk in CHUNKS:
        t0 = time.time()
        fast_mpv_sweep(model, bench.make_windows(chunk), bench.PRED_LEN,
                       chunk_windows=chunk)  # compile + warm
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            fast_mpv_sweep(model, wins, bench.PRED_LEN, chunk_windows=chunk)
            best = min(best, time.time() - t0)
        results[f"chunk{chunk}_s"] = best
        results[f"chunk{chunk}_windows_per_hr"] = N_WIN / best * 3600.0
        print(f"chunk={chunk}: {best:.3f}s -> {N_WIN / best * 3600:.0f} win/hr "
              f"(compile {compile_s:.0f}s)", flush=True)
    print(json.dumps(results, indent=2))
    (REPO / "BENCH_CHUNK_SWEEP.json").write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
