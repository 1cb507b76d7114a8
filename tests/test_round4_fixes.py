"""Round-4 guards: bench regression floor, two-trend zoo figure jobs,
probe timeouts sized above the measured TPU cold start."""
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "examples"))


def test_bench_regression_gate():
    """bench_result flags (and main exits nonzero on) sub-floor throughput so
    refactors can't silently give back the measured 117-119k windows/hr."""
    import bench

    ok = bench.bench_result(118_000.0, 205.0)
    assert ok["regression"] is False
    assert ok["unit"] == "windows/hr" and ok["vs_baseline"] > 500

    bad = bench.bench_result(bench.REGRESSION_FLOOR_WINDOWS_HR - 1, 205.0)
    assert bad["regression"] is True
    # the floor leaves honest headroom below the measured band
    assert 100_000 <= bench.REGRESSION_FLOOR_WINDOWS_HR <= 117_000


def test_probe_timeouts_cover_cold_start():
    """Accelerator probes must outlast the measured ~10 min (600 s) cold
    start: a probe killed mid-grant leaves a stale session grant that blocks
    the next probe (ADVICE round 3)."""
    import inspect

    import bench
    import reference_zoo as Z

    for fn in (bench.wait_for_accelerator, Z._wait_for_tpu):
        sig = inspect.signature(fn)
        assert sig.parameters["probe_timeout"].default > 600, fn


def test_zoo_figure_jobs_render_both_trends(tmp_path):
    """figs 2/3/7 (and fig4 once its tree exists) schedule one render per
    trend, matching the reference CLIs' two-trend contract
    (paper_figures/common.py:24-28)."""
    import reference_zoo as Z

    jobs = Z.figure_jobs(tmp_path)

    def trends_of(stem):
        return sorted(
            a[a.index("--trend") + 1]
            for m, a in jobs if stem in m and "--trend" in a
        )

    for stem in ("fig2", "fig3", "fig7"):
        assert trends_of(stem) == ["decrease", "increase"], stem

    pred = tmp_path / "ews_results" / "NsDiff_pred" / "models"
    pred.mkdir(parents=True)
    (pred / "dataset__w200p1000st100").write_bytes(b"ckpt")
    jobs = Z.figure_jobs(tmp_path)
    assert trends_of("fig4") == ["decrease", "increase"]
