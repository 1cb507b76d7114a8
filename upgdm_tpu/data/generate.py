"""Dataset generation drivers — the CLI layer over data.sde / data.graphs.

Reproduces the reference's dataset directory layouts so the data-prep loaders
(utils/data_prep.py) and the evaluation facade consume them unchanged:

  - networked systems (spdata_sde_*_dynamic_gene.py __main__:263-335):
      <out>/<graph_name>/<system>_dynamic_..._<trend>.pt
    paired with <graph_dir>/<graph_name>.graphml
  - SLBP (SLBP_dynamic_gene.py __main__:200-244):
      <out>/SLBP_dynamic_total_time_<T>_N_<trend>/SLBP_dynamic_D_<D>.pt
  - *_contant null datasets via constant_control / constant_n.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from ..ops.graph import graphml_to_adjacency
from ..utils.io import save_pt
from .sde import simulate_network_system, simulate_slbp

__all__ = ["generate_network_dataset", "generate_slbp_dataset", "main"]

_SYSTEM_DEFAULTS = {
    # physics defaults = the combination each paper figure consumes
    # (paper_figures/common.py:41-45 filenames + the generator __main__
    # grids' first entries).  Control ranges span the transition; the
    # shipped reference __main__ ramps are partly degenerate leftovers
    # (spdata_sde_biomass_dynamic_gene.py:276-277 has eps_min=eps_max=1.0,
    # i.e. no ramp at all), so ranges are chosen to bracket the tipping
    # point of each system.  biomass d: the shipped grid says 0.5 (:270)
    # but d is behaviorally irrelevant here — nodes synchronize onto the
    # same branch so the diffusive coupling term vanishes; measured
    # transitions at d=0.05 and d=0.5 are identical to <1% on BA-30/BA-100
    # (round-4 probe), and the degenerate main means the grid isn't
    # authoritative anyway.  d=0.05 (the committed-corpus value) stays.
    "SIS": dict(control_range=(1e-4, 0.5), base_params={"d": 0.5}, eta=1e-4),
    "biomass": dict(control_range=(0.0, 4.0), base_params={"r": 0.7, "k": 10.0, "d": 0.05}, eta=0.005),
    # mu=1.5 per spdata_sde_neuronal_dynamic_gene.py:268 — mu=3.0 kills the
    # bistability (no transition; see examples/reference_zoo.py SYSTEMS)
    "neuronal": dict(control_range=(0.0, 1.0), base_params={"tau": 2.0, "mu": 1.5}, eta=0.01),
}


def generate_network_dataset(
    system: str,
    graph_dir,
    out_dir,
    trends=("increase", "decrease"),
    total_time: float = 1e4,
    burn_time: float = 100.0,
    dt: float = 0.1,
    seed: int = 0,
    graph_filter: str = "*",
    constant_control=None,
    **overrides,
):
    """One record per (graph, trend): <out>/<graph_name>/<system>_dynamic_<trend>.pt."""
    cfg = dict(_SYSTEM_DEFAULTS[system])
    cfg.update({k: v for k, v in overrides.items() if v is not None})
    out_dir = Path(out_dir)
    written = []
    for gpath in sorted(Path(graph_dir).glob(f"{graph_filter}.graphml")):
        graph = graphml_to_adjacency(gpath)
        for trend in trends:
            rec = simulate_network_system(
                system,
                graph.adj,
                trend=trend,
                total_time=total_time,
                burn_time=burn_time,
                dt=dt,
                seed=seed + hash((gpath.stem, trend)) % 10_000,
                constant_control=constant_control,
                **{k: cfg[k] for k in ("control_range", "base_params", "eta")},
            )
            tag = "contant" if constant_control is not None else trend
            path = out_dir / gpath.stem / f"{system}_dynamic_{tag}.pt"
            save_pt(rec, path)
            written.append(path)
    return written


def generate_slbp_dataset(
    out_dir,
    trends=("increase", "decrease"),
    total_times=(1e6,),
    d_values=(1e-5, 5e-6),
    burn_time: float = 1000.0,
    dt: float = 0.1,
    seed: int = 0,
    save_every: int = 1,
    constant_n=None,
):
    out_dir = Path(out_dir)
    written = []
    for total_time in total_times:
        for trend in trends:
            for d in d_values:
                rec = simulate_slbp(
                    params={"D": d},
                    trend=trend,
                    total_time=total_time,
                    burn_time=burn_time,
                    dt=dt,
                    seed=seed,
                    save_every=save_every,
                    constant_n=constant_n,
                )
                path = (
                    out_dir
                    / f"SLBP_dynamic_total_time_{total_time}_N_{trend}"
                    / f"SLBP_dynamic_D_{d}.pt"
                )
                save_pt(rec, path)
                written.append(path)
    return written


def main(argv=None):
    ap = argparse.ArgumentParser(description="Generate SDE trajectory datasets")
    ap.add_argument("system", choices=["SIS", "biomass", "neuronal", "SLBP"])
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--graph-dir", default=None, help="dir of .graphml (networked systems)")
    ap.add_argument("--graph-filter", default="*")
    ap.add_argument("--total-time", type=float, default=1e4)
    ap.add_argument("--burn-time", type=float, default=100.0)
    ap.add_argument("--dt", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--trend", choices=["increase", "decrease", "both"], default="both")
    ap.add_argument("--constant", type=float, default=None, help="fixed control (null dataset)")
    ap.add_argument("--save-every", type=int, default=1)
    args = ap.parse_args(argv)

    trends = ("increase", "decrease") if args.trend == "both" else (args.trend,)
    if args.system == "SLBP":
        written = generate_slbp_dataset(
            args.out_dir, trends=trends, total_times=(args.total_time,),
            burn_time=args.burn_time, dt=args.dt, seed=args.seed,
            save_every=args.save_every, constant_n=args.constant,
        )
    else:
        if args.graph_dir is None:
            ap.error("--graph-dir is required for networked systems")
        written = generate_network_dataset(
            args.system, args.graph_dir, args.out_dir, trends=trends,
            total_time=args.total_time, burn_time=args.burn_time, dt=args.dt,
            seed=args.seed, graph_filter=args.graph_filter,
            constant_control=args.constant,
        )
    for p in written:
        print(p)


if __name__ == "__main__":
    main()
