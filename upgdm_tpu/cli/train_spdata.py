"""CLI: train diffusion models on networked (graph) SDE datasets.

Parity: /root/reference/main_SSLtrain_diffusion_spdata.py (argparse contract
from configs/configs_diffusion_spdata.py:4-16):

    python -m upgdm_tpu.cli.train_spdata --cfg <yaml> \
        --train_mode grid|hold_out|cross_val --repeat N
"""
from __future__ import annotations

import argparse

from ..utils.data_prep import pre_dataset_spdata
from .train_driver import main_from_args


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="modelGym")
    parser.add_argument("--cfg", default="configs/grid_search/diffusion_model_NsDiff_spdata.yaml",
                        type=str, help="The configuration file path.")
    parser.add_argument("--train_mode", default="grid", type=str,
                        help=" train mode: grid,hold_out,cross_val")
    parser.add_argument("--repeat", type=int, default=1, help="The number of repeated jobs.")
    return parser.parse_args(argv)


def build_dataset(dataset_param: dict):
    x, adjs, gids = pre_dataset_spdata(**dataset_param)
    return x, (adjs, gids), x.shape[-1]


def main(argv=None):
    main_from_args(parse_args(argv), build_dataset, spdata=True)


if __name__ == "__main__":
    main()
