"""Device mesh helpers.

The reference's only multi-device path is single-process torch DataParallel
(train/train_diffusion_spdata_dataparallel.py:45) plus a commented DDP sketch.
Here the equivalents are JAX-native (SURVEY.md §2.2):

  - data parallelism: batch axis sharded over 'dp', params replicated, XLA
    inserts the gradient all-reduce over ICI;
  - sample/window parallelism (the inference-scaling axis of this workload):
    ensemble and rolling-window axes sharded over the same mesh.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "dp_sharding", "replicated", "P", "NamedSharding"]


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("dp",)
) -> Mesh:
    """1-D (or factored) mesh over the first n devices."""
    devices = jax.devices()[: n_devices or len(jax.devices())]
    if len(axis_names) == 1:
        shape = (len(devices),)
    else:
        # factor devices as evenly as possible over the requested axes
        n = len(devices)
        shape = [n] + [1] * (len(axis_names) - 1)
        shape = tuple(shape)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def dp_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
