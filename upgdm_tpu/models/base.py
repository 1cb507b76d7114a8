"""Shared wrapper plumbing for the four diffusion model families.

Each family wrapper pairs a set of Flax modules with:
  - pure jittable functions (``loss_fn``, ``sample_fn``, ...) used by the
    training loop, the batched MPV sweep, and the multi-chip paths;
  - a thin stateful convenience API matching the reference model surface
    (``training_step`` / ``evaluation_step`` / ``pretrain_f`` / ``pretrain_g``
    / ``scaler_fit`` / ``scaler_transform`` / ``scaler_inverse_transform`` /
    ``state_dict`` / ``load_state_dict``), so the evaluation facade and the
    figure layer read identically to the reference
    (e.g. NsDiff_model.py:99-268).

RNG: wrappers own a root ``jax.random.key`` and derive per-call keys by fold-in
of a monotone counter — fully deterministic given ``seed``.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.io import flatten_params, unflatten_params
from ..utils.scalers import StandardScaler

EPS = 10e-8


class DiffusionWrapperBase:
    scaler_axis = 0  # flat series; graph wrappers use (0, 1)

    def __init__(self, net_param: dict, seed: int = 0):
        self.net_param = dict(net_param)
        self.dataset_nf = net_param["dataset_nf"]
        self.windows = net_param["windows"]
        self.pred_len = net_param["pred_len"]
        self.scaler = net_param.get("scaler_type")
        if self.scaler in (None, "None"):
            self.scaler = None
        self._scaler = StandardScaler(
            mean=np.zeros(self.dataset_nf, np.float32),
            std=np.ones(self.dataset_nf, np.float32),
        )
        self._root_key = jax.random.key(seed)
        self._rng_counter = 0
        self.params: Optional[dict] = None

    # -- RNG ---------------------------------------------------------------
    def next_key(self) -> jax.Array:
        self._rng_counter += 1
        return jax.random.fold_in(self._root_key, self._rng_counter)

    # -- scaler (reference semantics: NsDiff_model.py:99-110) --------------
    def scaler_fit(self, data):
        self._scaler.fit(np.asarray(data), axis=self.scaler_axis)

    def scaler_transform(self, data):
        return self._scaler.transform(data)

    def scaler_inverse_transform(self, data):
        return self._scaler.inverse_transform(data)

    @property
    def scaler_mean(self):
        return self._scaler.mean

    @property
    def scaler_std(self):
        return self._scaler.std

    # -- checkpoint surface -------------------------------------------------
    def state_dict(self) -> Dict[str, np.ndarray]:
        flat = flatten_params(jax.tree.map(np.asarray, self.params))
        flat["scaler_mean"] = np.asarray(self._scaler.mean)
        flat["scaler_std"] = np.asarray(self._scaler.std)
        return flat

    def load_state_dict(self, flat: Dict[str, np.ndarray], strict: bool = True):
        flat = dict(flat)
        converter = getattr(self, "convert_reference_state_dict", None)
        if converter is not None:
            flat = converter(flat, strict=strict)
        if "scaler_mean" in flat:
            self._scaler.mean = np.asarray(flat.pop("scaler_mean"), np.float32)
        if "scaler_std" in flat:
            self._scaler.std = np.asarray(flat.pop("scaler_std"), np.float32)
        tree = unflatten_params(flat)
        if strict:
            want = set(flatten_params(self.params))
            got = set(flatten_params(tree))
            if want != got:
                missing = sorted(want - got)[:5]
                extra = sorted(got - want)[:5]
                raise ValueError(f"state_dict mismatch; missing={missing} extra={extra}")
        self.params = jax.tree.map(jnp.asarray, tree)

    # -- helpers ------------------------------------------------------------
    _SAMPLING_DTYPES = {
        "float32": jnp.float32, "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
    }

    def dtype_param(self, name: str, default: str):
        """Validated net_param[name] -> jnp dtype.

        Raises on unknown strings so a typo ('fp32', 'float') cannot silently
        select the wrong precision for a bit-parity run.
        """
        s = str(self.net_param.get(name, default))
        try:
            return self._SAMPLING_DTYPES[s]
        except KeyError:
            raise ValueError(
                f"{name}={s!r}: expected one of {sorted(self._SAMPLING_DTYPES)}"
            ) from None

    def sampling_dtype(self, default: str = "bfloat16"):
        return self.dtype_param("sampling_dtype", default)

    @staticmethod
    def cast_sampling_tree(tree, dtype):
        """Cast the floating leaves of a param (sub)tree to the sampling
        dtype; integer leaves (embedding indices, counters) untouched."""
        if dtype == jnp.float32:
            return tree
        return jax.tree.map(
            lambda a: a.astype(dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            tree,
        )

    @staticmethod
    def antithetic_t(key, n: int, num_timesteps: int) -> jnp.ndarray:
        """Antithetic timestep sampling (NsDiff_model.py:149-152)."""
        t = jax.random.randint(key, (n // 2 + 1,), 0, num_timesteps)
        return jnp.concatenate([t, num_timesteps - 1 - t], axis=0)[:n]

    def trainable_mask(self, train_model_select: Optional[str]):
        """Pytree mask (by top-level module) selecting optimised params."""
        raise NotImplementedError
