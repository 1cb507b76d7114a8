"""Data-parallel training and sharded inference sweeps.

Replaces the reference's torch.nn.DataParallel path
(train/train_diffusion_spdata_dataparallel.py:19-188, model-side re-batching
at NsDiff_model.py:572-586) with the idiomatic JAX pattern: ONE jitted step
whose batch carries a 'dp' sharding while the params are replicated — XLA
inserts the psum of the gradients over ICI.  No checkpoint 'module.' prefixes,
no host-side scatter/gather.

The MPV sweep analog ("sequence scaling" for this workload, SURVEY.md §5):
rolling windows and/or the sample ensemble are sharded over the same mesh —
embarrassingly parallel, collective-free until the final summary.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import NamedSharding, P, dp_sharding, make_mesh, replicated

__all__ = [
    "make_dp_train_step",
    "dp_train_epoch",
    "sharded_window_ensemble",
    "sharded_fast_mpv_sweep",
]


def make_dp_train_step(model, tx, mesh, select: Optional[str] = None, with_adj: bool = False):
    """Jitted DP train step: batch sharded on 'dp', params/opt replicated."""
    rep = replicated(mesh)
    dp = dp_sharding(mesh)

    if with_adj:

        @partial(
            jax.jit,
            in_shardings=(rep, rep, dp, rep, rep),
            out_shardings=(rep, rep, rep),
            donate_argnums=(0, 1),
        )
        def train_step(params, opt_state, batch, adj, key):
            def lf(p):
                return model.loss_fn(p, batch, adj, key, select=select, train=True)

            loss, grads = jax.value_and_grad(lf)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return params, opt_state, loss

    else:

        @partial(
            jax.jit,
            in_shardings=(rep, rep, dp, rep),
            out_shardings=(rep, rep, rep),
            donate_argnums=(0, 1),
        )
        def train_step(params, opt_state, batch, key):
            def lf(p):
                return model.loss_fn(p, batch, key, select=select, train=True)

            loss, grads = jax.value_and_grad(lf)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return params, opt_state, loss

    return train_step


def dp_train_epoch(model, tx, mesh, params, opt_state, data, batch_size, select=None):
    """Convenience epoch driver over a sharded batch stream; returns mean loss."""
    train_step = make_dp_train_step(model, tx, mesh, select=select)
    n_dev = mesh.devices.size
    bs = max(batch_size // n_dev * n_dev, n_dev)  # divisible batches
    losses = []
    for start in range(0, data.shape[0] - bs + 1, bs):
        batch = jnp.asarray(data[start : start + bs])
        params, opt_state, loss = train_step(params, opt_state, batch, model.next_key())
        losses.append(float(loss))
    return params, opt_state, float(np.mean(losses)) if losses else float("nan")


def sharded_window_ensemble(
    model, windows_array: np.ndarray, pred_len: int, mesh=None, chunk_windows: int = 8
):
    """MPV sweep with the window axis sharded across the mesh.

    windows_array: [n, Node, W, F].  Each device call takes
    n_devices * chunk_windows windows; the flattened (window*node) batch axis
    carries a 'dp' sharding so every chip denoises its own window shard — the
    collective-free "sequence scaling" axis of this workload.
    Returns a list of [Node, pred_len, F, S] arrays (cache contract).
    """
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    n, node, W, F = windows_array.shape
    block_sz = n_dev * chunk_windows
    dp = dp_sharding(mesh)
    out = []

    def dispatch(start):
        block = windows_array[start : start + block_sz]
        valid = block.shape[0]
        if valid < block_sz:
            block = np.concatenate(
                [block, np.repeat(block[-1:], block_sz - valid, axis=0)], axis=0
            )
        flat = block.reshape(block_sz * node, W, F)
        if model.scaler is not None:
            flat = model.scaler_transform(flat)
        flat = jax.device_put(jnp.asarray(flat), dp)
        outs, _ = model.evaluation_step(flat)
        try:  # start the D2H copy behind the compute (see eval/uncertainty.py)
            outs.copy_to_host_async()
        except AttributeError:
            pass
        return outs, valid

    def drain(outs, valid):
        outs = np.asarray(outs)
        outs = outs[:, -pred_len:, :, :].reshape(block_sz, node, pred_len, F, outs.shape[-1])
        for i in range(valid):
            out.append(outs[i])

    pending = None  # next block computes while this block's ensembles copy out
    for start in range(0, n, block_sz):
        nxt = dispatch(start)
        if pending is not None:
            drain(*pending)
        pending = nxt
    drain(*pending)
    return out


def sharded_fast_mpv_sweep(
    model, windows_array: np.ndarray, pred_len: int, mesh=None, chunk_windows: int = 8
):
    """Multi-chip version of the device-side MPV engine
    (eval/uncertainty.py::fast_mpv_sweep): the window axis is sharded over
    'dp', each chip samples and reduces its own window shard, and only two
    scalars per window are gathered to the host — no cross-chip collective
    is needed because both the sample-variance and the prediction-mean
    reductions are per-window.

    Returns (mpv [n], pred_mean [n]), matching fast_mpv_sweep.
    """
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    n, node, W, F = windows_array.shape
    if n == 0:
        return np.zeros(0), np.zeros(0)
    block_sz = n_dev * chunk_windows
    dp = dp_sharding(mesh)
    std = jnp.asarray(
        model.scaler_std if model.scaler is not None else np.ones(F, np.float32))
    mean = jnp.asarray(
        model.scaler_mean if model.scaler is not None else np.zeros(F, np.float32))

    # separate tiny jitted reduce, like the single-chip engine (fusing it
    # into the sampling program makes XLA pick a worse sampling schedule);
    # its input arrives dp-sharded, so each chip reduces locally and the
    # [block_sz] outputs stay sharded until the host gather.  Cached on the
    # model per geometry, mirroring fast_mpv_sweep's _fast_sweep_jit_cache —
    # a per-call jit wrapper would recompile every sweep (minutes each under
    # the remote-compile backend when /tmp/jax_cache is cold).
    cache = model.__dict__.setdefault("_fast_sweep_jit_cache", {})
    cache_key = ("sharded", block_sz, node, pred_len, F)
    if cache_key not in cache:

        @jax.jit
        def _reduce(outs, std, mean):
            outs = outs[:, -pred_len:, :, :]  # [block*node, O, F, S]
            outs = outs * std[None, None, :, None] + mean[None, None, :, None]
            var = outs.var(axis=-1).reshape(block_sz, node, pred_len, F)
            pm = outs.reshape(block_sz, node, pred_len, F, -1)
            return var.mean(axis=(1, 2, 3)), pm.mean(axis=(1, 2, 3, 4))

        cache[cache_key] = _reduce
    _reduce = cache[cache_key]

    def dispatch(start):
        block = windows_array[start : start + block_sz]
        valid = block.shape[0]
        if valid < block_sz:
            block = np.concatenate(
                [block, np.repeat(block[-1:], block_sz - valid, axis=0)], axis=0
            )
        flat = block.reshape(block_sz * node, W, F)
        if model.scaler is not None:
            flat = model.scaler_transform(flat)
        flat = jax.device_put(jnp.asarray(flat), dp)
        outs, _ = model.evaluation_step(flat)
        return _reduce(outs, std, mean), valid

    mpv_out, mean_out = [], []

    def drain(vm, valid):
        v, m = vm
        mpv_out.append(np.asarray(v)[:valid])
        mean_out.append(np.asarray(m)[:valid])

    pending = None  # overlap: next block computes while scalars copy out
    for start in range(0, n, block_sz):
        nxt = dispatch(start)
        if pending is not None:
            drain(*pending)
        pending = nxt
    drain(*pending)
    return np.concatenate(mpv_out), np.concatenate(mean_out)
