"""Training loop.

Parity with /root/reference/train/train_diffusion_spdata.py:17-200 and
train_diffusion_timeseries.py:17-211:

  - StandardScaler fit on the train split, per-batch transform;
  - stage dispatch (training_step / pretrain_f / pretrain_g) via the model's
    ``loss_fn(select=...)`` + optax-masked parameters;
  - NaN-loss batches are skipped (zero update), a NaN at epoch end raises;
  - periodic ``ckpt/tmpt_model_{epoch}iter``, final
    ``trained_model/model_trained`` (+ yaml), emergency checkpoint with resume;
  - record_scores JSON {epoch[], train_scores[], val_scores[]} with running
    means computed exactly like the reference (n*s/(n+1) + loss/(n+1)).

TPU-first: the whole optimisation step (loss, grads, optimizer update, NaN
guard) is ONE jitted function with donated params/opt_state; batches are
device_put once per step.  DataParallel is replaced by parallel.data_parallel
(shard_map over the batch axis) — see that module.
"""
from __future__ import annotations

import os
from functools import partial
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..models.factory import diffusion_models
from ..utils import io as uio
from .optimizers import make_optimizer

__all__ = ["run_training", "make_train_step"]


def make_train_step(model, tx, select: Optional[str], with_adj: bool):
    """Build the jitted (params, opt_state, batch[, adj], key) -> update fn.

    net_param["train_dtype"]="bfloat16" (opt-in, default float32) runs the
    fwd/bwd compute in bf16 with fp32 master weights — the profiled lever is
    1.07x on the NsDiff bench geometry at 4e-4 relative loss shift
    (BENCH_TRAIN_SPLIT.json; the step is f(x)-transformer bound).  The loss
    value, gradients-into-Adam and weights all stay fp32 at the boundary.
    """
    train_dt = str(model.net_param.get("train_dtype", "float32"))
    if train_dt not in ("float32", "bfloat16", "bf16"):
        raise ValueError(
            f"train_dtype={train_dt!r}: expected 'float32' or 'bfloat16'")
    cast = train_dt != "float32"

    def loss_call(p, *args, **kw):
        if not cast:
            return model.loss_fn(p, *args, **kw)
        pb = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            p,
        )
        args = tuple(
            a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a
            for a in args
        )
        return model.loss_fn(pb, *args, **kw).astype(jnp.float32)

    if with_adj:

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch, adj, key):
            def lf(p):
                return loss_call(p, batch, adj, key, select=select, train=True)

            loss, grads = jax.value_and_grad(lf)(params)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            new_params = jax.tree.map(lambda p, u: p + u, params, updates)
            ok = jnp.isfinite(loss)
            params = jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_params, params)
            opt_state = jax.tree.map(
                lambda n, o: jnp.where(ok, n, o) if hasattr(n, "dtype") else n,
                new_opt_state,
                opt_state,
            )
            return params, opt_state, loss

    else:

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch, key):
            def lf(p):
                return loss_call(p, batch, key, select=select, train=True)

            loss, grads = jax.value_and_grad(lf)(params)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            new_params = jax.tree.map(lambda p, u: p + u, params, updates)
            ok = jnp.isfinite(loss)
            params = jax.tree.map(lambda n, o: jnp.where(ok, n, o), new_params, params)
            opt_state = jax.tree.map(
                lambda n, o: jnp.where(ok, n, o) if hasattr(n, "dtype") else n,
                new_opt_state,
                opt_state,
            )
            return params, opt_state, loss

    return train_step


def _batches(n, batch_size, shuffle, rng):
    idx = rng.permutation(n) if shuffle else np.arange(n)
    for start in range(0, n, batch_size):
        yield idx[start : start + batch_size]


def run_training(
    trainset,
    validationset,
    train_param: dict,
    net_param: dict,
    loss_param: dict,
    optimizer_param: dict,
    records_path,
    adj=None,
    seed: int = 0,
    model=None,
    dataset_param: Optional[dict] = None,
):
    """Train one configuration; returns record_scores.

    trainset / validationset: stacked windows — [num, T, F] for flat models,
    [num, V, T, F] for graph models with ``adj`` either a shared [V, V]
    adjacency or a tuple (adjs [G, V, V], train_graph_ids [num],
    val_graph_ids [num_val]) for mixed-topology batches.
    """
    records_path = Path(records_path)
    records_path.mkdir(parents=True, exist_ok=True)
    trainset = np.asarray(trainset, dtype=np.float32)
    validationset = np.asarray(validationset, dtype=np.float32)
    # DataParallel replacement (train_diffusion_spdata_dataparallel.py:19-188):
    # batch axis sharded over a 'dp' mesh, params replicated, XLA-inserted
    # gradient all-reduce.  Enabled by train_param dataparallel/dataparallel_set.
    dp_mesh = None
    if train_param.get("dataparallel") or train_param.get("dataparallel_set"):
        import jax as _jax

        if len(_jax.devices()) > 1:
            from ..parallel.mesh import make_mesh

            dp_mesh = make_mesh()
    select = train_param.get("train_model_select")
    if select == "NsDiff_model":
        select_for_loss = None  # model default
    else:
        select_for_loss = select

    if model is None:
        model = diffusion_models(
            task_model=net_param["task_model"],
            net_param=net_param,
            train_model_select=select,
            seed=seed,
        )
    if model.scaler == "StandardScaler":
        # Per-feature stats over all windows x time (x nodes): identical to the
        # reference's cat-then-std for both flat (axis 0 on [n*T, F]) and graph
        # (axes (0,1) on [n*V, T, F]) variants.
        model._scaler.fit(trainset.reshape(-1, trainset.shape[-1]), axis=0)
    with_adj = adj is not None

    steps_per_epoch = max(1, int(np.ceil(trainset.shape[0] / train_param["train_batch_size"])))
    opt_param = dict(optimizer_param)
    if opt_param.get("scheduler_set"):
        from .optimizers import make_lr_schedule

        epoch_sched = make_lr_schedule(opt_param)
        opt_param = dict(opt_param, scheduler_set=False)
        base_lr = opt_param["lr"]
        opt_param["lr"] = lambda step: epoch_sched(step // steps_per_epoch)
    mask = model.trainable_mask(select if select not in (None, "NsDiff_model") else None)
    tx = make_optimizer(opt_param, trainable_mask=mask)
    params = model.params
    opt_state = tx.init(params)
    if dp_mesh is not None and adj is None:
        from ..parallel.data_parallel import make_dp_train_step

        train_step = make_dp_train_step(model, tx, dp_mesh, select=select_for_loss)
    else:
        train_step = make_train_step(model, tx, select_for_loss, with_adj)
    adjs = train_gids = val_gids = None
    if with_adj:
        if isinstance(adj, tuple):
            adjs, train_gids, val_gids = adj
            adjs = np.asarray(adjs, np.float32)
        else:
            adj = np.asarray(adj, np.float32)

    def adj_for(idx, gids, batch_len):
        if not with_adj:
            return None
        if adjs is not None:
            return jnp.asarray(adjs[np.asarray(gids)[idx]])
        return jnp.broadcast_to(jnp.asarray(adj), (batch_len,) + adj.shape)

    if with_adj:

        @jax.jit
        def val_step(params, batch, adj_b, key):
            return model.loss_fn(params, batch, adj_b, key, select=select_for_loss, train=False)

    else:

        @jax.jit
        def val_step(params, batch, key):
            return model.loss_fn(params, batch, key, select=select_for_loss, train=False)

    # emergency resume (utils/utils.py:641-658)
    init_epoch, record_scores, em_sd, em_opt = uio.load_emergency_checkpoint(records_path)
    if em_sd is not None:
        model.load_state_dict(em_sd)
        params = model.params
        if em_opt is not None:
            opt_state = serialization.from_bytes(opt_state, em_opt)

    np_rng = np.random.default_rng(seed)
    current_step = init_epoch
    loss = jnp.asarray(0.0)
    try:
        for epoch in range(init_epoch, train_param["train_epochs"]):
            train_score = 0.0
            n = 0
            for idx in _batches(
                trainset.shape[0], train_param["train_batch_size"], True, np_rng
            ):
                if dp_mesh is not None:
                    # dp shards need divisible batches; drop the ragged tail
                    n_dev = dp_mesh.devices.size
                    usable = len(idx) - len(idx) % n_dev
                    if usable == 0:
                        continue
                    idx = idx[:usable]
                batch = trainset[idx]
                if model.scaler == "StandardScaler":
                    batch = model.scaler_transform(batch)
                batch = jnp.asarray(batch)
                key = model.next_key()
                if with_adj:
                    adj_b = adj_for(idx, train_gids, len(idx))
                    params, opt_state, loss = train_step(params, opt_state, batch, adj_b, key)
                else:
                    params, opt_state, loss = train_step(params, opt_state, batch, key)
                lv = float(loss)
                if np.isnan(lv):
                    continue
                train_score = n * train_score / (n + 1) + lv / (n + 1)
                n += 1
            if np.isnan(float(loss)):
                raise ValueError("loss is None")
            current_step = epoch + 1
            model.params = params

            val_score = 0.0
            if train_param.get("test_set"):
                for m_, idx in enumerate(
                    _batches(validationset.shape[0], train_param["val_batch_size"], False, np_rng)
                ):
                    batch = validationset[idx]
                    if model.scaler == "StandardScaler":
                        batch = model.scaler_transform(batch)
                    if with_adj:
                        adj_b = adj_for(idx, val_gids, len(idx))
                        lv = float(val_step(params, jnp.asarray(batch), adj_b, model.next_key()))
                    else:
                        lv = float(val_step(params, jnp.asarray(batch), model.next_key()))
                    if np.isnan(lv):
                        raise ValueError("loss is None")
                    val_score = m_ * val_score / (m_ + 1) + lv / (m_ + 1)

            record_scores["epoch"].append(epoch)
            record_scores["train_scores"].append(train_score)
            record_scores["val_scores"].append(val_score)

            if (
                epoch % train_param.get("ckpt_period", 2) == 0
                and epoch != 0
                and train_param.get("ckpt")
            ):
                uio.save_checkpoint(
                    records_path / "ckpt", f"tmpt_model_{epoch}iter", model.state_dict(), net_param
                )
    except KeyboardInterrupt:
        raise
    except Exception as e:  # emergency checkpoint (train_diffusion_spdata.py:155-174)
        print(f"training interrupted: {e}")
        model.params = params
        uio.emergency_checkpoint(
            records_path,
            model.state_dict(),
            net_param,
            serialization.to_bytes(opt_state),
            current_step,
            record_scores,
        )
        uio.save_record(records_path / "train_trace/record_scores.json", record_scores)

    model.params = params
    uio.save_checkpoint(
        records_path / "trained_model", "model_trained", model.state_dict(), net_param
    )
    # resolved single-value config consumed at inference
    # (model_trained.yaml contract, diffusion_model_uncertainy.py:185-190)
    uio.save_config_yaml(
        records_path / "trained_model/model_trained.yaml",
        {
            "dataset": dataset_param,
            "train": train_param,
            "net": {k: v for k, v in net_param.items() if k != "device"},
            "optimizer": optimizer_param,
            "loss": loss_param,
        },
    )
    uio.save_record(records_path / "train_trace/record_scores.json", record_scores)
    return record_scores
