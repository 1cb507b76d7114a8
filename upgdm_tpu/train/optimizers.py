"""Optimizer/scheduler factory on optax.

Parity: /root/reference/optimizers/optimizers.py:4-27 (Adam/SGD;
StepLR/MultiStepLR/CyclicLR/CosineAnnealingLR).  Schedules here are
*per-epoch* like torch's scheduler.step() after each epoch: the returned
schedule maps epoch -> lr multiplier and the training loop passes the epoch
count as the optax schedule step.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import optax

__all__ = ["make_optimizer", "make_lr_schedule"]


def make_lr_schedule(optimizer_param: dict) -> Optional[optax.Schedule]:
    if not optimizer_param.get("scheduler_set"):
        return None
    name = optimizer_param.get("scheduler", "StepLR")
    # YAML-1.1 parses "1e-5" as a string; coerce before arithmetic.
    base_lr = float(optimizer_param["lr"])

    def _p(*keys, default):
        """First present key wins; reference schema names (optimizers/optimizers.py:18-25)
        listed first, earlier local aliases kept as fallbacks."""
        for k in keys:
            if k in optimizer_param:
                return optimizer_param[k]
        return default

    if name == "StepLR":
        step = _p("stepLR_stepsize", "steplr_step_size", "StepLR_step_size", default=30)
        gamma = _p("stepLR_gamma", "steplr_gamma", "StepLR_gamma", default=0.1)

        def sched(epoch):
            return base_lr * gamma ** (epoch // step)

        return sched
    if name == "MultiStepLR":
        milestones = np.asarray(
            optimizer_param.get("MstepLR_milestones", [30]), dtype=np.int64
        )
        gamma = optimizer_param.get("MstepLR_gamma", 0.1)

        def sched(epoch):
            import jax.numpy as jnp

            n = jnp.sum(epoch >= jnp.asarray(milestones))
            return base_lr * gamma**n

        return sched
    if name == "CosineAnnealingLR":
        t_max = _p("CALR_Tmax", "CosLR_T_max", default=50)
        eta_min = float(_p("CALR_minlr", "CosLR_eta_min", default=0.0))
        return optax.cosine_decay_schedule(base_lr, t_max, alpha=eta_min / max(base_lr, 1e-12))
    if name == "CyclicLR":
        base = float(_p("CyclicLR_blr", "CyclicLR_base_lr", default=base_lr * 0.1))
        max_lr = float(_p("CyclicLR_mlr", "CyclicLR_max_lr", default=base_lr))
        step_size = _p("CyclicLR_upsteps", "CyclicLR_step_size_up", default=10)

        def sched(epoch):
            import jax.numpy as jnp

            cycle = jnp.floor(1 + epoch / (2 * step_size))
            x = jnp.abs(epoch / step_size - 2 * cycle + 1)
            return base + (max_lr - base) * jnp.maximum(0.0, 1 - x)

        return sched
    raise ValueError(f"unknown scheduler {name!r}")


def make_optimizer(optimizer_param: dict, trainable_mask=None) -> optax.GradientTransformation:
    """Adam/SGD with optional weight decay and per-epoch lr schedule, masked to
    the trainable sub-tree (the reference filters p.requires_grad,
    train/train_diffusion_spdata.py:43-47)."""
    name = optimizer_param.get("optimizer_name", "Adam")
    # YAML-1.1 parses exponents without a decimal point ("1e-5") as strings;
    # coerce like the reference does (optimizers/optimizers.py:7-10).  The
    # training loop may pre-resolve lr to a per-step schedule callable
    # (loop.py scheduler_set path) — pass that through untouched.
    raw_lr = optimizer_param["lr"]
    lr = make_lr_schedule(optimizer_param) or (
        raw_lr if callable(raw_lr) else float(raw_lr)
    )
    wd = float(optimizer_param.get("weight_decay", 0.0) or 0.0)
    if name == "Adam":
        # torch Adam + weight_decay is L2-regularised Adam (decay enters the
        # gradient BEFORE the moment estimates), not AdamW.
        tx = (
            optax.chain(optax.add_decayed_weights(wd), optax.adam(lr))
            if wd
            else optax.adam(lr)
        )
    elif name == "SGD":
        momentum = float(optimizer_param.get("momentum", 0.0) or 0.0)
        tx = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.sgd(lr, momentum=momentum or None),
        )
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if trainable_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            param_labels=lambda params: _label_tree(params, trainable_mask),
        )
    return tx


def _label_tree(params, mask):
    import jax

    return {
        k: jax.tree.map(lambda _: "train" if mask.get(k, True) else "freeze", v)
        for k, v in params.items()
    }
