"""DiffSTG — masked graph spatio-temporal DDPM.

TPU-native rebuild of /root/reference/models/Diffusion_model/DiffSTG/
graph_diffusion_model.py:13-282.  Design deltas:

  - graphs are dense: batches are [B, V, T, F] with adjacency [B, V, V] (padded
    to a common V with a node mask) instead of PyG block-diagonal batching;
  - inference walks the *static* (t1, t2) InferenceSchedule pairs inside one
    jitted program (coefficients folded at trace time, like the reference's
    host ``.item()`` scalars) — parallel_sampling x sequential_sampling
    ensembles become a single vmap over sample keys, with no
    duplicate_edge_index / duplicate_batch_index host work
    (graph_diffusion_model.py:238-248);
  - the loss is masked over padded nodes.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import diffusion as D
from ..ops.schedules import diffstg_schedule, inference_time_pairs
from .base import DiffusionWrapperBase
from .ugnet import UGnet

__all__ = ["DiffSTGModel"]


def _log_norm_pdf(x, mu=0.0, sigma=1.0):
    """Log-normal pdf (diffusion_schedulers.py:11-37), numpy host-side."""
    x = np.asarray(x, np.float64)
    sigma = max(sigma, 1e-8)
    pdf = np.zeros_like(x)
    m = x > 0
    logx = np.log(x[m])
    pdf[m] = np.exp(-0.5 * ((logx - mu) / sigma) ** 2) / (sigma * np.sqrt(2 * np.pi) * x[m])
    return pdf


class DiffSTGModel(DiffusionWrapperBase):
    scaler_axis = (0, 1)  # graph batches: stats over (windows*nodes, time)

    def __init__(self, net_param: dict, seed: int = 0, **_):
        net_param = dict(net_param)
        net_param.setdefault("windows", net_param.get("T_h"))
        net_param.setdefault("pred_len", net_param.get("T_p"))
        net_param.setdefault("dataset_nf", net_param.get("F", 1))
        net_param.setdefault("T_h", net_param["windows"])
        net_param.setdefault("T_p", net_param["pred_len"])
        net_param.setdefault("F", net_param["dataset_nf"])
        super().__init__(net_param, seed=seed)
        p = self.net_param
        self.T_h = p["T_h"]
        self.T_p = p["T_p"]
        self.T = self.T_h + self.T_p
        self.F = p["F"]
        self.mask_ratio = p.get("mask_ratio", 0.0)
        self.diffusion_steps = p["diffusion_steps"]
        self.inference_diffusion_steps = p.get("inference_diffusion_steps", 20)
        self.inference_trick = p.get("inference_trick") or "ddim"
        self.inference_schedule = p.get("inference_schedule", "linear")
        self.loss_weight_schedule = p.get("loss_weight_schedule", "constant")
        self.parallel_sampling = p.get("parallel_sampling", 1)
        self.sequential_sampling = p.get("sequential_sampling", 1)

        self.sched = diffstg_schedule(self.diffusion_steps, p.get("diffusion_schedule", "linear"))
        self.net = UGnet(
            d_h=p.get("d_h", 4),
            T_h=self.T_h,
            T_p=self.T_p,
            F=self.F,
            channel_multipliers=tuple(p.get("channel_multipliers", (1, 2))),
            n_blocks=p.get("n_blocks", 2),
            gnn_name=p.get("gnn_name", "GCNConv"),
            gnn_param=p.get("gnn_param"),
            td_h=p.get("Td_h", 10),
        )
        self._init_params(p.get("init_num_nodes", 8))

    def _init_params(self, V: int):
        x = jnp.zeros((1, V, self.T, self.F))
        t = jnp.zeros((1,), jnp.float32)
        adj = jnp.zeros((1, V, V))
        self.params = {
            "model": jax.jit(partial(self.net.init, deterministic=True))(
                {"params": self.next_key()}, x, t, x, adj
            )["params"]
        }

    # ------------------------------------------------------------------
    def _loss_weight(self, t_np: np.ndarray) -> np.ndarray:
        if self.loss_weight_schedule == "constant":
            return np.ones_like(t_np, np.float32)
        snr = self.sched.snr(t_np)
        return _log_norm_pdf(snr, 0.0, 0.5).astype(np.float32)

    def convert_reference_state_dict(self, flat, strict: bool = True):
        """Auto-import reference torch checkpoints (utils/torch_import.py):
        the UGnet lives under model.* with torch .res/.conv nesting."""
        if not any(".res.tcn1.conv." in k or k.endswith("x_proj.weight") for k in flat):
            return flat
        from ..utils.torch_import import convert_reference_diffstg_state_dict

        return convert_reference_diffstg_state_dict(flat, self.net_param, strict=strict)

    def loss_fn(self, params, batch, adj, key, node_mask=None,
                select: Optional[str] = None, train: bool = True):
        """training_step (graph_diffusion_model.py:141-191) on dense batches.

        batch: [B, V, T_h + T_p, F]; adj: [B, V, V] or [V, V];
        node_mask: [B, V] bool or None.
        """
        B, V = batch.shape[:2]
        history = batch[:, :, : self.T_h, :]
        future = batch[:, :, self.T_h : self.T, :]
        kd, km, kt, ke = jax.random.split(key, 4)

        if self.mask_ratio > 0:
            drop = jax.random.uniform(km, history.shape) < self.mask_ratio
            history = jnp.where(drop, 0.0, history)
        x0 = jnp.concatenate([batch[:, :, : self.T_h, :], future], axis=2)
        x_masked = jnp.concatenate([history, jnp.zeros_like(future)], axis=2)

        # per-graph timestep in 1..T (graph_diffusion_model.py:163-165)
        t = jax.random.randint(kt, (B,), 1, self.sched.T + 1)
        eps = jax.random.normal(ke, x0.shape, x0.dtype)
        xt = D.diffstg_q_sample(x0, self.sched, t[:, None, None, None], eps)

        rngs = {"dropout": kd} if train else None
        eps_pred = self.net.apply(
            {"params": params["model"]}, xt, t.astype(jnp.float32), x_masked, adj,
            deterministic=not train, rngs=rngs,
        )
        loss = (eps_pred - eps) ** 2  # [B, V, T, F]
        loss_node = loss.mean(axis=(2, 3))  # [B, V]
        if self.loss_weight_schedule == "constant":
            w = jnp.ones((B,), loss.dtype)
        else:
            # logNormal SNR weight, gathered from a host-precomputed table
            table = jnp.asarray(self._loss_weight(np.arange(self.sched.T + 1)))
            w = table[t]
        weighted = loss_node * w[:, None]
        if node_mask is not None:
            weighted = jnp.where(node_mask, weighted, 0.0)
            return weighted.sum() / jnp.maximum(node_mask.sum(), 1)
        return weighted.mean()

    def sample_fn(self, params, history, adj, key, n_samples: Optional[int] = None):
        """Ensemble of denoised x0: [V, T, F, all_sampling] for one graph.

        history: [V, T_h, F]; the masked condition is history + zero future
        (graph_diffusion_model.py:204-282).  The reduced-step reverse walk uses
        the static InferenceSchedule pairs.
        """
        S = n_samples or (self.parallel_sampling * self.sequential_sampling)
        V = history.shape[0]
        x_masked = jnp.concatenate(
            [history, jnp.zeros((V, self.T_p, self.F), history.dtype)], axis=1
        )[None]  # [1, V, T, F]
        adj_b = adj[None] if adj.ndim == 2 else adj

        # Every posterior step (DDPM or DDIM, graph_diffusion_model.py:46-73)
        # is affine: x_{next} = a*x_t + b*eps_pred + c*z.  Fold the static
        # (t1, t2) InferenceSchedule into coefficient tables and lax.scan.
        pairs = inference_time_pairs(
            self.inference_schedule, self.sched.T, self.inference_diffusion_steps
        )
        abar, alpha, beta = self.sched.alphabar, self.sched.alpha, self.sched.beta
        rows = []
        for t1, t2 in pairs:
            if self.inference_trick == "ddpm" or t1 <= 1:
                at = alpha[t1]
                atbar = abar[t1]
                atbar_prev = abar[t1 - 1]
                beta_tilde = beta[t1 - 1] * (1.0 - atbar_prev) / (1.0 - atbar)
                a = 1.0 / at**0.5
                b = -a * (1.0 - at) / (1.0 - atbar) ** 0.5
                c = beta_tilde**0.5
            else:  # ddim
                atbar, atbar_t = abar[t1], abar[t2]
                a = (atbar_t / atbar) ** 0.5
                b = -a * (1.0 - atbar) ** 0.5 + (1.0 - atbar_t) ** 0.5
                c = 0.0
            rows.append((float(t1), a, b, c))
        tab = jnp.asarray(rows, jnp.float32)  # [steps, 4]

        # Default: the UGnet denoiser (the bandwidth-bound part — see
        # BENCH_DIFFSTG_GROUPS.json: tiny d_h channels pad ~32x on MXU lanes,
        # leaving each window bandwidth-bound) runs in bf16: params and net
        # inputs are cast, while the chain state xt, the affine posterior
        # coefficients, and the PRNG draws all stay fp32 — the same split the
        # NsDiff fused kernel uses.  Measured 1.27x (857 vs 675 traj/s,
        # BENCH_DIFFSTG_BF16.json) at 0.10% MPV shift; parity guarded in
        # tests/test_models_e2e.py.  Set net_param["sampling_dtype"]=
        # "float32" for bit-parity with training.
        net_dt = self.sampling_dtype()
        net_params = self.cast_sampling_tree(params["model"], net_dt)
        x_m_net = x_masked.astype(net_dt)
        adj_net = adj_b.astype(net_dt)

        def one_sample(k):
            k, k0 = jax.random.split(k)
            xt0 = jax.random.normal(k0, x_masked.shape, x_masked.dtype)

            def body(carry, inp):
                xt, = carry
                row, kz = inp
                # t stays fp32: sinusoidal_time_embedding consumes it in fp32
                # anyway, and a bf16 t misrounds timesteps above 256
                t_b = row[0][None]
                eps_pred = self.net.apply(
                    {"params": net_params},
                    xt.astype(net_dt), t_b,
                    x_m_net, adj_net, deterministic=True,
                ).astype(jnp.float32)
                z = jax.random.normal(kz, xt.shape, xt.dtype)
                xt = row[1] * xt + row[2] * eps_pred + row[3] * z
                return (xt,), None

            keys = jax.random.split(k, tab.shape[0])
            (xt,), _ = jax.lax.scan(body, (xt0,), (tab, keys))
            return xt[0]  # [V, T, F]

        samples = jax.vmap(one_sample)(jax.random.split(key, S))  # [S, V, T, F]
        return jnp.transpose(samples, (1, 2, 3, 0))  # [V, T, F, S]

    def trainable_mask(self, select=None):
        return {k: True for k in self.params}

    # -- reference-surface API ------------------------------------------
    def training_step(self, batch, adj, node_mask=None):
        return self._jitted_loss(
            self.params, jnp.asarray(batch), jnp.asarray(adj), self.next_key(), node_mask
        )

    @partial(jax.jit, static_argnums=(0,))
    def _jitted_loss(self, params, batch, adj, key, node_mask):
        return self.loss_fn(params, batch, adj, key, node_mask=node_mask, train=False)

    def evaluation_step(self, gdata):
        """gdata: dict {x: [V, T, F] (or [V, T_h, F]), adj: [V, V]}.

        Returns (x0 samples [V, T, F, all_sampling], x0_truth or None) —
        graph_diffusion_model.py:204-282.
        """
        x = jnp.asarray(gdata["x"])
        adj = jnp.asarray(gdata["adj"])
        history = x[:, : self.T_h, :]
        truth = x[:, : self.T, :] if x.shape[1] - self.T_h >= self.T_p else None
        S = self.parallel_sampling * self.sequential_sampling
        outs = self._jitted_sample(self.params, history, adj, self.next_key(), S)
        return outs, truth

    @partial(jax.jit, static_argnums=(0, 5))
    def _jitted_sample(self, params, history, adj, key, n_samples):
        return self.sample_fn(params, history, adj, key, n_samples)
