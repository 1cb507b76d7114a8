"""TMDM — conditional diffusion guided by a VAE-regularised NS-Transformer.

TPU-native rebuild of /root/reference/models/Diffusion_model/TMDM/
(tmdm_adapter.py:23-155, TMDM.py:22-98, tmdm_model.py:23-64,
tmdm_diffusion_utils.py).  Design deltas:

  - The CARD reverse chain is a ``lax.scan`` (ops.diffusion.card_p_sample_loop)
    and the ensemble a ``vmap`` — no host tiling (tmdm_adapter.py:130-151).
  - The x-embedding (enc_embedding, TMDM.py:95) is computed ONCE per window and
    closed over by the scan body, instead of recomputed every reverse step.
  - The tmdm.yml defaults (cat_x/cat_y_pred=True, fixedlarge var) are inlined
    as config defaults rather than re-parsed from yaml at model build.

The diffusion operates on the label_len+pred_len target segment
(tmdm_adapter.py:93).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import diffusion as D
from ..ops.schedules import card_schedule
from .base import DiffusionWrapperBase
from .denoise import TMDMDenoiser
from .embedding import DataEmbedding
from .ns_transformer import NSTransformerVAE

__all__ = ["TMDMModel"]


def log_normal(x, mu, var_scalar: float = 1.0):
    """0.5 * mean(log 2pi + log var + (x-mu)^2/var) (tmdm_adapter.py:13-20)."""
    var = var_scalar + 1e-8
    return 0.5 * jnp.mean(np.log(2.0 * np.pi) + np.log(var) + (x - mu) ** 2 / var)


class TMDMModel(DiffusionWrapperBase):
    def __init__(self, net_param: dict, seed: int = 0, **_):
        super().__init__(net_param, seed=seed)
        p = self.net_param
        self.seq_len = p.setdefault("seq_len", self.windows)
        self.label_len = p.setdefault("label_len", self.windows // 2)
        self.diffusion_steps = p.get("diffusion_steps", 100)
        self.n_z_samples = p.get("n_z_samples", 100)
        self.parallel_sample = p.get("parallel_sample", min(10, self.n_z_samples))
        self.k_z = p.get("k_z", 0.01)
        self.k_cond = p.get("k_cond", 1.0)
        self.d_model = p.get("d_model", 64)
        self.target_len = self.label_len + self.pred_len

        # optional tmdm.yml-style config file (TMDM.py:30-40): net_param keys
        # override the yaml's diffusion section, exactly like the reference
        if p.get("diffusion_config_dir"):
            import yaml

            with open(p["diffusion_config_dir"], "r") as f:
                dcfg = yaml.safe_load(f)
            diff = dcfg.get("diffusion", {})
            p.setdefault("beta_schedule", diff.get("beta_schedule", "linear"))
            p.setdefault("beta_start", diff.get("beta_start", 1e-4))
            p.setdefault("beta_end", diff.get("beta_end", 2e-2))
            model_cfg = dcfg.get("model", {})
            p.setdefault("cat_x", model_cfg.get("cat_x", True))
            p.setdefault("cat_y_pred", model_cfg.get("cat_y_pred", True))

        self.sched = card_schedule(
            p.get("beta_schedule", "linear"),
            self.diffusion_steps,
            p.get("beta_start", 1e-4),
            p.get("beta_end", 2e-2),
        )

        self.cond_pred_model = NSTransformerVAE(
            seq_len=self.seq_len,
            label_len=self.label_len,
            pred_len=self.pred_len,
            enc_in=self.dataset_nf,
            d_model=self.d_model,
            n_heads=p.get("n_heads", 4),
            e_layers=p.get("e_layers", 2),
            d_layers=p.get("d_layers", 1),
            d_ff=p.get("d_ff", 128),
            dropout=p.get("dropout", 0.05),
            activation=p.get("activation", "gelu"),
            p_hidden_dims=tuple(p.get("p_hidden_dims", (64, 64))),
            p_hidden_layers=p.get("p_hidden_layers", 2),
        )
        self.enc_embedding = DataEmbedding(
            p.get("CART_input_x_embed_dim", self.d_model), p.get("dropout", 0.05)
        )
        # n_steps = timesteps + 1 (tmdm_model.py:26)
        self.denoiser = TMDMDenoiser(
            self.dataset_nf,
            self.diffusion_steps + 1,
            cat_x=p.get("cat_x", True),
            cat_y_pred=p.get("cat_y_pred", True),
        )
        self._init_params()

    def _init_params(self):
        kf, ke, km = jax.random.split(self.next_key(), 3)
        x = jnp.zeros((1, self.windows, self.dataset_nf))
        y = jnp.zeros((1, self.target_len, self.dataset_nf))
        t = jnp.zeros((1,), jnp.int32)
        emb = jnp.zeros((1, self.windows, self.d_model))
        self.params = {
            "cond_pred_model": jax.jit(self.cond_pred_model.init)({"params": kf}, x)["params"],
            "enc_embedding": jax.jit(self.enc_embedding.init)({"params": ke}, x)["params"],
            "model": jax.jit(self.denoiser.init)({"params": km}, emb, y, y, t)["params"],
        }

    # ------------------------------------------------------------------
    def _apply_cond(self, params, batch_x, rngs=None, deterministic=True):
        return self.cond_pred_model.apply(
            {"params": params["cond_pred_model"]},
            batch_x,
            deterministic=deterministic,
            rngs=rngs,
        )

    def loss_fn(self, params, batch, key, select: Optional[str] = None, train: bool = True):
        """tmdm_adapter.training_step (:90-114)."""
        batch_x = batch[:, : self.windows, :]
        target_y = batch[:, self.windows : self.windows + self.pred_len, :]
        batch_y = jnp.concatenate([batch_x[:, -self.label_len :, :], target_y], axis=1)
        kd, kr, kt, ke = jax.random.split(key, 4)
        rngs = {"dropout": kd, "reparam": kr} if train else {"reparam": kr}

        _, y_0_hat, kl_loss, _ = self._apply_cond(
            params, batch_x, rngs=rngs, deterministic=not train
        )
        loss_vae_all = log_normal(batch_y, y_0_hat) + self.k_z * kl_loss

        n = batch_x.shape[0]
        t = self.antithetic_t(kt, n, self.sched.num_timesteps)
        noise = jax.random.normal(ke, batch_y.shape, batch_y.dtype)
        y_t = D.card_q_sample(batch_y, y_0_hat, self.sched, t, noise)
        emb = self.enc_embedding.apply(
            {"params": params["enc_embedding"]},
            batch_x,
            deterministic=not train,
            rngs={"dropout": kd} if train else None,
        )
        output = self.denoiser.apply({"params": params["model"]}, emb, y_t, y_0_hat, t)
        return jnp.mean((noise - output) ** 2) + self.k_cond * loss_vae_all

    def sample_fn(self, params, batch_x, key, n_z_samples: Optional[int] = None):
        """Ensemble of futures: [B, pred_len, N, S] (tmdm_adapter.py:116-155)."""
        S = n_z_samples or self.n_z_samples
        kr, ks = jax.random.split(key)
        _, y_0_hat, _, _ = self._apply_cond(
            params, batch_x, rngs={"reparam": kr}, deterministic=True
        )
        emb = self.enc_embedding.apply(
            {"params": params["enc_embedding"]}, batch_x, deterministic=True
        )

        # Default OFF: the forced-sync A/B (benchmarks/ab_tmdm.py,
        # BENCH_TMDM_AB.json) measured the fused kernel 1.55x SLOWER than the
        # plain flax denoiser here (12.8k vs 19.8k traj/s) — unlike NsDiff,
        # this trunk has no inter-layer l2-norms, so XLA already fuses it
        # optimally and the pallas_call only adds overhead.  Kept opt-in for
        # experiments; parity guarded in tests/test_pallas_denoiser.py.
        use_pallas = bool(self.net_param.get("use_pallas_denoiser", False))
        # the fused kernel implements only the cat_y_pred=True input layout
        # (concat(y_t, y0_hat) — the reference tmdm.yml default)
        use_pallas = use_pallas and self.denoiser.cat_y_pred
        if use_pallas:
            from ..ops.pallas.fused_denoiser import fused_tmdm_denoiser

            # follows the validated sampling_dtype unless overridden, so
            # sampling_dtype="float32" means bit-parity on the kernel arm too
            mm_dtype = self.net_param.get(
                "sampling_matmul_dtype", jnp.dtype(self.sampling_dtype()).name
            )
            tile_m = self.net_param.get("denoiser_tile_m", 1024)

            def model_fn(y, t):
                return fused_tmdm_denoiser(
                    params["model"], y, y_0_hat, t,
                    matmul_dtype=mm_dtype, tile_m=tile_m,
                )

        else:
            # Default: the denoiser MLP runs in bf16 (params + inputs cast;
            # the CARD chain state, posterior coefficients and PRNG draws
            # stay fp32) — the 100-step chain is bandwidth/VPU-bound like
            # NsDiff's.  Measured in benchmarks/ab_tmdm_bf16.py; MPV parity
            # guarded in tests/test_models_e2e.py.  Set net_param
            # ["sampling_dtype"]="float32" for bit-parity with training.
            in_dt = self.sampling_dtype()
            den_params = self.cast_sampling_tree(params["model"], in_dt)
            emb_n, y0_n = emb.astype(in_dt), y_0_hat.astype(in_dt)

            def model_fn(y, t):
                tb = jnp.broadcast_to(jnp.asarray(t), (y.shape[0],))
                return self.denoiser.apply(
                    {"params": den_params}, emb_n, y.astype(in_dt), y0_n, tb
                ).astype(jnp.float32)

        def one_sample(k):
            return D.card_p_sample_loop(model_fn, y_0_hat, self.sched, k)

        samples = jax.vmap(one_sample)(jax.random.split(ks, S))  # [S, B, L+P, N]
        samples = samples[:, :, -self.pred_len :, :]
        return jnp.transpose(samples, (1, 2, 3, 0))  # [B, O, N, S]

    def trainable_mask(self, select=None):
        return {k: True for k in self.params}

    # -- reference-surface API ------------------------------------------
    def convert_reference_state_dict(self, flat, strict: bool = True):
        """Auto-import reference torch checkpoints (see utils/torch_import.py)."""
        from ..utils.torch_import import (
            convert_reference_tmdm_state_dict,
            looks_like_reference_nsdiff_state_dict,
        )

        if not looks_like_reference_nsdiff_state_dict(flat):
            return flat
        return convert_reference_tmdm_state_dict(flat, self.net_param, strict=strict)

    def training_step(self, batch):
        return self._jitted_loss(self.params, jnp.asarray(batch), self.next_key())

    @partial(jax.jit, static_argnums=(0,))
    def _jitted_loss(self, params, batch, key):
        return self.loss_fn(params, batch, key, train=False)

    def evaluation_step(self, batch):
        batch = jnp.asarray(batch)
        batch_x = batch[:, : self.windows, :]
        batch_y = (
            batch[:, self.windows : self.windows + self.pred_len, :]
            if batch.shape[1] - self.windows >= self.pred_len
            else None
        )
        outs = self._jitted_sample(self.params, batch_x, self.next_key(), self.n_z_samples)
        return outs, batch_y

    @partial(jax.jit, static_argnums=(0, 4))
    def _jitted_sample(self, params, batch_x, key, n_z_samples):
        return self.sample_fn(params, batch_x, key, n_z_samples)
