"""NsDiff — non-stationary diffusion with learned mean f(x) and variance g(x).

TPU-native rebuild of /root/reference/models/Diffusion_model/NsDiff/
NsDiff_model.py (wrapper :16-268, variants :271-495).  Differences by design:

  - The reverse chain is ONE ``lax.scan`` (ops.diffusion.nsdiff_p_sample_loop)
    instead of a Python loop of T denoiser calls (nsdiff_utils.py:271-284).
  - The sample ensemble is a ``vmap`` over n_z_samples instead of host-side
    tiling in chunks of ``parallel_sample`` (NsDiff_model.py:227-257); the
    whole (batch x samples x steps) program is compiled once.
  - f(x)/g(x) run ONCE per window and are broadcast into the vmapped chain.

The three-stage training protocol (pretrain_f -> pretrain_g -> NsDiff_model,
train/train_diffusion_spdata.py:42-49) maps to `loss_fn(..., select)` plus a
`trainable_mask` consumed by optax.masked.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import diffusion as D
from ..ops.rolling import wv_sigma_trailing
from ..ops.schedules import NsDiffSchedule
from .base import EPS, DiffusionWrapperBase
from .denoise import NsDiffDenoiser
from .ns_transformer import NSTransformer
from .sigma_estimation import SigmaEstimation

__all__ = ["NsDiffModel", "NsDiffVariants"]


class NsDiffModel(DiffusionWrapperBase):
    """train_model_select in {'NsDiff_model', 'pretrain_f', 'pretrain_g'}."""

    def __init__(
        self,
        net_param: dict,
        train_model_select: str = "NsDiff_model",
        pretrain_f_path: Optional[str] = None,
        pretrain_g_path: Optional[str] = None,
        seed: int = 0,
        has_f: bool = True,
        has_g: bool = True,
        wo_uans: bool = False,
    ):
        super().__init__(net_param, seed=seed)
        p = self.net_param
        self.train_model_select = train_model_select
        self.seq_len = p.setdefault("seq_len", self.windows)
        self.label_len = p.setdefault("label_len", self.windows // 2)
        self.rolling_length = p["rolling_length"]
        self.diffusion_steps = p["diffusion_steps"]
        self.n_z_samples = p.get("n_z_samples", 100)
        self.parallel_sample = p.get("parallel_sample", 10)  # kept for config parity
        # Pretrain stages hold ONLY their submodule, like the reference
        # (NsDiff_model.py:86-93): their checkpoints then contain just that
        # subtree, which is also what the reference's shipped pretrain
        # binaries (e.g. ews_results/NsDiff_preg/models/*) look like.
        has_denoiser = True
        if train_model_select == "pretrain_f":
            has_f, has_g, has_denoiser = True, False, False
        elif train_model_select == "pretrain_g":
            has_f, has_g, has_denoiser = False, True, False
        self.has_denoiser = has_denoiser
        self.has_f = has_f
        self.has_g = has_g
        self.wo_uans = wo_uans
        # Fused Pallas denoiser for the reverse scan: OFF by default since the
        # flax denoiser fully in bf16 beats it 1.22x on TPU
        # (BENCH_NSDIFF_FLAX_BF16.json: XLA lowers the softplus/l2-norm band
        # packed-bf16, which Mosaic cannot — its packed-bf16 compares don't
        # lower — so the kernel's elementwise band is stuck fp32).  Kept
        # opt-in via net_param["use_pallas_denoiser"].
        self.use_pallas_denoiser = bool(p.get("use_pallas_denoiser", False))

        self.sched = NsDiffSchedule.create(
            p.get("diffusion_schedule", "linear"),
            self.diffusion_steps,
            p.get("beta_start", 1e-4),
            p.get("beta_end", 2e-2),
        )

        self.cond_pred_model = NSTransformer(
            seq_len=self.seq_len,
            label_len=self.label_len,
            pred_len=self.pred_len,
            enc_in=self.dataset_nf,
            d_model=p.get("d_model", 512),
            n_heads=p.get("n_heads", 8),
            e_layers=p.get("e_layers", 2),
            d_layers=p.get("d_layers", 1),
            d_ff=p.get("d_ff", 256),
            dropout=p.get("dropout", 0.05),
            activation=p.get("activation", "gelu"),
            p_hidden_dims=tuple(p.get("p_hidden_dims", (64, 64))),
            p_hidden_layers=p.get("p_hidden_layers", 2),
        ) if has_f else None
        self.cond_pred_model_g = SigmaEstimation(
            self.windows, self.pred_len, self.dataset_nf, 512, self.rolling_length
        ) if has_g else None
        self.denoiser = (
            NsDiffDenoiser(self.dataset_nf, self.diffusion_steps) if has_denoiser else None
        )

        self._init_params()
        if train_model_select == "NsDiff_model" and p.get("load_pretrain") and pretrain_g_path:
            self._load_pretrain_g(pretrain_g_path)
        if train_model_select == "NsDiff_model" and p.get("load_pretrain") and pretrain_f_path and p.get("load_pretrain_f"):
            self._load_pretrain_f(pretrain_f_path)

    # ------------------------------------------------------------------
    def _init_params(self):
        key = self.next_key()
        kf, kg, km = jax.random.split(key, 3)
        x = jnp.zeros((1, self.windows, self.dataset_nf))
        y = jnp.zeros((1, self.pred_len, self.dataset_nf))
        t = jnp.zeros((1,), jnp.int32)
        params = {}
        # jit the inits: eager flax init dispatches hundreds of op-by-op XLA
        # compiles, which is prohibitively slow on a small host.
        if self.cond_pred_model is not None:
            params["cond_pred_model"] = jax.jit(self.cond_pred_model.init)(
                {"params": kf}, x
            )["params"]
        if self.cond_pred_model_g is not None:
            params["cond_pred_model_g"] = jax.jit(self.cond_pred_model_g.init)(
                {"params": kg}, x
            )["params"]
        if self.denoiser is not None:
            params["model"] = jax.jit(self.denoiser.init)({"params": km}, y, y, y, t)["params"]
        self.params = params

    def _load_pretrain_g(self, pretrain_g_path):
        from ..utils.io import load_checkpoint, unflatten_params

        _, sd = load_checkpoint(str(pretrain_g_path) + "/model_trained")
        # The pretrain stage saves the FULL model state; keep only the g
        # subtree (keys outside the prefix would otherwise be injected as
        # dead duplicates into cond_pred_model_g and persist into the final
        # checkpoint; torch strict-load rejects extras too).
        prefix = "cond_pred_model_g."
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
        self.params = dict(self.params)
        self.params["cond_pred_model_g"] = jax.tree.map(jnp.asarray, unflatten_params(sd))

    def _load_pretrain_f(self, pretrain_f_path):
        from ..utils.io import load_checkpoint, unflatten_params

        _, sd = load_checkpoint(str(pretrain_f_path) + "/model_trained")
        # Keep only the f subtree ("cond_pred_model." does not match the
        # "_g." keys, so this also excludes the g head) — see _load_pretrain_g.
        prefix = "cond_pred_model."
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
        self.params = dict(self.params)
        self.params["cond_pred_model"] = jax.tree.map(jnp.asarray, unflatten_params(sd))

    # ------------------------------------------------------------------
    # pure functions
    # ------------------------------------------------------------------
    def _apply_f(self, params, batch_x, rngs=None, deterministic=True):
        if self.cond_pred_model is None:
            B = batch_x.shape[0]
            return jnp.zeros((B, self.pred_len, self.dataset_nf), batch_x.dtype)
        y0_hat, _ = self.cond_pred_model.apply(
            {"params": params["cond_pred_model"]},
            batch_x,
            deterministic=deterministic,
            rngs=rngs,
        )
        return y0_hat

    def _apply_g(self, params, batch_x):
        if self.cond_pred_model_g is None:
            B = batch_x.shape[0]
            return jnp.ones((B, self.pred_len, self.dataset_nf), batch_x.dtype)
        return self.cond_pred_model_g.apply(
            {"params": params["cond_pred_model_g"]}, batch_x
        )

    def loss_fn(self, params, batch, key, select: Optional[str] = None, train: bool = True):
        """Single-step loss for any training stage.

        batch: [B, windows + pred_len, N].  Mirrors NsDiff_model.training_step
        (:133-179), pretrain_f (:111-123), pretrain_g (:124-132); variant
        behavior (Gaussian/cond_mean/cond_var/wo_UANS) via has_f/has_g/wo_uans
        (:336-402).
        """
        select = select or self.train_model_select
        batch_x = batch[:, : self.windows, :]
        batch_y = batch[:, self.windows : self.windows + self.pred_len, :]
        kd, kt, ke = jax.random.split(key, 3)
        rngs = {"dropout": kd} if train else None

        if select == "pretrain_f":
            y0_hat = self._apply_f(params, batch_x, rngs=rngs, deterministic=not train)
            return jnp.mean((y0_hat - batch_y) ** 2)
        if select == "pretrain_g":
            y_sigma = wv_sigma_trailing(
                jnp.concatenate([batch_x, batch_y], axis=1), self.rolling_length
            )[:, -self.pred_len :, :] + EPS
            gx = self._apply_g(params, batch_x)
            return jnp.mean((jnp.sqrt(gx) - jnp.sqrt(y_sigma)) ** 2)

        # full NsDiff step
        y_sigma = wv_sigma_trailing(
            jnp.concatenate([batch_x, batch_y], axis=1), self.rolling_length
        )[:, -self.pred_len :, :] + EPS
        n = batch_x.shape[0]
        t = self.antithetic_t(kt, n, self.sched.num_timesteps)
        y0_hat = self._apply_f(params, batch_x, rngs=rngs, deterministic=not train)
        gx = self._apply_g(params, batch_x) + EPS
        loss1 = jnp.mean((y0_hat - batch_y) ** 2) if self.has_f else 0.0
        loss2 = jnp.mean((jnp.sqrt(gx) - jnp.sqrt(y_sigma)) ** 2) if self.has_g else 0.0

        e = jax.random.normal(ke, batch_y.shape, batch_y.dtype)
        c = D.nsdiff_gather(self.sched, t, batch_y)
        forward_noise = D.nsdiff_forward_noise(c, gx, y_sigma)
        noise = e * jnp.sqrt(forward_noise)
        sigma_tilde = D.nsdiff_sigma_tilde(c, gx, y_sigma)
        y_t = D.nsdiff_q_sample(batch_y, y0_hat, self.sched, t, noise)
        output, sigma_theta = self.denoiser.apply(
            {"params": params["model"]}, y_t, y0_hat, gx, t
        )
        sigma_theta = sigma_theta + EPS
        if self.wo_uans:
            kl_loss = jnp.mean((e - output) ** 2)
        else:
            ratio = sigma_tilde / sigma_theta
            kl_loss = jnp.mean((e - output) ** 2) + jnp.mean(ratio) - jnp.mean(jnp.log(ratio))
        return kl_loss + loss1 + loss2

    def sample_fn(self, params, batch_x, key, n_z_samples: Optional[int] = None,
                  use_gx_directly: bool = False):
        """Generate the prediction ensemble: [B, pred_len, N, n_z_samples].

        f(x)/g(x) run once; the ensemble vmaps over sample keys.
        """
        S = n_z_samples or self.n_z_samples
        # f(x)/g(x) once per batch.  fg_sampling_dtype="bfloat16" (opt-in)
        # runs both backbones in bf16 — VERDICT r2 #5; the risk is the
        # NS-Transformer's de-stationary tau/delta statistics (per-window
        # std) losing digits in bf16, so the default stays fp32 unless the
        # measured MPV shift is within the 1% parity budget
        # (benchmarks/ab_fg_bf16.py).
        fg_dt = self.dtype_param("fg_sampling_dtype", "float32")
        if fg_dt != jnp.float32:
            fg_params = dict(params)
            for k in ("cond_pred_model", "cond_pred_model_g"):
                if k in fg_params:
                    fg_params[k] = self.cast_sampling_tree(fg_params[k], fg_dt)
            xb = batch_x.astype(fg_dt)
            y0_hat = self._apply_f(fg_params, xb, deterministic=True).astype(jnp.float32)
            gx = self._apply_g(fg_params, xb).astype(jnp.float32)
        else:
            y0_hat = self._apply_f(params, batch_x, deterministic=True)
            gx = self._apply_g(params, batch_x)
        if self.has_g:
            gx = gx + EPS

        if self.use_pallas_denoiser:
            from ..ops.pallas.fused_denoiser import fused_nsdiff_denoiser

            # TPU default: bfloat16 trunk matmuls (native MXU rate, fp32
            # accumulate; activations and all posterior coefficient math stay
            # fp32) + 1024-row tiles — measured 1.37x on the bench chain with
            # 0.085% MPV shift (BASELINE.md round-2 kernel tuning).  The
            # matmul dtype FOLLOWS the validated sampling_dtype unless
            # overridden, so sampling_dtype="float32" gives bit-parity on
            # both arms; guarded in tests/test_pallas_denoiser.py.
            mm_dtype = self.net_param.get(
                "sampling_matmul_dtype", jnp.dtype(self.sampling_dtype()).name
            )
            # sampling_act_dtype="bfloat16" (run the gate/softplus/l2-norm
            # band on packed-bf16 VPU lanes) is implemented + parity-tested
            # but NOT default: the current Mosaic toolchain fails to lower
            # packed-bf16 compares ("arith.cmpf ... vector<8x128x2xbf16>",
            # from softplus's internal branch), so the kernel only compiles
            # with fp32 activations on real TPU today.
            act_dtype = self.net_param.get("sampling_act_dtype", "float32")
            tile_m = self.net_param.get("denoiser_tile_m", 1024)

            def model_fn(y, t):
                return fused_nsdiff_denoiser(
                    params["model"], y, y0_hat, gx, t, matmul_dtype=mm_dtype,
                    act_dtype=act_dtype, tile_m=tile_m,
                )

        else:
            # Flax arm (the default): the denoiser runs fully in bf16 —
            # including the softplus/l2-norm elementwise band XLA can lower
            # packed (unlike Mosaic, which rejects bf16 compares inside the
            # pallas kernel; BENCH_NSDIFF_FLAX_BF16.json measures this arm
            # 1.22x over the tuned kernel).  Chain state / posterior math
            # stay fp32; MPV parity guarded in tests/test_models_e2e.py.
            # Set net_param["sampling_dtype"]="float32" for bit-parity.
            in_dt = self.sampling_dtype()
            den_params = self.cast_sampling_tree(params["model"], in_dt)
            y0_n, gx_n = y0_hat.astype(in_dt), gx.astype(in_dt)

            def model_fn(y, t):
                tb = jnp.broadcast_to(jnp.asarray(t), (y.shape[0],))
                eps, sig = self.denoiser.apply(
                    {"params": den_params}, y.astype(in_dt), y0_n, gx_n, tb
                )
                return eps.astype(jnp.float32), sig.astype(jnp.float32)

        def one_sample(k):
            return D.nsdiff_p_sample_loop(
                model_fn, y0_hat, gx, self.sched, k, use_gx_directly=use_gx_directly
            )

        keys = jax.random.split(key, S)
        samples = jax.vmap(one_sample)(keys)  # [S, B, O, N]
        return jnp.transpose(samples, (1, 2, 3, 0))  # [B, O, N, S]

    def gx_fn(self, params, batch_x):
        """The cheap closed-form variance pathway (cond_pred_model_g only)."""
        return self._apply_g(params, batch_x)

    def trainable_mask(self, select: Optional[str] = None):
        select = select or self.train_model_select
        freeze = self.net_param.get("freeze_pretrain", False)
        mask = {}
        for k in self.params:
            if select == "pretrain_f":
                mask[k] = k == "cond_pred_model"
            elif select == "pretrain_g":
                mask[k] = k == "cond_pred_model_g"
            elif freeze:
                mask[k] = k == "model"
            else:
                mask[k] = True
        return mask

    # ------------------------------------------------------------------
    # reference-surface convenience API
    # ------------------------------------------------------------------
    def training_step(self, batch):
        batch = jnp.asarray(batch)
        return self._jitted_loss(self.params, batch, self.next_key(), self.train_model_select)

    def pretrain_f(self, batch):
        return self._jitted_loss(self.params, jnp.asarray(batch), self.next_key(), "pretrain_f")

    def pretrain_g(self, batch):
        return self._jitted_loss(self.params, jnp.asarray(batch), self.next_key(), "pretrain_g")

    @partial(jax.jit, static_argnums=(0, 4))
    def _jitted_loss(self, params, batch, key, select):
        return self.loss_fn(params, batch, key, select=select, train=False)

    def convert_reference_state_dict(self, flat, strict: bool = True):
        """Auto-import reference torch checkpoints (see utils/torch_import.py)."""
        from ..utils.torch_import import (
            convert_reference_nsdiff_state_dict,
            looks_like_reference_nsdiff_state_dict,
        )

        if not looks_like_reference_nsdiff_state_dict(flat):
            return flat
        components = ["model"] if self.denoiser is not None else []
        if self.cond_pred_model is not None:
            components.append("cond_pred_model")
        if self.cond_pred_model_g is not None:
            components.append("cond_pred_model_g")
        return convert_reference_nsdiff_state_dict(
            flat, self.net_param, strict=strict, components=tuple(components)
        )

    def evaluation_step(self, batch, use_gx_directly: bool = False):
        """(outs [B, O, N, n_z_samples], batch_y or None) — NsDiff_model.py:180-268."""
        batch = jnp.asarray(batch)
        batch_x = batch[:, : self.windows, :]
        batch_y = (
            batch[:, self.windows : self.windows + self.pred_len, :]
            if batch.shape[1] - self.windows >= self.pred_len
            else None
        )
        outs = self._jitted_sample(
            self.params, batch_x, self.next_key(), self.n_z_samples, use_gx_directly
        )
        return outs, batch_y

    @partial(jax.jit, static_argnums=(0, 4, 5))
    def _jitted_sample(self, params, batch_x, key, n_z_samples, use_gx_directly):
        return self.sample_fn(params, batch_x, key, n_z_samples, use_gx_directly)


class NsDiffVariants(NsDiffModel):
    """Ablation variants (NsDiff_model.py:271-495).

    train_model_select in {'Guassian', 'cond_mean', 'cond_var', 'wo_UANS'}.
    """

    def __init__(self, net_param: dict, train_model_select: str, seed: int = 0):
        cfg = {
            "Guassian": dict(has_f=False, has_g=False, wo_uans=False),
            "cond_mean": dict(has_f=True, has_g=False, wo_uans=False),
            "cond_var": dict(has_f=False, has_g=True, wo_uans=False),
            "wo_UANS": dict(has_f=True, has_g=True, wo_uans=True),
        }
        if train_model_select not in cfg:
            raise ValueError(
                "train_model_select should be in Guassian/cond_mean/cond_var/wo_UANS"
            )
        super().__init__(net_param, train_model_select="NsDiff_model", seed=seed, **cfg[train_model_select])
        self.variant = train_model_select

    def trainable_mask(self, select=None):
        return {k: True for k in self.params}
