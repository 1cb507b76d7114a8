"""DiffusionTS — x0-prediction diffusion with DDIM infill + Langevin correction.

TPU-native rebuild of /root/reference/models/Diffusion_model/DiffusionTS/
(DiffusionTS_model.py:9-109, DiffusionTS.py:35-407).  Design deltas:

  - ``fast_sample_infill`` unrolls the *static* DDIM (time, time_next) pairs
    inside one jitted program; the Langevin corrector's K inner steps are also
    static per pair (K schedule by t, DiffusionTS.py:372-381), so the entire
    conditional sampler — gradients-through-the-denoiser included — compiles to
    a single device program.  The reference instead runs a host loop that
    constructs a fresh ``torch.optim.Adagrad`` *every inner iteration*
    (DiffusionTS.py:387), i.e. per-step state resets; we reproduce exactly that
    update (g / (sqrt(g^2) + 1e-10)).
  - The ensemble vmaps over sample keys (no host ``repeat`` tiling,
    DiffusionTS_model.py:91-105).
  - The Fourier training loss uses XLA's native FFT (DiffusionTS.py:249-256).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import diffusion as D
from ..ops.schedules import ddim_time_pairs, diffusionts_schedule
from .base import DiffusionWrapperBase
from .diffusionts_net import DTSTransformer

__all__ = ["DiffusionTSModel"]


class DiffusionTSModel(DiffusionWrapperBase):
    def __init__(self, net_param: dict, seed: int = 0, **_):
        super().__init__(net_param, seed=seed)
        p = self.net_param
        self.seq_len = p.setdefault("seq_len", self.windows)
        self.label_len = p.setdefault("label_len", self.windows // 2)
        self.seq_length = self.windows + self.pred_len
        self.n_z_samples = p.get("n_z_samples", 100)
        self.parallel_sample = p.get("parallel_sample", min(10, self.n_z_samples))
        self.sampling_timesteps = p.get("diffusion_steps", 100)
        self.timesteps = p.get("timesteps", 100)
        self.loss_type = p.get("loss_type", "l2")
        self.eta = p.get("eta", 0.0)
        self.use_ff = p.get("use_ff", True)
        self.ff_weight = p.get("reg_weight") or math.sqrt(self.seq_length) / 5
        self.infill_coef = p.get("infill_coef", 1e-1)
        self.infill_lr = p.get("infill_learning_rate", 5e-2)
        # Max window-rows per sampling call (eval.uncertainty.
        # bounded_chunk_windows): the Langevin corrector's per-call memory
        # and device time scale with rows x draws, so node-multiplied corpus
        # chunks must shrink to keep one program at the bench-validated
        # scale (BENCH_DTS_SCALE.json; 32 rows x parallel_sample=10 ~ the
        # measured-safe 8-windows x n_z geometry).
        self.eval_rows_per_call = p.get("eval_rows_per_call", 32)
        # Langevin sweeps run minutes per window on network records; flush
        # the evaluation-cache partial every few windows so a tunnel drop
        # costs minutes of recompute, not the 32-window default interval
        self.eval_checkpoint_every = p.get("eval_checkpoint_every", 4)

        self.sched = diffusionts_schedule(p.get("beta_schedule", "cosine"), self.timesteps)
        self.net = DTSTransformer(
            n_feat=self.dataset_nf,
            n_channel=self.seq_length,
            n_layer_enc=p.get("n_layer_enc", 3),
            n_layer_dec=p.get("n_layer_dec", 6),
            n_embd=p.get("d_model", 64),
            n_heads=p.get("n_heads", 4),
            attn_pdrop=p.get("attn_pd", 0.0),
            resid_pdrop=p.get("resid_pd", 0.0),
            mlp_hidden_times=p.get("mlp_hidden_times", 4),
            conv_kernel=p.get("kernel_size"),
        )
        # history-is-known mask (DiffusionTS_model.py:47-54)
        self.gt_mask = np.concatenate(
            [
                np.ones((self.windows, self.dataset_nf), bool),
                np.zeros((self.pred_len, self.dataset_nf), bool),
            ],
            axis=0,
        )
        self._init_params()

    def _init_params(self):
        x = jnp.zeros((1, self.seq_length, self.dataset_nf))
        t = jnp.zeros((1,), jnp.int32)
        self.params = {
            "model": jax.jit(partial(self.net.init, deterministic=True))(
                {"params": self.next_key()}, x, t
            )["params"]
        }

    def convert_reference_state_dict(self, flat, strict: bool = True):
        """Auto-import reference torch checkpoints (utils/torch_import.py):
        the Transformer lives under model.model.* in the wrapper's tree."""
        if not any(k.startswith("model.model.") for k in flat):
            return flat
        from ..utils.torch_import import convert_reference_dts_state_dict

        return convert_reference_dts_state_dict(flat, self.net_param, strict=strict)

    # ------------------------------------------------------------------
    def _output(self, params, x, t, train=False, rngs=None):
        p = params["model"]
        # follow the params' dtype: the sampling path may carry a bf16 cast
        # of the net (see _sampling_params); training params are fp32 so this
        # is a no-op there.  The astype is differentiable — Langevin grads
        # w.r.t. the fp32 chain state come back fp32-typed.  Probe the first
        # FLOATING leaf (an int leaf sorting first must not set x's dtype).
        dt = next(
            a.dtype for a in jax.tree.leaves(p)
            if jnp.issubdtype(a.dtype, jnp.floating)
        )
        trend, season = self.net.apply(
            {"params": p}, x.astype(dt), t, deterministic=not train, rngs=rngs
        )
        return (trend + season).astype(jnp.float32)

    def _sampling_params(self, params):
        """Params for the sampling chain: the denoising transformer in bf16
        when sampling_dtype="bfloat16" (the chain is MXU-compute-saturated —
        BENCH_DTS_SCALE.json — so halving the matmul passes is the lever);
        chain state, posterior coefficients and Langevin updates stay fp32.
        The corrector update is lr*sign(grad) elementwise, so gradient
        precision is immaterial.  Measured 1.24x (72.8 vs 58.7 traj/s,
        BENCH_DTS_BF16.json) at 0.39% MPV bias vs a 1.7% fp32 key-to-key CV;
        MPV parity guarded in test_models_e2e.py.  Set net_param
        ["sampling_dtype"]="float32" for bit-parity with training.
        """
        dt = self.sampling_dtype()
        return dict(params, model=self.cast_sampling_tree(params["model"], dt))

    def _elem_loss(self, a, b):
        if self.loss_type == "l1":
            return jnp.abs(a - b)
        return (a - b) ** 2

    def loss_fn(self, params, batch, key, select: Optional[str] = None, train: bool = True):
        """_train_loss with target=x (DiffusionTS.py:239-266)."""
        data = batch[:, : self.seq_length, :]
        kd, kt, ke = jax.random.split(key, 3)
        B = data.shape[0]
        t = jax.random.randint(kt, (B,), 0, self.timesteps)
        noise = jax.random.normal(ke, data.shape, data.dtype)
        x = D.dts_q_sample(data, self.sched, t, noise)
        rngs = {"dropout": kd} if train else None
        model_out = self._output(params, x, t, train=train, rngs=rngs)
        train_loss = self._elem_loss(model_out, data)
        if self.use_ff:
            fft1 = jnp.fft.fft(model_out, axis=1, norm="forward")
            fft2 = jnp.fft.fft(data, axis=1, norm="forward")
            fourier_loss = self._elem_loss(jnp.real(fft1), jnp.real(fft2)) + self._elem_loss(
                jnp.imag(fft1), jnp.imag(fft2)
            )
            train_loss = train_loss + self.ff_weight * fourier_loss
        per_sample = train_loss.reshape(B, -1).mean(axis=1)
        w = jnp.asarray(self.sched.loss_weight)[t]
        return jnp.mean(per_sample * w)

    # ------------------------------------------------------------------
    def _model_predictions(self, params, x, t_scalar, clip_x_start=True):
        B = x.shape[0]
        t = jnp.full((B,), t_scalar, jnp.int32)
        x_start = self._output(params, x, t)
        if clip_x_start:
            x_start = jnp.clip(x_start, -1.0, 1.0)
        pred_noise = D.dts_predict_noise_from_start(x, self.sched, t, x_start)
        return pred_noise, x_start

    def _ddim_step_tables(self):
        """Per-step constants of the DDIM chain as arrays for ``lax.scan``.

        Returns (pairs, arrays) where arrays cover all but the final pair
        (whose time_next < 0 means img = x_start, handled outside the scan).
        The Langevin K schedule (DiffusionTS.py:372-381) becomes a branch
        index + lr per step.
        """
        pairs = ddim_time_pairs(self.timesteps, self.sampling_timesteps)
        acp = self.sched.alphas_cumprod.astype(np.float64)
        T = self.timesteps
        rows = []
        for time, time_next in pairs[:-1]:
            alpha, alpha_next = float(acp[time]), float(acp[time_next])
            sigma = self.eta * ((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha)) ** 0.5
            c = (1 - alpha_next - sigma**2) ** 0.5
            if time < T * 0.05:
                K, lr = 0, 0.0
            elif time > T * 0.9:
                K, lr = 3, self.infill_lr
            elif time > T * 0.75:
                K, lr = 2, self.infill_lr * 0.5
            else:
                K, lr = 1, self.infill_lr * 0.25
            rows.append((time, sigma, c, alpha_next**0.5, K, lr))
        arrays = {
            "time": jnp.asarray([r[0] for r in rows], jnp.int32),
            "sigma": jnp.asarray([r[1] for r in rows], jnp.float32),
            "c": jnp.asarray([r[2] for r in rows], jnp.float32),
            "sqrt_alpha_next": jnp.asarray([r[3] for r in rows], jnp.float32),
            "k_id": jnp.asarray([r[4] for r in rows], jnp.int32),
            "lr": jnp.asarray([r[5] for r in rows], jnp.float32),
        }
        return pairs, arrays

    def _langevin_fn(self, params, target, partial_mask):
        """One Langevin corrector for the scan body: K gradient steps via a
        dynamic-bound ``lax.fori_loop`` (K comes in as a per-step scan array).

        The reference constructs a new torch Adagrad *per inner iteration*
        (DiffusionTS.py:387), so the accumulator state resets every step:
        update = lr*g/(sqrt(g^2)+1e-10).  A ``lax.switch`` over K=0..3
        branches would compile 0+1+2+3 = 6 unrolled grad-of-transformer
        instances into every scan body (the dominant share of the 806 s
        remote compile measured in round 2, benchmarks/report.json); the
        dynamic loop compiles exactly ONE while executing the same K
        iterations at runtime.
        """
        coef = self.infill_coef

        def loss(z, mean, sigma, t):
            x_start = self._output(params, z, t)
            sigma_mean = jnp.mean(sigma)
            safe_sigma = jnp.where(sigma == 0, 1.0, sigma)
            logp = jnp.where(
                sigma_mean == 0,
                coef * jnp.sum(jnp.mean((mean - z) ** 2, axis=0)),
                coef * jnp.sum(jnp.mean((mean - z) ** 2 / safe_sigma, axis=0)),
            )
            diff = jnp.where(partial_mask, x_start - target, 0.0) ** 2
            infill = jnp.where(
                sigma_mean == 0,
                jnp.sum(jnp.mean(diff, axis=0)),
                jnp.sum(jnp.mean(diff / jnp.where(sigma_mean == 0, 1.0, sigma_mean), axis=0)),
            )
            return logp + infill

        grad = jax.grad(loss)

        def langevin(sample, mean, sigma, t, lr, K):
            def body(_, z):
                g = grad(z, mean, sigma, t)
                return z - lr * g / (jnp.sqrt(g * g) + 1e-10)

            z = jax.lax.fori_loop(0, K, body, sample)
            return jnp.where(partial_mask, sample, z)

        return langevin

    def fast_sample_infill_fn(self, params, target, partial_mask, key):
        """Conditional DDIM infill (DiffusionTS.py:277-310) as ONE lax.scan.

        target: [B, T, F] with the unknown region zeroed; partial_mask: bool
        [B, T, F] True where known.
        """
        params = self._sampling_params(params)
        pairs, tab = self._ddim_step_tables()
        key, k0 = jax.random.split(key)
        img = jax.random.normal(k0, target.shape, target.dtype)
        B = target.shape[0]
        langevin = self._langevin_fn(params, target, partial_mask)

        def body(carry, inp):
            img, = carry
            time, sigma, c, sqrt_an, k_id, lr, k = inp
            kn, kl, kq = jax.random.split(k, 3)
            t_b = jnp.full((B,), time, jnp.int32)
            x_start = jnp.clip(self._output(params, img, t_b), -1.0, 1.0)
            pred_noise = D.dts_predict_noise_from_start(img, self.sched, t_b, x_start)
            pred_mean = x_start * sqrt_an + c * pred_noise
            img = pred_mean + sigma * jax.random.normal(kn, img.shape, img.dtype)
            img = langevin(img, pred_mean, sigma, t_b, lr, k_id)
            target_t = D.dts_q_sample(
                target, self.sched, t_b,
                jax.random.normal(kq, target.shape, target.dtype),
            )
            img = jnp.where(partial_mask, target_t, img)
            return (img,), None

        n_scan = len(pairs) - 1
        keys = jax.random.split(key, n_scan + 1)
        xs = (
            tab["time"], tab["sigma"], tab["c"], tab["sqrt_alpha_next"],
            tab["k_id"], tab["lr"], keys[:n_scan],
        )
        (img,), _ = jax.lax.scan(body, (img,), xs)

        # final pair: time_next < 0 -> img = x_start (DiffusionTS.py:291-293)
        t_last = jnp.full((B,), pairs[-1][0], jnp.int32)
        img = jnp.clip(self._output(params, img, t_last), -1.0, 1.0)
        return jnp.where(partial_mask, target, img)

    def sample_fn(self, params, batch_x, key, n_z_samples: Optional[int] = None):
        """Ensemble of infilled futures: [B, pred_len, N, S]."""
        S = n_z_samples or self.n_z_samples
        B = batch_x.shape[0]
        x = jnp.concatenate(
            [batch_x, jnp.zeros((B, self.pred_len, self.dataset_nf), batch_x.dtype)], axis=1
        )
        mask = jnp.broadcast_to(jnp.asarray(self.gt_mask), x.shape)
        target = x * mask

        def one_sample(k):
            return self.fast_sample_infill_fn(params, target, mask, k)

        keys = jax.random.split(key, S)
        # net_param["sample_chunk"]: cap the vmapped ensemble width — the
        # Langevin corrector's grad temporaries are [S_chunk*B, T, d] and OOM
        # 16 GB HBM at S*B >= ~3200 (BENCH_DTS_SCALE.json); lax.map runs the
        # chunks sequentially with one chunk's memory.  The chip is already
        # compute-saturated at small batches, so chunking costs no
        # throughput.  Same per-sample keys -> chunked == unchunked exactly.
        # Default: parallel_sample, the reference's own ensemble pass width
        # (DiffusionTS.py sampling loop draws parallel_sample trajectories
        # per forward) — n_z=100 x 8 windows x 30 nodes would OOM unchunked.
        chunk = self.net_param.get("sample_chunk", self.parallel_sample)
        if chunk and chunk < S:
            n_chunks = -(-S // chunk)
            pad = n_chunks * chunk - S
            keys_p = jnp.concatenate([keys, keys[:pad]]) if pad else keys
            blocks = jax.lax.map(
                lambda ks: jax.vmap(one_sample)(ks),
                keys_p.reshape(n_chunks, chunk),
            )  # [n_chunks, chunk, B, T, F]
            samples = blocks.reshape(n_chunks * chunk, *blocks.shape[2:])[:S]
        else:
            samples = jax.vmap(one_sample)(keys)  # [S, B, T, F]
        samples = samples[:, :, -self.pred_len :, :]
        return jnp.transpose(samples, (1, 2, 3, 0))

    def generate_mts_fn(self, params, key, batch_size: int = 16):
        """Unconditional generation (DiffusionTS.py:178-221), scanned DDIM."""
        shape = (batch_size, self.seq_length, self.dataset_nf)
        params = self._sampling_params(params)
        pairs, tab = self._ddim_step_tables()
        key, k0 = jax.random.split(key)
        img = jax.random.normal(k0, shape)

        def body(carry, inp):
            img, = carry
            time, sigma, c, sqrt_an, k = inp
            t_b = jnp.full((batch_size,), time, jnp.int32)
            x_start = jnp.clip(self._output(params, img, t_b), -1.0, 1.0)
            pred_noise = D.dts_predict_noise_from_start(img, self.sched, t_b, x_start)
            img = x_start * sqrt_an + c * pred_noise + sigma * jax.random.normal(k, shape)
            return (img,), None

        n_scan = len(pairs) - 1
        keys = jax.random.split(key, n_scan)
        (img,), _ = jax.lax.scan(
            body, (img,), (tab["time"], tab["sigma"], tab["c"], tab["sqrt_alpha_next"], keys)
        )
        t_last = jnp.full((batch_size,), pairs[-1][0], jnp.int32)
        return jnp.clip(self._output(params, img, t_last), -1.0, 1.0)

    def trainable_mask(self, select=None):
        return {k: True for k in self.params}

    # -- reference-surface API ------------------------------------------
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
        S, R = self.n_z_samples, self.parallel_sample
        if R and R < S:
            # Ensemble in host-side rounds of parallel_sample draws — the
            # reference's own sampling-loop shape (DiffusionTS draws
            # parallel_sample trajectories per forward).  One n_z=100
            # Langevin program over a chunk of 30-node windows is minutes of
            # device time in a single call, which the remote TPU transport
            # does not survive; R bounded rounds reuse one compiled program
            # and keep every call at the bench-validated scale.
            rounds = [
                self._jitted_sample(self.params, batch_x, self.next_key(), R)
                for _ in range(-(-S // R))
            ]
            outs = jnp.concatenate(rounds, axis=-1)[..., :S]
        else:
            outs = self._jitted_sample(self.params, batch_x, self.next_key(), S)
        return outs, batch_y

    @partial(jax.jit, static_argnums=(0, 4))
    def _jitted_sample(self, params, batch_x, key, n_z_samples):
        return self.sample_fn(params, batch_x, key, n_z_samples)
