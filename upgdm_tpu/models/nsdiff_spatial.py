"""NsDiff_spatial — the graph variant of NsDiff.

TPU-native rebuild of:
  - NsDiff_net_spatial + UGnet denoiser: /root/reference/models/Diffusion_model/
    NsDiff/ugnet.py:194-292 (conditioned on concat(y_t, y0_hat, gx), eps/sigma
    heads) and NsDiff_net.py:175-264;
  - Model_spatial f(x): /root/reference/models/Diffusion_model/NsDiff/
    mu_backbone.py:186-346 (NS-Transformer with a Conv-down -> GNN -> Conv-up
    sandwich on the encoder output);
  - NsDiff_model_spatial wrapper: NsDiff_model.py:496-801.

Layout: dense graphs [B, V, T, F] + adjacency [V, V] / [B, V, V]; per-node
sequences flatten to [B*V, T, F] for the transformer/TCN parts and fold back
for the spatial message passing.  No duplicate_edge_index at inference
(NsDiff_model.py:792-801) — the adjacency broadcasts across the vmapped
sample axis.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops import diffusion as D
from ..ops.rolling import wv_sigma_trailing
from .base import EPS
from .nsdiff import NsDiffModel
from .embedding import DataEmbedding, sinusoidal_time_embedding
from .ns_transformer import NSDecoder, NSEncoder, Projector, _series_stats
from .sigma_estimation import SigmaEstimation
from .ugnet import ResidualBlock, Downsample, SpatialBlock, TimeConv, TimeConvTranspose, Upsample

from flax import linen as nn

__all__ = ["NsDiffSpatialUGnet", "NSTransformerSpatial", "NsDiffSpatialModel"]


class NsDiffSpatialUGnet(nn.Module):
    """(y_t, y0_hat, gx, t, adj) -> (eps, sigma), each [B, V, T_p, F]."""

    d_h: int
    pred_len: int
    F: int
    channel_multipliers: Sequence[int] = (1, 2)
    n_blocks: int = 2
    gnn_name: str = "GCNConv"
    gnn_param: dict = None
    td_h: int = 10

    @nn.compact
    def __call__(self, y_t, y_0_hat, g_x, t, adj, deterministic=True):
        T = self.pred_len
        n_res = len(self.channel_multipliers)
        x = jnp.concatenate([y_t, y_0_hat, g_x], axis=-1)  # [B, V, T, 3F]
        hx = nn.Dense(self.d_h, name="x_proj")(x)
        # token dtype (see ugnet.py): keeps bf16 sampling bf16 end to end
        temb = sinusoidal_time_embedding(t, self.d_h).astype(hx.dtype)

        t_in = T
        stack = [hx]
        in_ch = out_ch = self.d_h
        bi = 0
        for i in range(n_res):
            out_ch = in_ch * self.channel_multipliers[i]
            for _ in range(self.n_blocks):
                hx = ResidualBlock(
                    out_ch, t_in, self.d_h, self.td_h, self.gnn_name, self.gnn_param,
                    name=f"down_{bi}",
                )(hx, temb, adj, deterministic)
                stack.append(hx)
                in_ch = out_ch
                bi += 1
            if i < n_res - 1:
                hx = Downsample(in_ch, name=f"down_{bi}")(hx)
                stack.append(hx)
                t_in = t_in // 2
                bi += 1

        hx = ResidualBlock(
            out_ch, t_in, self.d_h, self.td_h, self.gnn_name, self.gnn_param, name="middle_1"
        )(hx, temb, adj, deterministic)
        hx = ResidualBlock(
            out_ch, t_in, self.d_h, self.td_h, self.gnn_name, self.gnn_param, name="middle_2"
        )(hx, temb, adj, deterministic)

        in_ch = out_ch
        bi = 0
        for i in reversed(range(n_res)):
            out_ch = in_ch
            for _ in range(self.n_blocks):
                s = stack.pop()
                hx = ResidualBlock(
                    out_ch, t_in, self.d_h, self.td_h, self.gnn_name, self.gnn_param,
                    name=f"up_{bi}",
                )(jnp.concatenate([hx, s], axis=-1), temb, adj, deterministic)
                bi += 1
            out_ch = in_ch // self.channel_multipliers[i]
            s = stack.pop()
            hx = ResidualBlock(
                out_ch, t_in, self.d_h, self.td_h, self.gnn_name, self.gnn_param,
                name=f"up_{bi}",
            )(jnp.concatenate([hx, s], axis=-1), temb, adj, deterministic)
            in_ch = out_ch
            bi += 1
            if i > 0:
                hx = Upsample(in_ch, name=f"up_{bi}")(hx)
                t_in = t_in * 2
                bi += 1

        assert t_in == T, "time axis must round-trip to pred_len"
        h = nn.Dense(self.d_h, name="out_proj")(hx)
        w = self.param("out_time_kernel", nn.initializers.lecun_normal(), (T, T))
        b = self.param("out_time_bias", nn.initializers.zeros, (T,))
        h = jnp.einsum("ot,bvtf->bvof", w, h) + b[None, None, :, None]  # [B, V, T, d_h]
        eps_pred = nn.Dense(self.F, name="lin4")(h)
        sigma = nn.softplus(nn.Dense(self.F, name="sigma_lin")(nn.softplus(eps_pred)))
        return eps_pred, sigma


class NSTransformerSpatial(nn.Module):
    """f(x) with GNN message passing on the encoder output (mu_backbone.py:186-346).

    x: [B, V, T, F] + adj -> (pred [B, V, pred_len, F], dec_out).
    """

    seq_len: int
    label_len: int
    pred_len: int
    enc_in: int
    d_model: int = 64
    n_heads: int = 4
    e_layers: int = 2
    d_layers: int = 1
    d_ff: int = 128
    dropout: float = 0.05
    activation: str = "gelu"
    p_hidden_dims: Sequence[int] = (64, 64)
    p_hidden_layers: int = 2
    spatial_layers: int = 1
    fT_h: int = 10
    f_gnn_name: str = "GCNConv"
    f_gnn_param: dict = None

    @nn.compact
    def __call__(self, x, adj, deterministic: bool = True):
        B, V, T, F = x.shape
        xf = x.reshape(B * V, T, F)
        x_raw = jax.lax.stop_gradient(xf)
        mean_enc, std_enc = _series_stats(xf)
        x_norm = (xf - mean_enc) / std_enc
        x_dec = jnp.concatenate(
            [
                x_norm[:, -self.label_len :, :],
                jnp.zeros((B * V, self.pred_len, self.enc_in), x.dtype),
            ],
            axis=1,
        )
        tau = jnp.exp(
            Projector(self.p_hidden_dims, self.p_hidden_layers, 1, name="tau_learner")(
                x_raw, std_enc
            )
        )
        delta = Projector(
            self.p_hidden_dims, self.p_hidden_layers, self.seq_len, name="delta_learner"
        )(x_raw, mean_enc)

        enc = DataEmbedding(self.d_model, self.dropout, name="enc_embedding")(
            x_norm, deterministic=deterministic
        )
        enc = NSEncoder(
            self.e_layers, self.d_model, self.d_ff, self.n_heads, self.dropout,
            self.activation, name="encoder",
        )(enc, tau=tau, delta=delta, deterministic=deterministic)

        # Conv-down T -> fT_h, GNN over nodes, Conv-up back (mu_backbone.py:256-333)
        enc4 = enc.reshape(B, V, T, self.d_model)
        enc4 = TimeConv(
            self.d_model, T + 1, pad_left=self.fT_h // 2, pad_right=self.fT_h // 2,
            name="downsampling",
        )(enc4)  # [B, V, fT_h, d_model]
        spatial = enc4.reshape(B, V, self.fT_h * self.d_model)
        for l in range(self.spatial_layers):
            spatial = SpatialBlock(
                self.fT_h * self.d_model, self.f_gnn_name, self.f_gnn_param,
                name=f"spatial_{l}",
            )(spatial, adj)
        enc4 = spatial.reshape(B, V, self.fT_h, self.d_model)
        enc4 = TimeConvTranspose(
            self.d_model, T + 1, 1, self.fT_h // 2, name="upsampling"
        )(enc4)  # [B, V, T, d_model]
        enc = enc4.reshape(B * V, T, self.d_model)

        dec = DataEmbedding(self.d_model, self.dropout, name="dec_embedding")(
            x_dec, deterministic=deterministic
        )
        dec_out = NSDecoder(
            self.d_layers, self.d_model, self.d_ff, self.n_heads, self.enc_in,
            self.dropout, self.activation, name="decoder",
        )(dec, enc, tau=tau, delta=delta, deterministic=deterministic)
        dec_out = dec_out * std_enc + mean_enc
        pred = dec_out[:, -self.pred_len :, :].reshape(B, V, self.pred_len, F)
        return pred, dec_out.reshape(B, V, -1, F)


class NsDiffSpatialModel(NsDiffModel):
    """Graph NsDiff wrapper (NsDiff_model.py:496-790): dense batches
    [B, V, windows + pred_len, F] with adjacency."""

    scaler_axis = (0, 1)

    def __init__(self, net_param, train_model_select="NsDiff_model",
                 pretrain_f_path=None, pretrain_g_path=None, seed: int = 0):
        self._V0 = net_param.get("init_num_nodes", 8)
        super().__init__(
            net_param, train_model_select, pretrain_f_path, pretrain_g_path, seed=seed
        )

    def _build_modules(self):
        p = self.net_param
        self.cond_pred_model = NSTransformerSpatial(
            seq_len=self.seq_len,
            label_len=self.label_len,
            pred_len=self.pred_len,
            enc_in=self.dataset_nf,
            d_model=p.get("d_model", 64),
            n_heads=p.get("n_heads", 4),
            e_layers=p.get("e_layers", 2),
            d_layers=p.get("d_layers", 1),
            d_ff=p.get("d_ff", 128),
            dropout=p.get("dropout", 0.05),
            activation=p.get("activation", "gelu"),
            p_hidden_dims=tuple(p.get("p_hidden_dims", (64, 64))),
            p_hidden_layers=p.get("p_hidden_layers", 2),
            spatial_layers=p.get("spatial_layers", 1),
            fT_h=p.get("fT_h", 10),
            f_gnn_name=p.get("f_gnn_name", "GCNConv"),
            f_gnn_param=p.get("f_gnn_param"),
        )
        self.cond_pred_model_g = SigmaEstimation(
            self.windows, self.pred_len, self.dataset_nf, 512, self.rolling_length
        )
        self.denoiser = NsDiffSpatialUGnet(
            d_h=p.get("d_h", 4),
            pred_len=self.pred_len,
            F=self.dataset_nf,
            channel_multipliers=tuple(p.get("channel_multipliers", (1, 2))),
            n_blocks=p.get("n_blocks", 2),
            gnn_name=p.get("gnn_name", "GCNConv"),
            gnn_param=p.get("gnn_param"),
            td_h=p.get("Td_h", 10),
        )

    def _init_params(self):
        # called by NsDiffModel.__init__; swap in the spatial modules first
        self._build_modules()
        key = self.next_key()
        kf, kg, km = jax.random.split(key, 3)
        V = self._V0
        x = jnp.zeros((1, V, self.windows, self.dataset_nf))
        y = jnp.zeros((1, V, self.pred_len, self.dataset_nf))
        t = jnp.zeros((1,), jnp.int32)
        adj = jnp.zeros((V, V))
        self.params = {
            "cond_pred_model": jax.jit(partial(self.cond_pred_model.init, deterministic=True))(
                {"params": kf}, x, adj
            )["params"],
            "cond_pred_model_g": jax.jit(self.cond_pred_model_g.init)(
                {"params": kg}, x.reshape(V, self.windows, self.dataset_nf)
            )["params"],
            "model": jax.jit(partial(self.denoiser.init, deterministic=True))(
                {"params": km}, y, y, y, t, adj
            )["params"],
        }

    # ------------------------------------------------------------------
    def _apply_f(self, params, batch_x, adj=None, rngs=None, deterministic=True):
        y0_hat, _ = self.cond_pred_model.apply(
            {"params": params["cond_pred_model"]}, batch_x, adj,
            deterministic=deterministic, rngs=rngs,
        )
        return y0_hat

    def _apply_g_nodes(self, params, batch_x):
        """g(x) over flattened node sequences: [B, V, T, F] -> [B, V, O, F]."""
        B, V = batch_x.shape[:2]
        flat = batch_x.reshape(B * V, self.windows, self.dataset_nf)
        gx = self.cond_pred_model_g.apply({"params": params["cond_pred_model_g"]}, flat)
        return gx.reshape(B, V, self.pred_len, self.dataset_nf)

    def loss_fn(self, params, batch, adj, key, select: Optional[str] = None, train: bool = True):
        """training_step / pretrain_f / pretrain_g on dense graph batches
        (NsDiff_model.py:599-694)."""
        select = select or self.train_model_select
        batch_x = batch[:, :, : self.windows, :]
        batch_y = batch[:, :, self.windows : self.windows + self.pred_len, :]
        B, V = batch_x.shape[:2]
        kd, kt, ke = jax.random.split(key, 3)
        rngs = {"dropout": kd} if train else None

        flat_xy = jnp.concatenate([batch_x, batch_y], axis=2).reshape(
            B * V, -1, self.dataset_nf
        )
        if select == "pretrain_f":
            y0_hat = self._apply_f(params, batch_x, adj, rngs=rngs, deterministic=not train)
            return jnp.mean((y0_hat - batch_y) ** 2)
        if select == "pretrain_g":
            y_sigma = wv_sigma_trailing(flat_xy, self.rolling_length)[
                :, -self.pred_len :, :
            ].reshape(B, V, self.pred_len, self.dataset_nf) + EPS
            gx = self._apply_g_nodes(params, batch_x)
            return jnp.mean((jnp.sqrt(gx) - jnp.sqrt(y_sigma)) ** 2)

        y_sigma = wv_sigma_trailing(flat_xy, self.rolling_length)[
            :, -self.pred_len :, :
        ].reshape(B, V, self.pred_len, self.dataset_nf) + EPS
        t = self.antithetic_t(kt, B, self.sched.num_timesteps)
        y0_hat = self._apply_f(params, batch_x, adj, rngs=rngs, deterministic=not train)
        gx = self._apply_g_nodes(params, batch_x) + EPS
        loss1 = jnp.mean((y0_hat - batch_y) ** 2)
        loss2 = jnp.mean((jnp.sqrt(gx) - jnp.sqrt(y_sigma)) ** 2)

        e = jax.random.normal(ke, batch_y.shape, batch_y.dtype)
        t4 = t[:, None, None, None]
        c = D.nsdiff_gather(self.sched, t4, batch_y)
        forward_noise = D.nsdiff_forward_noise(c, gx, y_sigma)
        noise = e * jnp.sqrt(forward_noise)
        sigma_tilde = D.nsdiff_sigma_tilde(c, gx, y_sigma)
        y_t = D.nsdiff_q_sample(batch_y, y0_hat, self.sched, t4, noise)
        output, sigma_theta = self.denoiser.apply(
            {"params": params["model"]}, y_t, y0_hat, gx, t, adj,
            deterministic=not train, rngs=rngs,
        )
        sigma_theta = sigma_theta + EPS
        ratio = sigma_tilde / sigma_theta
        kl_loss = jnp.mean((e - output) ** 2) + jnp.mean(ratio) - jnp.mean(jnp.log(ratio))
        if self.net_param.get("freeze_pretrain", False):
            return kl_loss
        return kl_loss + loss1 + loss2

    def sample_fn(self, params, batch_x, adj, key, n_z_samples: Optional[int] = None,
                  use_gx_directly: bool = False):
        """Ensemble [B, V, pred_len, F, S] (NsDiff_model.py:695-790)."""
        S = n_z_samples or self.n_z_samples
        y0_hat = self._apply_f(params, batch_x, adj, deterministic=True)
        gx = self._apply_g_nodes(params, batch_x) + EPS
        B = batch_x.shape[0]

        # Same precision split as the flat model: spatial UGnet denoiser in
        # bf16 (params + inputs incl. the dense adjacency), chain state and
        # posterior math fp32.  MPV parity guarded in tests/test_models_e2e.py.
        in_dt = self.sampling_dtype()
        den_params = self.cast_sampling_tree(params["model"], in_dt)
        y0_n, gx_n = y0_hat.astype(in_dt), gx.astype(in_dt)
        adj_n = jnp.asarray(adj).astype(in_dt)

        def model_fn(y, t):
            tb = jnp.broadcast_to(jnp.asarray(t), (B,))
            eps, sig = self.denoiser.apply(
                {"params": den_params}, y.astype(in_dt), y0_n, gx_n, tb, adj_n,
                deterministic=True,
            )
            return eps.astype(jnp.float32), sig.astype(jnp.float32)

        def one_sample(k):
            return D.nsdiff_p_sample_loop(
                model_fn, y0_hat, gx, self.sched, k, use_gx_directly=use_gx_directly
            )

        samples = jax.vmap(one_sample)(jax.random.split(key, S))  # [S, B, V, O, F]
        return jnp.moveaxis(samples, 0, -1)  # [B, V, O, F, S]

    # -- reference-surface API ------------------------------------------
    def training_step(self, batch, adj):
        return self._jitted_loss_sp(
            self.params, jnp.asarray(batch), jnp.asarray(adj), self.next_key(),
            self.train_model_select,
        )

    def pretrain_f(self, batch, adj):
        return self._jitted_loss_sp(
            self.params, jnp.asarray(batch), jnp.asarray(adj), self.next_key(), "pretrain_f"
        )

    def pretrain_g(self, batch, adj):
        return self._jitted_loss_sp(
            self.params, jnp.asarray(batch), jnp.asarray(adj), self.next_key(), "pretrain_g"
        )

    @partial(jax.jit, static_argnums=(0, 5))
    def _jitted_loss_sp(self, params, batch, adj, key, select):
        return self.loss_fn(params, batch, adj, key, select=select, train=False)

    def evaluation_step(self, gdata, use_gx_directly: bool = False):
        """gdata: {x: [V, T(+O), F], adj: [V, V]} -> ([V, O, F, S], y or None)."""
        x = jnp.asarray(gdata["x"])
        adj = jnp.asarray(gdata["adj"])
        batch_x = x[None, :, : self.windows, :]
        batch_y = (
            x[:, self.windows : self.windows + self.pred_len, :]
            if x.shape[1] - self.windows >= self.pred_len
            else None
        )
        outs = self._jitted_sample_sp(
            self.params, batch_x, adj, self.next_key(), self.n_z_samples, use_gx_directly
        )
        return outs[0], batch_y

    @partial(jax.jit, static_argnums=(0, 5, 6))
    def _jitted_sample_sp(self, params, batch_x, adj, key, n_z_samples, use_gx_directly):
        return self.sample_fn(params, batch_x, adj, key, n_z_samples, use_gx_directly)

    def gx_fn(self, params, batch_x):
        if batch_x.ndim == 3:  # [V, T, F] single graph
            return self.cond_pred_model_g.apply(
                {"params": params["cond_pred_model_g"]}, batch_x
            )
        return self._apply_g_nodes(params, batch_x)
