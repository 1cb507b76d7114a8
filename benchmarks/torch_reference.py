"""Torch-CPU reference replica of the NsDiff sampling-MPV hot path.

BASELINE.md requires a *measured CPU-PyTorch reference run* as the comparison
point (the reference repo publishes no numbers, and its pinned dependency
stack — torch-geometric / torchsde / torch-timeseries — is not installed in
this image).  This module re-implements the exact workload to the reference's
math spec in plain torch (written from the spec, not copied):

  - NS-Transformer mean head f(x) (mu_backbone.py:53-183 + the
    torch_timeseries DSAttention/DataEmbedding/EncDec stack it imports)
  - SigmaEstimation variance head g(x) (g_backbone.py:19-72, sigma.py:34-72)
  - ConditionalGuidedModel denoiser (denoise.py:6-51)
  - heteroscedastic reverse chain p_sample_loop with the per-step quadratic
    sigma_y0 solve (nsdiff_utils.py:111-284)
  - per-window evaluation with host-side sample chunking in blocks of
    parallel_sample, exactly like NsDiff_model.evaluation_step (:180-268)

It doubles as an independent numerical cross-check of the JAX build.
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from upgdm_tpu.ops.schedules import NsDiffSchedule


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

class ConditionalLinear(nn.Module):
    def __init__(self, num_in, num_out, n_steps):
        super().__init__()
        self.num_out = num_out
        self.lin = nn.Linear(num_in, num_out)
        self.embed = nn.Embedding(n_steps, num_out)
        self.embed.weight.data.uniform_()

    def forward(self, x, t):
        return self.embed(t).view(t.shape[0], -1, self.num_out) * self.lin(x)


class Denoiser(nn.Module):
    """eps/sigma heads on concat(y_t, y0_hat, gx) with inter-layer L2 norm."""

    def __init__(self, diff_steps, enc_in, hidden=128):
        super().__init__()
        self.lin1 = ConditionalLinear(enc_in * 3, hidden, diff_steps)
        self.lin2 = ConditionalLinear(hidden, hidden, diff_steps)
        self.lin3 = ConditionalLinear(hidden, hidden, diff_steps)
        self.lin4 = nn.Linear(hidden, enc_in)
        self.sigma_lin = nn.Linear(hidden, enc_in)

    def forward(self, y_t, y_0_hat, g_x, t):
        h = torch.cat((y_t, y_0_hat, g_x), dim=-1)
        h = F.normalize(F.softplus(self.lin1(h, t)), dim=-1)
        h = F.normalize(F.softplus(self.lin2(h, t)), dim=-1)
        h = F.normalize(F.softplus(self.lin3(h, t)), dim=-1)
        return self.lin4(h), F.softplus(self.sigma_lin(F.softplus(h)))


def wv_sigma_trailing(x, window, discard_rep=False):
    if not discard_rep:
        x = F.pad(x, (0, 0, window - 1, 0), mode="replicate")
    wins = x.unfold(1, window, 1).permute(0, 1, 3, 2)
    return wins.var(dim=2, unbiased=False)


class SigmaEstimation(nn.Module):
    def __init__(self, seq_len, pred_len, enc_in, hidden_size=512, kernel_size=24):
        super().__init__()
        self.pred_len = pred_len
        self.kernel_size = kernel_size
        self.mlp = nn.Sequential(
            nn.Linear(seq_len - kernel_size, hidden_size),
            nn.ReLU(),
            nn.LayerNorm([enc_in, hidden_size]),
            nn.Linear(hidden_size, hidden_size),
            nn.ReLU(),
            nn.LayerNorm([enc_in, hidden_size]),
            nn.Linear(hidden_size, pred_len),
        )

    def forward(self, x):
        B, T, N = x.shape
        sigma = wv_sigma_trailing(x, self.kernel_size)[:, -(T - self.kernel_size):, :] + 1e-7
        return F.softplus(self.mlp(sigma.permute(0, 2, 1))).permute(0, 2, 1)[:, -self.pred_len:, :]


class DSAttention(nn.Module):
    def __init__(self, mask_flag=False):
        super().__init__()
        self.mask_flag = mask_flag

    def forward(self, q, k, v, tau, delta):
        B, L, H, E = q.shape
        scale = 1.0 / math.sqrt(E)
        tau = tau if tau is not None else torch.ones(B, 1)
        delta = delta if delta is not None else torch.zeros(B, 1)
        scores = torch.einsum("blhe,bshe->bhls", q, k) * tau[:, :, None, None] + delta[:, None, None, :]
        if self.mask_flag:
            mask = torch.triu(torch.ones(L, scores.shape[-1], dtype=torch.bool), 1)
            scores = scores.masked_fill(mask, -1e9)
        A = torch.softmax(scale * scores, dim=-1)
        return torch.einsum("bhls,bshd->blhd", A, v)


class AttentionLayer(nn.Module):
    def __init__(self, d_model, n_heads, mask_flag=False):
        super().__init__()
        self.h = n_heads
        self.inner = DSAttention(mask_flag)
        self.q = nn.Linear(d_model, d_model)
        self.k = nn.Linear(d_model, d_model)
        self.v = nn.Linear(d_model, d_model)
        self.o = nn.Linear(d_model, d_model)

    def forward(self, q, k, v, tau=None, delta=None):
        B, L, D = q.shape
        S = k.shape[1]
        qh = self.q(q).view(B, L, self.h, -1)
        kh = self.k(k).view(B, S, self.h, -1)
        vh = self.v(v).view(B, S, self.h, -1)
        out = self.inner(qh, kh, vh, tau, delta).reshape(B, L, D)
        return self.o(out)


class Projector(nn.Module):
    def __init__(self, enc_in, seq_len, hidden_dims, output_dim, kernel_size=3):
        super().__init__()
        self.series_conv = nn.Conv1d(seq_len, 1, kernel_size, padding=kernel_size // 2,
                                     padding_mode="circular", bias=False)
        layers = [nn.Linear(2 * enc_in, hidden_dims[0]), nn.ReLU()]
        for i in range(len(hidden_dims) - 1):
            layers += [nn.Linear(hidden_dims[i], hidden_dims[i + 1]), nn.ReLU()]
        layers += [nn.Linear(hidden_dims[-1], output_dim, bias=False)]
        self.backbone = nn.Sequential(*layers)

    def forward(self, x, stats):
        B = x.shape[0]
        x = self.series_conv(x)
        x = torch.cat([x, stats], dim=1).view(B, -1)
        return self.backbone(x)


class EncLayer(nn.Module):
    def __init__(self, d_model, d_ff, n_heads):
        super().__init__()
        self.attn = AttentionLayer(d_model, n_heads)
        self.ff1 = nn.Linear(d_model, d_ff)
        self.ff2 = nn.Linear(d_ff, d_model)
        self.n1 = nn.LayerNorm(d_model)
        self.n2 = nn.LayerNorm(d_model)

    def forward(self, x, tau, delta):
        x = self.n1(x + self.attn(x, x, x, tau, delta))
        return self.n2(x + self.ff2(F.gelu(self.ff1(x))))


class DecLayer(nn.Module):
    def __init__(self, d_model, d_ff, n_heads):
        super().__init__()
        self.self_attn = AttentionLayer(d_model, n_heads, mask_flag=True)
        self.cross_attn = AttentionLayer(d_model, n_heads)
        self.ff1 = nn.Linear(d_model, d_ff)
        self.ff2 = nn.Linear(d_ff, d_model)
        self.n1 = nn.LayerNorm(d_model)
        self.n2 = nn.LayerNorm(d_model)
        self.n3 = nn.LayerNorm(d_model)

    def forward(self, x, cross, tau, delta):
        x = self.n1(x + self.self_attn(x, x, x, tau, None))
        x = self.n2(x + self.cross_attn(x, cross, cross, tau, delta))
        return self.n3(x + self.ff2(F.gelu(self.ff1(x))))


class TokenEmbedding(nn.Module):
    def __init__(self, c_in, d_model):
        super().__init__()
        self.conv = nn.Conv1d(c_in, d_model, 3, padding=1, padding_mode="circular", bias=False)

    def forward(self, x):
        return self.conv(x.transpose(1, 2)).transpose(1, 2)


class NSTransformer(nn.Module):
    def __init__(self, seq_len, label_len, pred_len, enc_in, d_model=512, n_heads=8,
                 e_layers=4, d_layers=2, d_ff=256, p_hidden=(64, 64)):
        super().__init__()
        self.label_len, self.pred_len, self.enc_in = label_len, pred_len, enc_in
        pe = torch.zeros(5000, d_model)
        pos = torch.arange(0, 5000).unsqueeze(1).double()
        div = torch.exp(torch.arange(0, d_model, 2).double() * -(math.log(10000.0) / d_model))
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        self.register_buffer("pe", pe)
        self.enc_emb = TokenEmbedding(enc_in, d_model)
        self.dec_emb = TokenEmbedding(enc_in, d_model)
        self.encoder = nn.ModuleList([EncLayer(d_model, d_ff, n_heads) for _ in range(e_layers)])
        self.enc_norm = nn.LayerNorm(d_model)
        self.decoder = nn.ModuleList([DecLayer(d_model, d_ff, n_heads) for _ in range(d_layers)])
        self.dec_norm = nn.LayerNorm(d_model)
        self.proj = nn.Linear(d_model, enc_in)
        self.tau_learner = Projector(enc_in, seq_len, p_hidden, 1)
        self.delta_learner = Projector(enc_in, seq_len, p_hidden, seq_len)

    def forward(self, x_enc):
        x_raw = x_enc.detach()
        mean_enc = x_enc.mean(1, keepdim=True).detach()
        x = x_enc - mean_enc
        std_enc = torch.sqrt(x.var(dim=1, keepdim=True, unbiased=False) + 1e-5).detach()
        x = x / std_enc
        x_dec = torch.cat(
            [x[:, -self.label_len:, :], torch.zeros(x.shape[0], self.pred_len, self.enc_in)], dim=1
        )
        tau = self.tau_learner(x_raw, std_enc).exp()
        delta = self.delta_learner(x_raw, mean_enc)
        enc = self.enc_emb(x) + self.pe[: x.shape[1]]
        for layer in self.encoder:
            enc = layer(enc, tau, delta)
        enc = self.enc_norm(enc)
        dec = self.dec_emb(x_dec) + self.pe[: x_dec.shape[1]]
        for layer in self.decoder:
            dec = layer(dec, enc, tau, delta)
        out = self.proj(self.dec_norm(dec)) * std_enc + mean_enc
        return out[:, -self.pred_len:, :]


# ---------------------------------------------------------------------------
# heteroscedastic reverse chain (nsdiff_utils.py:111-284)
# ---------------------------------------------------------------------------

def _gathers(sched, t):
    g = lambda a: float(a[t])
    return dict(
        alpha=g(sched.alphas), bt=g(sched.betas_tilde), bb=g(sched.betas_bar),
        bt1=g(sched.betas_tilde_m_1), bb1=g(sched.betas_bar_m_1),
        abar_prev=g(sched.alphas_cumprod_prev), s1m=g(sched.one_minus_alphas_bar_sqrt),
    )


def _sigma_y0_hat(c, gx, sigma_theta):
    a, bt1, bb1 = c["alpha"], c["bt1"], c["bb1"]
    lam0 = a * (1 - a) * bt1
    lam1 = ((1 - a) ** 2 * bt1 + a * (1 - a) * (bb1 - bt1)) * gx - sigma_theta * (
        a * bt1 + a * (1 - a)
    )
    lam2 = gx**2 * (1 - a) ** 2 * (bb1 - bt1) - sigma_theta * gx * (
        a * bb1 - a * bt1 + (1 - a) ** 2
    )
    return (-lam1 + (lam1**2 - 4 * lam0 * lam2).clamp_min(0).sqrt()) / (2 * lam0)


def _gammas(c, gx, y_sigma):
    a = c["alpha"]
    s1 = (1 - a) ** 2 * gx + a * (1 - a) * y_sigma
    s2 = (c["bb1"] - c["bt1"]) * gx + c["bt1"] * y_sigma
    den = a * s2 + s1
    sa, sabp = a**0.5, c["abar_prev"] ** 0.5
    return sabp * s1 / den, sa * s2 / den, ((sa * (a - 1)) * s2 + (1 - sabp) * s1) / den


@torch.no_grad()
def p_sample_loop(model, y_0_hat, gx, sched):
    n_steps = sched.num_timesteps
    y = gx.sqrt() * torch.randn_like(y_0_hat) + y_0_hat
    for t in range(n_steps - 1, 0, -1):
        c = _gathers(sched, t)
        tt = torch.full((y.shape[0],), t, dtype=torch.long)
        eps, sigma_theta = model(y, y_0_hat, gx, tt)
        sy0 = _sigma_y0_hat(c, gx, sigma_theta)
        noise_var = (c["bb"] - c["bt"]) * gx + c["bt"] * sy0
        sqrt_abar = (1 - c["s1m"] ** 2) ** 0.5
        y0_rep = (y - (1 - sqrt_abar) * y_0_hat - eps * noise_var.sqrt()) / sqrt_abar
        g0, g1, g2 = _gammas(c, gx, sy0)
        y = g0 * y0_rep + g1 * y + g2 * y_0_hat + sigma_theta.sqrt() * torch.randn_like(y)
    c = _gathers(sched, 0)
    tt = torch.zeros(y.shape[0], dtype=torch.long)
    eps, sigma_theta = model(y, y_0_hat, gx, tt)
    sy0 = _sigma_y0_hat(c, gx, sigma_theta)
    noise_var = (c["bb"] - c["bt"]) * gx + c["bt"] * sy0
    sqrt_abar = (1 - c["s1m"] ** 2) ** 0.5
    return (y - (1 - sqrt_abar) * y_0_hat - eps * noise_var.sqrt()) / sqrt_abar


def _gather_b(arr, t):
    """Batched schedule gather -> [B, 1, 1] (reference `extract`)."""
    return torch.from_numpy(np.asarray(arr, np.float32))[t].view(-1, 1, 1)


def nsdiff_train_loss(f, g, denoiser, sched, batch, windows, pred_len, rolling_length=50):
    """Full NsDiff training loss (NsDiff_model.training_step, :133-179) in torch."""
    eps_const = 1e-7
    x = batch[:, :windows, :]
    y = batch[:, windows : windows + pred_len, :]
    y_sigma = wv_sigma_trailing(torch.cat([x, y], dim=1), rolling_length)[:, -pred_len:, :] + eps_const
    n = x.shape[0]
    t = torch.randint(0, sched.num_timesteps, ((n // 2) + 1,))
    t = torch.cat([t, sched.num_timesteps - 1 - t], dim=0)[:n]
    y0_hat = f(x)
    gx = g(x) + eps_const
    loss1 = (y0_hat - y).square().mean()
    loss2 = (gx.sqrt() - y_sigma.sqrt()).square().mean()

    bt = _gather_b(sched.betas_tilde, t)
    bb = _gather_b(sched.betas_bar, t)
    bt1 = _gather_b(sched.betas_tilde_m_1, t)
    bb1 = _gather_b(sched.betas_bar_m_1, t)
    a = _gather_b(sched.alphas, t)
    abar_prev = _gather_b(sched.alphas_cumprod_prev, t)
    sa = _gather_b(sched.alphas_bar_sqrt, t)

    e = torch.randn_like(y)
    forward_noise = (bb - bt) * gx + bt * y_sigma
    s1 = (1 - a) ** 2 * gx + a * (1 - a) * y_sigma
    s2 = (bb1 - bt1) * gx + bt1 * y_sigma
    sigma_tilde = (s1 * s2) / (a * s2 + s1)
    y_t = sa * y + (1 - sa) * y0_hat + e * forward_noise.sqrt()
    out, sigma_theta = denoiser(y_t, y0_hat, gx, t)
    sigma_theta = sigma_theta + eps_const
    ratio = sigma_tilde / sigma_theta
    kl = (e - out).square().mean() + ratio.mean() - ratio.log().mean()
    return kl + loss1 + loss2


class TorchNsDiffReference:
    """Per-window evaluation with host-side sample chunking (the reference's
    inference pattern, NsDiff_model.py:180-268)."""

    def __init__(self, windows=100, pred_len=100, enc_in=1, diffusion_steps=20,
                 n_z_samples=100, parallel_sample=10, rolling_length=50,
                 d_model=512, e_layers=4, d_layers=2, d_ff=256, n_heads=8, seed=0):
        torch.manual_seed(seed)
        self.windows, self.pred_len = windows, pred_len
        self.n_z_samples, self.parallel_sample = n_z_samples, parallel_sample
        self.sched = NsDiffSchedule.create("linear", diffusion_steps, 1e-4, 2e-2)
        self.f = NSTransformer(windows, windows // 2, pred_len, enc_in,
                               d_model, n_heads, e_layers, d_layers, d_ff).eval()
        self.g = SigmaEstimation(windows, pred_len, enc_in, 512, rolling_length).eval()
        self.denoiser = Denoiser(diffusion_steps, enc_in).eval()

    @torch.no_grad()
    def evaluate_window(self, batch_x: torch.Tensor) -> torch.Tensor:
        """batch_x [B(=Node), W, F] -> [B, O, F, n_z_samples]."""
        y0_hat = self.f(batch_x)
        gx = self.g(batch_x) + 1e-7
        preds = []
        for _ in range(self.n_z_samples // self.parallel_sample):
            rep = self.parallel_sample
            y0_tile = y0_hat.repeat(rep, 1, 1, 1).transpose(0, 1).flatten(0, 1)
            gx_tile = gx.repeat(rep, 1, 1, 1).transpose(0, 1).flatten(0, 1)
            y0 = p_sample_loop(self.denoiser, y0_tile, gx_tile, self.sched)
            preds.append(y0.reshape(batch_x.shape[0], rep, self.pred_len, -1))
        preds = torch.cat(preds, dim=1)
        return preds.permute(0, 2, 3, 1)

    @torch.no_grad()
    def mpv_sweep(self, windows_array: np.ndarray) -> np.ndarray:
        """windows_array [n, Node, W, F] -> MPV per window."""
        out = []
        for win in windows_array:
            pf = self.evaluate_window(torch.from_numpy(np.asarray(win, np.float32)))
            out.append(float(pf.var(dim=-1, unbiased=False).mean()))
        return np.asarray(out)
