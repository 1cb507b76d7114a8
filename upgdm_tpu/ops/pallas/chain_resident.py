"""Pallas TPU kernel: the ENTIRE NsDiff reverse chain in one pallas_call.

VERDICT r2 next-step #1: the single-call fused denoiser
(ops/pallas/fused_denoiser.py) keeps activations VMEM-resident within ONE
reverse step, but the chain state and the posterior-coefficient elementwise
band still live in XLA between the 20 steps.  This kernel runs the whole
scan (nsdiff_utils.py:271-284 -> ops/diffusion.py::nsdiff_p_sample_loop)
inside the kernel: per row tile, the state y, the trunk weights, the
timestep-embedding tables and the 7-row schedule table stay in VMEM for all
T steps; HBM traffic is one [R, F] read for y0_hat/gx and one [R, F] write
of y_0 — nothing per step.

Gaussian noise is generated in-kernel (pltpu.prng_random_bits + Box-Muller),
so the sample stream differs from jax.random.normal: parity with the flax
chain is STATISTICAL (ensemble MPV), not per-sample — the same acceptance
rule round 2 established for chaotic/bf16 chains.  noise_mode="zero"
disables the noise entirely for deterministic math validation against the
reference scan in tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .fused_denoiser import _DTYPES, _softplus_branchfree

HIDDEN = 128
_EPS_NORM = 1e-12
_TWO_PI = 6.283185307179586


def _normal(shape):
    """Standard normals via Box-Muller on pltpu.prng_random_bits.

    Mosaic has no uint32->float32 cast, so the bits are shifted down to 24
    (value-preserving in int32, and 24 bits is all a float32 mantissa keeps
    of a uniform anyway) and converted int32->float32.
    """
    from jax.experimental.pallas import tpu as pltpu

    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    v1 = jax.lax.shift_right_logical(b1, jnp.uint32(8)).astype(jnp.int32)
    v2 = jax.lax.shift_right_logical(b2, jnp.uint32(8)).astype(jnp.int32)
    # u1 in (0, 1]: (v+1) * 2^-24 never hits 0, so log(u1) is finite
    u1 = (v1.astype(jnp.float32) + 1.0) * (1.0 / 16777216.0)
    u2 = v2.astype(jnp.float32) * (1.0 / 16777216.0)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2)


def _chain_kernel(seed_ref, tab_ref, y0h_ref, gx_ref,
                  e1_ref, e2_ref, e3_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                  w4_ref, b4_ref, ws_ref, bs_ref,
                  out_ref, *, n_steps, matmul_dtype, act_dtype, noise_mode,
                  use_gx_directly):
    if noise_mode == "prng":
        from jax.experimental.pallas import tpu as pltpu

        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    y0h = y0h_ref[:]          # [R, F] fp32 — doubles as y_T_mean
    gx = gx_ref[:]            # [R, F] fp32

    if act_dtype != jnp.float32:
        softplus = _softplus_branchfree
    else:
        softplus = jax.nn.softplus

    def dot(a, w):
        return jnp.dot(a.astype(matmul_dtype), w,
                       preferred_element_type=jnp.float32)

    # W1 is [3F, 128] over concat(y_t, y0_hat, gx); the y0_hat/gx partial
    # product is STEP-INVARIANT, so it is computed once per tile and stays
    # resident — per step the first layer only adds y_t @ W1[:F]
    # (an optimization the per-step reference loop cannot express).
    F = y0h.shape[-1]
    w1 = w1_ref[:]
    base1 = dot(y0h, w1[F:2 * F, :]) + dot(gx, w1[2 * F:3 * F, :])  # [R, 128]
    w1y = w1[:F, :]

    def norm_band(out, g, b):
        out = out.astype(act_dtype)
        out = g.astype(act_dtype) * (out + b.astype(act_dtype))
        out = softplus(out)
        s2 = jnp.sum((out * out).astype(jnp.float32), axis=-1, keepdims=True)
        r = jax.lax.rsqrt(jnp.maximum(s2, _EPS_NORM * _EPS_NORM))
        return out * r.astype(act_dtype)

    def trunk(y, t):
        """(eps_theta, sigma_theta) for the whole tile at scalar step t."""
        g1 = e1_ref[pl.ds(t, 1), :]  # [1, 128] dynamic row at step t
        g2 = e2_ref[pl.ds(t, 1), :]
        g3 = e3_ref[pl.ds(t, 1), :]
        h = norm_band(dot(y, w1y) + base1, g1, b1_ref[:])
        h = norm_band(dot(h, w2_ref[:]), g2, b2_ref[:])
        h = norm_band(dot(h, w3_ref[:]), g3, b3_ref[:])
        eps = dot(h, w4_ref[:]) + b4_ref[:]
        hs = jax.nn.softplus(h.astype(jnp.float32))
        sigma = jax.nn.softplus(dot(hs, ws_ref[:]) + bs_ref[:])
        return eps, sigma

    def coeffs(t):
        """The 7 per-step schedule scalars from the SMEM table."""
        return (tab_ref[0, t], tab_ref[1, t], tab_ref[2, t], tab_ref[3, t],
                tab_ref[4, t], tab_ref[5, t], tab_ref[6, t])

    def sigma_y0_hat(a, bt_m1, bb_m1, sigma_theta):
        # per-step quadratic solve (nsdiff_utils.py:143-146)
        lam0 = a * (1.0 - a) * bt_m1
        lam1 = ((1.0 - a) ** 2 * bt_m1 + a * (1.0 - a) * (bb_m1 - bt_m1)) * gx \
            - sigma_theta * (a * bt_m1 + a * (1.0 - a))
        lam2 = gx * gx * (1.0 - a) ** 2 * (bb_m1 - bt_m1) - sigma_theta * gx * (
            a * bb_m1 - a * bt_m1 + (1.0 - a) ** 2
        )
        disc = jnp.maximum(lam1 * lam1 - 4.0 * lam0 * lam2, 0.0)
        return (-lam1 + jnp.sqrt(disc)) / (2.0 * lam0)

    # y_T = sqrt(gx) * z + y_T_mean
    if noise_mode == "prng":
        y = jnp.sqrt(gx) * _normal(y0h.shape) + y0h
    else:
        y = y0h

    def step(i, y):
        t = (n_steps - 1) - i
        a, bt, bb, bt_m1, bb_m1, acp_prev, om_abar_sqrt = coeffs(t)
        eps_theta, sigma_theta = trunk(y, t)
        sqrt_abar = jnp.sqrt(1.0 - om_abar_sqrt * om_abar_sqrt)
        if use_gx_directly:
            s_y0 = gx
            noise_var = bb * gx
        else:
            s_y0 = sigma_y0_hat(a, bt_m1, bb_m1, sigma_theta)
            noise_var = (bb - bt) * gx + bt * s_y0
        y0_reparam = (y - (1.0 - sqrt_abar) * y0h
                      - eps_theta * jnp.sqrt(noise_var)) / sqrt_abar
        # posterior mean coefficients (nsdiff_utils.py:80-92)
        s1 = (1.0 - a) ** 2 * gx + a * (1.0 - a) * s_y0
        s2 = (bb_m1 - bt_m1) * gx + bt_m1 * s_y0
        denom = a * s2 + s1
        sqrt_a = jnp.sqrt(a)
        sqrt_abar_prev = jnp.sqrt(acp_prev)
        g0 = sqrt_abar_prev * s1 / denom
        g1 = sqrt_a * s2 / denom
        g2 = ((sqrt_a * (a - 1.0)) * s2 + (1.0 - sqrt_abar_prev) * s1) / denom
        y_mean = g0 * y0_reparam + g1 * y + g2 * y0h
        if noise_mode == "prng":
            y = y_mean + jnp.sqrt(sigma_theta) * _normal(y.shape)
        else:
            y = y_mean
        return y

    y = jax.lax.fori_loop(0, n_steps - 1, step, y)

    # final deterministic step t=0 (p_sample_t_1to0, nsdiff_utils.py:209-239)
    a, bt, bb, bt_m1, bb_m1, _acp, om_abar_sqrt = coeffs(0)
    eps_theta, sigma_theta = trunk(y, 0)
    sqrt_abar = jnp.sqrt(1.0 - om_abar_sqrt * om_abar_sqrt)
    if use_gx_directly:
        noise_var = bb * gx
    else:
        s_y0 = sigma_y0_hat(a, bt_m1, bb_m1, sigma_theta)
        noise_var = (bb - bt) * gx + bt * s_y0
    out_ref[:] = (y - (1.0 - sqrt_abar) * y0h
                  - eps_theta * jnp.sqrt(noise_var)) / sqrt_abar


def _schedule_table(sched) -> np.ndarray:
    """[8, T] fp32 row-stack of the per-step schedule arrays (row 7 pad)."""
    rows = [sched.alphas, sched.betas_tilde, sched.betas_bar,
            sched.betas_tilde_m_1, sched.betas_bar_m_1,
            sched.alphas_cumprod_prev, sched.one_minus_alphas_bar_sqrt]
    tab = np.stack([np.asarray(r, np.float32) for r in rows], axis=0)
    return np.concatenate([tab, np.zeros((1, tab.shape[1]), np.float32)], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "interpret", "matmul_dtype", "act_dtype",
                     "noise_mode", "use_gx_directly", "tile_m"),
)
def fused_chain_rows(y0h, gx, tab, seed, gammas_tables, weights, n_steps,
                     interpret=False, matmul_dtype="bfloat16",
                     act_dtype="float32", noise_mode="prng",
                     use_gx_directly=False, tile_m=1024):
    """y0h/gx: [M, F] rows -> y_0 [M, F] after the full reverse chain.

    gammas_tables: (E1, E2, E3) full [T, HIDDEN] embedding tables.
    weights: the 10-tuple of fused_denoiser.denoiser_weights_from_params.
    seed: int32 scalar array; each grid tile folds in its program_id.
    """
    from jax.experimental.pallas import tpu as pltpu

    mm_dt = _DTYPES[str(matmul_dtype)]
    act_dt = _DTYPES[str(act_dtype)]
    weights = tuple(jnp.atleast_2d(w) if w.ndim == 1 else w for w in weights)
    if mm_dt != jnp.float32:
        weights = tuple(
            w.astype(mm_dt) if i % 2 == 0 else w for i, w in enumerate(weights)
        )
    M, F = y0h.shape
    m_pad = (-M) % tile_m
    if m_pad:
        y0h = jnp.pad(y0h, ((0, m_pad), (0, 0)))
        # pad gx with 1.0: padded rows still run the chain, and gx=0 would
        # divide-by-zero inside the quadratic solve
        gx = jnp.pad(gx, ((0, m_pad), (0, 0)), constant_values=1.0)
    Mp = y0h.shape[0]
    vmem = dict(memory_space=pltpu.VMEM) if not interpret else {}
    smem = dict(memory_space=pltpu.SMEM) if not interpret else {}
    row = pl.BlockSpec((tile_m, F), lambda i: (i, 0), **vmem)
    full = lambda c: pl.BlockSpec(c.shape, lambda i: tuple(0 for _ in c.shape), **vmem)
    tab = jnp.asarray(tab)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    consts = tuple(gammas_tables) + weights
    kernel = functools.partial(
        _chain_kernel, n_steps=n_steps, matmul_dtype=mm_dt, act_dtype=act_dt,
        noise_mode=str(noise_mode), use_gx_directly=bool(use_gx_directly),
    )
    out = pl.pallas_call(
        kernel,
        grid=(Mp // tile_m,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,), **smem),
            pl.BlockSpec(tab.shape, lambda i: (0, 0), **smem),
            row, row,
        ] + [full(c) for c in consts],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((Mp, F), jnp.float32),
        interpret=interpret,
    )(seed, tab, y0h, gx, *consts)
    return out[:M]


def fused_nsdiff_chain(params_model, y0_hat, gx, sched, seed,
                       n_z_samples: int, interpret=False,
                       matmul_dtype="bfloat16", act_dtype="float32",
                       noise_mode="prng", use_gx_directly=False, tile_m=1024):
    """Chain-resident ensemble sampler: [B, O, N] y0_hat/gx -> samples
    [B, O, N, S].  Replaces sample_fn's vmap-of-scans when enabled."""
    from .fused_denoiser import denoiser_weights_from_params

    B, O, N = y0_hat.shape
    S = n_z_samples
    y0_rows = jnp.broadcast_to(y0_hat[None], (S, B, O, N)).reshape(-1, N)
    gx_rows = jnp.broadcast_to(gx[None], (S, B, O, N)).reshape(-1, N)
    p = params_model
    tables = (p["lin1"]["embed"], p["lin2"]["embed"], p["lin3"]["embed"])
    weights = denoiser_weights_from_params(p)
    tab = _schedule_table(sched)
    n_steps = int(np.asarray(sched.alphas).shape[0])
    out = fused_chain_rows(
        y0_rows.astype(jnp.float32), gx_rows.astype(jnp.float32), tab, seed,
        tables, weights, n_steps, interpret=interpret,
        matmul_dtype=matmul_dtype, act_dtype=act_dtype, noise_mode=noise_mode,
        use_gx_directly=use_gx_directly, tile_m=tile_m,
    )
    return jnp.transpose(out.reshape(S, B, O, N), (1, 2, 3, 0))
