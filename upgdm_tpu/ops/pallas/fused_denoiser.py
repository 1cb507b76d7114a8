"""Pallas TPU kernel: fused NsDiff conditional-MLP denoiser step.

The innermost op of the NsDiff reverse-diffusion scan is the ConditionalLinear
MLP (models/denoise.py): for every (sample, window-row, horizon-step) the
trunk runs

    h = l2norm(softplus(gamma1 * (x @ W1 + b1)))
    h = l2norm(softplus(gamma2 * (h @ W2 + b2)))
    h = l2norm(softplus(gamma3 * (h @ W3 + b3)))
    eps = h @ W4 + b4 ; sigma = softplus(softplus(h) @ Ws + bs)

With the full MPV sweep batched (samples x windows x nodes x horizon rows),
the activation matrix is ~10^6 x 128 per step; unfused, each of the three
trunk layers round-trips that matrix through HBM.  This kernel keeps the
activation tile resident in VMEM across ALL layers and heads: HBM traffic
drops to one [TILE, 3F] read + two [TILE, F] writes per tile.

Weights (3F x 128, 2x 128 x 128, 2x 128 x F, biases, and the per-timestep
embedding gates gathered OUTSIDE the kernel) total < 100 KB — they sit in VMEM
for every grid step.  Tiles are (TILE_M, 128)-aligned per the MXU/VPU layout
rules (pallas_guide.md).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

TILE_M = 512
HIDDEN = 128
_EPS_NORM = 1e-12
_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16}


def _softplus_branchfree(x):
    """softplus(x) = max(x,0) + log1p(exp(-|x|)) without a compare/select.

    ``jax.nn.softplus`` lowers through a ``where`` whose packed-bf16
    ``arith.cmpf`` Mosaic rejects ("arith.cmpf ... vector<8x128x2xbf16>") —
    this was THE blocker for act_dtype=bfloat16 (BASELINE.md round-2).
    ``jnp.abs`` is a sign-bit mask and ``(x+|x|)/2`` is pure arithmetic, so
    the whole band stays on packed VPU lanes.  ``log(1+e)`` instead of
    ``log1p(e)`` because Mosaic also fails to legalize packed-bf16
    ``math.log1p`` ("failed to legalize operation 'math.log1p' ...
    vector<8x128x2xbf16>"); with e = exp(-|x|) in (0, 1] the log1p precision
    advantage is far below bf16 resolution anyway.  Same function value,
    same overflow behavior (exp(-|x|) never overflows).
    """
    ax = jnp.abs(x)
    return jnp.log(1.0 + jnp.exp(-ax)) + 0.5 * (x + ax)


def _prep_rows(x, gammas, weights, mm_dt):
    """Shared const prep: vectors to (1, n) rows (TPU-friendly 2-D layouts);
    for bf16 matmuls the weight MATRICES (even indices) and x arrive in the
    kernel as bf16 so the MXU dot is natively mixed-precision — biases stay
    fp32 (an in-kernel f32->bf16->dot astype is folded away by Mosaic)."""
    gammas = tuple(jnp.atleast_2d(g) for g in gammas)
    weights = tuple(jnp.atleast_2d(w) if w.ndim == 1 else w for w in weights)
    if mm_dt != jnp.float32:
        weights = tuple(
            w.astype(mm_dt) if i % 2 == 0 else w for i, w in enumerate(weights)
        )
        x = x.astype(mm_dt)
    return x, gammas + weights


def _call_fused_rows(kernel, x, consts, n_out, out_f, tile_m, interpret):
    """Shared pallas_call plumbing: pad rows to the tile, tile the row axis,
    keep every const whole-array in VMEM, slice the padding off the outputs."""
    from jax.experimental.pallas import tpu as pltpu

    M, in_dim = x.shape
    m_pad = (-M) % tile_m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    Mp = x.shape[0]
    vmem = dict(memory_space=pltpu.VMEM) if not interpret else {}
    row_spec = pl.BlockSpec((tile_m, in_dim), lambda i: (i, 0), **vmem)
    out_spec = pl.BlockSpec((tile_m, out_f), lambda i: (i, 0), **vmem)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), **vmem)
    outs = pl.pallas_call(
        kernel,
        grid=(Mp // tile_m,),
        in_specs=[row_spec] + [full(c.shape) for c in consts],
        out_specs=[out_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((Mp, out_f), jnp.float32)] * n_out,
        interpret=interpret,
    )(x, *consts)
    if m_pad:
        outs = tuple(o[:M] for o in outs)
    return outs


def _kernel(x_ref, g1_ref, g2_ref, g3_ref,
            w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
            w4_ref, b4_ref, ws_ref, bs_ref,
            eps_ref, sigma_ref, *, matmul_dtype=jnp.float32,
            act_dtype=jnp.float32):
    # vectors (biases, timestep gates) arrive as (1, n) rows — broadcast-ready
    x = x_ref[:]

    def dot(a, w_ref):
        # matmul_dtype=bfloat16 runs the MXU at native single-pass rate
        # (fp32 matmuls cost multiple bf16 passes); accumulation stays fp32.
        # The weight refs already hold bf16 (cast OUTSIDE the kernel — an
        # in-kernel f32->bf16->dot pattern gets folded away by Mosaic and
        # silently runs fp32); only the activation is cast here.
        w = w_ref[:]
        return jnp.dot(a.astype(matmul_dtype), w,
                       preferred_element_type=jnp.float32)

    def layer(h, w_ref, b_ref, g_ref):
        # act_dtype=bfloat16 runs the gate/softplus/l2-norm band on
        # packed-bf16 VPU lanes.  The dot must still accumulate fp32 —
        # Mosaic rejects a bf16 matmul acc ("Expected matmul acc to be
        # 32-bit") — so the downcast happens on the dot RESULT; the next
        # layer's dot then consumes the bf16 activations directly (no
        # astype-into-dot, which Mosaic folds away).  The norm accumulation
        # stays fp32 (a 128-element sum of squares is where bf16 actually
        # loses digits).
        out = dot(h, w_ref).astype(act_dtype)
        out = g_ref[:].astype(act_dtype) * (out + b_ref[:].astype(act_dtype))
        # fp32 arm keeps jax.nn.softplus for BIT-parity with the flax
        # denoiser; the bf16 arm needs the branch-free form Mosaic can lower
        out = (
            jax.nn.softplus(out)
            if act_dtype == jnp.float32
            else _softplus_branchfree(out)
        )
        # l2-normalize via rsqrt+mul: one multi-cycle VPU divide per element
        # becomes a mul (the norm clamp keeps torch F.normalize semantics:
        # x / max(||x||, eps) == x * rsqrt(max(||x||^2, eps^2)) for eps<<1)
        s2 = jnp.sum((out * out).astype(jnp.float32), axis=-1, keepdims=True)
        r = jax.lax.rsqrt(jnp.maximum(s2, _EPS_NORM * _EPS_NORM))
        return out * r.astype(act_dtype)

    h = layer(x, w1_ref, b1_ref, g1_ref)
    h = layer(h, w2_ref, b2_ref, g2_ref)
    h = layer(h, w3_ref, b3_ref, g3_ref)
    eps_ref[:] = dot(h, w4_ref) + b4_ref[:]
    hs = jax.nn.softplus(h.astype(jnp.float32))
    sigma_ref[:] = jax.nn.softplus(dot(hs, ws_ref) + bs_ref[:])


@functools.partial(
    jax.jit, static_argnames=("interpret", "matmul_dtype", "act_dtype", "tile_m")
)
def fused_denoiser_rows(x, gammas, weights, interpret: bool = False,
                        matmul_dtype: str = "float32", act_dtype: str = "float32",
                        tile_m: int = TILE_M):
    """x: [M, 3F] concat(y_t, y0_hat, gx) rows -> (eps [M, F], sigma [M, F]).

    gammas: (g1, g2, g3) per-timestep embedding rows, each [HIDDEN]
    (already gathered for the current scalar t).
    weights: (W1, b1, W2, b2, W3, b3, W4, b4, Ws, bs).
    matmul_dtype: "float32" (default, bit-matched to the flax denoiser) or
    "bfloat16" (single-pass MXU matmuls, fp32 accumulate/activations).
    act_dtype: "float32" (default) or "bfloat16" — dtype of the trunk
    activations between matmuls (gate/softplus/l2-norm run packed-bf16 on the
    VPU; the norm's sum-of-squares and both output heads stay fp32).
    tile_m: rows per grid step; larger tiles amortize per-invocation overhead
    against VMEM (h tile is [tile_m, 128] fp32).
    """
    mm_dt = _DTYPES[str(matmul_dtype)]
    act_dt = _DTYPES[str(act_dtype)]
    if act_dt != jnp.float32 and mm_dt == jnp.float32:
        raise ValueError("act_dtype=bfloat16 requires matmul_dtype=bfloat16 "
                         "(the trunk dots must consume the bf16 activations)")
    kernel = functools.partial(_kernel, matmul_dtype=mm_dt, act_dtype=act_dt)
    F = weights[6].shape[1]
    x, consts = _prep_rows(x, gammas, weights, mm_dt)
    eps, sigma = _call_fused_rows(
        kernel, x, consts, n_out=2, out_f=F, tile_m=tile_m, interpret=interpret
    )
    return eps, sigma


def denoiser_weights_from_params(params_model) -> tuple:
    """Extract (W..., b...) tuples from the NsDiffDenoiser flax params."""
    p = params_model
    return (
        p["lin1"]["Dense_0"]["kernel"], p["lin1"]["Dense_0"]["bias"],
        p["lin2"]["Dense_0"]["kernel"], p["lin2"]["Dense_0"]["bias"],
        p["lin3"]["Dense_0"]["kernel"], p["lin3"]["Dense_0"]["bias"],
        p["lin4"]["kernel"], p["lin4"]["bias"],
        p["sigma_lin"]["kernel"], p["sigma_lin"]["bias"],
    )


def denoiser_gammas_from_params(params_model, t):
    """Per-timestep embedding gates (g1, g2, g3), each [HIDDEN], for scalar t."""
    return (
        params_model["lin1"]["embed"][t],
        params_model["lin2"]["embed"][t],
        params_model["lin3"]["embed"][t],
    )


def fused_nsdiff_denoiser(params_model, y_t, y_0_hat, g_x, t, interpret: bool = False,
                          matmul_dtype: str = "float32", act_dtype: str = "float32",
                          tile_m: int = TILE_M):
    """Drop-in equivalent of NsDiffDenoiser.apply for scalar timestep t.

    y_t / y_0_hat / g_x: [..., O, F]; t: scalar int. Returns (eps, sigma)
    with the input shape.
    """
    x = jnp.concatenate([y_t, y_0_hat, g_x], axis=-1)
    lead_shape = x.shape[:-1]
    F = y_t.shape[-1]
    rows = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    gammas = denoiser_gammas_from_params(params_model, t)
    weights = denoiser_weights_from_params(params_model)
    eps, sigma = fused_denoiser_rows(
        rows, gammas, weights, interpret=interpret, matmul_dtype=matmul_dtype,
        act_dtype=act_dtype, tile_m=tile_m,
    )
    return eps.reshape(lead_shape + (F,)), sigma.reshape(lead_shape + (F,))


# ===========================================================================
# TMDM variant: same ConditionalLinear trunk, no inter-layer normalization,
# single eps head (models/denoise.py::TMDMDenoiser, reference
# TMDM/tmdm_model.py:23-64 with cat_y_pred=True -> input concat(y_t, y0_hat)).
# ===========================================================================

def _tmdm_kernel(x_ref, g1_ref, g2_ref, g3_ref,
                 w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                 w4_ref, b4_ref, eps_ref, *, matmul_dtype=jnp.float32):
    x = x_ref[:]

    def dot(a, w_ref):
        return jnp.dot(a.astype(matmul_dtype), w_ref[:],
                       preferred_element_type=jnp.float32)

    def layer(h, w_ref, b_ref, g_ref):
        out = dot(h, w_ref)
        return jax.nn.softplus(g_ref[:] * (out + b_ref[:]))

    h = layer(x, w1_ref, b1_ref, g1_ref)
    h = layer(h, w2_ref, b2_ref, g2_ref)
    h = layer(h, w3_ref, b3_ref, g3_ref)
    eps_ref[:] = dot(h, w4_ref) + b4_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret", "matmul_dtype", "tile_m"))
def fused_tmdm_rows(x, gammas, weights, interpret: bool = False,
                    matmul_dtype: str = "bfloat16", tile_m: int = 1024):
    """x: [M, 2F] concat(y_t, y0_hat) rows -> eps [M, F].

    weights: (W1, b1, W2, b2, W3, b3, W4, b4)."""
    mm_dt = _DTYPES[str(matmul_dtype)]
    kernel = functools.partial(_tmdm_kernel, matmul_dtype=mm_dt)
    F = weights[6].shape[1]
    x, consts = _prep_rows(x, gammas, weights, mm_dt)
    (eps,) = _call_fused_rows(
        kernel, x, consts, n_out=1, out_f=F, tile_m=tile_m, interpret=interpret
    )
    return eps


def fused_tmdm_denoiser(params_model, y_t, y_0_hat, t, interpret: bool = False,
                        matmul_dtype: str = "bfloat16", tile_m: int = 1024):
    """Drop-in for TMDMDenoiser.apply (cat_y_pred=True path) at scalar t."""
    x = jnp.concatenate([y_t, y_0_hat], axis=-1)
    lead_shape = x.shape[:-1]
    F = y_t.shape[-1]
    rows = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    p = params_model
    gammas = (p["lin1"]["embed"][t], p["lin2"]["embed"][t], p["lin3"]["embed"][t])
    weights = (
        p["lin1"]["Dense_0"]["kernel"], p["lin1"]["Dense_0"]["bias"],
        p["lin2"]["Dense_0"]["kernel"], p["lin2"]["Dense_0"]["bias"],
        p["lin3"]["Dense_0"]["kernel"], p["lin3"]["Dense_0"]["bias"],
        p["lin4"]["kernel"], p["lin4"]["bias"],
    )
    eps = fused_tmdm_rows(rows, gammas, weights, interpret=interpret,
                          matmul_dtype=matmul_dtype, tile_m=tile_m)
    return eps.reshape(lead_shape + (F,))
