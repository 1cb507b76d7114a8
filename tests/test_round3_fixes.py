"""Round-3 fixes: ADVICE r2 items (precision-knob coupling, jit-cache reuse)."""
import jax.numpy as jnp
import numpy as np
import pytest


def _tiny_nsdiff(**extra):
    from upgdm_tpu.models.nsdiff import NsDiffModel

    net = dict(
        dataset_nf=1, windows=12, pred_len=4, rolling_length=4,
        diffusion_steps=5, scaler_type=None, d_model=8, n_heads=2,
        e_layers=1, d_layers=1, d_ff=8, p_hidden_dims=[4, 4],
        p_hidden_layers=2, n_z_samples=2, task_model="NsDiff",
        diffusion_schedule="linear", beta_start=1e-4, beta_end=2e-2,
        output_attention=False, dropout=0.05, factor=3, activation="gelu",
        load_pretrain=False, freeze_pretrain=False,
    )
    net.update(extra)
    return NsDiffModel(net)


def test_pallas_arm_matmul_dtype_follows_sampling_dtype(monkeypatch):
    """ADVICE r2: sampling_dtype="float32" must reach the Pallas arm's
    matmul dtype instead of being silently overridden by a bf16 default."""
    from upgdm_tpu.ops.pallas import fused_denoiser as fd

    seen = {}

    def stub(params, y, y0_hat, gx, t, *, matmul_dtype, act_dtype, tile_m):
        seen["matmul_dtype"] = matmul_dtype
        B = y.shape[0]
        O, N = y.shape[1], y.shape[2]
        return jnp.zeros((B, O, N)), jnp.ones((B, O, N))

    monkeypatch.setattr(fd, "fused_nsdiff_denoiser", stub)

    for sdt, expect in [("float32", "float32"), ("bfloat16", "bfloat16")]:
        model = _tiny_nsdiff(use_pallas_denoiser=True, sampling_dtype=sdt)
        x = jnp.zeros((2, 12, 1), jnp.float32)
        model.sample_fn(model.params, x, model.next_key())
        assert seen["matmul_dtype"] == expect, (sdt, seen)

    # an explicit override still wins
    model = _tiny_nsdiff(
        use_pallas_denoiser=True,
        sampling_dtype="float32",
        sampling_matmul_dtype="bfloat16",
    )
    x = jnp.zeros((2, 12, 1), jnp.float32)
    model.sample_fn(model.params, x, model.next_key())
    assert seen["matmul_dtype"] == "bfloat16"


def test_sharded_sweep_caches_jitted_reduce():
    """ADVICE r2: sharded_fast_mpv_sweep must reuse its jitted reduce across
    calls (per-call rebuilds recompile under the remote-compile backend)."""
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    from upgdm_tpu.parallel.data_parallel import sharded_fast_mpv_sweep
    from upgdm_tpu.parallel.mesh import make_mesh

    model = _tiny_nsdiff()
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    wins = rng.normal(size=(mesh.devices.size, 1, 12, 1)).astype(np.float32)
    sharded_fast_mpv_sweep(model, wins, pred_len=4, mesh=mesh, chunk_windows=1)
    cache = model.__dict__.get("_fast_sweep_jit_cache", {})
    keys = [k for k in cache if isinstance(k, tuple) and k and k[0] == "sharded"]
    assert keys, "sharded reduce was not cached on the model"
    before = {k: cache[k] for k in keys}
    sharded_fast_mpv_sweep(model, wins, pred_len=4, mesh=mesh, chunk_windows=1)
    for k in keys:
        assert cache[k] is before[k], "jitted reduce was rebuilt on the second call"


def test_bury_shape_only_bind_refuses_cross_type(tmp_path):
    """ADVICE r2: positional shape-signature binding must not silently pair
    weight groups across layer types."""
    import re

    from upgdm_tpu.eval import bury

    natural = lambda name: (
        re.match(r"(.*?)(\d+)?$", name).group(1),
        int(re.match(r"(.*?)(\d+)?$", name).group(2) or 0),
    )
    # same base: ok ("lstm_1" model layer vs "lstm_14" h5 group)
    assert natural("lstm_1")[0].rstrip("_") == natural("lstm_14")[0].rstrip("_")
    # cross-type: must differ, which load-time now turns into a ValueError
    assert natural("dense_1")[0].rstrip("_") != natural("lstm_3")[0].rstrip("_")
