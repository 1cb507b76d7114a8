"""Tiny end-to-end train+sample checks for TMDM, DiffusionTS, DiffSTG, the
NsDiff variants/spatial family, and DP training on the 8-device mesh."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _series_batch(n=24, T=24, F=2, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(n, T, F)) * 0.1).astype(np.float32).cumsum(axis=1)


TINY_COMMON = dict(
    dataset_nf=2, windows=16, pred_len=8, scaler_type="StandardScaler",
    d_model=16, n_heads=2, e_layers=1, d_layers=1, d_ff=16,
    p_hidden_dims=[8, 8], p_hidden_layers=2,
)


def test_tmdm_end_to_end(tmp_path):
    from upgdm_tpu.train.loop import run_training

    net_param = dict(TINY_COMMON, task_model="TMDM", diffusion_steps=5, n_z_samples=4)
    data = _series_batch()
    rs = run_training(
        data[:16], data[16:],
        dict(train_model_select=None, train_batch_size=8, val_batch_size=8,
             train_epochs=2, test_set=True, ckpt=False, ckpt_period=2),
        net_param, {}, dict(optimizer_name="Adam", lr=1e-3), tmp_path,
    )
    assert len(rs["train_scores"]) == 2
    assert np.isfinite(rs["train_scores"]).all()
    from upgdm_tpu.eval.uncertainty import load_model_from_dir
    from upgdm_tpu.utils.io import save_config_yaml

    save_config_yaml(
        tmp_path / "trained_model/model_trained.yaml",
        {"dataset": {"windows": 16, "pred_len": 8, "sampling_t": 0.1},
         "train": {"train_model_select": None}, "net": net_param},
    )
    model, _np = load_model_from_dir(tmp_path / "trained_model")
    outs, by = model.evaluation_step(data[:2])
    assert outs.shape == (2, 8, 2, 4)


def test_diffusionts_end_to_end(tmp_path):
    from upgdm_tpu.train.loop import run_training
    from upgdm_tpu.models.diffusionts import DiffusionTSModel

    net_param = dict(
        TINY_COMMON, task_model="DiffusionTS", diffusion_steps=4, timesteps=8,
        n_layer_enc=1, n_layer_dec=2, n_z_samples=3,
    )
    data = _series_batch()
    rs = run_training(
        data[:16], data[16:],
        dict(train_model_select=None, train_batch_size=8, val_batch_size=8,
             train_epochs=2, test_set=True, ckpt=False),
        net_param, {}, dict(optimizer_name="Adam", lr=1e-3), tmp_path,
    )
    assert np.isfinite(rs["train_scores"]).all()
    m = DiffusionTSModel(net_param)
    outs, _ = m.evaluation_step(data[:2])
    assert outs.shape == (2, 8, 2, 3)
    # unconditional generation path
    import jax

    gen = m.generate_mts_fn(m.params, jax.random.key(0), batch_size=2)
    assert np.asarray(gen).shape == (2, 24, 2)


def test_diffstg_training_with_mixed_graphs(tmp_path):
    from upgdm_tpu.train.loop import run_training

    rng = np.random.default_rng(0)
    V, n = 6, 20
    x = (rng.normal(size=(n, V, 16, 1)) * 0.1).astype(np.float32).cumsum(axis=2)
    adjs = rng.integers(0, 2, size=(2, V, V)).astype(np.float32)
    adjs = ((adjs + adjs.transpose(0, 2, 1)) > 0).astype(np.float32)
    gids = rng.integers(0, 2, size=(n,)).astype(np.int32)
    net_param = dict(
        T_h=8, T_p=8, F=1, diffusion_steps=20, inference_diffusion_steps=3,
        inference_trick="ddim", inference_schedule="cosine",
        diffusion_schedule="linear", scaler_type="StandardScaler", d_h=4, Td_h=6,
        channel_multipliers=[1, 2], n_blocks=1, gnn_name="GCNConv",
        parallel_sampling=2, sequential_sampling=1, mask_ratio=0.1,
        init_num_nodes=V, task_model="DiffSTG",
    )
    rs = run_training(
        x[:16], x[16:],
        dict(train_model_select=None, train_batch_size=8, val_batch_size=8,
             train_epochs=2, test_set=True, ckpt=False),
        net_param, {}, dict(optimizer_name="Adam", lr=1e-3), tmp_path,
        adj=(adjs, gids[:16], gids[16:]),
    )
    assert np.isfinite(rs["train_scores"]).all()


def test_nsdiff_variants():
    from upgdm_tpu.models.factory import diffusion_models

    data = _series_batch(8)
    for variant in ("Guassian", "cond_mean", "cond_var", "wo_UANS"):
        m = diffusion_models(
            "NsDiff_model_variants",
            dict(TINY_COMMON, task_model="NsDiff_model_variants", rolling_length=4,
                 diffusion_steps=4, n_z_samples=2),
            train_model_select=variant,
        )
        loss = float(m.training_step(data))
        assert np.isfinite(loss)
        outs, _ = m.evaluation_step(data[:2])
        assert outs.shape == (2, 8, 2, 2)


def test_dp_run_training(tmp_path):
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    from upgdm_tpu.train.loop import run_training

    net_param = dict(TINY_COMMON, task_model="NsDiff", rolling_length=4,
                     diffusion_steps=4, n_z_samples=2)
    data = _series_batch(32)
    rs = run_training(
        data[:24], data[24:],
        dict(train_model_select="NsDiff_model", train_batch_size=16, val_batch_size=8,
             train_epochs=2, test_set=True, ckpt=False, dataparallel=True),
        net_param, {}, dict(optimizer_name="Adam", lr=1e-3), tmp_path,
    )
    assert np.isfinite(rs["train_scores"]).all()


def test_diffstg_bf16_sampling_mpv_parity():
    """sampling_dtype="bfloat16" (UGnet denoiser in bf16, chain state fp32)
    must keep ensemble MPV within the 1% parity budget (measured 0.10%)."""
    import jax
    import jax.numpy as jnp

    from upgdm_tpu.models.diffstg import DiffSTGModel

    rng = np.random.default_rng(0)
    NODE = 12
    cfg = dict(
        T_h=24, T_p=8, F=1, diffusion_steps=50, inference_diffusion_steps=10,
        inference_trick="ddim", inference_schedule="cosine",
        diffusion_schedule="linear", scaler_type=None, d_h=4, Td_h=10,
        channel_multipliers=[1, 2], n_blocks=2, gnn_name="GCNConv",
        parallel_sampling=4, sequential_sampling=4, init_num_nodes=NODE,
        task_model="DiffSTG",
    )
    adj = (rng.uniform(size=(NODE, NODE)) < 0.3).astype(np.float32)
    adj = ((adj + adj.T) > 0).astype(np.float32)
    np.fill_diagonal(adj, 0)
    adj = jnp.asarray(adj)
    hist = jnp.asarray(rng.normal(size=(NODE, 24, 1)).astype(np.float32))
    key = jax.random.key(0)
    S = 64

    m32 = DiffSTGModel(cfg)
    m16 = DiffSTGModel(dict(cfg, sampling_dtype="bfloat16"))
    m16.params = m32.params  # identical weights, same PRNG keys
    e32 = np.asarray(jax.jit(
        lambda p, h, k: m32.sample_fn(p, h, adj, k, S))(m32.params, hist, key))
    e16 = np.asarray(jax.jit(
        lambda p, h, k: m16.sample_fn(p, h, adj, k, S))(m16.params, hist, key))
    mpv32 = e32.var(axis=-1).mean()
    mpv16 = e16.var(axis=-1).mean()
    assert abs(mpv16 - mpv32) / mpv32 < 0.01


def test_diffusionts_bf16_sampling_mpv_parity():
    """sampling_dtype="bfloat16" (denoising transformer in bf16, chain state
    and sign()-Langevin updates fp32) must not bias the ensemble MPV.

    The DTS chain is chaotic (the corrector update is lr*sign(grad)), so
    same-key trajectories decorrelate under any perturbation and per-sample
    comparison is meaningless; the guard is statistical.  Measured bias:
    0.39% at S=192 over 4 keys vs an fp32 key-to-key CV of 1.7% — the 5%
    tolerance here (S=96, one key pair) catches gross breakage while staying
    above the ensemble noise floor.
    """
    import jax
    import jax.numpy as jnp

    from upgdm_tpu.models.diffusionts import DiffusionTSModel

    cfg = dict(
        dataset_nf=1, windows=24, pred_len=8, diffusion_steps=10, timesteps=20,
        scaler_type=None, d_model=32, n_heads=2, n_layer_enc=1, n_layer_dec=2,
        n_z_samples=32, task_model="DiffusionTS",
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 24, 1)).astype(np.float32))
    key = jax.random.key(7)
    S = 96

    m32 = DiffusionTSModel(cfg)
    m16 = DiffusionTSModel(dict(cfg, sampling_dtype="bfloat16"))
    m16.params = m32.params
    e32 = np.asarray(jax.jit(
        lambda p, b, k: m32.sample_fn(p, b, k, S))(m32.params, x, key))
    e16 = np.asarray(jax.jit(
        lambda p, b, k: m16.sample_fn(p, b, k, S))(m16.params, x, key))
    mpv32 = e32.var(axis=-1).mean()
    mpv16 = e16.var(axis=-1).mean()
    assert np.isfinite(e16).all()
    assert abs(mpv16 - mpv32) / mpv32 < 0.05


def test_tmdm_bf16_sampling_mpv_parity():
    """sampling_dtype="bfloat16" (denoiser MLP in bf16, CARD chain state
    fp32) keeps ensemble MPV within the 1% budget (measured 0.03% — the
    chain is affine in eps so same-key comparison is exact)."""
    import jax
    import jax.numpy as jnp

    from upgdm_tpu.models.tmdm import TMDMModel

    cfg = dict(
        dataset_nf=1, windows=24, pred_len=8, diffusion_steps=30,
        scaler_type=None, d_model=32, n_heads=2, e_layers=1, d_layers=1,
        d_ff=32, p_hidden_dims=[16, 16], p_hidden_layers=2, n_z_samples=48,
        task_model="TMDM",
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(6, 24, 1)).astype(np.float32))
    key = jax.random.key(0)

    m32 = TMDMModel(dict(cfg, sampling_dtype="float32"))
    m16 = TMDMModel(cfg)  # bf16 default
    m16.params = m32.params
    e32 = np.asarray(jax.jit(
        lambda p, b, k: m32.sample_fn(p, b, k, 48))(m32.params, x, key))
    e16 = np.asarray(jax.jit(
        lambda p, b, k: m16.sample_fn(p, b, k, 48))(m16.params, x, key))
    mpv32 = e32.var(axis=-1).mean()
    mpv16 = e16.var(axis=-1).mean()
    assert abs(mpv16 - mpv32) / mpv32 < 0.01


def test_nsdiff_flax_bf16_sampling_mpv_parity():
    """NsDiff flax-arm sampling_dtype="bfloat16" (denoiser fully bf16 incl.
    the softplus/l2-norm band; chain state fp32) keeps ensemble MPV within
    the 1% budget."""
    import jax
    import jax.numpy as jnp

    from upgdm_tpu.models.nsdiff import NsDiffModel

    cfg = dict(
        dataset_nf=1, windows=40, pred_len=20, rolling_length=10,
        diffusion_steps=20, scaler_type=None, d_model=32, n_heads=2,
        e_layers=1, d_layers=1, d_ff=16, p_hidden_dims=[8, 8],
        p_hidden_layers=2, n_z_samples=48, task_model="NsDiff",
        diffusion_schedule="linear", beta_start=1e-4, beta_end=2e-2,
        output_attention=False, dropout=0.05, factor=3, activation="gelu",
        load_pretrain=False, freeze_pretrain=False, use_pallas_denoiser=False,
    )
    rng = np.random.default_rng(3)
    x = jnp.asarray((rng.normal(size=(12, 40, 1)) * 0.05 + 1.0).astype(np.float32))
    key = jax.random.key(0)

    m32 = NsDiffModel(dict(cfg, sampling_dtype="float32"))
    m16 = NsDiffModel(dict(cfg, sampling_dtype="bfloat16"))
    m16.params = m32.params
    e32 = np.asarray(jax.jit(
        lambda p, b, k: m32.sample_fn(p, b, k, 48))(m32.params, x, key))
    e16 = np.asarray(jax.jit(
        lambda p, b, k: m16.sample_fn(p, b, k, 48))(m16.params, x, key))
    mpv32 = e32.var(axis=-1).mean()
    mpv16 = e16.var(axis=-1).mean()
    assert abs(mpv16 - mpv32) / mpv32 < 0.01


def test_nsdiff_spatial_bf16_sampling_mpv_parity():
    """Spatial UGnet denoiser in bf16 (chain state fp32, dense adjacency
    cast) keeps ensemble MPV within the 1% budget (measured 0.12%)."""
    import jax
    import jax.numpy as jnp

    from upgdm_tpu.models.nsdiff_spatial import NsDiffSpatialModel

    cfg = dict(
        dataset_nf=1, windows=24, pred_len=8, rolling_length=8,
        diffusion_steps=12, scaler_type=None, d_model=32, n_heads=2,
        e_layers=1, d_layers=1, d_ff=16, p_hidden_dims=[8, 8],
        p_hidden_layers=2, n_z_samples=48, task_model="NsDiff_spatial",
        d_h=4, channel_multipliers=[1, 2], n_blocks=2, gnn_name="GCNConv",
        init_num_nodes=10, diffusion_schedule="linear", beta_start=1e-4,
        beta_end=2e-2, output_attention=False, dropout=0.05, factor=3,
        activation="gelu", load_pretrain=False, freeze_pretrain=False,
    )
    rng = np.random.default_rng(0)
    V = 10
    adj = (rng.uniform(size=(V, V)) < 0.3).astype(np.float32)
    adj = ((adj + adj.T) > 0).astype(np.float32)
    np.fill_diagonal(adj, 0)
    x = jnp.asarray(rng.normal(size=(2, V, 24, 1)).astype(np.float32))
    key = jax.random.key(0)

    m32 = NsDiffSpatialModel(dict(cfg, sampling_dtype="float32"))
    m16 = NsDiffSpatialModel(cfg)  # bf16 default
    m16.params = m32.params
    e32 = np.asarray(jax.jit(
        lambda p, b, a, k: m32.sample_fn(p, b, a, k, 48)
    )(m32.params, x, jnp.asarray(adj), key))
    e16 = np.asarray(jax.jit(
        lambda p, b, a, k: m16.sample_fn(p, b, a, k, 48)
    )(m16.params, x, jnp.asarray(adj), key))
    mpv32 = e32.var(axis=-1).mean()
    mpv16 = e16.var(axis=-1).mean()
    assert abs(mpv16 - mpv32) / mpv32 < 0.01


def test_diffstg_bf16_high_timestep_parity():
    """Regression: at diffusion_steps>256 the timestep values are not exactly
    representable in bf16, so t must stay fp32 in the bf16 sampling path
    (sinusoidal_time_embedding consumes it fp32; a bf16 t misrounds steps)."""
    import jax
    import jax.numpy as jnp

    from upgdm_tpu.models.diffstg import DiffSTGModel

    rng = np.random.default_rng(1)
    NODE = 8
    cfg = dict(
        T_h=16, T_p=8, F=1, diffusion_steps=500, inference_diffusion_steps=8,
        inference_trick="ddim", inference_schedule="cosine",
        diffusion_schedule="linear", scaler_type=None, d_h=4, Td_h=10,
        channel_multipliers=[1, 2], n_blocks=1, gnn_name="GCNConv",
        parallel_sampling=4, sequential_sampling=4, init_num_nodes=NODE,
        task_model="DiffSTG",
    )
    adj = (rng.uniform(size=(NODE, NODE)) < 0.4).astype(np.float32)
    adj = ((adj + adj.T) > 0).astype(np.float32)
    np.fill_diagonal(adj, 0)
    adj = jnp.asarray(adj)
    hist = jnp.asarray(rng.normal(size=(NODE, 16, 1)).astype(np.float32))
    key = jax.random.key(0)
    S = 48

    m32 = DiffSTGModel(dict(cfg, sampling_dtype="float32"))
    m16 = DiffSTGModel(cfg)  # bf16 default
    m16.params = m32.params
    e32 = np.asarray(jax.jit(
        lambda p, h, k: m32.sample_fn(p, h, adj, k, S))(m32.params, hist, key))
    e16 = np.asarray(jax.jit(
        lambda p, h, k: m16.sample_fn(p, h, adj, k, S))(m16.params, hist, key))
    mpv32 = e32.var(axis=-1).mean()
    mpv16 = e16.var(axis=-1).mean()
    assert abs(mpv16 - mpv32) / mpv32 < 0.01


def test_diffusionts_sample_chunk_exact():
    """net_param["sample_chunk"] bounds the vmapped ensemble width (the
    Langevin grad temporaries OOM at large S*B); each sample keeps its own
    key, so the chunked ensemble equals the unchunked one exactly —
    including a chunk size that does not divide S."""
    import jax
    import jax.numpy as jnp

    from upgdm_tpu.models.diffusionts import DiffusionTSModel

    cfg = dict(
        dataset_nf=1, windows=24, pred_len=8, diffusion_steps=6, timesteps=12,
        scaler_type=None, d_model=32, n_heads=2, n_layer_enc=1, n_layer_dec=2,
        n_z_samples=10, task_model="DiffusionTS",
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 24, 1)).astype(np.float32))
    key = jax.random.key(0)

    m_full = DiffusionTSModel(dict(cfg, sample_chunk=None))  # explicit off
    m_chunk = DiffusionTSModel(dict(cfg, sample_chunk=4))  # 10 = 4+4+2(pad)
    m_chunk.params = m_full.params
    e_full = np.asarray(jax.jit(
        lambda p, b, k: m_full.sample_fn(p, b, k, 10))(m_full.params, x, key))
    e_chunk = np.asarray(jax.jit(
        lambda p, b, k: m_chunk.sample_fn(p, b, k, 10))(m_chunk.params, x, key))
    np.testing.assert_allclose(e_chunk, e_full, atol=1e-5)

    # sample_chunk now DEFAULTS to parallel_sample (the reference's ensemble
    # pass width) — the default-chunked ensemble must equal the unchunked one
    m_default = DiffusionTSModel(dict(cfg, parallel_sample=4))
    m_default.params = m_full.params
    e_default = np.asarray(jax.jit(
        lambda p, b, k: m_default.sample_fn(p, b, k, 10))(m_default.params, x, key))
    np.testing.assert_allclose(e_default, e_full, atol=1e-5)


def test_diffusionts_evaluation_step_host_rounds():
    """evaluation_step draws the ensemble in host-side parallel_sample
    rounds (bounded device programs for the remote TPU transport) and still
    returns exactly n_z_samples finite trajectories."""
    from upgdm_tpu.models.diffusionts import DiffusionTSModel

    cfg = dict(
        dataset_nf=1, windows=24, pred_len=8, diffusion_steps=6, timesteps=12,
        scaler_type=None, d_model=32, n_heads=2, n_layer_enc=1, n_layer_dec=2,
        n_z_samples=10, parallel_sample=4, task_model="DiffusionTS",
    )
    m = DiffusionTSModel(cfg)
    batch = np.random.default_rng(0).normal(size=(3, 32, 1)).astype(np.float32)
    outs, batch_y = m.evaluation_step(batch)
    outs = np.asarray(outs)
    assert outs.shape == (3, 8, 1, 10)
    assert np.isfinite(outs).all()
    assert batch_y.shape == (3, 8, 1)
