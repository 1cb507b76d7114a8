"""Loss registry + CEP, FGNN, profiling, vanilla loop, TMDM yaml config."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_simple_losses():
    from upgdm_tpu.train.losses import train_loss

    mse = train_loss("MSELoss")
    assert float(mse(jnp.ones(4), jnp.zeros(4))) == pytest.approx(1.0)
    bce = train_loss("BCELoss")
    assert float(bce(jnp.full(4, 0.5), jnp.ones(4))) == pytest.approx(np.log(2), rel=1e-4)
    ce = train_loss("CrossEntropyLoss")
    logits = jnp.asarray([[10.0, -10.0], [-10.0, 10.0]])
    assert float(ce(logits, jnp.asarray([0, 1]))) < 1e-3


def test_cep_loss_contrast():
    from upgdm_tpu.train.losses import CEPLoss

    cep = CEPLoss("GaussianDiffusion", {"T": 10, "schedule": "linear"})
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(6, 5, 1)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))

    # a model that predicts the true energy should beat a constant model
    def good_model(nx, t):
        return y

    def bad_model(nx, t):
        return jnp.zeros(6)

    k = jax.random.key(0)
    good = float(cep(good_model, x, y, k))
    bad = float(cep(bad_model, x, y, k))
    assert good < bad


@pytest.mark.parametrize("kind", ["GaussianDiffusion", "CategoricalDiffusion",
                                  "DiscreteFlowDiffusion"])
def test_cep_forward_processes(kind):
    from upgdm_tpu.train.losses import CEPLoss

    cep = CEPLoss(kind, {"T": 8})
    x = jnp.asarray(np.random.default_rng(1).uniform(size=(3, 4, 1)).astype(np.float32))
    t = jnp.asarray([1, 4, 8]).reshape(3, 1, 1)
    out = cep.diffusion.sample(x, t, jax.random.key(0))
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_evaluation_scores():
    from upgdm_tpu.train.losses import evaluation_score

    mse = evaluation_score("mse")
    assert mse([1, 2], [1, 2]) == 0
    tau = evaluation_score("kendall_rank")([1, 2, 3], [1, 2, 3])
    assert tau == pytest.approx(1.0)
    sc = evaluation_score("set_correlation")(np.array([1, 0, 1]), np.array([1, 0, 1]))
    assert sc == 1.0


def test_fgnn_conv_and_cliques():
    from upgdm_tpu.models.fgnn import FGNNConv, find_cliques, find_maximal_cliques

    adj = np.zeros((4, 4))
    for i, j in [(0, 1), (1, 2), (0, 2), (2, 3)]:
        adj[i, j] = adj[j, i] = 1
    tris = find_cliques(adj)
    assert {0, 1, 2} in tris
    maximal = find_maximal_cliques(adj)
    assert {0, 1, 2} in maximal and {2, 3} in maximal

    mod = FGNNConv(output_vdim=8, factor_dim=6)
    var = jnp.zeros((4, 5))
    fac = jnp.zeros((2, 6))
    v2f = jnp.asarray([[0, 1, 2, 3], [0, 0, 1, 1]])
    f2v = jnp.asarray([[0, 0, 1, 1], [0, 1, 2, 3]])
    eattr = jnp.zeros((4, 3))
    params = jax.jit(mod.init)(jax.random.key(0), var, fac, v2f, eattr, f2v)
    out_fv, out_vf, _ = jax.jit(mod.apply)(params, var, fac, v2f, eattr, f2v)
    assert out_fv.shape == (4, 8)
    assert out_vf.shape == (2, 6)


def test_phase_timer():
    from upgdm_tpu.utils.profiling import PhaseTimer

    pt = PhaseTimer()
    with pt.phase("a"):
        pass
    with pt.phase("a"):
        pass
    assert pt.counts["a"] == 2
    assert "a" in pt.report()


def test_tmdm_yaml_config(tmp_path):
    import yaml

    from upgdm_tpu.models.tmdm import TMDMModel

    cfg = tmp_path / "tmdm.yml"
    cfg.write_text(yaml.safe_dump({
        "diffusion": {"beta_schedule": "const", "beta_start": 1e-4, "beta_end": 5e-3},
        "model": {"cat_x": True, "cat_y_pred": True},
    }))
    m = TMDMModel(dict(
        dataset_nf=1, windows=8, pred_len=4, diffusion_steps=4, d_model=8, n_heads=2,
        e_layers=1, d_layers=1, d_ff=8, p_hidden_dims=[4, 4], p_hidden_layers=2,
        n_z_samples=2, diffusion_config_dir=str(cfg),
    ))
    np.testing.assert_allclose(m.sched.betas, 5e-3, rtol=1e-6)  # const schedule


def test_vanilla_loop_mse(tmp_path):
    from flax import linen as nn

    from upgdm_tpu.train.vanilla import run_training_vanilla

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, adj):
            h = jnp.einsum("bvu,buc->bvc", adj, x)
            h = nn.relu(nn.Dense(8)(jnp.concatenate([x, h], -1)))
            return nn.Dense(1)(h.mean(axis=1))

    net = Net()
    rng = np.random.default_rng(0)
    n, V = 32, 5
    adj = rng.integers(0, 2, size=(n, V, V)).astype(np.float32)
    adj = ((adj + adj.transpose(0, 2, 1)) > 0).astype(np.float32)
    x = rng.normal(size=(n, V, 2)).astype(np.float32)
    y = adj.sum(axis=(1, 2)) / V  # learnable graph statistic
    train = {"x": x[:24], "adj": adj[:24], "y": y[:24]}
    val = {"x": x[24:], "adj": adj[24:], "y": y[24:]}
    rs = run_training_vanilla(
        train, val, {"train_epochs": 8, "batch_size": 8, "score_metrics": ["mse"]},
        {"task_model": "vanilla"}, {"loss_metric": "MSELoss"},
        {"optimizer_name": "Adam", "lr": 1e-2}, tmp_path,
        model_init=lambda k, xx, aa: net.init(k, xx, aa),
        model_apply=lambda p, xx, aa: net.apply(p, xx, aa),
    )
    assert rs["mse"]["train_scores"][-1] < rs["mse"]["train_scores"][0]
    assert (tmp_path / "model_trained").exists()


def test_registries():
    from upgdm_tpu.models.registries import GraphNorm, gnn_act, gnn_norm, gnn_pool

    assert gnn_act("relu")(jnp.asarray([-1.0, 2.0]))[0] == 0
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 4)).astype(np.float32))
    mask = jnp.asarray([[True] * 5, [True, True, True, False, False]])
    mean_pool = gnn_pool("global_mean_pool")
    out = mean_pool(x, mask)
    assert out.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(x[1, :3].mean(axis=0)),
                               rtol=1e-5)
    add_pool = gnn_pool("sum")
    np.testing.assert_allclose(np.asarray(add_pool(x)), np.asarray(x.sum(axis=1)), rtol=1e-5)
    gn = gnn_norm("GraphNorm")
    params = jax.jit(gn.init)(jax.random.key(0), x)
    y = gn.apply(params, x, mask)
    assert y.shape == x.shape
    assert gnn_norm("identity")(x) is x
