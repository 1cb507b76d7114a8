"""Correctness of the dense GNN convolutions and the de-stationary attention."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from upgdm_tpu.models import gnn as G


def _line_graph():
    # 0 - 1 - 2
    adj = np.zeros((3, 3), np.float32)
    adj[0, 1] = adj[1, 0] = adj[1, 2] = adj[2, 1] = 1
    return jnp.asarray(adj)


def test_gcn_normalization_hand_computed():
    adj = _line_graph()
    x = jnp.asarray(np.eye(3, 1, dtype=np.float32))  # features: e0 = [1,0,0]
    mod = G.GCNConv(1, bias=False)
    params = jax.jit(mod.init)(jax.random.key(0), x, adj)
    # set W = identity to expose the propagation matrix
    params = jax.tree.map(lambda p: jnp.ones_like(p), params)
    out = np.asarray(mod.apply(params, x, adj)).ravel()
    # A_hat = D^-1/2 (A+I) D^-1/2 with degrees (2,3,2)
    want = np.array([1 / 2, 1 / np.sqrt(6), 0.0])
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_graphconv_sum_aggregation():
    adj = _line_graph()
    x = jnp.asarray(np.array([[1.0], [2.0], [4.0]], np.float32))
    mod = G.GraphConv(1)
    params = jax.jit(mod.init)(jax.random.key(0), x, adj)
    params = jax.tree.map(lambda p: jnp.ones_like(p), params)
    # out_i = sum_j A_ij x_j (W_rel=1) + x_i (W_root=1) + bias(=1)
    out = np.asarray(mod.apply(params, x, adj)).ravel()
    np.testing.assert_allclose(out, [2 + 1 + 1, 5 + 2 + 1, 2 + 4 + 1], rtol=1e-5)


def test_sage_mean_aggregation():
    adj = _line_graph()
    x = jnp.asarray(np.array([[2.0], [4.0], [6.0]], np.float32))
    mod = G.SAGEConv(1, aggr="mean")
    params = jax.jit(mod.init)(jax.random.key(0), x, adj)
    params = jax.tree.map(lambda p: jnp.ones_like(p), params)
    out = np.asarray(mod.apply(params, x, adj)).ravel()
    # lin_l(mean_neigh)+bias(1) + lin_r(x): node0 neigh mean=4 -> 4+1+2
    np.testing.assert_allclose(out, [4 + 1 + 2, 4 + 1 + 4, 4 + 1 + 6], rtol=1e-5)


def test_gat_attention_is_neighbor_masked(rng):
    adj = _line_graph()
    x = jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32))
    mod = G.GATConv(4, heads=2, add_self_loops=False)
    params = jax.jit(mod.init)(jax.random.key(0), x, adj)
    out = mod.apply(params, x, adj)
    assert out.shape == (3, 8)
    # isolated node (zero adjacency row) must produce zero output (+bias)
    adj0 = jnp.zeros((3, 3))
    out0 = np.asarray(mod.apply(params, x, adj0))
    bias = np.asarray(params["params"]["bias"])
    np.testing.assert_allclose(out0, np.broadcast_to(bias, out0.shape), atol=1e-6)


def test_resgated_formula():
    adj = _line_graph()
    x = jnp.asarray(np.array([[1.0], [2.0], [3.0]], np.float32))
    mod = G.ResGatedGraphConv(1, bias=False)
    params = jax.jit(mod.init)(jax.random.key(1), x, adj)
    params = jax.tree.map(lambda p: jnp.ones_like(p), params)
    out = np.asarray(mod.apply(params, x, adj)).ravel()

    def sig(v):
        return 1 / (1 + np.exp(-v))

    # out_i = x_i + sum_j sigmoid(x_i + x_j) * x_j over neighbors
    want = np.array([
        1 + sig(1 + 2) * 2,
        2 + sig(2 + 1) * 1 + sig(2 + 3) * 3,
        3 + sig(3 + 2) * 2,
    ])
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_pna_mean_aggregation_hand_computed():
    adj = _line_graph()
    x = jnp.asarray(np.array([[1.0], [2.0], [4.0]], np.float32))
    # identity-only scaler, mean-only aggregator, unit weights everywhere:
    # pre(x_i||x_j) = x_i + x_j (+bias 1); post = x_i + mean_agg (+1); lin same
    mod = G.PNAConv(1, aggregators=("mean",), scalers=("identity",))
    params = jax.jit(mod.init)(jax.random.key(0), x, adj)
    params = jax.tree.map(lambda p: jnp.ones_like(p), params)
    out = np.asarray(mod.apply(params, x, adj)).ravel()
    # node0: mean_j pre = (1+2+1) = 4 -> post = 1+4+1 = 6 -> lin = 6+1 = 7
    # node1: mean over {0,2}: ((2+1+1)+(2+4+1))/2 = 5.5 -> 2+5.5+1=8.5 -> 9.5
    # node2: (4+2+1) = 7 -> 4+7+1 = 12 -> 13
    np.testing.assert_allclose(out, [7.0, 9.5, 13.0], rtol=1e-5)


def test_pna_degree_scalers_and_isolated_nodes(rng):
    adj = _line_graph()
    x = jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32))
    deg_hist = [0, 2, 1]  # 2 nodes of degree 1, 1 node of degree 2
    mod = G.PNAConv(8, deg=tuple(deg_hist))
    params = jax.jit(mod.init)(jax.random.key(0), x, adj)
    out = mod.apply(params, x, adj)
    assert out.shape == (3, 8)
    assert np.isfinite(np.asarray(out)).all()
    # amplification/attenuation must differ between degree-1 and degree-2 nodes
    x_same = jnp.broadcast_to(x[0], x.shape)  # identical features everywhere
    out_same = np.asarray(mod.apply(params, x_same, adj))
    assert np.abs(out_same[0] - out_same[1]).max() > 1e-5  # deg 1 vs deg 2
    np.testing.assert_allclose(out_same[0], out_same[2], atol=1e-5)  # both deg 1
    # isolated nodes: no inf leakage from masked min/max
    out0 = np.asarray(mod.apply(params, x, jnp.zeros((3, 3))))
    assert np.isfinite(out0).all()


def test_pna_towers_and_batched_adjacency(rng):
    adjs = jnp.asarray(np.stack([np.asarray(_line_graph()),
                                 np.eye(3, dtype=np.float32)]))
    x = jnp.asarray(rng.normal(size=(2, 3, 4)).astype(np.float32))
    mod = G.PNAConv(6, towers=2, divide_input=True,
                    aggregators=("mean", "sum", "var"))
    params = jax.jit(mod.init)(jax.random.key(0), x, adjs)
    out = mod.apply(params, x, adjs)
    assert out.shape == (2, 3, 6)
    assert np.isfinite(np.asarray(out)).all()


def test_registry_dispatches_pna_and_fgnn():
    mod = G.gnn_conv("PNAConv", 8, {"deg": np.array([0, 3, 1]), "towers": 2})
    assert isinstance(mod, G.PNAConv) and mod.towers == 2
    fgnn = G.gnn_conv("FGNNConv", 8, {"factor_dim": 4})
    from upgdm_tpu.models.fgnn import FGNNConv

    assert isinstance(fgnn, FGNNConv)
    with pytest.raises(ValueError):
        G.gnn_conv("NopeConv", 8)


def test_batched_adjacency_broadcast(rng):
    """Per-sample adjacency [B, V, V] against [B, V, C] features."""
    adjs = np.stack([np.asarray(_line_graph()), np.zeros((3, 3), np.float32)])
    x = jnp.asarray(rng.normal(size=(2, 3, 4)).astype(np.float32))
    mod = G.GCNConv(4)
    params = jax.jit(mod.init)(jax.random.key(0), x, jnp.asarray(adjs))
    out = mod.apply(params, x, jnp.asarray(adjs))
    assert out.shape == (2, 3, 4)


# ---------------------------------------------------------------------------


def test_ds_attention_causal_mask(rng):
    from upgdm_tpu.models.attention import AttentionLayer

    B, L, D = 2, 6, 8
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    mod = AttentionLayer(D, 2, mask_flag=True)
    params = jax.jit(mod.init)(jax.random.key(0), x, x, x)
    out1 = np.asarray(mod.apply(params, x, x, x))
    # perturbing the FUTURE must not change earlier outputs
    x2 = x.at[:, -1, :].add(100.0)
    out2 = np.asarray(mod.apply(params, x2, x2, x2))
    np.testing.assert_allclose(out1[:, :-1], out2[:, :-1], atol=1e-5)
    assert np.abs(out1[:, -1] - out2[:, -1]).max() > 1e-3


def test_ds_attention_tau_delta_effect(rng):
    from upgdm_tpu.models.attention import AttentionLayer

    B, L, D = 2, 5, 8
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    mod = AttentionLayer(D, 2)
    params = jax.jit(mod.init)(jax.random.key(0), x, x, x)
    base = np.asarray(mod.apply(params, x, x, x))
    tau = jnp.full((B, 1), 3.0)
    delta = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32)) * 2
    mod2 = mod.apply(params, x, x, x, tau=tau, delta=delta)
    assert np.abs(np.asarray(mod2) - base).max() > 1e-4
