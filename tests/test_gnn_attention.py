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
