"""DiffSTG importer validation.

The reference ships no DiffSTG weights and its UGnet imports torch_geometric
(absent here), so validation is two-level: (1) every tensor-layout transform
is checked against the REAL torch op it converts (Conv2d (3,k)+Chomp on
height-1 inputs vs our causal 1-D TCN, the (1,T+1) down/up-sampling pair,
ConvTranspose2d stride-2, 1x1 convs, LayerNorm([1,C])); (2) the full key map
covers a reference-shaped state dict exactly and strict-loads into the model.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

NET_PARAM = dict(
    T_h=8, T_p=8, F=1, diffusion_steps=10, inference_diffusion_steps=3,
    diffusion_schedule="linear", scaler_type=None, d_h=4, Td_h=8,
    channel_multipliers=[1, 2], n_blocks=2, gnn_name="GCNConv",
    parallel_sampling=2, sequential_sampling=2, init_num_nodes=6,
    task_model="DiffSTG",
)


def _to4d(x):  # [N, T, C] -> torch [N, C, 1, T]
    return torch.from_numpy(x).permute(0, 2, 1).unsqueeze(2)


def _from4d(y):  # torch [N, C, 1, T] -> [N, T, C]
    return y.squeeze(2).permute(0, 2, 1).detach().numpy()


def test_tcn_conv2d_midrow_transform():
    """torch Conv2d((3,k), padding=(1,pad)) + Chomp on [N, C, 1, T] equals our
    causal 1-D conv with the mid-row kernel slice."""
    from upgdm_tpu.models.ugnet import TcnBlock
    from upgdm_tpu.utils.torch_import import _T

    rng = np.random.default_rng(0)
    N, T, c_in, c_out, k = 3, 12, 4, 6, 3
    x = rng.normal(size=(N, T, c_in)).astype(np.float32)
    conv = torch.nn.Conv2d(c_in, c_out, (3, k), padding=(1, k - 1))
    short = torch.nn.Conv2d(c_in, c_out, (1, 1))
    with torch.no_grad():
        h = conv(_to4d(x))[..., : T]  # Chomp removes trailing pad
        ref = _from4d(h + short(_to4d(x)))

    blk = TcnBlock(c_out, k)
    params = {"params": {
        "Conv_0": {"kernel": _T["conv2d_midrow"](conv.weight.detach().numpy()),
                   "bias": conv.bias.detach().numpy()},
        "shortcut": {"kernel": _T["conv2d_1x1"](short.weight.detach().numpy()),
                     "bias": short.bias.detach().numpy()},
    }}
    ours = np.asarray(blk.apply(params, x[:, None]))[:, 0]  # add/remove V axis
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_downsampling_conv_transform():
    """torch Conv2d((1, T+1), padding=(0, Td//2)) maps T -> Td like our
    TimeConv with explicit padding."""
    from upgdm_tpu.models.ugnet import TimeConv
    from upgdm_tpu.utils.torch_import import _T

    rng = np.random.default_rng(1)
    N, T, C, Td = 2, 16, 4, 8
    x = rng.normal(size=(N, T, C)).astype(np.float32)
    conv = torch.nn.Conv2d(C, C, (1, T + 1), padding=(0, Td // 2))
    with torch.no_grad():
        ref = _from4d(conv(_to4d(x)))
    mod = TimeConv(C, T + 1, pad_left=Td // 2, pad_right=Td // 2)
    params = {"params": {"Conv_0": {
        "kernel": _T["conv2d_midrow"](conv.weight.detach().numpy()),
        "bias": conv.bias.detach().numpy()}}}
    ours = np.asarray(mod.apply(params, x[:, None]))[:, 0]
    assert ours.shape == ref.shape == (N, Td, C)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("k,s,p,T", [(17, 1, 4, 8), (4, 2, 1, 8)])
def test_convtranspose_transform(k, s, p, T):
    """torch ConvTranspose2d((1,k),(1,s),(0,p)) equals our TimeConvTranspose
    with the kernel flipped along time."""
    from upgdm_tpu.models.ugnet import TimeConvTranspose
    from upgdm_tpu.utils.torch_import import _T

    rng = np.random.default_rng(2)
    N, C = 2, 4
    x = rng.normal(size=(N, T, C)).astype(np.float32)
    conv = torch.nn.ConvTranspose2d(C, C, (1, k), (1, s), (0, p))
    with torch.no_grad():
        ref = _from4d(conv(_to4d(x)))
    mod = TimeConvTranspose(C, k, s, p)
    params = {"params": {
        "kernel": _T["convtranspose2d_time"](conv.weight.detach().numpy()),
        "bias": conv.bias.detach().numpy()}}
    ours = np.asarray(mod.apply(params, x[:, None]))[:, 0]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_layernorm_1c_transform():
    """torch LayerNorm([1, C]) on [N, T, 1, C] equals our channel LayerNorm."""
    import flax.linen as fnn

    from upgdm_tpu.utils.torch_import import _T

    rng = np.random.default_rng(3)
    N, T, C = 2, 6, 4
    x = rng.normal(size=(N, T, C)).astype(np.float32)
    ln = torch.nn.LayerNorm([1, C])
    with torch.no_grad():
        ln.weight.uniform_(0.5, 1.5)
        ln.bias.normal_()
        ref = ln(torch.from_numpy(x).unsqueeze(2)).squeeze(2).numpy()
    ours = fnn.LayerNorm(epsilon=1e-5).apply(
        {"params": {"scale": _T["squeeze_copy"](ln.weight.detach().numpy()),
                    "bias": _T["squeeze_copy"](ln.bias.detach().numpy())}}, x)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-6)


def test_diffstg_full_map_strict_load():
    """The generated key map covers our whole UGnet param tree 1:1, and a
    reference-shaped checkpoint strict-loads and samples finitely."""
    from upgdm_tpu.models.diffstg import DiffSTGModel
    from upgdm_tpu.utils.io import flatten_params
    from upgdm_tpu.utils.torch_import import _T, diffstg_reference_key_map

    model = DiffSTGModel(dict(NET_PARAM))
    key_map = diffstg_reference_key_map(NET_PARAM)
    flat = flatten_params(model.params)
    mapped_dsts = {dst for dst, _tf in key_map.values()}
    assert mapped_dsts == set(flat), (
        sorted(mapped_dsts - set(flat))[:5], sorted(set(flat) - mapped_dsts)[:5])

    # synthesize a reference-layout dict via per-transform inverses
    inv = {
        "linear": lambda a: np.asarray(a).T,
        "copy": lambda a: np.asarray(a),
        "squeeze_copy": lambda a: np.asarray(a)[None, :],
        "conv2d_1x1": lambda a: np.asarray(a).T[:, :, None, None],
        "conv2d_midrow": lambda a: np.stack(
            [np.zeros_like(np.asarray(a).transpose(2, 1, 0)),
             np.asarray(a).transpose(2, 1, 0),
             np.zeros_like(np.asarray(a).transpose(2, 1, 0))], axis=2
        ) if np.asarray(a).shape[0] == 3 else np.asarray(a).transpose(2, 1, 0)[:, :, None, :],
        "convtranspose2d_time": lambda a: np.asarray(a)[::-1].transpose(1, 2, 0)[:, :, None, :],
    }
    rng = np.random.default_rng(0)
    sd = {}
    for torch_key, (dst, tf) in key_map.items():
        target = flat[dst]
        sd[torch_key] = inv[tf](rng.normal(size=target.shape).astype(np.float32) * 0.05)
    sd["scaler_mean"] = np.zeros(1, np.float32)
    sd["scaler_std"] = np.ones(1, np.float32)
    model.load_state_dict(sd)
    # round-trip: converted values match what we synthesized
    for torch_key, (dst, tf) in key_map.items():
        np.testing.assert_allclose(
            flatten_params(model.params)[dst], _T[tf](sd[torch_key]), atol=1e-7)

    adj = (rng.uniform(size=(6, 6)) < 0.4).astype(np.float32)
    adj = ((adj + adj.T) > 0).astype(np.float32)
    x = rng.normal(size=(6, 8, 1)).astype(np.float32)
    outs, _ = model.evaluation_step({"x": x, "adj": adj})
    assert np.isfinite(np.asarray(outs)).all()
