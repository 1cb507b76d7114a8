"""Dataset builders: windowing, augmentation, graph layout, generators."""
import numpy as np
import pytest

from upgdm_tpu.utils import data_prep as DP


def test_unfold_windows_axis0():
    x = np.arange(20, dtype=np.float32).reshape(20, 1)
    w = DP.unfold_windows(x, 5, 3, axis=0)
    assert w.shape == ((20 - 5) // 3 + 1, 5, 1)
    np.testing.assert_array_equal(w[1, :, 0], np.arange(3, 8))


def test_flip_augment_modes():
    w = np.arange(6, dtype=np.float32).reshape(6, 1)
    both = DP.flip_augment(w, "*")
    assert len(both) == 2
    np.testing.assert_array_equal(both[0][:, 0], w[::-1, 0])
    inc = DP.flip_augment(w, "*_increase", file_name="foo_increase")
    assert len(inc) == 1 and inc[0] is w
    flipped = DP.flip_augment(w, "*_increase", file_name="foo_decrease")
    np.testing.assert_array_equal(flipped[0][:, 0], w[::-1, 0])


def test_pre_dataset_timeseries(tmp_path):
    from upgdm_tpu.utils.io import save_pt

    rec = {
        "ys_dynamic": np.random.default_rng(0).normal(size=(400, 2)).astype(np.float32),
        "ts_dynamic": np.arange(400, dtype=np.float32),
        "N_values": np.zeros(400, np.float32),
    }
    save_pt(rec, tmp_path / "SLBP_x_increase/rec.pt")
    out = DP.pre_dataset_timeseries(
        tmp_path, windows=16, pred_len=8, interval_step=50, sampling_t=0.1,
        STG_exist=False,
    )
    n = (400 - 24) // 50 + 1
    assert out.shape == (2 * n, 24, 2)  # flip augmentation doubles
    # STG_exist splits features into univariate rows
    out2 = DP.pre_dataset_timeseries(
        tmp_path, windows=16, pred_len=8, interval_step=50, sampling_t=0.1,
        STG_exist=True,
    )
    assert out2.shape == (2 * n * 2, 24, 1)


def test_pre_dataset_spdata(tmp_path):
    import networkx as nx

    from upgdm_tpu.data.graphs import save_graphml
    from upgdm_tpu.utils.io import save_pt

    gdir = tmp_path / "graphs"
    ddir = tmp_path / "spdata"
    for name, n_nodes in [("g_a", 5), ("g_b", 7)]:
        save_graphml(nx.path_graph(n_nodes), gdir / f"{name}.graphml")
        rec = {
            "ys_dynamic": np.random.default_rng(0).normal(size=(300, n_nodes)).astype(np.float32),
            "ts_dynamic": np.arange(300, dtype=np.float32),
            "tp_values": np.zeros(300, np.float32),
        }
        save_pt(rec, ddir / name / "sys_dynamic_increase.pt")
    x, adjs, gids = DP.pre_dataset_spdata(
        ddir, gdir, windows=16, pred_len=8, interval_step=40, sampling_t=0.1
    )
    n_per = (300 - 24) // 40 + 1
    assert x.shape == (2 * 2 * n_per, 7, 24, 1)  # padded to vmax=7, flip x2
    assert adjs.shape == (2, 7, 7)
    assert set(np.unique(gids)) == {0, 1}
    # padded nodes of the 5-node graph are zero
    first_graph_rows = x[gids == 0]
    assert np.all(first_graph_rows[:, 5:, :, :] == 0)
    assert adjs[0][5:, :].sum() == 0


def test_pre_dataset_spdata_rejects_nonfinite_record(tmp_path):
    """A part-NaN trajectory record must fail at data prep with the file
    named, not surface later as a NaN training loss (the flat-window
    builders drop such windows via their std guard; spatial batches would
    poison the whole DiffSTG run)."""
    import networkx as nx
    import pytest

    from upgdm_tpu.data.graphs import save_graphml
    from upgdm_tpu.utils.io import save_pt

    gdir = tmp_path / "graphs"
    ddir = tmp_path / "spdata"
    save_graphml(nx.path_graph(5), gdir / "g_a.graphml")
    ys = np.random.default_rng(0).normal(size=(300, 5)).astype(np.float32)
    ys[150:] = np.nan
    save_pt({"ys_dynamic": ys, "ts_dynamic": np.arange(300, dtype=np.float32),
             "tp_values": np.zeros(300, np.float32)},
            ddir / "g_a" / "sys_dynamic_increase.pt")
    with pytest.raises(ValueError, match="non-finite ys_dynamic.*g_a"):
        DP.pre_dataset_spdata(
            ddir, gdir, windows=16, pred_len=8, interval_step=40, sampling_t=0.1
        )


def test_graph_generators():
    from upgdm_tpu.data.graphs import gen_graph, generate_network

    g = gen_graph("barabasi_albert", 10, 15)
    import networkx as nx

    assert nx.is_connected(g)
    dg = generate_network("WS", 12, k=4, p=0.1, seed=0)
    assert dg.num_nodes == 12
    assert (dg.adj == dg.adj.T).all()
    assert np.diag(dg.adj).sum() == 0
