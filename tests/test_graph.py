import numpy as np
import pytest

from bridged_gnn_tpu.graph import (
    add_self_loops_np,
    build_graph,
    coalesce_np,
    domain_split_np,
    graph_from_dict,
    merge_graphs_np,
    remove_self_loops_np,
    reorder_np,
    with_self_loops,
)


def random_graph_dict(rng, n=50, e=200, d=8, c=3):
    ei = rng.integers(0, n, size=(2, e))
    y = rng.integers(-1, c, size=n)
    central = np.zeros(n, dtype=bool)
    central[: n // 2] = True
    return dict(
        x=rng.normal(size=(n, d)).astype(np.float32),
        edge_index=ei,
        y=y,
        train_mask=rng.random(n) < 0.5,
        val_mask=np.zeros(n, dtype=bool),
        test_mask=np.zeros(n, dtype=bool),
        central_mask=central,
    )


def test_coalesce_sorted_unique(rng):
    ei = rng.integers(0, 20, size=(2, 300))
    out = coalesce_np(ei, 20)
    # sorted by (dst, src)
    key = out[1] * 20 + out[0]
    assert np.all(np.diff(key) > 0)
    # same edge set
    assert set(map(tuple, out.T)) == set(map(tuple, ei.T))


def test_self_loops():
    ei = np.array([[0, 1, 2, 2], [1, 1, 0, 2]])
    ei2 = remove_self_loops_np(ei)
    assert ei2.shape[1] == 2
    ei3 = add_self_loops_np(ei2, 4)
    assert ei3.shape[1] == 6
    assert np.sum(ei3[0] == ei3[1]) == 4


def test_build_graph_padding(rng):
    d = random_graph_dict(rng)
    g = graph_from_dict(d)
    assert g.num_nodes == 50
    assert g.num_nodes_padded % 8 == 0
    assert g.num_edges_padded % 128 == 0
    assert int(np.sum(np.asarray(g.edge_mask))) == 200
    # edges sorted by receiver
    recv = np.asarray(g.receivers)[np.asarray(g.edge_mask)]
    assert np.all(np.diff(recv) >= 0)
    # round trip edge set
    assert set(map(tuple, g.edge_index_np().T)) == set(
        map(tuple, d["edge_index"].T)
    )


def test_edge_capacity(rng):
    d = random_graph_dict(rng)
    g = graph_from_dict(d, edge_capacity=1000)
    assert g.num_edges_padded >= 1000
    assert g.num_edges == 200


def test_with_self_loops(rng):
    d = random_graph_dict(rng)
    g = graph_from_dict(d)
    g2 = with_self_loops(g)
    ei = g2.edge_index_np()
    n_loops = np.sum(ei[0] == ei[1])
    assert n_loops == g.num_nodes


def test_merge_reorder_roundtrip(rng):
    """domain_split → merge → reorder must reproduce the original node order."""
    d = random_graph_dict(rng, n=60, e=150)
    src, tar, m_src, m_tar = domain_split_np(d)
    # no cross edges proposed: merged graph = union of the two domain graphs
    merged = merge_graphs_np(
        src, tar, np.zeros((2, 0), dtype=np.int64)
    )
    out = reorder_np(merged, src["x"].shape[0], m_src, m_tar)
    np.testing.assert_allclose(out["x"], d["x"])
    np.testing.assert_array_equal(out["y"], d["y"])
    np.testing.assert_array_equal(out["central_mask"], d["central_mask"])
    # edge set must equal the intra-domain edges of the original graph
    central = d["central_mask"]
    ei = d["edge_index"]
    keep = (central[ei[0]] == central[ei[1]])
    expect = set(map(tuple, ei[:, keep].T))
    got = set(map(tuple, out["edge_index"].T))
    assert got == expect


def test_merge_masks(rng):
    d = random_graph_dict(rng)
    src, tar, _, _ = domain_split_np(d)
    tar["train_mask"][:3] = True
    tar["val_mask"][3:5] = True
    tar["test_mask"][5:9] = True
    merged = merge_graphs_np(src, tar, np.zeros((2, 0), dtype=np.int64))
    n_src = src["x"].shape[0]
    # all labeled source nodes are train; unlabeled (-1) are not
    assert np.array_equal(
        merged["train_mask"][:n_src], src["y"] != -1
    )
    assert merged["central_mask"][:n_src].all()
    assert not merged["central_mask"][n_src:].any()
    assert merged["val_mask"][n_src:].sum() == 2
    assert merged["test_mask"][n_src:].sum() == 4


def test_golden_graph_loads(a2d_dict):
    g = graph_from_dict(a2d_dict)
    assert g.num_nodes == 3408
    assert g.num_features == 256
    assert g.num_edges == 20824
    assert g.num_classes == 31
