"""Facebook100 pipeline tests on synthetic .mat fixtures.

The real FB100 raw data is absent from the archive (.MISSING_LARGE_BLOBS),
so these tests build small synthetic university .mat files with the exact
field layout the reference reads (scipy.io.loadmat of 'A' + 'local_info',
reference dataset_facebook100.py:121-141) and drive the full pipeline:
loading, one-hot encoding, ratio + count splits, the heterophily (gender
label) variant, the cross-network assembler, and the fb recipe dispatch
end-to-end.
"""

import os

import numpy as np
import pytest
import scipy.sparse as sp
from scipy.io import savemat

from bridged_gnn_tpu.data.facebook100 import (
    build_fb100_graph,
    count_based_split,
    facebook100_kt,
    load_fb100_mat,
    merge_fb_vsgraph,
    onehot_encode_columns,
)


def make_fake_univ_mat(path, n=120, num_classes=3, seed=0):
    """Synthetic <Univ>.mat: local_info columns are
    [status_flag, gender, major, minor, dorm, year, high_school]."""
    rng = np.random.default_rng(seed)
    # labels 1..num_classes (0 = missing, reference shifts by -1)
    flag = rng.integers(1, num_classes + 1, size=n)
    flag[rng.random(n) < 0.05] = 0
    gender = rng.integers(1, 3, size=n)
    gender[rng.random(n) < 0.1] = 0
    feats = rng.integers(0, 5, size=(n, 5))
    local_info = np.column_stack([flag, gender, feats]).astype(np.float64)
    dense = (rng.random((n, n)) < 0.05).astype(np.float64)
    np.fill_diagonal(dense, 0)
    savemat(path, {"A": sp.csr_matrix(dense), "local_info": local_info})
    return local_info


@pytest.fixture()
def univ_mats(tmp_path):
    p1 = os.path.join(tmp_path, "Hamilton46.mat")
    p2 = os.path.join(tmp_path, "Caltech36.mat")
    info1 = make_fake_univ_mat(p1, n=150, num_classes=3, seed=1)
    info2 = make_fake_univ_mat(p2, n=90, num_classes=3, seed=2)
    return p1, p2, info1, info2


def test_load_mat_flag_and_heterophily(univ_mats):
    p1, _, info1, _ = univ_mats
    d = load_fb100_mat(p1)
    assert d["x_raw"].shape == (150, 6)
    np.testing.assert_array_equal(d["y"], info1[:, 0].astype(np.int64) - 1)
    # symmetric-ish adjacency loaded as COO
    assert d["edge_index"].shape[0] == 2

    h = load_fb100_mat(p1, heterophily=True)
    np.testing.assert_array_equal(h["y"], info1[:, 1].astype(np.int64) - 1)
    assert h["x_raw"].shape == (150, 6)
    # heterophily features exclude the gender column but keep the flag
    np.testing.assert_array_equal(h["x_raw"][:, 0],
                                  info1[:, 0].astype(np.int64))


def test_ratio_split_partitions_each_class(univ_mats):
    p1 = univ_mats[0]
    d = build_fb100_graph(p1, split="random",
                          train_val_test_ratio=(0.6, 0.2, 0.2), seed=0)
    masks = d["train_mask"], d["val_mask"], d["test_mask"]
    # disjoint, and together cover every node of every class (incl. y=-1:
    # the reference splits all classes present, missing labels excluded)
    assert not (masks[0] & masks[1]).any()
    assert not (masks[0] & masks[2]).any()
    assert not (masks[1] & masks[2]).any()
    for c in range(int(d["y"].max()) + 1):
        sel = d["y"] == c
        covered = masks[0] | masks[1] | masks[2]
        assert covered[sel].all()
        n = sel.sum()
        assert masks[0][sel].sum() == int(np.ceil(n * 0.6))


def test_count_based_split(univ_mats):
    p1 = univ_mats[0]
    d = build_fb100_graph(
        p1, split="random", train_val_test_ratio=None,
        num_train_per_class=5, num_val=30, num_test=40, seed=0,
    )
    num_classes = int(d["y"].max()) + 1
    for c in range(num_classes):
        assert d["train_mask"][d["y"] == c].sum() == 5
    assert d["val_mask"].sum() == 30
    assert d["test_mask"].sum() == 40
    assert not (d["train_mask"] & (d["val_mask"] | d["test_mask"])).any()
    # num_test=None → remainder becomes test
    d2 = build_fb100_graph(
        p1, split="random", train_val_test_ratio=None,
        num_train_per_class=5, num_val=30, num_test=None, seed=0,
    )
    n = d2["x"].shape[0]
    assert (d2["train_mask"].sum() + d2["val_mask"].sum()
            + d2["test_mask"].sum()) == n


def test_count_split_torch_parity(univ_mats):
    """The count split reproduces the reference's torch draw order:
    one randperm per class over class members, then one over remainder."""
    import torch

    p1 = univ_mats[0]
    d = build_fb100_graph(
        p1, split="random", train_val_test_ratio=None,
        num_train_per_class=4, num_val=20, num_test=10, seed=7,
    )
    # replay the reference procedure by hand with the same seed
    raw = load_fb100_mat(p1)
    y = raw["y"]
    n = len(y)
    import random as _random

    _random.seed(7)
    np.random.seed(7)
    torch.manual_seed(7)
    train = np.zeros(n, dtype=bool)
    for c in range(int(y.max()) + 1):
        idx = np.where(y == c)[0]
        perm = torch.randperm(len(idx)).numpy()[:4]
        train[idx[perm]] = True
    remaining = np.where(~train)[0]
    remaining = remaining[torch.randperm(len(remaining)).numpy()]
    val = np.zeros(n, dtype=bool)
    test = np.zeros(n, dtype=bool)
    val[remaining[:20]] = True
    test[remaining[20:30]] = True
    np.testing.assert_array_equal(d["train_mask"], train)
    np.testing.assert_array_equal(d["val_mask"], val)
    np.testing.assert_array_equal(d["test_mask"], test)


def test_heterophily_graph_build(univ_mats):
    p1 = univ_mats[0]
    d = build_fb100_graph(p1, heterophily=True, to_onehot=True,
                          train_val_test_ratio=(0.6, 0.2, 0.2), seed=0)
    assert int(d["y"].max()) + 1 == 2  # gender: 2 classes
    # one-hot feature width = sum of per-column cardinalities
    raw = load_fb100_mat(p1, heterophily=True)
    want = sum(len(np.unique(raw["x_raw"][:, j])) for j in range(6))
    assert d["x"].shape[1] == want


def test_cross_network_assembler(univ_mats):
    p1, p2, _, _ = univ_mats
    src, tar = facebook100_kt(p1, p2, to_onehot=True,
                              min_sample_per_cls=10, seed=0)
    # joint one-hot: same feature width both domains
    assert src["x"].shape[1] == tar["x"].shape[1]
    # surviving labels contiguous from 0; removed → -1
    for d in (src, tar):
        labels = np.unique(d["y"])
        labels = labels[labels >= 0]
        np.testing.assert_array_equal(labels, np.arange(len(labels)))
    # onehot is over the union of both domains' categories
    merged = merge_fb_vsgraph(src, tar)
    assert merged["central_mask"].sum() == src["x"].shape[0]
    assert merged["x"].shape[0] == src["x"].shape[0] + tar["x"].shape[0]


def test_fb_recipe_end_to_end(tmp_path):
    """The fb_hamilton2caltech recipe runs from raw .mat fixtures through
    prepare_datasets → stage-1 → bridge → stage-2 (VERDICT r1 item 5)."""
    from bridged_gnn_tpu.bridge import gen_bridged_graph
    from bridged_gnn_tpu.data import prepare_datasets
    from bridged_gnn_tpu.graph import graph_from_dict
    from bridged_gnn_tpu.train.stage1 import Stage1Config, train_adversarial
    from bridged_gnn_tpu.train.stage2 import Stage2Config, train_ktgnn

    mat_dir = os.path.join(tmp_path, "facebook100")
    os.makedirs(mat_dir)
    make_fake_univ_mat(os.path.join(mat_dir, "Hamilton46.mat"),
                       n=150, num_classes=3, seed=1)
    make_fake_univ_mat(os.path.join(mat_dir, "Caltech36.mat"),
                       n=90, num_classes=3, seed=2)
    src, tar, data, m_src, m_tar = prepare_datasets(
        "fb_hamilton2caltech", data_root=str(tmp_path)
    )
    assert data["central_mask"].sum() == 150
    cfg1 = Stage1Config(hidden_dim=16, num_epoch=8, start_eval_epoch=4,
                        eval_per_epoch=2, sample_size=900,
                        eval_sample_size=900, sim_mode="mlp",
                        backbone="mlp")
    res1 = train_adversarial(src, tar, cfg1)
    g_src, g_tar = graph_from_dict(src), graph_from_dict(tar)
    # fb recipe flags: k_within 0, k_cross 50, thres_feat_sim 0.0
    # (reference run.sh:21-31)
    merged = gen_bridged_graph(
        res1["model"], res1["variables"], g_src, None, g_tar, None,
        m_src, m_tar, k_cross=50, k_within=0, check_cross=True,
        thres_conf_quantile=0.1, thres_feat_sim=0.0, sim_mode="mlp",
        row_block=64,
    )
    assert merged["x"].shape[0] == data["x"].shape[0]
    res2 = train_ktgnn(merged, Stage2Config(num_epoch=5, hidden=16,
                                            to_undirected=True))
    assert np.isfinite(res2["best"]["loss"])
