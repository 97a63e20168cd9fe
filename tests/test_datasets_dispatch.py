"""Named-dataset dispatcher with synthetic raw files on disk."""

import os

import numpy as np
import pytest

from bridged_gnn_tpu.data import prepare_datasets


def _write_raw(root, n=80, d=320, c=3):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    y = rng.integers(-1, c, size=n).astype(np.int64)
    central = np.zeros(n, dtype=bool)
    central[: n // 3] = True
    np.save(os.path.join(root, "X.npy"),
            rng.normal(size=(n, d)).astype(np.float32))
    np.save(os.path.join(root, "Y.npy"), y)
    np.save(os.path.join(root, "central_mask.npy"), central)
    np.save(os.path.join(root, "edge_index.npy"),
            rng.integers(0, n, size=(2, 200)).astype(np.int64))
    return y, central


def test_twitter_unrelational_dispatch(tmp_path):
    root = tmp_path / "twitter_observed" / "raw"
    y, central = _write_raw(str(root))
    src, tar, data, m_src, m_tar = prepare_datasets(
        "twitter_unrelational", data_root=str(tmp_path)
    )
    # observed prefix: 300 dims
    assert data["x"].shape[1] == 300
    # UD: self loops only in both domain graphs
    assert np.array_equal(src["edge_index"][0], src["edge_index"][1])
    # source domain == central nodes
    assert src["x"].shape[0] == central.sum()
    # splits cover labeled nodes
    covered = src["train_mask"] | src["val_mask"] | src["test_mask"]
    assert np.array_equal(covered, src["y"] != -1)


def test_twitter_relational_dispatch(tmp_path):
    root = tmp_path / "twitter_observed" / "raw"
    _write_raw(str(root))
    src, tar, data, _, _ = prepare_datasets(
        "twitter_relational_intra_inter", data_root=str(tmp_path)
    )
    ei = data["edge_index"]
    n = data["x"].shape[0]
    # self loops present for every node
    assert np.isin(np.arange(n), ei[0][ei[0] == ei[1]]).all()
    # undirected (excluding the appended self loops): every non-loop edge
    # has its reverse
    nl = ei[:, ei[0] != ei[1]]
    s = set(map(tuple, nl.T))
    assert all((b, a) in s for a, b in s)


def test_company_dispatch(tmp_path):
    root = tmp_path / "company_observed" / "raw"
    _write_raw(str(root), d=64)
    src, tar, data, _, _ = prepare_datasets(
        "company_relational", data_root=str(tmp_path)
    )
    # company observed prefix: 33 dims
    assert data["x"].shape[1] == 33
    assert tar["x"].shape[1] == 33
