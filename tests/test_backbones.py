"""Every baseline model must train a few steps and improve its loss."""

import numpy as np
import pytest

from bridged_gnn_tpu.data.synthetic import make_sync_dataset
from bridged_gnn_tpu.train.stage2 import Stage2Config, train_ktgnn

MODELS = ["MLP", "GCN", "GraphSAGE", "GAT", "GATv2", "GIN", "JKNet",
          "APPNP", "GCN2", "DeeperGCN"]


@pytest.fixture(scope="module")
def data():
    d = make_sync_dataset("relational-intra", n_src=150, n_tar=100, dim=12,
                          num_classes=3, seed=1)
    rng = np.random.default_rng(0)
    n = d["x"].shape[0]
    r = rng.random(n)
    d["train_mask"] = r < 0.6
    d["val_mask"] = (r >= 0.6) & (r < 0.8)
    d["test_mask"] = r >= 0.8
    return d


@pytest.mark.parametrize("model", MODELS)
def test_backbone_trains(data, model):
    cfg = Stage2Config(
        model_name=model, num_epoch=40, hidden=16, use_scheduler=False,
        to_undirected=True,
    )
    res = train_ktgnn(data, cfg)
    losses = [h["loss"] for h in res["history"]]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # propagation-heavy models need more epochs than this smoke test runs
    # to beat chance on the tiny synthetic graph; check signal for the rest
    if model not in ("APPNP", "GCN2", "DeeperGCN"):
        assert res["best"]["test"] > 0.25


def test_ktgnn_nodtc_trains(data):
    cfg = Stage2Config(no_dtc=True, num_epoch=15, hidden=16,
                       use_scheduler=False, to_undirected=True)
    res = train_ktgnn(data, cfg)
    losses = [h["loss"] for h in res["history"]]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


def test_stage1_gnn_backbone_trains(data):
    """v1 family: SAGE GraphEncoder backbone + cosine similarity head."""
    from bridged_gnn_tpu.data import dataset_conversion
    from bridged_gnn_tpu.train.stage1 import Stage1Config, train_adversarial

    src, tar, _, _ = dataset_conversion(dict(data), seed=1, split_data=True)
    cfg = Stage1Config(
        hidden_dim=16, num_epoch=8, start_eval_epoch=6, eval_per_epoch=2,
        max_class_num=3, sample_size=900, eval_sample_size=900,
        sim_mode="cosine", backbone="gnn", norm_mode="PN",
    )
    res = train_adversarial(src, tar, cfg)
    assert res["best"]["epoch"] > 0


def test_row_norm_weights(rng):
    """row_norm_weights = 1/deg(dst) on real edges (reference
    adj_norm(norm='row'), models/backbones.py:521-539)."""
    import numpy as np

    from bridged_gnn_tpu.graph import build_graph
    from bridged_gnn_tpu.nn.backbones import row_norm_weights
    from bridged_gnn_tpu.ops.spmm import adjacency_from_graph

    n, e = 20, 60
    s = rng.integers(0, n, size=e).astype(np.int64)
    r = rng.integers(0, n, size=e).astype(np.int64)
    x = rng.normal(size=(n, 4)).astype(np.float32)
    g = build_graph(x, np.stack([s, r]))
    adj = adjacency_from_graph(g, method="gather")
    w = np.asarray(row_norm_weights(adj))
    deg = np.zeros(g.num_nodes_padded)
    rr = np.asarray(adj.receivers)
    em = np.asarray(adj.edge_mask)
    for i in range(len(rr)):
        if em[i]:
            deg[rr[i]] += 1
    for i in range(len(rr)):
        want = 1.0 / deg[rr[i]] if em[i] and deg[rr[i]] > 0 else 0.0
        np.testing.assert_allclose(w[i], want, rtol=1e-6)
