"""Stage-1 node-sharded encode (VERDICT r4 #7): ``Stage1Config.n_shards``
places both domain graphs row-sharded over the virtual mesh
(parallel/gspmd.shard_stage1_graph) and runs the UNMODIFIED jitted steps
under GSPMD. Training must be loss-identical to single-device (same host
RNG stream, same math — only the partitioning differs)."""

import numpy as np
import pytest

from bridged_gnn_tpu.data import dataset_conversion
from bridged_gnn_tpu.data.synthetic import make_sync_dataset
from bridged_gnn_tpu.train.stage1 import Stage1Config, train_adversarial

CFG = dict(
    hidden_dim=8, num_epoch=4, start_eval_epoch=2, eval_per_epoch=2,
    sample_size=300, eval_sample_size=300, max_class_num=3,
    eval_mode="sampling", seed=0, verbose=False,
)


@pytest.fixture(scope="module")
def domains():
    data = make_sync_dataset("relational-intra", n_src=80, n_tar=60,
                             dim=10, num_classes=3, seed=7)
    return dataset_conversion(dict(data), seed=0)[:2]


@pytest.fixture(scope="module")
def single(domains):
    src, tar = domains
    return train_adversarial(dict(src), dict(tar), Stage1Config(**CFG))


def test_sharded_stage1_matches_single_device(domains, single):
    src, tar = domains
    res = train_adversarial(dict(src), dict(tar),
                            Stage1Config(**CFG, n_shards=4))
    # identical host RNG stream + identical math -> identical best
    # epoch and identical (f1, auc, acc) triples per split
    assert res["best"]["epoch"] == single["best"]["epoch"]
    for split in ("train", "val", "test"):
        np.testing.assert_allclose(
            np.asarray(res["best"][split], dtype=np.float64),
            np.asarray(single["best"][split], dtype=np.float64),
            rtol=1e-4, atol=1e-5,
        )


def test_sharded_stage1_gnn_backbone_matches_single_device(domains):
    """The SAGE graph-encode path (the memory-heavy encode this sharding
    exists for): gather adjacency replicated, node rows sharded —
    scores must still match single-device exactly."""
    src, tar = domains
    cfg_kw = dict(CFG, backbone="gnn", num_epoch=2, start_eval_epoch=1,
                  eval_per_epoch=1)
    ref = train_adversarial(dict(src), dict(tar), Stage1Config(**cfg_kw))
    res = train_adversarial(dict(src), dict(tar),
                            Stage1Config(**cfg_kw, n_shards=4))
    assert res["best"]["epoch"] == ref["best"]["epoch"]
    for split in ("train", "val", "test"):
        np.testing.assert_allclose(
            np.asarray(res["best"][split], dtype=np.float64),
            np.asarray(ref["best"][split], dtype=np.float64),
            rtol=1e-4, atol=1e-5,
        )


def test_sharded_stage1_rejects_device_sampling(domains):
    src, tar = domains
    with pytest.raises(ValueError, match="n_shards"):
        train_adversarial(
            dict(src), dict(tar),
            Stage1Config(**CFG, n_shards=4, device_sampling=True,
                         scan_epochs=2),
        )


def test_repad_graph_nodes_semantics():
    """Extending node padding must not change aggregation results."""
    from bridged_gnn_tpu.graph import graph_from_dict
    from bridged_gnn_tpu.ops.spmm import adjacency_from_graph, spmm
    from bridged_gnn_tpu.parallel.gspmd import repad_graph_nodes

    rng = np.random.default_rng(1)
    n = 20
    data = dict(
        x=rng.normal(size=(n, 6)).astype(np.float32),
        edge_index=rng.integers(0, n, size=(2, 50)),
        y=rng.integers(0, 3, size=n),
    )
    g = graph_from_dict(data)
    g2 = repad_graph_nodes(g, 64)
    assert g2.num_nodes_padded % 64 == 0
    adj = adjacency_from_graph(g, method="gather")
    adj2 = adjacency_from_graph(g2, method="gather")
    out = np.asarray(spmm(adj, g.x))[:n]
    out2 = np.asarray(spmm(adj2, g2.x))[:n]
    np.testing.assert_allclose(out2, out, rtol=1e-6)
