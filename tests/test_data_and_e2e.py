"""Dataset pipeline tests + the full two-stage pipeline on synthetic data."""

import numpy as np
import pytest

from bridged_gnn_tpu.data import (
    dataset_conversion,
    make_sync_dataset,
    prepare_datasets,
)
from bridged_gnn_tpu.utils import eval_bridged_graph, eval_homophily
from bridged_gnn_tpu.utils.sanitizers import (
    assert_all_finite,
    check_determinism,
)


def test_sync_ud_structure():
    d = make_sync_dataset("unrelational", n_src=200, n_tar=150, dim=16,
                          num_classes=3)
    assert d["x"].shape == (350, 16)
    assert d["central_mask"].sum() == 200
    # UD: self loops only
    assert np.array_equal(d["edge_index"][0], d["edge_index"][1])


def test_sync_rd_homophily():
    d = make_sync_dataset("relational-intra", n_src=400, n_tar=300, dim=16,
                          num_classes=3, homophily=0.7, avg_degree=6)
    h1, _ = eval_homophily(d)
    # expected homophily ≈ 0.7 + (1-0.7)/C
    assert 0.65 < h1 < 0.9
    # intra-domain only
    ei, c = d["edge_index"], d["central_mask"]
    assert (c[ei[0]] == c[ei[1]]).all()


def test_dataset_conversion_splits():
    d = make_sync_dataset("relational-intra", n_src=300, n_tar=200, dim=8,
                          num_classes=3)
    src, tar, m_src, m_tar = dataset_conversion(d, seed=1, split_data=True)
    # disjoint masks covering all labeled nodes
    for g in (src, tar):
        assert not (g["train_mask"] & g["val_mask"]).any()
        assert not (g["train_mask"] & g["test_mask"]).any()
        assert not (g["val_mask"] & g["test_mask"]).any()
        covered = g["train_mask"] | g["val_mask"] | g["test_mask"]
        assert np.array_equal(covered, g["y"] != -1)
    # ratio roughly 60/20/20
    n = src["train_mask"].sum() + src["val_mask"].sum() + src["test_mask"].sum()
    assert src["train_mask"].sum() / n > 0.55
    # mappers invert correctly
    assert all(d["central_mask"][orig] for orig in m_src)
    assert all(not d["central_mask"][orig] for orig in m_tar)


def test_prepare_datasets_sync():
    src, tar, data, m_src, m_tar = prepare_datasets("sync_unrelational",
                                                    data_root="/tmp")
    assert src["x"].shape[0] + tar["x"].shape[0] == data["x"].shape[0]
    # UD: per-domain graphs carry only self loops
    assert np.array_equal(src["edge_index"][0], src["edge_index"][1])


@pytest.mark.slow
def test_two_stage_pipeline_synthetic():
    """stage-1 train → bridge → stage-2 KTGNN, asserting the bridged graph
    transfers signal (test F1 well above chance)."""
    from bridged_gnn_tpu.bridge import gen_bridged_graph
    from bridged_gnn_tpu.graph import graph_from_dict
    from bridged_gnn_tpu.train.stage1 import Stage1Config, train_adversarial
    from bridged_gnn_tpu.train.stage2 import Stage2Config, train_ktgnn

    src, tar, data, m_src, m_tar = prepare_datasets("sync_relational-intra",
                                                    data_root="/tmp")
    cfg1 = Stage1Config(
        hidden_dim=32, num_epoch=40, start_eval_epoch=30, eval_per_epoch=5,
        max_class_num=4, sample_size=4900, eval_sample_size=4000,
        sim_mode="mlp", backbone="mlp",
    )
    res1 = train_adversarial(src, tar, cfg1)
    # sanitizers guard the e2e path: trained weights must be finite
    assert_all_finite(res1["variables"], "stage1 variables")
    g_src, g_tar = graph_from_dict(src), graph_from_dict(tar)
    merged = gen_bridged_graph(
        res1["model"], res1["variables"], g_src, None, g_tar, None,
        m_src, m_tar, k_cross=8, k_within=0, check_cross=True,
        thres_conf_quantile=0.1, thres_feat_sim=0.0, sim_mode="mlp",
        row_block=128,
    )
    assert merged["x"].shape[0] == data["x"].shape[0]
    cfg2 = Stage2Config(num_epoch=60, to_undirected=True, hidden=32)
    res2 = train_ktgnn(merged, cfg2)
    assert res2["best"]["test"] > 0.4  # 4 classes, chance ≈ 0.25
    assert_all_finite(
        {"params": res2["params"], "batch_stats": res2["batch_stats"]},
        "stage2 state",
    )
    # per-step timing flowed into the results (utils.profiling.StepTimer)
    assert res2["throughput"]["steps"] == 60
    assert res2["throughput"]["edges_per_sec"] > 0


def test_stage2_forward_deterministic():
    """check_determinism on the jitted stage-2 eval forward: bit-identical
    outputs across runs (sorted-segment reductions, no atomics)."""
    import jax

    from bridged_gnn_tpu.graph import graph_from_dict, with_self_loops
    from bridged_gnn_tpu.nn.ktgnn import KTGNN
    from bridged_gnn_tpu.ops.spmm import adjacency_from_graph

    src, tar, data, _, _ = prepare_datasets("sync_relational-intra",
                                            data_root="/tmp")
    g = with_self_loops(graph_from_dict(data))
    adj = adjacency_from_graph(g)
    model = KTGNN(num_classes=int(data["y"].max()) + 1, hidden=16)
    variables = model.init(jax.random.PRNGKey(0), g, adj)
    fwd = jax.jit(
        lambda v: model.apply(v, g, adj)[:3]  # drop loss_dist (None)
    )
    check_determinism(fwd, variables)


def test_stage2_kernel_layout_gating(monkeypatch):
    """nb=128 slot layout only when the Mosaic auto-policy is active AND
    the model is KTGNN-family; zoo backbones keep the nb=256 layout."""
    import numpy as np

    from bridged_gnn_tpu.data.synthetic import make_sync_dataset
    from bridged_gnn_tpu.ops import pallas_fused
    from bridged_gnn_tpu.train.stage2 import Stage2Config, prepare_stage2_graph

    d = make_sync_dataset("relational-intra", n_src=120, n_tar=80, dim=8,
                          num_classes=3, seed=0)
    n = d["x"].shape[0]
    r = np.random.default_rng(0).random(n)
    d["train_mask"] = r < 0.6
    d["val_mask"] = (r >= 0.6) & (r < 0.8)
    d["test_mask"] = r >= 0.8

    def prep(model, auto):
        monkeypatch.setattr(pallas_fused, "auto_kernel", lambda: auto)
        cfg = Stage2Config(model_name=model, adjacency_method="blocked")
        _, adj = prepare_stage2_graph(dict(d), cfg)
        # the kernel consumes the fast_fn slot layout (lay_dst), not the
        # lax.map block meta
        return adj.fast_fn.lay_dst.node_block

    assert prep("KTGNN", True) == 128
    assert prep("KTGNN", False) == 256
    assert prep("GraphSAGE", True) == 256   # zoo model: tuned XLA layout
    assert prep("KTGNN_noDTC", True) == 128
