"""Multi-device stage-2 runtime tests (VERDICT r3 item 1).

``train_ktgnn(cfg with n_shards=8)`` must be the SAME runtime as the
single-device run — eval heads, best-by-loss_clf_t2 selection, scan
mode, checkpoint/resume — with the graph partitioned over the virtual
8-device CPU mesh. Single-device is the n_shards=1 degenerate case of
the same code path (SURVEY §7.1-6).
"""

import jax
import numpy as np
import pytest

from bridged_gnn_tpu.train.stage2 import Stage2Config, train_ktgnn


def make_data(rng, n=120, e=600, d=16, c=4):
    ei = rng.integers(0, n, size=(2, e))
    central = np.zeros(n, dtype=bool)
    central[rng.permutation(n)[: n // 2]] = True
    val = np.zeros(n, dtype=bool)
    test = np.zeros(n, dtype=bool)
    val[~central] = rng.random(int((~central).sum())) < 0.3
    test[~central & ~val] = True
    return dict(
        x=rng.normal(size=(n, d)).astype(np.float32),
        edge_index=ei,
        y=rng.integers(0, c, size=n),
        train_mask=rng.random(n) < 0.5,
        val_mask=val,
        test_mask=test,
        central_mask=central,
    )


BASE = dict(hidden=16, num_epoch=10, dropout=0.0, log_every=0)


@pytest.fixture(scope="module")
def data():
    return make_data(np.random.default_rng(0))


@pytest.fixture(scope="module")
def single(data):
    return train_ktgnn(dict(data), Stage2Config(**BASE))


def assert_history_matches(res, single, rtol=2e-4):
    l1 = [h["loss"] for h in single["history"]]
    l2 = [h["loss"] for h in res["history"]]
    np.testing.assert_allclose(l2, l1, rtol=rtol)
    # identical eval trajectory → identical best epoch + scores
    assert res["best"]["epoch"] == single["best"]["epoch"]
    for k in ("train", "val", "test"):
        assert abs(res["best"][k] - single["best"][k]) < 1e-6
    assert abs(res["best"]["loss"] - single["best"]["loss"]) < 1e-3


def test_halo_runtime_matches_single_device(data, single):
    """Per-epoch loop on the halo row partition: loss history exact
    (fp-reduction tolerance), best selection identical."""
    res = train_ktgnn(dict(data), Stage2Config(**BASE, n_shards=8))
    assert_history_matches(res, single)
    # per-head test scores recorded at the best epoch, like single-device
    assert set(res["best"]["per_head"]) == {"source", "target",
                                            "target_hat"}


def test_halo_runtime_scan_mode(data, single):
    """scan_epochs>0 runs epochs device-side under shard_map + lax.scan
    with psum'd confusion counts — history still exact."""
    res = train_ktgnn(
        dict(data), Stage2Config(**BASE, n_shards=8, scan_epochs=4)
    )
    assert_history_matches(res, single)


def test_edgeshard_runtime_matches_single_device(data, single):
    res = train_ktgnn(
        dict(data),
        Stage2Config(**BASE, n_shards=8, shard_layout="edgeshard"),
    )
    assert_history_matches(res, single)


def test_halo_overlap_runtime(data, single):
    """Overlap layout is numerically equal up to fp reduction order
    (streaming-softmax combine), not bit-identical."""
    res = train_ktgnn(
        dict(data), Stage2Config(**BASE, n_shards=8, halo_overlap=True)
    )
    l1 = [h["loss"] for h in single["history"]]
    l2 = [h["loss"] for h in res["history"]]
    np.testing.assert_allclose(l2, l1, rtol=5e-3)


def test_sharded_resume_mid_run(data, tmp_path):
    """Checkpoint at epoch 5, resume to 10 — state-exact vs the straight
    run (same guarantee as the single-device resume test)."""
    ck = str(tmp_path / "ck")
    cfg_full = Stage2Config(**BASE, n_shards=8, ckpt_dir=ck + "_full",
                            ckpt_every=5)
    full = train_ktgnn(dict(data), cfg_full)

    import dataclasses

    cfg_a = dataclasses.replace(cfg_full, num_epoch=5, ckpt_dir=ck)
    train_ktgnn(dict(data), cfg_a)
    cfg_b = dataclasses.replace(cfg_full, ckpt_dir=ck, resume=True)
    resumed = train_ktgnn(dict(data), cfg_b)

    assert len(resumed["history"]) == 5  # epochs 6..10 only
    l_full = [h["loss"] for h in full["history"][5:]]
    l_res = [h["loss"] for h in resumed["history"]]
    np.testing.assert_allclose(l_res, l_full, rtol=1e-5)
    assert resumed["best"]["epoch"] == full["best"]["epoch"]
    for a, b in zip(
        jax.tree_util.tree_leaves(resumed["params"]),
        jax.tree_util.tree_leaves(full["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6)


def test_sharded_trains_with_dropout(data):
    """Production config (dropout on, scheduler on): the sharded runtime
    trains — loss decreases and eval metrics are sane."""
    cfg = Stage2Config(hidden=16, num_epoch=25, dropout=0.5, log_every=0,
                       n_shards=8, scan_epochs=10)
    res = train_ktgnn(dict(data), cfg)
    losses = [h["loss"] for h in res["history"]]
    assert losses[-1] < losses[0]
    assert 0.0 <= res["best"]["test"] <= 1.0
    assert res["best"]["epoch"] >= 1


def test_surrogate_init_matches_full_init(data):
    """Sharded mode initializes params on an O(1) surrogate graph; the
    param tree (structure AND values) must equal a full-graph init —
    flax folds init rngs by module path, not by data."""
    from bridged_gnn_tpu.graph import graph_from_dict, with_self_loops
    from bridged_gnn_tpu.ops.spmm import adjacency_from_graph
    from bridged_gnn_tpu.train.stage2 import (
        _surrogate_init_graph,
        build_model,
    )

    cfg = Stage2Config(**BASE)
    g = with_self_loops(graph_from_dict(dict(data)))
    adj = adjacency_from_graph(g, method="gather")
    num_classes = int(np.asarray(g.y).max()) + 1
    model = build_model(cfg, num_classes)
    rngs = {"params": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    v_full = model.init(rngs, g, adj, False)
    gs, adjs = _surrogate_init_graph(g.num_features, num_classes)
    v_sur = model.init(rngs, gs, adjs, False)
    assert jax.tree_util.tree_structure(v_full["params"]) == \
        jax.tree_util.tree_structure(v_sur["params"])
    for a, b in zip(jax.tree_util.tree_leaves(v_full["params"]),
                    jax.tree_util.tree_leaves(v_sur["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_rejects_unsupported_models(data):
    with pytest.raises(ValueError, match="n_shards"):
        train_ktgnn(
            dict(data),
            Stage2Config(**BASE, n_shards=8, model_name="GraphSAGE"),
        )


@pytest.fixture(scope="module")
def single_nodtc(data):
    return train_ktgnn(dict(data), Stage2Config(**BASE, no_dtc=True))


def test_nodtc_halo_matches_single_device(data, single_nodtc):
    """KTGNN_noDTC under n_shards>1 (VERDICT r4 #6): the FB h2c recipe's
    single-head model (reference run.sh:24-26) trains on the halo
    partition with a loss history exact vs single-device."""
    res = train_ktgnn(
        dict(data), Stage2Config(**BASE, no_dtc=True, n_shards=8)
    )
    assert_history_matches(res, single_nodtc)


def test_nodtc_halo_scan_mode(data, single_nodtc):
    res = train_ktgnn(
        dict(data),
        Stage2Config(**BASE, no_dtc=True, n_shards=8, scan_epochs=5),
    )
    assert_history_matches(res, single_nodtc)


def test_nodtc_edgeshard_matches_single_device(data, single_nodtc):
    res = train_ktgnn(
        dict(data),
        Stage2Config(**BASE, no_dtc=True, n_shards=8,
                     shard_layout="edgeshard"),
    )
    assert_history_matches(res, single_nodtc)


def test_sharded_save_best(data, tmp_path):
    """--save works in sharded mode (best-variable snapshot path)."""
    import pickle

    p = str(tmp_path / "best.pkl")
    cfg = Stage2Config(**BASE, n_shards=8, save_best_path=p)
    res = train_ktgnn(dict(data), cfg)
    with open(p, "rb") as f:
        best = pickle.load(f)
    assert "params" in best and "batch_stats" in best
    assert res["best"]["epoch"] >= 1
