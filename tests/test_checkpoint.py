"""Checkpoint/resume: an interrupted run resumed must match an
uninterrupted run exactly (deterministic resume)."""

import numpy as np
import pytest

from bridged_gnn_tpu.data.synthetic import make_sync_dataset
from bridged_gnn_tpu.train.stage2 import Stage2Config, train_ktgnn


def _data():
    d = make_sync_dataset("relational-intra", n_src=150, n_tar=100, dim=12,
                          num_classes=3, seed=3)
    rng = np.random.default_rng(0)
    n = d["x"].shape[0]
    r = rng.random(n)
    d["train_mask"] = r < 0.6
    d["val_mask"] = (r >= 0.6) & (r < 0.8)
    d["test_mask"] = r >= 0.8
    return d


def test_resume_matches_uninterrupted(tmp_path):
    data = _data()
    base = dict(hidden=16, to_undirected=True, use_scheduler=True)

    full = train_ktgnn(data, Stage2Config(num_epoch=20, **base))

    # run 10 epochs with checkpointing, then resume to 20
    ck = str(tmp_path / "ck")
    train_ktgnn(data, Stage2Config(
        num_epoch=10, ckpt_dir=ck, ckpt_every=10, **base
    ))
    resumed = train_ktgnn(data, Stage2Config(
        num_epoch=20, ckpt_dir=ck, ckpt_every=10, resume=True, **base
    ))
    assert resumed["history"][0]["epoch"] == 11
    # same per-epoch losses from epoch 11 on
    full_tail = {h["epoch"]: h["loss"] for h in full["history"][10:]}
    res_tail = {h["epoch"]: h["loss"] for h in resumed["history"]}
    for ep, loss in res_tail.items():
        np.testing.assert_allclose(loss, full_tail[ep], rtol=1e-5)


def test_checkpointer_gc(tmp_path):
    from bridged_gnn_tpu.train.checkpoint import TrainCheckpointer

    ck = TrainCheckpointer(str(tmp_path / "gc"), keep=2)
    for s in (1, 2, 3, 4):
        ck.save(s, {"a": np.ones(3) * s})
    assert ck.latest_step() == 4
    steps = ck._steps()
    assert steps == [3, 4]
    st = ck.restore()
    np.testing.assert_allclose(st["a"], 4 * np.ones(3))
