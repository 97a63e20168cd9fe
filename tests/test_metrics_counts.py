"""Counts-based scoring (device-side eval) vs sklearn ground truth."""

import numpy as np
import pytest

from bridged_gnn_tpu.train.metrics import eval_metric, score_from_counts


def _counts_np(y, pred, mask, num_classes):
    """Reference (numpy) construction of the device-side count bins."""
    y_bin = np.where(y < 0, num_classes, y)
    bins = num_classes + 1
    tp = np.zeros(bins)
    pred_cnt = np.zeros(bins)
    true_cnt = np.zeros(bins)
    for c in range(bins):
        tp[c] = np.sum(mask & (y_bin == c) & (pred == c))
        pred_cnt[c] = np.sum(mask & (pred == c))
        true_cnt[c] = np.sum(mask & (y_bin == c))
    return tp, pred_cnt, true_cnt


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("metric,average", [
    ("f1", "macro"), ("acc", "macro"),
])
def test_matches_sklearn_random(seed, metric, average):
    rng = np.random.default_rng(seed)
    n, c = 500, 7
    y = rng.integers(0, c, size=n)
    pred = rng.integers(0, c, size=n)
    mask = rng.random(n) < 0.5
    want = eval_metric(y[mask], pred[mask], metric, average)
    got = score_from_counts(
        *_counts_np(y, pred, mask, c), metric=metric, f1_average=average
    )
    assert got == pytest.approx(want, abs=1e-12)


def test_matches_sklearn_with_unlabeled_and_absent_classes():
    """-1 labels count as a distinct never-predicted class (sklearn
    semantics) and classes absent from both y and pred are excluded
    from the macro mean."""
    rng = np.random.default_rng(3)
    n, c = 400, 10
    y = rng.integers(0, 4, size=n)          # classes 4..9 never true
    y[rng.random(n) < 0.1] = -1             # some unlabeled rows
    pred = rng.integers(0, 5, size=n)       # class 4 predicted, never true
    mask = rng.random(n) < 0.7
    want = eval_metric(y[mask], pred[mask], "f1", "macro")
    got = score_from_counts(*_counts_np(y, pred, mask, c))
    assert got == pytest.approx(want, abs=1e-12)


def test_binary_average():
    rng = np.random.default_rng(4)
    n = 300
    y = rng.integers(0, 2, size=n)
    pred = rng.integers(0, 2, size=n)
    mask = np.ones(n, dtype=bool)
    want = eval_metric(y, pred, "f1", "binary")
    got = score_from_counts(
        *_counts_np(y, pred, mask, 2), f1_average="binary"
    )
    assert got == pytest.approx(want, abs=1e-12)


def test_empty_mask():
    tp = pred = true = np.zeros(4)
    assert score_from_counts(tp, pred, true) == 0.0
    assert score_from_counts(tp, pred, true, metric="acc") == 0.0


def test_scan_scores_match_per_epoch_loop():
    """Stage-2 scan mode (device-side counts) reproduces the per-epoch
    loop's history scores exactly (same seed, same dispatch math)."""
    from bridged_gnn_tpu.data.synthetic import make_sync_dataset
    from bridged_gnn_tpu.train.stage2 import Stage2Config, train_ktgnn

    d = make_sync_dataset("relational-intra", n_src=80, n_tar=60, dim=10,
                          num_classes=3, seed=5)
    rng = np.random.default_rng(0)
    n = d["x"].shape[0]
    r = rng.random(n)
    d["train_mask"] = r < 0.6
    d["val_mask"] = (r >= 0.6) & (r < 0.8)
    d["test_mask"] = r >= 0.8
    base = dict(num_epoch=8, hidden=8, to_undirected=True,
                use_scheduler=False, seed=0)
    res_loop = train_ktgnn(dict(d), Stage2Config(**base))
    res_scan = train_ktgnn(dict(d), Stage2Config(**base, scan_epochs=4))
    for h_loop, h_scan in zip(res_loop["history"], res_scan["history"]):
        assert h_scan["loss"] == pytest.approx(h_loop["loss"], rel=1e-5)
        for k in ("train", "val", "test"):
            assert h_scan[k] == pytest.approx(h_loop[k], abs=1e-9), (
                f"epoch {h_loop['epoch']} split {k}"
            )
    assert res_scan["best"]["test"] == pytest.approx(
        res_loop["best"]["test"], abs=1e-9
    )
    assert res_scan["best"]["per_head"]["target"] == pytest.approx(
        res_loop["best"]["per_head"]["target"], abs=1e-9
    )
