"""Operational numerics guards (VERDICT r2 item 7 / SURVEY §5.2).

``check_numerics`` wires utils/sanitizers.assert_all_finite into both
train loops' eval boundaries, and — for KTGNN on a fused (blocked)
layout — asserts the per-destination-block attention-logit spread stays
inside the Mosaic kernel's block-max softmax envelope
(ops/pallas_fused.SOFTMAX_SPREAD_LIMIT), whose failure mode is silent
exp-underflow rather than NaN.
"""

import numpy as np
import pytest

from bridged_gnn_tpu.train.stage2 import Stage2Config, train_ktgnn


def make_graph_dict(rng, n=60, e=300, d=16, c=4):
    x = rng.normal(size=(n, d)).astype(np.float32)
    y = rng.integers(0, c, size=n).astype(np.int64)
    ei = rng.integers(0, n, size=(2, e)).astype(np.int64)
    central = np.zeros(n, dtype=bool)
    central[: n // 2] = True
    train = rng.random(n) < 0.6
    val = (~train) & (rng.random(n) < 0.5)
    test = ~(train | val)
    return dict(x=x, y=y, edge_index=ei, central_mask=central,
                train_mask=train, val_mask=val & ~central,
                test_mask=test & ~central)


def _cfg(**kw):
    base = dict(num_epoch=4, hidden=16, use_scheduler=False,
                check_numerics=True, adjacency_method="blocked")
    base.update(kw)
    return Stage2Config(**base)


def test_stage2_check_numerics_clean_run(rng):
    d = make_graph_dict(rng)
    res = train_ktgnn(d, _cfg())
    # the fused layout is active on the blocked adjacency, so the spread
    # diagnostic must have been measured (positive, inside the envelope)
    assert 0.0 < res["max_logit_spread"] < 60.0


def test_stage2_check_numerics_scan_mode(rng):
    d = make_graph_dict(rng)
    res = train_ktgnn(d, _cfg(scan_epochs=2))
    assert 0.0 < res["max_logit_spread"] < 60.0


def test_stage2_check_numerics_raises_on_nonfinite(rng):
    d = make_graph_dict(rng)
    d["x"][0, 0] = np.nan
    with pytest.raises(FloatingPointError, match="non-finite"):
        train_ktgnn(d, _cfg())


def test_stage2_spread_guard_trips(rng, monkeypatch):
    from bridged_gnn_tpu.ops import pallas_fused
    from bridged_gnn_tpu.train import stage2 as s2mod

    monkeypatch.setattr(pallas_fused, "SOFTMAX_SPREAD_LIMIT", 1e-9)
    d = make_graph_dict(rng)
    with pytest.raises(FloatingPointError, match="logit spread"):
        train_ktgnn(d, _cfg())


def test_stage1_check_numerics(rng):
    from bridged_gnn_tpu.train.stage1 import (
        Stage1Config,
        train_adversarial,
    )

    def dom(n, dim, c=3):
        x = rng.normal(size=(n, dim)).astype(np.float32)
        y = rng.integers(0, c, size=n).astype(np.int64)
        ei = rng.integers(0, n, size=(2, 4 * n)).astype(np.int64)
        train = rng.random(n) < 0.6
        val = (~train) & (rng.random(n) < 0.5)
        return dict(x=x, y=y, edge_index=ei, train_mask=train,
                    val_mask=val, test_mask=~(train | val))

    src, tar = dom(50, 12), dom(40, 12)
    cfg = Stage1Config(num_epoch=3, start_eval_epoch=2, hidden_dim=16,
                       sample_size=200, eval_sample_size=400,
                       max_class_num=3, check_numerics=True, verbose=False)
    res = train_adversarial(src, tar, cfg)
    assert np.isfinite(res["best"]["loss"])

    src_bad = dict(src, x=src["x"].copy())
    src_bad["x"][0, 0] = np.inf
    with pytest.raises(FloatingPointError, match="non-finite"):
        train_adversarial(src_bad, tar, cfg)
