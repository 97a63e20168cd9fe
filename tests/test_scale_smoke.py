"""Scalability smoke: stage-2 training beyond the dense-path limit uses the
blocked aggregation path and stays healthy."""

import numpy as np
import pytest

from bridged_gnn_tpu.data.synthetic import make_benchmark_graph
from bridged_gnn_tpu.train.stage2 import Stage2Config, train_ktgnn


@pytest.mark.slow
def test_16k_node_training_runs():
    d = make_benchmark_graph(n=16384, avg_degree=16, dim=64, num_classes=8)
    res = train_ktgnn(
        d, Stage2Config(num_epoch=3, hidden=64, use_scheduler=False)
    )
    losses = [h["loss"] for h in res["history"]]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 1.5
