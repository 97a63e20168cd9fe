"""The shipped trained KT-GNN artifact reproduces its recorded accuracy."""

import os
import pickle

import numpy as np
import pytest

ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts", "ktgnn_office_a2d_best.pkl",
)


@pytest.mark.slow
def test_shipped_a2d_model_accuracy(a2d_dict):
    from bridged_gnn_tpu.serve import KTGNNPredictor
    from bridged_gnn_tpu.train.metrics import eval_metric
    from bridged_gnn_tpu.train.stage2 import Stage2Config, build_model

    with open(ARTIFACT, "rb") as f:
        variables = pickle.load(f)
    cfg = Stage2Config(to_undirected=True)
    model = build_model(cfg, int(a2d_dict["y"].max()) + 1)
    pred = KTGNNPredictor(model, variables, dict(a2d_dict),
                          to_undirected=True)
    labels = pred.predict_labels("target_hat")
    test = a2d_dict["test_mask"].astype(bool)
    f1 = eval_metric(a2d_dict["y"][test], labels[test], "f1", "macro")
    # best-epoch weights (selected by min loss_t2) reach 0.8835 on test
    assert f1 > 0.85
