"""Stage-1 scan-mode training (lax.scan segments, device-sliced preds)."""

import numpy as np

from bridged_gnn_tpu.data import dataset_conversion
from bridged_gnn_tpu.data.synthetic import make_sync_dataset
from bridged_gnn_tpu.train.stage1 import Stage1Config, train_adversarial


def test_stage1_scan_mode_runs_and_times():
    data = make_sync_dataset("relational-intra", n_src=80, n_tar=60,
                             dim=10, num_classes=3, seed=7)
    src, tar, _ms, _mt = dataset_conversion(dict(data), seed=0)
    cfg = Stage1Config(
        hidden_dim=16, num_epoch=6, start_eval_epoch=3, eval_per_epoch=3,
        sample_size=500, eval_sample_size=500, max_class_num=3,
        sim_mode="mlp", backbone="mlp", scan_epochs=3,
    )
    res = train_adversarial(src, tar, cfg)
    assert res["best"]["epoch"] >= 3            # an eval fired
    # pair scores are (f1, auc-ish, acc)-style tuples of floats
    assert all(np.isfinite(v) for v in res["best"]["val"])
    # scan segments record per-epoch wall times -> throughput is real
    assert res["throughput"]["steps"] == cfg.num_epoch
    assert np.isfinite(res["throughput"]["mean_s"])
    assert res["throughput"]["mean_s"] > 0
