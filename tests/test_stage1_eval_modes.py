"""Stage-1 evaluation modes: sampled vs exhaustive pair enumeration."""

import numpy as np
import pytest

from bridged_gnn_tpu.data import dataset_conversion
from bridged_gnn_tpu.data.synthetic import make_sync_dataset
from bridged_gnn_tpu.train.stage1 import Stage1Config, train_adversarial


@pytest.mark.parametrize("eval_mode", ["sampling", "all"])
def test_eval_modes_run(eval_mode):
    d = make_sync_dataset("relational-intra", n_src=120, n_tar=80, dim=10,
                          num_classes=3, seed=9)
    src, tar = dataset_conversion(d, seed=1, split_data=True)[:2]
    cfg = Stage1Config(
        hidden_dim=16, num_epoch=6, start_eval_epoch=4, eval_per_epoch=2,
        max_class_num=3, sample_size=900, eval_sample_size=900,
        eval_mode=eval_mode,
    )
    res = train_adversarial(src, tar, cfg)
    best = res["best"]
    assert best["epoch"] > 0
    for triple in (best["val"], best["test"]):
        for s in triple:
            assert 0.0 <= s <= 1.0
