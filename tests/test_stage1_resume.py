"""Stage-1 checkpoint/resume determinism."""

import numpy as np

from bridged_gnn_tpu.data import dataset_conversion
from bridged_gnn_tpu.data.synthetic import make_sync_dataset
from bridged_gnn_tpu.train.stage1 import Stage1Config, train_adversarial


def _domains():
    d = make_sync_dataset("relational-intra", n_src=150, n_tar=100, dim=12,
                          num_classes=3, seed=5)
    return dataset_conversion(d, seed=1, split_data=True)[:2]


def test_stage1_resume_matches(tmp_path):
    src, tar = _domains()
    base = dict(
        hidden_dim=16, start_eval_epoch=100, eval_per_epoch=100,
        max_class_num=3, sample_size=900, eval_sample_size=900,
    )
    full = train_adversarial(src, tar, Stage1Config(num_epoch=12, **base))

    ck = str(tmp_path / "s1")
    train_adversarial(src, tar, Stage1Config(
        num_epoch=6, ckpt_dir=ck, ckpt_every=6, **base
    ))
    resumed = train_adversarial(src, tar, Stage1Config(
        num_epoch=12, ckpt_dir=ck, ckpt_every=6, resume=True, **base
    ))
    # identical final variables (same pair streams, same updates)
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(full["variables"]["params"]),
        jax.tree_util.tree_leaves(resumed["variables"]["params"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
