"""Data-parallel stage-1 pair batches: sharding the pair-index arrays over
a 'pairs' mesh axis into the unmodified jitted sim step must produce the
same update (GSPMD partitions the pair-wise compute; SURVEY §2c item 2)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from bridged_gnn_tpu.data import dataset_conversion
from bridged_gnn_tpu.data.synthetic import make_sync_dataset
from bridged_gnn_tpu.graph import graph_from_dict
from bridged_gnn_tpu.parallel import make_mesh
from bridged_gnn_tpu.train.samplers import PairEnumerator, PairEnumeratorCross
from bridged_gnn_tpu.train.stage1 import (
    Stage1Config,
    build_model,
    make_train_steps,
)
from bridged_gnn_tpu.nn.stage1 import AdversarialLearnerV2


def test_pair_sharded_step_matches(rng):
    d = make_sync_dataset("relational-intra", n_src=120, n_tar=80, dim=12,
                          num_classes=3, seed=11)
    src, tar = dataset_conversion(d, seed=1, split_data=True)[:2]
    cfg = Stage1Config(hidden_dim=16, max_class_num=2, sample_size=6400)
    g_src, g_tar = graph_from_dict(src), graph_from_dict(tar)
    model = build_model(cfg, src, tar)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)},
        g_src.x, None, g_tar.x, None,
        jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.int32),
        mask_src=g_src.node_mask, mask_tar=g_tar.node_mask,
        method=AdversarialLearnerV2.init_all,
    )
    params, bs = variables["params"], variables["batch_stats"]
    sim_step, d_step, tx_st, _, _ = make_train_steps(
        model, g_src, None, g_tar, None, cfg.use_clf
    )
    opt = tx_st.init(params)

    host = np.random.default_rng(0)
    enu_s = PairEnumerator(src, "train", host)
    enu_t = PairEnumerator(tar, "train", host)
    enu_c = PairEnumeratorCross(src, tar, "train", host)
    i1s, i2s = enu_s.sampling(2, 6400)
    i1t, i2t = enu_t.sampling(2, 6400)
    i1c, i2c = enu_c.sampling(2, 6400)
    ys = np.asarray(src["y"])
    yt = np.asarray(tar["y"])
    idxs = dict(
        src1=jnp.asarray(i1s, jnp.int32), src2=jnp.asarray(i2s, jnp.int32),
        tar1=jnp.asarray(i1t, jnp.int32), tar2=jnp.asarray(i2t, jnp.int32),
        cross1=jnp.asarray(i1c, jnp.int32),
        cross2=jnp.asarray(i2c, jnp.int32),
    )
    y_pairs = dict(
        src=jnp.asarray((ys[i1s] == ys[i2s]).astype(np.float32)),
        tar=jnp.asarray((yt[i1t] == yt[i2t]).astype(np.float32)),
        cross=jnp.asarray((ys[i1c] == yt[i2c]).astype(np.float32)),
    )
    drop = jax.random.PRNGKey(3)
    p1, bs1, _, loss1, _ = sim_step(params, bs, opt, drop, idxs, y_pairs)

    mesh = make_mesh(8, ("pairs",))
    sh = NamedSharding(mesh, P("pairs"))
    idxs_sh = {k: jax.device_put(v, sh) for k, v in idxs.items()}
    y_sh = {k: jax.device_put(v, sh) for k, v in y_pairs.items()}
    p2, bs2, _, loss2, _ = sim_step(params, bs, opt, drop, idxs_sh, y_sh)

    # identical loss; parameters agree up to Adam's first-step sign
    # amplification of reduction-order noise on near-zero grads (each
    # element's update magnitude is ≤ lr, so differences are ≤ 2·lr)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2.1e-2)
    for a, b in zip(
        jax.tree_util.tree_leaves(bs1), jax.tree_util.tree_leaves(bs2)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
