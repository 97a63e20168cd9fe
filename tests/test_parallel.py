"""Multi-device (8 virtual CPU) tests for the edge-sharded SPMD layer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bridged_gnn_tpu.graph import graph_from_dict, with_self_loops
from bridged_gnn_tpu.nn.ktgnn import KTGNN
from bridged_gnn_tpu.ops import blockwise_pair_scores_topk
from bridged_gnn_tpu.ops.sddmm import cosine_score_block
from bridged_gnn_tpu.ops.spmm import adjacency_from_graph, spmm
from bridged_gnn_tpu.parallel import (
    make_mesh,
    make_sharded_ktgnn_train_step,
    sharded_pair_topk,
    sharded_spmm,
)
from bridged_gnn_tpu.train.stage2 import Stage2Config


def make_graph_dict(rng, n=60, e=300, d=16, c=4):
    ei = rng.integers(0, n, size=(2, e))
    central = np.zeros(n, dtype=bool)
    central[rng.permutation(n)[: n // 2]] = True
    return dict(
        x=rng.normal(size=(n, d)).astype(np.float32),
        edge_index=ei,
        y=rng.integers(0, c, size=n),
        train_mask=rng.random(n) < 0.5,
        val_mask=np.zeros(n, dtype=bool),
        test_mask=np.zeros(n, dtype=bool),
        central_mask=central,
    )


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_spmm_matches_dense(rng):
    d = make_graph_dict(rng)
    g = graph_from_dict(d, edge_capacity=8 * 128)
    mesh = make_mesh(8)
    adj = adjacency_from_graph(g, method="dense")
    expect = np.asarray(spmm(adj, g.x))
    got = np.asarray(sharded_spmm(mesh, g, g.x))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_sharded_topk_matches_single(rng):
    nt, ns, dd, k = 40, 100, 16, 7
    zt = rng.normal(size=(64, dd)).astype(np.float32)
    zs = rng.normal(size=(ns, dd)).astype(np.float32)
    mesh = make_mesh(8)
    vals_s, idx_s = sharded_pair_topk(
        mesh, jnp.asarray(zt), jnp.asarray(zs), nt, ns, k, mode="cosine",
        row_block=16,
    )
    fn = cosine_score_block(jnp.asarray(zt), jnp.asarray(zs))
    vals_1, idx_1 = blockwise_pair_scores_topk(fn, nt, ns, k, row_block=16)
    # same top-k values per row (indices may tie-break differently)
    np.testing.assert_allclose(
        np.sort(np.asarray(vals_s)[:nt], axis=1),
        np.sort(np.asarray(vals_1)[:nt], axis=1),
        rtol=1e-5,
    )
    # indices achieve the reported scores
    def sigmoid(x):
        return 1 / (1 + np.exp(-x))
    zsn = zs / np.linalg.norm(zs, axis=1, keepdims=True)
    ztn = np.asarray(zt)[:nt] / np.linalg.norm(
        np.asarray(zt)[:nt], axis=1, keepdims=True
    )
    scores = sigmoid(ztn @ zsn.T)
    got_idx = np.asarray(idx_s)[:nt]
    got_vals = np.asarray(vals_s)[:nt]
    for i in range(nt):
        np.testing.assert_allclose(
            scores[i, got_idx[i]], got_vals[i], rtol=1e-4
        )


def test_sharded_ktgnn_step_matches_single_device(rng):
    d = make_graph_dict(rng)
    g = with_self_loops(graph_from_dict(d))
    cfg = Stage2Config(hidden=16, use_scheduler=False)
    mesh = make_mesh(8)

    model_sh = KTGNN(num_classes=4, layer_num=2, hidden=16,
                     axis_name="edges")
    model_1 = KTGNN(num_classes=4, layer_num=2, hidden=16)

    adj = adjacency_from_graph(g, method="gather")
    variables = model_1.init(jax.random.PRNGKey(0), g, adj, False)
    params, bs = variables["params"], variables["batch_stats"]

    train_step, g_sh = make_sharded_ktgnn_train_step(mesh, model_sh, g, cfg)
    rng_drop = jax.random.PRNGKey(42)

    # run the sharded step (params after one Adam update + loss)
    from bridged_gnn_tpu.train.optim import torch_adam

    tx = torch_adam(cfg.lr, weight_decay=cfg.weight_decay)
    opt_state = tx.init(params)
    p_sh, bs_sh, opt_sh, loss_sh = train_step(params, bs, opt_state, rng_drop)

    # single-device loss and grads on the same inputs
    from bridged_gnn_tpu.train.stage2 import kl_batchmean, masked_nll

    tar_train = g.train_mask & (~g.central_mask)

    def loss_fn(p, bstats):
        outs, mutated = model_1.apply(
            {"params": p, "batch_stats": bstats}, g, adj, True,
            rngs={"dropout": rng_drop}, mutable=["batch_stats"],
        )
        lp_s, lp_t, lp_that, _ = outs
        loss = (
            2.0 * masked_nll(lp_s, g.y, g.train_mask)
            + masked_nll(lp_t, g.y, tar_train)
            + masked_nll(lp_that, g.y, tar_train)
        ) / 4.0 + kl_batchmean(lp_that, lp_t, g.node_mask)
        return loss, mutated["batch_stats"]

    (loss_1, bs_1), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(params, bs)

    np.testing.assert_allclose(float(loss_sh), float(loss_1), rtol=1e-4)
    # grads must be finite and batch stats must agree; the post-Adam params
    # are compared only where grads are not ~0 (Adam's first step is
    # lr·sign(grad), which amplifies reduction-order noise on tiny grads)
    for a in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(a)))
    flat_g = jax.tree_util.flatten_with_path(grads)[0] if hasattr(
        jax.tree_util, "flatten_with_path"
    ) else None
    import optax

    updates, _ = tx.update(grads, tx.init(params), params)
    p_1 = optax.apply_updates(params, updates)
    for a, b, gr in zip(
        jax.tree_util.tree_leaves(p_sh),
        jax.tree_util.tree_leaves(p_1),
        jax.tree_util.tree_leaves(grads),
    ):
        significant = np.abs(np.asarray(gr)) > 1e-5
        np.testing.assert_allclose(
            np.asarray(a)[significant], np.asarray(b)[significant],
            rtol=2e-3, atol=2e-5,
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(bs_sh), jax.tree_util.tree_leaves(bs_1)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )
