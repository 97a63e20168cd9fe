"""Halo row-partition tests (8 virtual CPU devices).

VERDICT r1 item 2: the row-partitioned KT-GNN train step with boundary
all_to_all exchange must be gradient-exact vs single device, and its wire
bytes must beat the edge-shard layout's full-array psums.
"""

import jax
import numpy as np
import pytest

from bridged_gnn_tpu.graph import graph_from_dict, with_self_loops
from bridged_gnn_tpu.nn.ktgnn import KTGNN
from bridged_gnn_tpu.ops.spmm import adjacency_from_graph
from bridged_gnn_tpu.parallel import make_mesh
from bridged_gnn_tpu.parallel.halopart import (
    build_halo_partition,
    make_halo_ktgnn_train_step,
    wire_bytes_per_layer,
)
from bridged_gnn_tpu.train.stage2 import Stage2Config


def make_graph_dict(rng, n=60, e=300, d=16, c=4, clustered=False):
    if clustered:
        # mostly-intra-block edges → small halo
        blocks = rng.integers(0, 8, size=e)
        lo = blocks * (n // 8)
        src = lo + rng.integers(0, n // 8, size=e)
        dst = lo + rng.integers(0, n // 8, size=e)
        cross = rng.random(e) < 0.1
        dst = np.where(cross, rng.integers(0, n, size=e), dst)
        ei = np.stack([src, dst])
    else:
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


def test_partition_accounts_every_edge(rng):
    g = with_self_loops(graph_from_dict(make_graph_dict(rng)))
    part = build_halo_partition(g, 8)
    # masked local edges across shards == real edges of the graph
    assert int(part.edge_mask.sum()) == int(np.asarray(g.edge_mask).sum())
    # reconstruct global (src, dst) pairs from local ids + halo plans
    n_dev, rows, h_pair = part.num_shards, part.rows, part.h_pair
    sl = part.senders_local.reshape(n_dev, -1)
    rl = part.receivers_local.reshape(n_dev, -1)
    em = part.edge_mask.reshape(n_dev, -1)
    send_idx = part.send_idx.reshape(n_dev, n_dev, h_pair)
    got = set()
    for q in range(n_dev):
        # local slot -> global node id
        lut = np.zeros(rows + n_dev * h_pair, dtype=np.int64)
        lut[:rows] = np.arange(q * rows, (q + 1) * rows)
        for p in range(n_dev):
            lut[rows + p * h_pair: rows + (p + 1) * h_pair] = (
                send_idx[p, q] + p * rows
            )
        for s_loc, r_loc in zip(sl[q][em[q]], rl[q][em[q]]):
            got.add((int(lut[s_loc]), int(lut[r_loc])))
    want = {
        (int(s), int(r))
        for s, r, m in zip(
            np.asarray(g.senders), np.asarray(g.receivers),
            np.asarray(g.edge_mask),
        )
        if m
    }
    assert got == want


def test_halo_step_matches_single_device(rng):
    """Loss + param update of the halo row-partitioned step are exact vs
    the unsharded step (dropout off: masks can't align across layouts)."""
    d = make_graph_dict(rng)
    g = with_self_loops(graph_from_dict(d))
    cfg = Stage2Config(hidden=16, use_scheduler=False, dropout=0.0)
    mesh = make_mesh(8)

    model = KTGNN(num_classes=4, layer_num=2, hidden=16, dropout=0.0)
    adj = adjacency_from_graph(g, method="gather")
    variables = model.init(jax.random.PRNGKey(0), g, adj, False)
    params, bs = variables["params"], variables["batch_stats"]

    train_step, part = make_halo_ktgnn_train_step(mesh, model, g, cfg)
    from bridged_gnn_tpu.train.optim import torch_adam

    tx = torch_adam(cfg.lr, weight_decay=cfg.weight_decay)
    opt_state = tx.init(params)
    rng_drop = jax.random.PRNGKey(42)
    p_sh, bs_sh, opt_sh, loss_sh = train_step(params, bs, opt_state,
                                              rng_drop)

    from bridged_gnn_tpu.train.stage2 import kl_batchmean, masked_nll

    tar_train = g.train_mask & (~g.central_mask)

    def loss_fn(p, bstats):
        outs, mutated = model.apply(
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


def test_wire_bytes_halo_beats_edgeshard(rng):
    """On a clustered graph the halo layout moves far fewer bytes per
    layer than edge-shard's three full-array psums."""
    g = with_self_loops(
        graph_from_dict(make_graph_dict(rng, n=512, e=4096, clustered=True))
    )
    part = build_halo_partition(g, 8)
    acct = wire_bytes_per_layer(part, d=64)
    assert acct["halo_bytes"] < acct["edgeshard_bytes"]
    assert acct["ratio"] > 2.0  # clustered cut → big win
    # and even on a random graph the halo layout can't exceed one
    # all-gather-equivalent while edge-shard always pays ~3 psums
    g2 = with_self_loops(graph_from_dict(make_graph_dict(rng, n=512,
                                                         e=4096)))
    part2 = build_halo_partition(g2, 8)
    acct2 = wire_bytes_per_layer(part2, d=64)
    assert acct2["halo_bytes"] < acct2["edgeshard_bytes"]


def test_halo_step_trains(rng):
    """Multiple halo steps reduce the loss (end-to-end sanity)."""
    d = make_graph_dict(rng)
    g = with_self_loops(graph_from_dict(d))
    cfg = Stage2Config(hidden=16, use_scheduler=False, dropout=0.0)
    mesh = make_mesh(8)
    model = KTGNN(num_classes=4, layer_num=2, hidden=16, dropout=0.0)
    adj = adjacency_from_graph(g, method="gather")
    variables = model.init(jax.random.PRNGKey(0), g, adj, False)
    params, bs = variables["params"], variables["batch_stats"]
    train_step, _ = make_halo_ktgnn_train_step(mesh, model, g, cfg)
    from bridged_gnn_tpu.train.optim import torch_adam

    tx = torch_adam(cfg.lr, weight_decay=cfg.weight_decay)
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(7)
    losses = []
    for i in range(8):
        key, k = jax.random.split(key)
        params, bs, opt_state, loss = train_step(params, bs, opt_state, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_overlap_split_accounts_every_edge(rng):
    """The local/halo split layouts together hold exactly the partition's
    real edges, and the local set only references own rows."""
    g = with_self_loops(graph_from_dict(make_graph_dict(rng)))
    part = build_halo_partition(g, 8, overlap=True)
    n_dev = part.num_shards
    pd_b = part.pd_blocks
    ld_mask = part.pl2["ld_mask"].reshape(n_dev, -1)
    hd_mask = part.pl2["hd_mask"].reshape(n_dev, -1)
    em = part.edge_mask.reshape(n_dev, -1)
    sl = part.senders_local.reshape(n_dev, -1)
    for q in range(n_dev):
        n_local = int((em[q] & (sl[q] < part.rows)).sum())
        n_halo = int((em[q] & (sl[q] >= part.rows)).sum())
        assert int(ld_mask[q].sum()) == n_local
        assert int(hd_mask[q].sum()) == n_halo
    # local src layout gathers own rows only; halo src from halo space
    ls_other = part.pl2["ls_other"].reshape(n_dev, -1)
    ls_m = part.pl2["ls_mask"].reshape(n_dev, -1).astype(bool)
    hs_other = part.pl2["hs_other"].reshape(n_dev, -1)
    hs_m = part.pl2["hs_mask"].reshape(n_dev, -1).astype(bool)
    for q in range(n_dev):
        # src layouts key on senders; other_slot holds receivers (< rows)
        assert (ls_other[q][ls_m[q]] < part.rows).all()
        assert (hs_other[q][hs_m[q]] < part.rows).all()
    # uniform static dims
    assert part.pl2["ld_rel"].size == n_dev * pd_b * part.t_ld
    assert part.pl2["hd_rel"].size == n_dev * pd_b * part.t_hd


def test_halo_overlap_step_matches_single_device(rng):
    """VERDICT r2 item 2: the comm/compute-overlap halo step (split
    local/halo slot layouts + streaming-softmax combine) must match the
    single-device step up to fp reduction order — same loss, same param
    updates within fp32 tolerance — while the collective only feeds the
    (small) halo partials."""
    d = make_graph_dict(rng)
    g = with_self_loops(graph_from_dict(d))
    cfg = Stage2Config(hidden=16, use_scheduler=False, dropout=0.0)
    mesh = make_mesh(8)

    model = KTGNN(num_classes=4, layer_num=2, hidden=16, dropout=0.0)
    adj = adjacency_from_graph(g, method="gather")
    variables = model.init(jax.random.PRNGKey(0), g, adj, False)
    params, bs = variables["params"], variables["batch_stats"]

    train_step, part = make_halo_ktgnn_train_step(
        mesh, model, g, cfg, overlap=True
    )
    assert part.pl2 is not None
    from bridged_gnn_tpu.train.optim import torch_adam

    tx = torch_adam(cfg.lr, weight_decay=cfg.weight_decay)
    opt_state = tx.init(params)
    rng_drop = jax.random.PRNGKey(42)
    p_sh, bs_sh, opt_sh, loss_sh = train_step(params, bs, opt_state,
                                              rng_drop)

    from bridged_gnn_tpu.train.stage2 import kl_batchmean, masked_nll

    tar_train = g.train_mask & (~g.central_mask)

    def loss_fn(p, bstats):
        outs, mutated = model.apply(
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
    np.testing.assert_allclose(float(loss_sh), float(loss_1), rtol=2e-4)

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
            rtol=5e-3, atol=5e-5,
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(bs_sh), jax.tree_util.tree_leaves(bs_1)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )


def test_halo_overlap_trains(rng):
    """Overlap steps reduce the loss (end-to-end sanity, clustered cut)."""
    d = make_graph_dict(rng, clustered=True)
    g = with_self_loops(graph_from_dict(d))
    cfg = Stage2Config(hidden=16, use_scheduler=False, dropout=0.0)
    mesh = make_mesh(8)
    model = KTGNN(num_classes=4, layer_num=2, hidden=16, dropout=0.0)
    adj = adjacency_from_graph(g, method="gather")
    variables = model.init(jax.random.PRNGKey(0), g, adj, False)
    params, bs = variables["params"], variables["batch_stats"]
    train_step, _ = make_halo_ktgnn_train_step(mesh, model, g, cfg,
                                               overlap=True)
    from bridged_gnn_tpu.train.optim import torch_adam

    tx = torch_adam(cfg.lr, weight_decay=cfg.weight_decay)
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(7)
    losses = []
    for i in range(8):
        key, k = jax.random.split(key)
        params, bs, opt_state, loss = train_step(params, bs, opt_state, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_halo_step_recompute_bwd_matches_single_device(rng):
    """STATUS r2 gap 4: the hand-derived fused-attention backward
    (make_adapted_attention) now runs under shard_map — the replicated
    a_f vectors are pcast to device-varying outside the custom VJP, so
    the VMA checker sees a uniform-varying region and JAX inserts the
    psum at the pcast transpose. Loss and updated params must match the
    single-device AUTODIFF step (same math, different backward)."""
    d = make_graph_dict(rng)
    g = with_self_loops(graph_from_dict(d))
    cfg = Stage2Config(hidden=16, use_scheduler=False, dropout=0.0)
    mesh = make_mesh(8)

    model_rc = KTGNN(num_classes=4, layer_num=2, hidden=16, dropout=0.0,
                     fused_recompute_bwd=True)
    model_ad = KTGNN(num_classes=4, layer_num=2, hidden=16, dropout=0.0)
    adj = adjacency_from_graph(g, method="gather")
    variables = model_ad.init(jax.random.PRNGKey(0), g, adj, False)
    params, bs = variables["params"], variables["batch_stats"]
    # param trees of the two variants must be interchangeable
    v_rc = model_rc.init(jax.random.PRNGKey(0), g, adj, False)
    assert jax.tree_util.tree_structure(v_rc["params"]) == \
        jax.tree_util.tree_structure(params)

    train_step, _ = make_halo_ktgnn_train_step(mesh, model_rc, g, cfg)
    from bridged_gnn_tpu.train.optim import torch_adam

    tx = torch_adam(cfg.lr, weight_decay=cfg.weight_decay)
    opt_state = tx.init(params)
    rng_drop = jax.random.PRNGKey(42)
    p_sh, bs_sh, opt_sh, loss_sh = train_step(params, bs, opt_state,
                                              rng_drop)

    from bridged_gnn_tpu.train.stage2 import kl_batchmean, masked_nll

    tar_train = g.train_mask & (~g.central_mask)

    def loss_fn(p, bstats):
        outs, mutated = model_ad.apply(
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

    (loss_1, _), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(params, bs)
    np.testing.assert_allclose(float(loss_sh), float(loss_1), rtol=1e-4)

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
