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


def test_remat_recompute_composition(rng):
    """KTGNN(remat=True) composed with the recompute custom-VJP attention
    backward — the two HBM knobs engaged together (the 524k-node capacity
    config). Regression: make_adapted_attention used to stage a
    closure-scope array inside the nn.remat trace; capturing it in the
    custom-VJP backward raised UnexpectedTracerError at transposition."""
    import jax
    import jax.numpy as jnp
    import optax

    from bridged_gnn_tpu.graph import build_graph, with_self_loops
    from bridged_gnn_tpu.nn.ktgnn import KTGNN
    from bridged_gnn_tpu.ops.spmm import adjacency_from_graph
    from bridged_gnn_tpu.train.optim import torch_adam
    from bridged_gnn_tpu.train.stage2 import kl_batchmean, masked_nll

    n, e = 512, 4096
    s = rng.integers(0, n, size=e).astype(np.int64)
    r = rng.integers(0, n, size=e).astype(np.int64)
    x = rng.normal(size=(n, 32)).astype(np.float32)
    y = rng.integers(0, 4, size=n).astype(np.int64)
    central = np.zeros(n, bool)
    central[: n // 2] = True
    train = rng.random(n) < 0.6
    g = with_self_loops(build_graph(
        x, np.stack([s, r]), y=y, train_mask=train, central_mask=central
    ))
    adj = adjacency_from_graph(g, method="blocked", node_block=128)
    assert adj.fast_fn is not None
    model = KTGNN(num_classes=4, layer_num=2, hidden=16,
                  remat=True, fused_recompute_bwd=True, dropout=0.0)
    variables = jax.jit(lambda k: model.init(k, g, adj, False))(
        jax.random.PRNGKey(0)
    )
    params, bs = variables["params"], variables["batch_stats"]
    tx = torch_adam(1e-3)
    opt_state = tx.init(params)
    tt = g.train_mask & ~g.central_mask

    def loss_fn(p, bstats, drop, g):
        outs, mut = model.apply(
            {"params": p, "batch_stats": bstats}, g, adj, True,
            rngs={"dropout": drop}, mutable=["batch_stats"],
        )
        lp_s, lp_t, lp_that, _ = outs
        loss = (
            2.0 * masked_nll(lp_s, g.y, g.train_mask)
            + masked_nll(lp_t, g.y, tt) + masked_nll(lp_that, g.y, tt)
        ) / 4.0 + kl_batchmean(lp_that, lp_t, g.node_mask)
        return loss, mut["batch_stats"]

    @jax.jit
    def step(p, bstats, opt_state, key, g):
        (loss, newbs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, bstats, key, g
        )
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), newbs, opt_state, loss

    params, bs, opt_state, loss = step(
        params, bs, opt_state, jax.random.PRNGKey(1), g
    )
    assert np.isfinite(float(loss))

    # grads must equal the plain (no remat, stored-residual) model's
    plain = KTGNN(num_classes=4, layer_num=2, hidden=16, dropout=0.0)

    def loss_plain(p):
        outs, _ = plain.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            g, adj, True, rngs={"dropout": jax.random.PRNGKey(7)},
            mutable=["batch_stats"],
        )
        lp_s, lp_t, lp_that, _ = outs
        return (
            2.0 * masked_nll(lp_s, g.y, g.train_mask)
            + masked_nll(lp_t, g.y, tt) + masked_nll(lp_that, g.y, tt)
        ) / 4.0 + kl_batchmean(lp_that, lp_t, g.node_mask)

    def loss_rr(p):
        outs, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            g, adj, True, rngs={"dropout": jax.random.PRNGKey(7)},
            mutable=["batch_stats"],
        )
        lp_s, lp_t, lp_that, _ = outs
        return (
            2.0 * masked_nll(lp_s, g.y, g.train_mask)
            + masked_nll(lp_t, g.y, tt) + masked_nll(lp_that, g.y, tt)
        ) / 4.0 + kl_batchmean(lp_that, lp_t, g.node_mask)

    g1 = jax.grad(loss_rr)(variables["params"])
    g2 = jax.grad(loss_plain)(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_memory_policy_resolution(rng):
    """Three-tier auto policy (resolve_memory_mode, round-4
    recalibration): auto picks the fastest tier whose calibrated
    estimate fits in ~80% of HBM — 'plain' (Mosaic kernels, ~7.5
    msg-space copies), then 'xla_plain' (kernels off, ~5.2 copies),
    then 'lean' (recompute + remat) as the unconditional fallback."""
    from unittest import mock

    from bridged_gnn_tpu.graph import build_graph
    from bridged_gnn_tpu.ops.spmm import adjacency_from_graph
    from bridged_gnn_tpu.train.stage2 import (
        Stage2Config,
        estimate_plain_hbm,
        resolve_memory_mode,
        resolve_memory_policy,
    )

    n, e = 2048, 16384
    s = rng.integers(0, n, size=e).astype(np.int64)
    r = rng.integers(0, n, size=e).astype(np.int64)
    x = rng.normal(size=(n, 32)).astype(np.float32)
    g = build_graph(x, np.stack([s, r]))
    adj = adjacency_from_graph(g, method="blocked", node_block=128)
    cfg = Stage2Config(hidden=64, message_dtype="bfloat16")

    est = estimate_plain_hbm(g, adj, cfg)
    lay = adj.fast_fn.lay_dst
    slots = lay.num_blocks * lay.tile_e
    # dominant term: 7.5 live copies of [slots, 2*hidden] bf16
    assert est >= 7.5 * slots * 2 * 64 * 2

    # explicit overrides: all three tiers pass straight through, and the
    # boolean back-compat view means "resolved to lean"
    for tier in ("plain", "xla_plain", "lean"):
        assert resolve_memory_mode(
            g, adj, Stage2Config(memory_policy=tier)) == tier
    assert resolve_memory_policy(
        g, adj, Stage2Config(memory_policy="lean")) is True
    assert resolve_memory_policy(
        g, adj, Stage2Config(memory_policy="plain")) is False
    assert resolve_memory_policy(
        g, adj, Stage2Config(memory_policy="xla_plain")) is False

    # auto tier boundaries (on_tpu + hbm_limit injected; the Mosaic
    # gate mocked open so the 'plain' tier is reachable off-chip)
    est_kernel = estimate_plain_hbm(g, adj, cfg, kernel_path=True)
    est_xla = estimate_plain_hbm(g, adj, cfg, kernel_path=False)
    assert est_xla < est_kernel  # 5.2 vs 7.5 msg-space copies

    from bridged_gnn_tpu.ops import pallas_fused

    auto = Stage2Config(hidden=64, message_dtype="bfloat16",
                        memory_policy="auto")

    with mock.patch.object(pallas_fused, "auto_kernel", return_value=True):
        # everything fits -> plain (fastest tier)
        assert resolve_memory_mode(
            g, adj, auto, hbm_limit=int(est_kernel / 0.8) + 8,
            on_tpu=True) == "plain"
        # kernel-path estimate over budget, XLA estimate under -> middle tier
        assert resolve_memory_mode(
            g, adj, auto, hbm_limit=int(est_kernel / 0.8) - 1000,
            on_tpu=True) == "xla_plain"
        # even the XLA stored-residual estimate over budget -> lean
        assert resolve_memory_mode(
            g, adj, auto, hbm_limit=int(est_xla / 0.8) - 1000,
            on_tpu=True) == "lean"
        # and a limit below ANY estimate still resolves (lean is the
        # unconditional capacity fallback, never an error)
        assert resolve_memory_mode(
            g, adj, auto, hbm_limit=1, on_tpu=True) == "lean"

    # with the Mosaic gate closed the plain tier is unreachable: a
    # kernel-sized budget resolves to xla_plain instead
    with mock.patch.object(pallas_fused, "auto_kernel", return_value=False):
        assert resolve_memory_mode(
            g, adj, auto, hbm_limit=int(est_kernel / 0.8) + 8,
            on_tpu=True) == "xla_plain"

    # host backends page: auto stays plain off-TPU
    assert resolve_memory_mode(g, adj, auto, on_tpu=False) == "plain"

    import pytest as _pytest
    with _pytest.raises(ValueError, match="memory_policy"):
        resolve_memory_policy(g, adj, Stage2Config(memory_policy="bogus"))


def test_lean_policy_trains(rng):
    """memory_policy='lean' end to end on a small graph: loss finite and
    decreasing (the capacity config as a user-facing knob)."""
    from bridged_gnn_tpu.data.synthetic import make_benchmark_graph
    from bridged_gnn_tpu.train.stage2 import Stage2Config, train_ktgnn

    d = make_benchmark_graph(n=1024, avg_degree=8, dim=32, num_classes=4)
    res = train_ktgnn(
        d, Stage2Config(num_epoch=3, hidden=16, use_scheduler=False,
                        memory_policy="lean", adjacency_method="blocked")
    )
    losses = [h["loss"] for h in res["history"]]
    assert np.isfinite(losses).all()


def test_pass_layouts_trains_identically(rng):
    """pass_layouts=True (slot layouts as jit arguments) must reproduce
    the constant-layout run exactly — same losses, same history — since
    it only changes WHERE the arrays live, not the math."""
    from bridged_gnn_tpu.data.synthetic import make_benchmark_graph
    from bridged_gnn_tpu.train.stage2 import Stage2Config, train_ktgnn

    d = make_benchmark_graph(n=1024, avg_degree=8, dim=32, num_classes=4)
    common = dict(num_epoch=3, hidden=16, use_scheduler=False,
                  adjacency_method="blocked", memory_policy="plain")
    res_c = train_ktgnn(d, Stage2Config(pass_layouts=False, **common))
    res_a = train_ktgnn(d, Stage2Config(pass_layouts=True, **common))
    for hc, ha in zip(res_c["history"], res_a["history"]):
        np.testing.assert_allclose(hc["loss"], ha["loss"], rtol=1e-6)
        assert hc["test"] == ha["test"]


def test_pass_layouts_auto_threshold(rng):
    from bridged_gnn_tpu.graph import build_graph
    from bridged_gnn_tpu.ops.spmm import adjacency_from_graph
    from bridged_gnn_tpu.train.stage2 import (
        Stage2Config,
        resolve_pass_layouts,
    )

    n, e = 1024, 8192
    s = rng.integers(0, n, size=e).astype(np.int64)
    r = rng.integers(0, n, size=e).astype(np.int64)
    g = build_graph(rng.normal(size=(n, 8)).astype(np.float32),
                    np.stack([s, r]))
    adj = adjacency_from_graph(g, method="blocked", node_block=128)
    # tiny layouts stay constants under auto; booleans force
    assert resolve_pass_layouts(adj, Stage2Config()) is False
    assert resolve_pass_layouts(
        adj, Stage2Config(pass_layouts=True)) is True
    adj_g = adjacency_from_graph(g, method="gather")
    assert resolve_pass_layouts(adj_g, Stage2Config()) is False
