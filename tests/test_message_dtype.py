"""bf16 conv messages (Stage2Config.message_dtype): forward drift vs the
f32 parity path stays small, training works end to end on the golden
graph, and the knob refuses models that don't consume it."""

import jax
import numpy as np
import pytest

from bridged_gnn_tpu.graph import graph_from_dict, with_self_loops
from bridged_gnn_tpu.nn.ktgnn import KTGNN
from bridged_gnn_tpu.ops.spmm import adjacency_from_graph
from bridged_gnn_tpu.train.stage2 import Stage2Config, train_ktgnn


def _graph(rng, n=300, e=1800, d=24, c=4):
    x = rng.normal(size=(n, d)).astype(np.float32)
    y = rng.integers(0, c, size=n)
    central = np.zeros(n, bool)
    central[: n // 2] = True
    r = rng.random(n)
    return dict(
        x=x, edge_index=rng.integers(0, n, size=(2, e)), y=y,
        train_mask=r < 0.6, val_mask=(r >= 0.6) & (r < 0.8),
        test_mask=r >= 0.8, central_mask=central,
    )


@pytest.mark.parametrize("method", ["dense", "blocked", "gather"])
def test_forward_drift_small_vs_f32(rng, method):
    d = _graph(rng)
    g = with_self_loops(graph_from_dict(d))
    adj = adjacency_from_graph(g, method=method)
    kw = dict(num_classes=4, layer_num=2, hidden=16, dropout=0.0)
    m32 = KTGNN(**kw)
    m16 = KTGNN(**kw, msg_dtype="bfloat16")
    variables = m32.init(jax.random.PRNGKey(0), g, adj, False)
    lp32 = m32.apply(variables, g, adj, False)[0]
    lp16 = m16.apply(variables, g, adj, False)[0]
    # log-probs drift bounded by bf16 rounding through 2 conv layers
    drift = np.abs(np.asarray(lp32) - np.asarray(lp16))[
        np.asarray(g.node_mask)
    ]
    assert drift.max() < 0.15, (method, drift.max())
    # and the argmax predictions agree almost everywhere
    agree = (
        np.asarray(lp32).argmax(1) == np.asarray(lp16).argmax(1)
    )[np.asarray(g.node_mask)]
    assert agree.mean() > 0.98, (method, agree.mean())


def test_backward_finite_and_output_dtype(rng):
    d = _graph(rng)
    g = with_self_loops(graph_from_dict(d))
    adj = adjacency_from_graph(g, method="blocked")
    model = KTGNN(num_classes=4, layer_num=2, hidden=16, dropout=0.0,
                  msg_dtype="bfloat16")
    variables = model.init(jax.random.PRNGKey(0), g, adj, False)

    def loss(params):
        lp = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            g, adj, False,
        )[0]
        assert lp.dtype == g.x.dtype  # cast back before the heads
        return -(lp * (lp > -2)).sum()

    grads = jax.grad(loss)(variables["params"])
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.slow
def test_golden_a2d_accuracy_with_bf16_messages(a2d_dict):
    """40 epochs on the shipped office a2d graph with bf16 messages must
    reach the same early-training quality bar as the parity path."""
    cfg = Stage2Config(
        num_epoch=40, hidden=64, to_undirected=True, seed=0,
        matmul_precision="default", message_dtype="bfloat16",
        scan_epochs=20,
    )
    res = train_ktgnn(a2d_dict, cfg)
    assert res["best"]["test"] > 0.6, res["best"]


def test_halo_step_runs_with_bf16_messages(rng):
    """The halo row-partition path applies the same message cast; one
    sharded train step must run finite on the 8-device mesh."""
    from bridged_gnn_tpu.parallel import make_mesh
    from bridged_gnn_tpu.parallel.halopart import make_halo_ktgnn_train_step
    from bridged_gnn_tpu.train.optim import torch_adam

    d = _graph(rng, n=160, e=800, d=16)
    g = with_self_loops(graph_from_dict(d))
    cfg = Stage2Config(hidden=16, use_scheduler=False, dropout=0.0,
                       message_dtype="bfloat16")
    model = KTGNN(num_classes=4, layer_num=2, hidden=16, dropout=0.0,
                  msg_dtype="bfloat16")
    adj = adjacency_from_graph(g, method="gather")
    variables = model.init(jax.random.PRNGKey(0), g, adj, False)
    params, bs = variables["params"], variables["batch_stats"]
    mesh = make_mesh(8)
    train_step, _ = make_halo_ktgnn_train_step(mesh, model, g, cfg)
    tx = torch_adam(cfg.lr, weight_decay=cfg.weight_decay)
    opt_state = tx.init(params)
    _, _, _, loss = train_step(params, bs, opt_state,
                               jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


def test_refuses_non_ktgnn_models(rng):
    d = _graph(rng)
    cfg = Stage2Config(model_name="GraphSAGE", num_epoch=1,
                       message_dtype="bfloat16")
    with pytest.raises(ValueError, match="message_dtype"):
        train_ktgnn(d, cfg)
