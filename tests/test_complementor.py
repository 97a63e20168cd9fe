"""Feature-complementor tests: frontier construction + forward shape/semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from bridged_gnn_tpu.graph import graph_from_dict, with_self_loops
from bridged_gnn_tpu.nn.complementor import (
    AdaptedComplementor,
    build_frontier_edges,
)
from bridged_gnn_tpu.nn.ktgnn import KTGNN
from bridged_gnn_tpu.ops.spmm import adjacency_from_graph


def test_frontier_construction():
    # chain: 0(src) → 1(tar) → 2(tar);  plus 0→2 not present
    ei = np.array([[0, 1], [1, 2]])
    central = np.array([True, False, False])
    fronts = build_frontier_edges(ei, central, step=2)
    assert fronts[0].shape == (2, 1)
    assert tuple(fronts[0][:, 0]) == (0, 1)
    # step 2: front is {1}; edge 1→2 qualifies
    assert fronts[1].shape == (2, 1)
    assert tuple(fronts[1][:, 0]) == (1, 2)


def _pad_frontier(ei, n_pad, e_pad=128):
    s = np.full(e_pad, n_pad - 1, dtype=np.int32)
    r = np.full(e_pad, n_pad - 1, dtype=np.int32)
    m = np.zeros(e_pad, dtype=bool)
    e = ei.shape[1]
    s[:e], r[:e], m[:e] = ei[0], ei[1], True
    return jnp.asarray(s), jnp.asarray(r), jnp.asarray(m)


def test_complementor_forward(rng):
    n, d_o, d_u = 30, 8, 6
    x = rng.normal(size=(n, d_o + d_u)).astype(np.float32)
    central = np.zeros(n, dtype=bool)
    central[:15] = True
    ei = rng.integers(0, n, size=(2, 100))
    g = graph_from_dict(dict(
        x=x, edge_index=ei, y=rng.integers(0, 3, size=n),
        central_mask=central,
    ))
    fronts_np = build_frontier_edges(ei, central, step=2)
    fronts = [_pad_frontier(f, g.num_nodes_padded) for f in fronts_np]
    model = AdaptedComplementor(dim_o=d_o, dim_u=d_u, hidden_o=16,
                                hidden_u=16, step=2, use_dist_loss=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        g.x, fronts, g.central_mask, g.node_mask, True,
    )
    out, loss_dist = model.apply(
        variables, g.x, fronts, g.central_mask, g.node_mask, True,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert out.shape == (g.num_nodes_padded, 32)
    assert loss_dist is not None and np.isfinite(float(loss_dist))
    # central nodes keep their own (projected) unobserved features
    out_eval, _ = model.apply(
        variables, g.x, fronts, g.central_mask, g.node_mask, False,
    )
    assert np.isfinite(np.asarray(out_eval)).all()


def test_ktgnn_with_complementor(rng):
    n, d_o, d_u, c = 24, 6, 4, 3
    x = rng.normal(size=(n, d_o + d_u)).astype(np.float32)
    central = np.zeros(n, dtype=bool)
    central[:12] = True
    ei = rng.integers(0, n, size=(2, 80))
    g = with_self_loops(graph_from_dict(dict(
        x=x, edge_index=ei, y=rng.integers(0, c, size=n),
        train_mask=np.ones(n, dtype=bool), central_mask=central,
    )))
    adj = adjacency_from_graph(g, method="dense")
    fronts_np = build_frontier_edges(g.edge_index_np(),
                                     np.asarray(g.central_mask)[:n], step=1)
    fronts = [_pad_frontier(f, g.num_nodes_padded) for f in fronts_np]
    model = KTGNN(num_classes=c, layer_num=2, hidden=16,
                  need_complement=True, dim_share=d_o, hidden_o=8,
                  hidden_u=8, step=1)
    variables = model.init(jax.random.PRNGKey(0), g, adj, False,
                           frontiers=fronts)
    lp_s, lp_t, lp_that, loss_dist = model.apply(
        variables, g, adj, False, frontiers=fronts
    )
    assert np.isfinite(np.asarray(lp_that)[:n]).all()
