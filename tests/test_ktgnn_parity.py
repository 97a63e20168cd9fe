"""Equivalence of the TPU single-edge-array KT-GNN against the reference's
dual-partition formulation (torch oracle), on random graphs and weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import torch_oracle_ktgnn as oracle
from bridged_gnn_tpu.graph import graph_from_dict, with_self_loops
from bridged_gnn_tpu.nn.ktgnn import KTGNN
from bridged_gnn_tpu.ops.spmm import adjacency_from_graph


def make_graph(rng, n=40, e=150, d=12, c=4):
    ei = rng.integers(0, n, size=(2, e))
    central = np.zeros(n, dtype=bool)
    central[rng.permutation(n)[: n // 2]] = True
    y = rng.integers(0, c, size=n)
    return dict(
        x=rng.normal(size=(n, d)).astype(np.float32),
        edge_index=ei,
        y=y,
        train_mask=rng.random(n) < 0.5,
        val_mask=np.zeros(n, dtype=bool),
        test_mask=np.zeros(n, dtype=bool),
        central_mask=central,
    )


@pytest.mark.parametrize("method", ["dense", "gather", "blocked"])
def test_ktgnn_forward_parity(rng, method):
    d = make_graph(rng)
    g = with_self_loops(graph_from_dict(d))
    adj = adjacency_from_graph(g, method=method)
    model = KTGNN(num_classes=4, layer_num=2, hidden=16, use_bn=True)
    variables = model.init(jax.random.PRNGKey(1), g, adj, False)
    lp_s, lp_t, lp_that, _ = model.apply(variables, g, adj, False)

    # torch oracle on the unpadded graph with the same weights
    n = g.num_nodes
    ei = g.edge_index_np()
    central = np.asarray(g.central_mask)[:n]
    e1 = torch.from_numpy(ei[:, central[ei[1]]])
    e2 = torch.from_numpy(ei[:, ~central[ei[1]]])
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    t_s, t_t, t_that = oracle.ktgnn_forward(
        oracle.t(d["x"]), e1, e2, torch.from_numpy(central), params, stats
    )
    np.testing.assert_allclose(
        np.asarray(lp_s)[:n], t_s.numpy(), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(lp_t)[:n], t_t.numpy(), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(lp_that)[:n], t_that.numpy(), rtol=2e-4, atol=2e-5
    )


def test_ktgnn_padding_invariance(rng):
    """Outputs on real nodes must not depend on padding amount."""
    d = make_graph(rng, n=40)
    g1 = with_self_loops(graph_from_dict(d))
    model = KTGNN(num_classes=4, layer_num=2, hidden=16, use_bn=True)
    adj1 = adjacency_from_graph(g1, method="dense")
    variables = model.init(jax.random.PRNGKey(1), g1, adj1, False)
    out1 = model.apply(variables, g1, adj1, False)[2]

    # same graph, much larger padding
    from bridged_gnn_tpu.graph import build_graph

    ei = g1.edge_index_np()
    g2 = build_graph(
        d["x"], ei, y=d["y"], train_mask=d["train_mask"],
        val_mask=d["val_mask"], test_mask=d["test_mask"],
        central_mask=d["central_mask"], node_pad=64, edge_pad=512,
        sort_edges=True,
    )
    adj2 = adjacency_from_graph(g2, method="dense")
    out2 = model.apply(variables, g2, adj2, False)[2]
    np.testing.assert_allclose(
        np.asarray(out1)[:40], np.asarray(out2)[:40], rtol=1e-4, atol=1e-5
    )
