"""GSPMD auto-sharding path: pjit with sharded edge arrays matches the
single-device forward (XLA inserts the collectives)."""

import jax
import jax.numpy as jnp
import numpy as np

from bridged_gnn_tpu.graph import graph_from_dict, with_self_loops
from bridged_gnn_tpu.nn.ktgnn import KTGNN
from bridged_gnn_tpu.ops.spmm import adjacency_from_graph
from bridged_gnn_tpu.parallel import make_mesh
from bridged_gnn_tpu.parallel.gspmd import gspmd_setup


def test_gspmd_forward_matches(rng):
    n, e, dd, c = 60, 300, 16, 4
    ei = rng.integers(0, n, size=(2, e))
    central = np.zeros(n, bool)
    central[:30] = True
    d = dict(
        x=rng.normal(size=(n, dd)).astype(np.float32), edge_index=ei,
        y=rng.integers(0, c, size=n), train_mask=np.ones(n, bool),
        val_mask=np.zeros(n, bool), test_mask=np.zeros(n, bool),
        central_mask=central,
    )
    g = with_self_loops(graph_from_dict(d))
    adj = adjacency_from_graph(g, method="gather")
    model = KTGNN(num_classes=c, layer_num=2, hidden=16)
    variables = model.init(jax.random.PRNGKey(0), g, adj, False)
    ref = model.apply(variables, g, adj, False)[2]

    mesh = make_mesh(8)
    g_sh, adj_sh = gspmd_setup(mesh, g)
    out = jax.jit(lambda v, gg, aa: model.apply(v, gg, aa, False)[2])(
        variables, g_sh, adj_sh
    )
    np.testing.assert_allclose(
        np.asarray(out)[:n], np.asarray(ref)[:n], rtol=1e-4, atol=1e-5
    )
