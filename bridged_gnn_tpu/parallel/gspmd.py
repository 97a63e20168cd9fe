"""GSPMD auto-sharding path: pjit + NamedSharding annotations, no shard_map.

The scaling-book recipe: place the edge arrays with an 'edges' sharding and
the node arrays replicated, jit the unmodified single-device train step,
and let XLA's SPMD partitioner insert the collectives. This is the
lowest-friction multi-chip path (model code identical to single-device);
`shard_map` (parallel/edgeshard.py) remains the explicit-collectives
alternative when the partitioner's choices need overriding.
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from bridged_gnn_tpu.graph import Graph
from bridged_gnn_tpu.ops.spmm import Adjacency
from bridged_gnn_tpu.parallel.edgeshard import pad_graph_edges_for_sharding


def shard_graph(mesh: Mesh, g: Graph, axis: str = "edges") -> Graph:
    """Place edge arrays sharded over `axis`, node arrays replicated."""
    g = pad_graph_edges_for_sharding(g, mesh.devices.size)
    edge_s = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def place(name, arr):
        sharding = edge_s if name in (
            "senders", "receivers", "edge_mask"
        ) else rep
        return jax.device_put(arr, sharding)

    return g.replace(**{
        name: place(name, getattr(g, name))
        for name in ("x", "y", "senders", "receivers", "edge_mask",
                     "node_mask", "train_mask", "val_mask", "test_mask",
                     "central_mask")
    })


def gspmd_setup(
    mesh: Mesh, g: Graph, axis: str = "edges"
) -> Tuple[Graph, Adjacency]:
    """Sharded (graph, gather-path adjacency) pair for pjit execution."""
    from bridged_gnn_tpu.ops.spmm import build_adjacency

    g = shard_graph(mesh, g, axis)
    edge_s = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    adj = build_adjacency(
        g.senders, g.receivers, g.edge_mask, g.num_nodes,
        g.num_nodes_padded, method="gather",
    )
    adj = adj.replace(
        senders=jax.device_put(adj.senders, edge_s),
        receivers=jax.device_put(adj.receivers, edge_s),
        edge_mask=jax.device_put(adj.edge_mask, edge_s),
        in_degree=jax.device_put(adj.in_degree, rep),
    )
    return g, adj


# ------------------------------------------------------------------ stage 1

def repad_graph_nodes(g: Graph, multiple: int) -> Graph:
    """Extend the node padding of ``g`` so ``num_nodes_padded`` is a
    multiple of ``multiple`` (shard-evenly divisible row partition).
    Appended rows are pure padding (node_mask False, y = -1); padded edge
    slots keep pointing at the OLD last padded row, which stays a masked
    padding row, so aggregation semantics are unchanged."""
    import numpy as np

    n_pad = g.num_nodes_padded
    target = ((n_pad + multiple - 1) // multiple) * multiple
    if target == n_pad:
        return g
    extra = target - n_pad

    def ext(a, fill):
        a = np.asarray(a)
        pad = np.full((extra,) + a.shape[1:], fill, dtype=a.dtype)
        return np.concatenate([a, pad], axis=0)

    return g.replace(
        x=ext(g.x, 0), y=ext(g.y, -1),
        node_mask=ext(g.node_mask, False),
        train_mask=ext(g.train_mask, False),
        val_mask=ext(g.val_mask, False),
        test_mask=ext(g.test_mask, False),
        central_mask=ext(g.central_mask, False),
    )


def shard_stage1_graph(mesh: Mesh, g: Graph, adj=None,
                       axis: str = "nodes"):
    """Node-row-sharded placement of a stage-1 domain graph (VERDICT r4
    #7: the stage-1 encode previously inherited a single-chip memory
    ceiling). The scaling-book recipe, GSPMD flavor: place the node
    arrays (features, masks, labels) sharded over ``axis`` and leave
    edge/adjacency arrays replicated; the UNMODIFIED stage-1 jitted
    steps then run row-parallel — the MLP backbone encode and BatchNorm
    partition cleanly (XLA inserts the cross-shard mean reduces), and
    pair gathers over the sharded embedding table lower to collective
    gathers. Step code identical to single-device; loss-exact
    (tests/test_stage1_sharded.py)."""
    from bridged_gnn_tpu.graph import NODE_BLOCK

    g = repad_graph_nodes(g, mesh.devices.size * NODE_BLOCK)
    row = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def place_nodes(a):
        return jax.device_put(jax.numpy.asarray(a), row)

    g = g.replace(
        x=place_nodes(g.x), y=place_nodes(g.y),
        node_mask=place_nodes(g.node_mask),
        train_mask=place_nodes(g.train_mask),
        val_mask=place_nodes(g.val_mask),
        test_mask=place_nodes(g.test_mask),
        central_mask=place_nodes(g.central_mask),
        senders=jax.device_put(g.senders, rep),
        receivers=jax.device_put(g.receivers, rep),
        edge_mask=jax.device_put(g.edge_mask, rep),
    )
    if adj is not None:
        adj = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, rep), adj
        )
    return g, adj
