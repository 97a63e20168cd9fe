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
