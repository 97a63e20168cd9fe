"""Row-partitioned (node-sharded) SpMM: the low-communication layout.

Nodes are split into contiguous row blocks, one per device; because edges
are destination-sorted, each device's incoming edges form one contiguous
range. With features replicated at layer input, every device reduces its
own rows with **zero forward communication**; the single collective per
layer is the all-gather that re-replicates the output (vs the edge-shard
layout's psum of full per-node partials — half the wire bytes and no
reduction tree).

Trade-off vs edge sharding (parallel/edgeshard.py): load balance follows
the degree distribution of the row blocks rather than being exact, and
the host must bucket+pad edges per shard (done here once per graph).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from bridged_gnn_tpu.graph import Graph, round_up
from bridged_gnn_tpu.ops.segment import segment_sum


class RowPartition(NamedTuple):
    senders: np.ndarray     # [n_dev * e_shard] int32 (bucketed + padded)
    receivers: np.ndarray   # [n_dev * e_shard] int32 (LOCAL row ids)
    edge_mask: np.ndarray   # [n_dev * e_shard] bool
    rows_per_shard: int
    edges_per_shard: int
    num_shards: int


def build_row_partition(g: Graph, n_shards: int) -> RowPartition:
    """Bucket dst-sorted edges by destination row block, pad each bucket to
    the max bucket size (host, once per graph)."""
    n_pad = g.num_nodes_padded
    rows = round_up(n_pad, n_shards) // n_shards
    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    em = np.asarray(g.edge_mask)
    shard_of_edge = r // rows
    counts = np.bincount(shard_of_edge[em], minlength=n_shards)
    e_shard = round_up(max(int(counts.max()), 1), 128)

    out_s = np.zeros((n_shards, e_shard), dtype=np.int32)
    out_r = np.full((n_shards, e_shard), rows - 1, dtype=np.int32)
    out_m = np.zeros((n_shards, e_shard), dtype=bool)
    for d in range(n_shards):
        sel = em & (shard_of_edge == d)
        k = int(sel.sum())
        out_s[d, :k] = s[sel]
        out_r[d, :k] = r[sel] - d * rows
        out_m[d, :k] = True
    return RowPartition(
        senders=out_s.reshape(-1),
        receivers=out_r.reshape(-1),
        edge_mask=out_m.reshape(-1),
        rows_per_shard=rows,
        edges_per_shard=e_shard,
        num_shards=n_shards,
    )


def rowpart_spmm(
    mesh: Mesh,
    part: RowPartition,
    x: jax.Array,
    edge_weights_sharded: jax.Array | None = None,
    axis: str = "edges",
    gather_output: bool = True,
) -> jax.Array:
    """out[v] = Σ_{(u,v)} x[u] with rows of out owned per device."""

    def body(senders, receivers, edge_mask, x):
        msg = x[senders]
        local = segment_sum(
            msg, receivers, part.rows_per_shard, mask=edge_mask,
            indices_are_sorted=True,
        )
        if gather_output:
            return jax.lax.all_gather(local, axis, axis=0, tiled=True)
        return local

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P()),
        out_specs=P() if gather_output else P(axis),
        check_vma=False,
    )
    out = f(
        jnp.asarray(part.senders), jnp.asarray(part.receivers),
        jnp.asarray(part.edge_mask), x,
    )
    return out
