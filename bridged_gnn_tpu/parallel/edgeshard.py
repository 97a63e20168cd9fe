"""Edge-sharded SPMD execution of GNN training over a device mesh.

The scaling axis for full-batch GNN training is edges (SURVEY §2c): the
edge set is partitioned across devices on a 1-D mesh, node-indexed arrays
(features, masks, parameters) stay replicated, and per-node partial
aggregates are combined with ``psum``/``pmax`` collectives that XLA places on
ICI. Because every destination-keyed reduction happens inside the segment
ops (which take ``axis_name``), the *same model code* runs single-device or
N-way sharded — single-device is the degenerate 1-device mesh.

This is the analogue of the reference's missing distribution layer; the
reference is strictly single-GPU (SURVEY §2c).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from bridged_gnn_tpu.graph import Graph, round_up
from bridged_gnn_tpu.ops.segment import segment_sum
from bridged_gnn_tpu.ops.spmm import Adjacency
from bridged_gnn_tpu.train.optim import torch_adam
from bridged_gnn_tpu.train.stage2 import kl_batchmean, masked_nll


def pad_graph_edges_for_sharding(g: Graph, n_shards: int) -> Graph:
    """Pad the edge arrays so E_pad divides n_shards (keeps dst-sorted
    order; extra slots are masked)."""
    e_pad = g.num_edges_padded
    target = round_up(e_pad, n_shards * 128)
    if target == e_pad:
        return g
    extra = target - e_pad
    fill = g.num_nodes_padded - 1

    def pad_e(a, value):
        return jnp.concatenate(
            [a, jnp.full((extra,), value, dtype=a.dtype)]
        )

    return g.replace(
        senders=pad_e(g.senders, fill),
        receivers=pad_e(g.receivers, fill),
        edge_mask=pad_e(g.edge_mask, False),
    )


def sharded_spmm(
    mesh: Mesh,
    g: Graph,
    x: jax.Array,
    edge_weights: Optional[jax.Array] = None,
    axis: str = "edges",
) -> jax.Array:
    """Standalone edge-sharded SpMM (sum) over a mesh: local gather +
    segment-sum per edge shard, psum across shards."""

    if edge_weights is None:
        edge_weights = jnp.ones(g.num_edges_padded, dtype=x.dtype)

    def body(senders, receivers, edge_mask, x, w):
        msg = x[senders] * w[:, None]
        return segment_sum(
            msg, receivers, x.shape[0], mask=edge_mask,
            indices_are_sorted=False, axis_name=axis,
        )

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P(axis)),
        out_specs=P(),
    )
    return f(g.senders, g.receivers, g.edge_mask, x, edge_weights)


def make_sharded_ktgnn_train_step(
    mesh: Mesh,
    model,
    g: Graph,
    cfg,
    axis: str = "edges",
) -> Callable:
    """Jitted full KT-GNN train step with the edge set sharded over `mesh`.

    Returns (params, batch_stats, opt_state, rng) → updated tuple + loss.
    Parameters/optimizer state are replicated; gradients come out replicated
    because the loss is computed identically on every device after psum.
    """
    n_dev = mesh.devices.size
    g = pad_graph_edges_for_sharding(g, n_dev)
    tar_train = g.train_mask & (~g.central_mask)
    tx = torch_adam(cfg.lr, weight_decay=cfg.weight_decay)

    def device_loss(params, batch_stats, dropout_rng,
                    senders, receivers, edge_mask,
                    x, y, node_mask, central_mask, train_mask, tt_mask,
                    in_degree):
        # rebuild a device-local view of graph + adjacency (edge shard)
        gl = g.replace(
            x=x, y=y, senders=senders, receivers=receivers,
            edge_mask=edge_mask, node_mask=node_mask,
            central_mask=central_mask, train_mask=train_mask,
        )
        adj = Adjacency(
            senders=senders, receivers=receivers, edge_mask=edge_mask,
            dense=None, in_degree=in_degree, num_nodes=g.num_nodes,
        )
        outs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            gl, adj, True,
            rngs={"dropout": dropout_rng},
            mutable=["batch_stats"],
        )
        lp_s, lp_t, lp_that, _ = outs
        loss_s = masked_nll(lp_s, y, train_mask)
        loss_t1 = masked_nll(lp_t, y, tt_mask)
        loss_t2 = masked_nll(lp_that, y, tt_mask)
        loss_kl = kl_batchmean(lp_that, lp_t, node_mask)
        loss = (2.0 * loss_s + loss_t1 + loss_t2) / 4.0 + cfg.Lambda * loss_kl
        return loss, mutated["batch_stats"]

    def step(params, batch_stats, opt_state, dropout_rng,
             senders, receivers, edge_mask, in_degree,
             x, y, node_mask, central_mask, train_mask, tt_mask):
        (loss, new_bs), grads = jax.value_and_grad(
            device_loss, has_aux=True
        )(params, batch_stats, dropout_rng, senders, receivers, edge_mask,
          x, y, node_mask, central_mask, train_mask, tt_mask, in_degree)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss

    edge_spec, rep = P(axis), P()
    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep,
                  edge_spec, edge_spec, edge_spec, rep,
                  rep, rep, rep, rep, rep, rep),
        out_specs=(rep, rep, rep, rep),
        # check_vma stays ON: with unchecked replication shard_map's
        # collective transposes are wrong and gradients silently lose the
        # other devices' edge contributions (verified empirically).
    )

    # global in-degree (includes all shards) for any mean-reduce consumers
    in_degree = segment_sum(
        g.edge_mask.astype(jnp.float32), g.receivers, g.num_nodes_padded,
        indices_are_sorted=True,
    )

    @jax.jit
    def train_step(params, batch_stats, opt_state, dropout_rng):
        return sharded(
            params, batch_stats, opt_state, dropout_rng,
            g.senders, g.receivers, g.edge_mask, in_degree,
            g.x, g.y, g.node_mask, g.central_mask, g.train_mask, tar_train,
        )

    return train_step, g
