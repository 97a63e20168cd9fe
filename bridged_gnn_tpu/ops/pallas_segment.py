"""Pallas TPU kernel: segment-sum over destination-sorted edges.

Replaces XLA's scatter-add lowering of ``segment_sum`` (≈19 ms for 2M×128
on v5e) with a block-reduction that keeps all FLOPs on the MXU: for each
output node block, iterate the contiguous edge chunks covering it and
accumulate ``one_hot(ids) @ msg`` — a (B×K)·(K×D) matmul per chunk. Edges
sorted by destination make each node block's edges a contiguous range, so
the kernel is a pure streaming read (≈bandwidth-bound).

Grid: (num_node_blocks, max_chunks_per_block); blocks with fewer chunks
skip the tail via @pl.when. Heavy degree skew inflates max_chunks (wasted
grid steps but correct); the metadata builder reports the skew so callers
can fall back to XLA for pathological graphs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class SegmentChunkMeta(NamedTuple):
    """Host-precomputed chunk ranges for one (sorted) edge array."""

    chunk_base: np.ndarray   # [n_blocks] first edge-chunk index per block
    num_chunks: np.ndarray   # [n_blocks] chunks covering each block
    max_chunks: int          # static grid bound
    node_block: int
    edge_chunk: int
    num_blocks: int


def build_chunk_meta(
    receivers: np.ndarray,
    num_edges_padded: int,
    num_nodes_padded: int,
    node_block: int = 256,
    edge_chunk: int = 1024,
) -> SegmentChunkMeta:
    """Compute per-node-block edge-chunk ranges (host side, once per graph)."""
    r = np.asarray(receivers)
    n_blocks = -(-num_nodes_padded // node_block)
    block_edges_start = np.searchsorted(
        r, np.arange(n_blocks) * node_block, side="left"
    )
    block_edges_end = np.searchsorted(
        r, np.arange(1, n_blocks + 1) * node_block, side="left"
    )
    chunk_base = block_edges_start // edge_chunk
    chunk_end = np.where(
        block_edges_end > block_edges_start,
        (block_edges_end - 1) // edge_chunk + 1,
        chunk_base,
    )
    num_chunks = (chunk_end - chunk_base).astype(np.int32)
    max_chunks = int(num_chunks.max()) if len(num_chunks) else 1
    return SegmentChunkMeta(
        chunk_base=chunk_base.astype(np.int32),
        num_chunks=num_chunks,
        max_chunks=max(max_chunks, 1),
        node_block=node_block,
        edge_chunk=edge_chunk,
        num_blocks=n_blocks,
    )


def _kernel(chunk_base_ref, num_chunks_ref, ids_ref, msg_ref, out_ref, *,
            node_block, edge_chunk):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(j < num_chunks_ref[i])
    def _():
        ids = ids_ref[:]                          # [K]
        rel = ids - i * node_block
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (node_block, edge_chunk), 0
        )
        onehot = (rows == rel[None, :]).astype(msg_ref.dtype)
        out_ref[:] += jnp.dot(
            onehot, msg_ref[:], preferred_element_type=jnp.float32
        )


@functools.partial(
    jax.jit,
    static_argnames=("num_nodes_padded", "node_block", "edge_chunk",
                     "max_chunks", "num_blocks"),
)
def segment_sum_sorted_pallas(
    msg: jax.Array,          # [E_pad, D], padded edges must be pre-zeroed
    receivers: jax.Array,    # [E_pad] int32 sorted ascending
    chunk_base: jax.Array,   # [n_blocks] int32
    num_chunks: jax.Array,   # [n_blocks] int32
    num_nodes_padded: int,
    node_block: int,
    edge_chunk: int,
    max_chunks: int,
    num_blocks: int,
) -> jax.Array:
    e_pad, d = msg.shape
    n_chunks_total = e_pad // edge_chunk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_blocks, max_chunks),
        in_specs=[
            pl.BlockSpec(
                (edge_chunk,),
                lambda i, j, cb, nc: (
                    jnp.minimum(cb[i] + j, n_chunks_total - 1),
                ),
            ),
            pl.BlockSpec(
                (edge_chunk, d),
                lambda i, j, cb, nc: (
                    jnp.minimum(cb[i] + j, n_chunks_total - 1), 0
                ),
            ),
        ],
        out_specs=pl.BlockSpec(
            (node_block, d), lambda i, j, cb, nc: (i, 0)
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, node_block=node_block, edge_chunk=edge_chunk
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (num_blocks * node_block, d), jnp.float32
        ),
    )(chunk_base, num_chunks, receivers, msg)
    return out[:num_nodes_padded]


def spmm_pallas(
    x: jax.Array,
    senders: jax.Array,
    receivers: jax.Array,
    edge_mask: jax.Array,
    meta: SegmentChunkMeta,
    num_nodes_padded: int,
    edge_weights: jax.Array | None = None,
) -> jax.Array:
    """Full SpMM: XLA row gather + Pallas sorted segment reduce."""
    msg = x[senders]
    if edge_weights is not None:
        msg = msg * edge_weights[:, None].astype(msg.dtype)
    msg = jnp.where(edge_mask[:, None], msg, 0)
    return segment_sum_sorted_pallas(
        msg, receivers,
        jnp.asarray(meta.chunk_base), jnp.asarray(meta.num_chunks),
        num_nodes_padded, meta.node_block, meta.edge_chunk,
        meta.max_chunks, meta.num_blocks,
    ).astype(x.dtype)
