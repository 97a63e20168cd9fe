"""Host-side chunk metadata for destination-sorted edge arrays.

For a dst-sorted edge list, each node block's edges form one contiguous
range; ``build_chunk_meta`` computes per-block edge-chunk ranges used by
the native graph-core dispatch (io/native.py) and by chunked reducers.

Extracted from the retired first-generation chunked Pallas segment-sum
(ops/pallas_segment.py, removed round 3 — superseded by the padded
slot-layout kernels in ops/pallas_padded.py, which measured 2.6× faster;
see DESIGN.md §2 and tools/probe_gather2.py for the measurement record).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


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
