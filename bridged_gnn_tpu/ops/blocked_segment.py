"""Blocked one-hot-matmul segment-sum in pure XLA (no Pallas).

Same algorithm as ops/pallas_segment.py — for each node block, reduce its
contiguous (dst-sorted) edge range with ``one_hot(ids) @ msg`` matmuls on
the MXU — expressed with ``lax.map`` + ``dynamic_slice`` so it compiles
through stock XLA. This path exists because remote Mosaic compilation is
not always available; XLA fuses the slice+compare+dot body into a single
pipelined loop and still beats the scatter-add lowering of segment_sum.

Requires host-side per-block edge offsets and a static max-edges-per-block
bound (degree skew inflates the bound; build_block_meta reports it).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class BlockMeta(NamedTuple):
    block_start: np.ndarray  # [n_blocks] first edge index of each block
    max_edges: int           # static per-block bound (multiple of 128)
    node_block: int
    num_blocks: int


def build_block_meta(
    receivers_sorted: np.ndarray,
    num_nodes_padded: int,
    node_block: int = 256,
) -> BlockMeta:
    r = np.asarray(receivers_sorted)
    n_blocks = -(-num_nodes_padded // node_block)
    bounds = np.searchsorted(
        r, np.arange(n_blocks + 1) * node_block, side="left"
    )
    per_block = np.diff(bounds)
    max_e = int(per_block.max()) if len(per_block) else 1
    max_e = ((max_e + 127) // 128) * 128
    return BlockMeta(
        block_start=bounds[:-1].astype(np.int32),
        max_edges=max(max_e, 128),
        node_block=node_block,
        num_blocks=n_blocks,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_nodes_padded", "node_block", "max_edges",
                     "num_blocks"),
)
def segment_sum_blocked(
    msg: jax.Array,        # [E_pad, D] (padded edges pre-zeroed)
    receivers: jax.Array,  # [E_pad] int32 sorted
    block_start: jax.Array,  # [n_blocks] int32
    num_nodes_padded: int,
    node_block: int,
    max_edges: int,
    num_blocks: int,
) -> jax.Array:
    e_pad, d = msg.shape
    # sentinel tail so dynamic_slice never clamps into earlier edges
    msg_ext = jnp.concatenate(
        [msg, jnp.zeros((max_edges, d), msg.dtype)], axis=0
    )
    ids_ext = jnp.concatenate(
        [receivers,
         jnp.full((max_edges,), num_nodes_padded, jnp.int32)], axis=0
    )
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (node_block, max_edges), 0
    )

    def per_block(i):
        start = block_start[i]
        chunk = jax.lax.dynamic_slice(msg_ext, (start, 0), (max_edges, d))
        ids = jax.lax.dynamic_slice(ids_ext, (start,), (max_edges,))
        rel = ids - i * node_block
        onehot = (rows == rel[None, :]).astype(msg.dtype)
        return jnp.dot(onehot, chunk, preferred_element_type=jnp.float32)

    out = jax.lax.map(per_block, jnp.arange(num_blocks, dtype=jnp.int32))
    return out.reshape(num_blocks * node_block, d)[:num_nodes_padded]


def spmm_blocked(
    x: jax.Array,
    senders: jax.Array,
    receivers: jax.Array,
    edge_mask: jax.Array,
    meta: BlockMeta,
    num_nodes_padded: int,
    edge_weights: jax.Array | None = None,
) -> jax.Array:
    msg = x[senders]
    if edge_weights is not None:
        msg = msg * edge_weights[:, None].astype(msg.dtype)
    msg = jnp.where(edge_mask[:, None], msg, 0)
    return segment_sum_blocked(
        msg, receivers, jnp.asarray(meta.block_start), num_nodes_padded,
        meta.node_block, meta.max_edges, meta.num_blocks,
    ).astype(x.dtype)


def make_spmm_fast(
    senders: np.ndarray,
    receivers: np.ndarray,
    edge_mask: np.ndarray,
    num_nodes_padded: int,
    node_block: int = 256,
):
    """Build a custom-VJP SpMM whose backward also runs as blocked one-hot
    matmuls — no XLA scatters in either direction.

    Forward (dst-sorted edges): out[v] = Σ w_e·x[src_e].
    Backward:
      dx[u]  = Σ_{e: src_e=u} w_e·dout[dst_e]  — a segment reduction over
               the SAME edges sorted by sender (permutation precomputed);
      dw_e   = x[src_e]·dout[dst_e]            — two gathers + a row dot.

    XLA's scatter-add lowering (the autodiff VJP of gather) costs ~19 ms
    per 2M×128 on v5e; the blocked reduction costs ~6 ms and the gathers
    ~5 ms, so training steps lose their scatter tax.

    Returns fn(x, edge_weights) -> out ([N_pad, D]); pass
    ``edge_weights=None`` via a ones vector of length E_pad.
    """
    s = np.asarray(senders)
    r = np.asarray(receivers)
    em = np.asarray(edge_mask)
    meta_dst = build_block_meta(r, num_nodes_padded, node_block)
    perm = np.argsort(s, kind="stable")
    s_sorted = s[perm]
    meta_src = build_block_meta(s_sorted, num_nodes_padded, node_block)

    senders_j = jnp.asarray(s.astype(np.int32))
    receivers_j = jnp.asarray(r.astype(np.int32))
    mask_j = jnp.asarray(em)
    perm_j = jnp.asarray(perm.astype(np.int32))
    s_sorted_j = jnp.asarray(s_sorted.astype(np.int32))
    bs_dst = jnp.asarray(meta_dst.block_start)
    bs_src = jnp.asarray(meta_src.block_start)

    @jax.custom_vjp
    def spmm_fast(x, w):
        msg = x[senders_j] * w[:, None].astype(x.dtype)
        msg = jnp.where(mask_j[:, None], msg, 0)
        return segment_sum_blocked(
            msg, receivers_j, bs_dst, num_nodes_padded,
            meta_dst.node_block, meta_dst.max_edges, meta_dst.num_blocks,
        ).astype(x.dtype)

    def fwd(x, w):
        return spmm_fast(x, w), (x, w)

    def bwd(res, dout):
        x, w = res
        dout = dout.astype(x.dtype)
        dmsg = dout[receivers_j]                      # [E, D] gather
        dmsg = jnp.where(mask_j[:, None], dmsg, 0)
        dw = jnp.sum(dmsg * x[senders_j], axis=-1).astype(w.dtype)
        contrib = (dmsg * w[:, None].astype(x.dtype))[perm_j]
        dx = segment_sum_blocked(
            contrib, s_sorted_j, bs_src, num_nodes_padded,
            meta_src.node_block, meta_src.max_edges, meta_src.num_blocks,
        ).astype(x.dtype)
        return dx, dw

    spmm_fast.defvjp(fwd, bwd)
    return spmm_fast
