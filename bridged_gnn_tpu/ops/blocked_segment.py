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
from typing import NamedTuple, Optional

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


@functools.partial(
    jax.jit,
    static_argnames=("num_nodes_padded", "node_block", "max_edges",
                     "num_blocks", "op"),
)
def segment_reduce_blocked_1d(
    vals: jax.Array,       # [E_pad] (pre-masked: 0 for sum, -inf for max)
    ids: jax.Array,        # [E_pad] int32 sorted
    block_start: jax.Array,
    num_nodes_padded: int,
    node_block: int,
    max_edges: int,
    num_blocks: int,
    op: str = "sum",
) -> jax.Array:
    """Scatter-free 1-D segment reduce (sum or max) over sorted ids.

    Same tiling as segment_sum_blocked but the per-block reduction is a
    masked row-reduce on the VPU instead of a matmul — used for the
    attention softmax statistics so the sharded conv layer contains no
    XLA scatters at all."""
    fill = jnp.array(0 if op == "sum" else -1e30, vals.dtype)
    vals_ext = jnp.concatenate(
        [vals, jnp.full((max_edges,), fill, vals.dtype)], axis=0
    )
    ids_ext = jnp.concatenate(
        [ids, jnp.full((max_edges,), num_nodes_padded, jnp.int32)], axis=0
    )
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (node_block, max_edges), 0
    )

    def per_block(i):
        start = block_start[i]
        v = jax.lax.dynamic_slice(vals_ext, (start,), (max_edges,))
        bids = jax.lax.dynamic_slice(ids_ext, (start,), (max_edges,))
        rel = bids - i * node_block
        hit = rows == rel[None, :]
        masked = jnp.where(hit, v[None, :], fill)
        if op == "sum":
            return jnp.sum(masked, axis=1)
        return jnp.max(masked, axis=1)

    out = jax.lax.map(per_block, jnp.arange(num_blocks, dtype=jnp.int32))
    return out.reshape(-1)[:num_nodes_padded]


def segment_softmax_blocked(
    logits: jax.Array,     # [E_pad]
    ids: jax.Array,        # [E_pad] int32 sorted
    mask: jax.Array,       # [E_pad] bool
    block_start: jax.Array,
    num_nodes_padded: int,
    node_block: int,
    max_edges: int,
    num_blocks: int,
) -> jax.Array:
    """Scatter-free segment softmax (torch_geometric.utils.softmax
    semantics, reference models/KTGNN.py:299) over dst-sorted edges."""
    neg = jnp.asarray(-1e30, logits.dtype)
    lm = jnp.where(mask, logits, neg)
    m = segment_reduce_blocked_1d(
        lm, ids, block_start, num_nodes_padded, node_block, max_edges,
        num_blocks, op="max",
    )
    m = jax.lax.stop_gradient(jnp.maximum(m, neg))
    shifted = jnp.where(mask, logits - m[ids], neg)
    e = jnp.exp(shifted)
    denom = segment_reduce_blocked_1d(
        jnp.where(mask, e, 0), ids, block_start, num_nodes_padded,
        node_block, max_edges, num_blocks, op="sum",
    )
    denom = jnp.where(denom == 0, 1.0, denom)
    return e / denom[ids]


def use_matmul_dense_build() -> bool:
    """Scatter dense builds are fine on CPU (and faster there); the
    one-hot-matmul build exists for TPU, where the scatter lowering has
    pathological compile times (results_a2d_tpu_timing.json)."""
    return jax.default_backend() != "cpu"


@functools.partial(
    jax.jit,
    static_argnames=("num_nodes_padded", "node_block", "max_edges",
                     "num_blocks"),
)
def dense_from_edges(
    weights: jax.Array,    # [E_pad] (pre-masked to 0 on padded edges)
    senders: jax.Array,    # [E_pad] int32
    receivers: jax.Array,  # [E_pad] int32 sorted
    block_start: jax.Array,
    num_nodes_padded: int,
    node_block: int,
    max_edges: int,
    num_blocks: int,
) -> jax.Array:
    """dense[r, s] = Σ w over edges (scatter-free).

    Replaces ``zeros.at[r, s].add(w)`` — whose TPU lowering is an O(E)
    serialized scatter with pathological compile times at production
    sizes (results_a2d_tpu_timing.json: 1046 s total on the gather path)
    — with per-receiver-block one-hot matmuls:
    ``dense[rb] = (onehot_r * w) @ onehot_s`` on the MXU. Autodiff gives
    the weight cotangent as transposed matmuls (an SDDMM), also
    scatter-free. Used by the dense aggregation path of AdaptedConv and
    ``build_adjacency`` (reference hot path models/KTGNN.py:303-324)."""
    w_ext = jnp.concatenate(
        [weights, jnp.zeros((max_edges,), weights.dtype)], axis=0
    )
    s_ext = jnp.concatenate(
        [senders, jnp.zeros((max_edges,), jnp.int32)], axis=0
    )
    r_ext = jnp.concatenate(
        [receivers,
         jnp.full((max_edges,), num_nodes_padded, jnp.int32)], axis=0
    )
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (node_block, max_edges), 0
    )
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (max_edges, num_nodes_padded), 1
    )

    def per_block(i):
        start = block_start[i]
        w = jax.lax.dynamic_slice(w_ext, (start,), (max_edges,))
        se = jax.lax.dynamic_slice(s_ext, (start,), (max_edges,))
        re = jax.lax.dynamic_slice(r_ext, (start,), (max_edges,))
        rel = re - i * node_block
        oh_r = (rows == rel[None, :]).astype(weights.dtype) * w[None, :]
        oh_s = (cols == se[:, None]).astype(weights.dtype)
        return jnp.dot(oh_r, oh_s, preferred_element_type=jnp.float32)

    out = jax.lax.map(per_block, jnp.arange(num_blocks, dtype=jnp.int32))
    return out.reshape(num_blocks * node_block, num_nodes_padded)[
        :num_nodes_padded
    ].astype(weights.dtype)


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


class PaddedLayout(NamedTuple):
    """Host-built padded per-block edge layout (one per sort order).

    Edges sorted by key are re-laid into [num_blocks, tile_e] fixed slots
    (block b owns keys [b·nb, (b+1)·nb)); the segment reduce then becomes
    ONE batched one-hot matmul — no lax.map, no dynamic_slice — which XLA
    pipelines end to end. Measured on-chip (tools/bench_spmm_padded.py):
    4.99 ms for 2M edges × 128 bf16 (420 Medges/s, 89% of the measured
    474 Mrows/s gather-engine ceiling) vs 8.5 ms for the lax.map path.
    Slot padding costs 3-6% extra gather rows (pad_frac)."""

    other_slot: jax.Array   # [B*Et] int32: gather ids (non-key endpoint)
    rel_key: jax.Array      # [B, Et] int32: key - b*nb (nb ⇒ no hit)
    slot_edge: jax.Array    # [B*Et] int32: original edge index per slot
    slot_mask: jax.Array    # [B*Et] bool
    node_block: int
    tile_e: int
    num_blocks: int
    num_nodes_padded: int


def build_padded_layout(
    key_sorted: np.ndarray,     # [E] sorted segment keys
    other: np.ndarray,          # [E] the gathered endpoint per edge
    edge_index_orig: np.ndarray,  # [E] original edge ids in this order
    valid: np.ndarray,          # [E] bool
    num_nodes_padded: int,
    node_block: int = 256,
) -> PaddedLayout:
    n = num_nodes_padded
    nb = node_block
    num_blocks = -(-n // nb)
    bounds = np.searchsorted(
        key_sorted, np.arange(num_blocks + 1) * nb, side="left"
    )
    per_block = np.diff(bounds)
    tile_e = ((int(per_block.max()) + 127) // 128) * 128
    other_slot = np.zeros((num_blocks, tile_e), dtype=np.int32)
    rel_key = np.full((num_blocks, tile_e), nb, dtype=np.int32)
    slot_edge = np.zeros((num_blocks, tile_e), dtype=np.int32)
    slot_mask = np.zeros((num_blocks, tile_e), dtype=bool)
    for b in range(num_blocks):
        k = per_block[b]
        sl = slice(bounds[b], bounds[b + 1])
        other_slot[b, :k] = other[sl]
        rel_key[b, :k] = key_sorted[sl] - b * nb
        slot_edge[b, :k] = edge_index_orig[sl]
        slot_mask[b, :k] = valid[sl]
    # invalid (padded) edges must not hit any output row
    rel_key[~slot_mask.reshape(num_blocks, tile_e)] = nb
    return PaddedLayout(
        other_slot=jnp.asarray(other_slot.reshape(-1)),
        rel_key=jnp.asarray(rel_key),
        slot_edge=jnp.asarray(slot_edge.reshape(-1)),
        slot_mask=jnp.asarray(slot_mask.reshape(-1)),
        node_block=nb,
        tile_e=tile_e,
        num_blocks=num_blocks,
        num_nodes_padded=n,
    )


def padded_gather_reduce(
    lay: PaddedLayout, x: jax.Array, w_slot: Optional[jax.Array] = None
) -> jax.Array:
    """out[key] = Σ w·x[other] via one gather + one batched one-hot dot.

    ``w_slot``: per-slot weights [B*Et] (already permuted to slot order
    and masked), or None for unweighted."""
    B, Et, nb = lay.num_blocks, lay.tile_e, lay.node_block
    d = x.shape[1]
    msg = x[lay.other_slot].reshape(B, Et, d)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)
    oh = (rows == lay.rel_key[:, None, :]).astype(x.dtype)
    if w_slot is not None:
        oh = oh * w_slot.reshape(B, 1, Et).astype(x.dtype)
    out = jax.lax.dot_general(
        oh, msg, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B * nb, d)[: lay.num_nodes_padded]


class BlockedOps(NamedTuple):
    """Scatter-free edge ops bound to one (dst-sorted) edge array.

    spmm(x [N,D], w [E]) -> [N,D]       weighted aggregation by destination
    pair_sum(u [N,D])    -> [E,D]       u[senders]+u[receivers] (masked 0)

    Both carry custom VJPs whose backward passes are blocked one-hot-matmul
    segment reductions (sender- and destination-sorted) instead of XLA
    scatters.
    """

    spmm: object
    pair_sum: object


def make_blocked_ops(
    senders: np.ndarray,
    receivers: np.ndarray,
    edge_mask: np.ndarray,
    num_nodes_padded: int,
    node_block: int = 256,
) -> BlockedOps:
    s = np.asarray(senders).astype(np.int64)
    r = np.asarray(receivers).astype(np.int64)
    em = np.asarray(edge_mask)
    e = len(s)
    eid = np.arange(e)
    # dst-keyed layout (edges already dst-sorted by the Graph container)
    lay_dst = build_padded_layout(
        r, s.astype(np.int32), eid, em, num_nodes_padded, node_block
    )
    # src-keyed layout for the backward-by-sender reduction
    perm = np.argsort(s, kind="stable")
    lay_src = build_padded_layout(
        s[perm], r[perm].astype(np.int32), eid[perm], em[perm],
        num_nodes_padded, node_block,
    )

    senders_j = jnp.asarray(s.astype(np.int32))
    receivers_j = jnp.asarray(r.astype(np.int32))
    mask_j = jnp.asarray(em)

    def slot_w(lay, w):
        return (
            w[lay.slot_edge] * lay.slot_mask.astype(w.dtype)
        )

    @jax.custom_vjp
    def spmm_fast(x, w):
        wm = jnp.where(mask_j, w, 0)
        return padded_gather_reduce(
            lay_dst, x, slot_w(lay_dst, wm.astype(x.dtype))
        ).astype(x.dtype)

    def spmm_fwd(x, w):
        return spmm_fast(x, w), (x, w)

    def spmm_bwd(res, dout):
        x, w = res
        dout = dout.astype(x.dtype)
        wm = jnp.where(mask_j, w, 0).astype(x.dtype)
        # dx[u] = Σ_{(u,v)} w_uv · dout[v]  — src-keyed padded reduce
        dx = padded_gather_reduce(
            lay_src, dout, slot_w(lay_src, wm)
        ).astype(x.dtype)
        # dw_uv = dout[v] · x[u]
        dmsg = jnp.where(mask_j[:, None], dout[receivers_j], 0)
        dw = jnp.sum(dmsg * x[senders_j], axis=-1).astype(w.dtype)
        return dx, dw

    spmm_fast.defvjp(spmm_fwd, spmm_bwd)

    @jax.custom_vjp
    def pair_sum(u):
        e = u[senders_j] + u[receivers_j]
        return jnp.where(mask_j[:, None], e, 0)

    def ps_fwd(u):
        return pair_sum(u), None

    def ps_bwd(_, de):
        de = jnp.where(mask_j[:, None], de, 0)

        # du = Σ_{e: s_e=u} de[e] + Σ_{e: r_e=u} de[e]; the padded
        # layouts reduce the de rows permuted into each slot order
        def reduce_rows(lay):
            B, Et, nb = lay.num_blocks, lay.tile_e, lay.node_block
            d = de.shape[-1]
            vals = de[lay.slot_edge].reshape(B, Et, d)
            rws = jax.lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)
            oh = (rws == lay.rel_key[:, None, :]).astype(de.dtype)
            oh = oh * lay.slot_mask.astype(de.dtype).reshape(B, 1, Et)
            out = jax.lax.dot_general(
                oh, vals, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            return out.reshape(B * nb, d)[: lay.num_nodes_padded]

        du = reduce_rows(lay_dst) + reduce_rows(lay_src)
        return (du.astype(de.dtype),)

    pair_sum.defvjp(ps_fwd, ps_bwd)
    return BlockedOps(spmm=spmm_fast, pair_sum=pair_sum)


def make_spmm_fast(
    senders: np.ndarray,
    receivers: np.ndarray,
    edge_mask: np.ndarray,
    num_nodes_padded: int,
    node_block: int = 256,
):
    """Back-compat wrapper: the custom-VJP SpMM from make_blocked_ops."""
    return make_blocked_ops(
        senders, receivers, edge_mask, num_nodes_padded, node_block
    ).spmm
