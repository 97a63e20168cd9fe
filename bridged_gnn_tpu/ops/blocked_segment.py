"""Blocked one-hot-matmul segment-sum in pure XLA (no Pallas).

Same algorithm as the retired chunked Pallas kernel (now ops/chunk_meta.py
keeps only its host meta builder) — for each node block, reduce its
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


def _padded_layout_np(
    key_sorted: np.ndarray,
    other: np.ndarray,
    edge_index_orig: np.ndarray,
    valid: np.ndarray,
    num_nodes_padded: int,
    node_block: int,
    min_tile_e: int = 0,
):
    """Host slot assignment; returns numpy arrays (see PaddedLayout).

    ``min_tile_e`` forces a larger static slot width — used to keep the
    layout shape uniform across shards of a row partition."""
    n = num_nodes_padded
    nb = node_block
    num_blocks = -(-n // nb)
    bounds = np.searchsorted(
        key_sorted, np.arange(num_blocks + 1) * nb, side="left"
    )
    per_block = np.diff(bounds)
    tile_e = ((max(int(per_block.max()), min_tile_e, 1) + 127) // 128) * 128
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
    rel_key[~slot_mask] = nb
    return other_slot, rel_key, slot_edge, slot_mask, tile_e, num_blocks


def _layout_from_np(arrs, num_nodes_padded: int, node_block: int):
    other_slot, rel_key, slot_edge, slot_mask, tile_e, num_blocks = arrs
    return PaddedLayout(
        other_slot=jnp.asarray(other_slot.reshape(-1)),
        rel_key=jnp.asarray(rel_key),
        slot_edge=jnp.asarray(slot_edge.reshape(-1)),
        slot_mask=jnp.asarray(slot_mask.reshape(-1)),
        node_block=node_block,
        tile_e=tile_e,
        num_blocks=num_blocks,
        num_nodes_padded=num_nodes_padded,
    )


def build_padded_layout(
    key_sorted: np.ndarray,     # [E] sorted segment keys
    other: np.ndarray,          # [E] the gathered endpoint per edge
    edge_index_orig: np.ndarray,  # [E] original edge ids in this order
    valid: np.ndarray,          # [E] bool
    num_nodes_padded: int,
    node_block: int = 256,
) -> PaddedLayout:
    return _layout_from_np(
        _padded_layout_np(
            key_sorted, other, edge_index_orig, valid, num_nodes_padded,
            node_block,
        ),
        num_nodes_padded, node_block,
    )


# Which backend executes the padded one-hot reduces: 'xla' (batched
# dot_general) or 'pallas' (compiled Mosaic kernel, ops/pallas_padded.py).
# Both produce identical results; selection is a perf knob. Env
# BGNN_PALLAS=1 flips the default at import.
import os as _os

_REDUCE_IMPL = "pallas" if _os.environ.get("BGNN_PALLAS") == "1" else "xla"


def set_reduce_impl(name: str) -> None:
    global _REDUCE_IMPL
    if name not in ("xla", "pallas"):
        raise ValueError(f"unknown reduce impl: {name}")
    _REDUCE_IMPL = name


def get_reduce_impl() -> str:
    return _REDUCE_IMPL


def padded_slot_reduce(
    lay: PaddedLayout, vals: jax.Array, w_slot: Optional[jax.Array] = None
) -> jax.Array:
    """out[key] = Σ_slots w·vals over slots hitting that key row.

    ``vals``: per-slot rows, [B, Et, D] (or [B*Et, D]) already in this
    layout's slot order. ``w_slot``: per-slot weights [B, Et] / [B*Et]
    or None. Invalid (padding) slots are masked out. One batched one-hot
    ``dot_general`` on the MXU — the reduce half of padded_gather_reduce,
    reusable when the rows are already gathered (fused attention,
    pair_sum backward)."""
    B, Et, nb = lay.num_blocks, lay.tile_e, lay.node_block
    vals = vals.reshape(B, Et, -1)
    d = vals.shape[-1]
    if _REDUCE_IMPL == "pallas":
        from bridged_gnn_tpu.ops import pallas_padded

        if pallas_padded.fits_vmem(Et, nb, d, vals.dtype.itemsize):
            return pallas_padded.slot_reduce_pallas(lay, vals, w_slot)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)
    oh = (rows == lay.rel_key[:, None, :]).astype(vals.dtype)
    w = lay.slot_mask.reshape(B, 1, Et).astype(vals.dtype)
    if w_slot is not None:
        w = w * w_slot.reshape(B, 1, Et).astype(vals.dtype)
    out = jax.lax.dot_general(
        oh * w, vals, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B * nb, d)[: lay.num_nodes_padded]


def padded_block_expand(lay: PaddedLayout, blk_vals: jax.Array) -> jax.Array:
    """slot[b, e] = blk_vals[b, rel_key[b, e]] (0 for padding slots).

    ``blk_vals``: [B, nb, D] per-(block, key-row) values. Expansion runs
    as the transposed one-hot batched matmul — NO per-element gather, so
    it never touches the issue-rate-bound gather engine (DESIGN.md §2).
    Autodiff gives the transposed matmul (a slot reduce), also
    scatter-free. Returns [B, Et, D]."""
    B, Et, nb = lay.num_blocks, lay.tile_e, lay.node_block
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nb), 2)
    oh_t = (lay.rel_key[:, :, None] == cols).astype(blk_vals.dtype)
    return jax.lax.dot_general(
        oh_t, blk_vals, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(blk_vals.dtype)


def padded_dst_expand(lay: PaddedLayout, u: jax.Array) -> jax.Array:
    """slot[b, e] = u[key-node of slot (b,e)] — the destination-side row
    per edge slot, [B, Et, D]. Padding-slot rows are 0."""
    B, nb = lay.num_blocks, lay.node_block
    n_full = B * nb
    u_pad = jnp.pad(u, ((0, n_full - u.shape[0]), (0, 0)))
    return padded_block_expand(lay, u_pad.reshape(B, nb, -1))


def padded_gather_reduce(
    lay: PaddedLayout, x: jax.Array, w_slot: Optional[jax.Array] = None
) -> jax.Array:
    """out[key] = Σ w·x[other] via one gather + one batched one-hot dot.

    ``w_slot``: per-slot weights [B*Et] (already permuted to slot order
    and masked), or None for unweighted."""
    B, Et, nb = lay.num_blocks, lay.tile_e, lay.node_block
    d = x.shape[1]
    msg = x[lay.other_slot].reshape(B, Et, d)
    if _REDUCE_IMPL == "pallas":
        from bridged_gnn_tpu.ops import pallas_padded

        if pallas_padded.fits_vmem(Et, nb, d, msg.dtype.itemsize):
            return pallas_padded.slot_reduce_pallas(lay, msg, w_slot)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)
    oh = (rows == lay.rel_key[:, None, :]).astype(x.dtype)
    if w_slot is not None:
        oh = oh * w_slot.reshape(B, 1, Et).astype(x.dtype)
    out = jax.lax.dot_general(
        oh, msg, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B * nb, d)[: lay.num_nodes_padded]


def float0_zeros(tree):
    """Symbolic-zero cotangents for an integer/bool pytree (what
    custom_vjp backward rules must return for non-inexact primals)."""
    return jax.tree_util.tree_map(
        lambda a: np.zeros(jnp.shape(a), jax.dtypes.float0), tree
    )


def _lay_arrays(lay: PaddedLayout) -> dict:
    return dict(other=lay.other_slot, rel=lay.rel_key,
                edge=lay.slot_edge, mask=lay.slot_mask)


def _lay_from(arrs: dict, meta: PaddedLayout) -> PaddedLayout:
    """PaddedLayout from (possibly traced) arrays + static dims."""
    return PaddedLayout(
        other_slot=arrs["other"], rel_key=arrs["rel"],
        slot_edge=arrs["edge"], slot_mask=arrs["mask"],
        node_block=meta.node_block, tile_e=meta.tile_e,
        num_blocks=meta.num_blocks,
        num_nodes_padded=meta.num_nodes_padded,
    )


def make_slot_gather(
    lay_dst: PaddedLayout,
    lay_src: PaddedLayout,
    src_from_dst: jax.Array,
):
    """Custom-VJP gather of rows into dst-block slot order: [B, Et, D].

    Backward is the src-keyed padded one-hot reduce (no scatter): the
    slot cotangents are re-ordered dst-slot -> src-slot with a
    host-precomputed index map, then reduced by sender.

    The layout arrays ride through the custom_vjp as an explicit aux
    primal (float0 cotangents), NEVER as closure captures: a custom_vjp
    backward referencing arrays captured from an outer trace fails at
    transposition ("no constant handler" / UnexpectedTracerError), and
    the arrays may well be tracers — jit arguments (rebind_blocked_ops)
    or shard_map-local slices (parallel/halopart.py). Only the static
    dims stay in the closure."""
    aux0 = dict(ld=_lay_arrays(lay_dst), ls=_lay_arrays(lay_src),
                sfd=src_from_dst)
    meta_dst, meta_src = lay_dst, lay_src

    @jax.custom_vjp
    def _gather(x, aux):
        return x[aux["ld"]["other"]].reshape(
            meta_dst.num_blocks, meta_dst.tile_e, -1
        )

    def gsl_fwd(x, aux):
        return _gather(x, aux), (x.shape[0], aux)

    def gsl_bwd(res, dm):
        n_rows, aux = res
        dm_flat = dm.reshape(-1, dm.shape[-1])
        du = padded_slot_reduce(
            _lay_from(aux["ls"], meta_src), dm_flat[aux["sfd"]]
        )
        return du[:n_rows].astype(dm.dtype), float0_zeros(aux)

    _gather.defvjp(gsl_fwd, gsl_bwd)

    def gather_slots(x):
        return _gather(x, aux0)

    return gather_slots


class BlockedOps(NamedTuple):
    """Scatter-free edge ops bound to one (dst-sorted) edge array.

    spmm(x [N,D], w [E]) -> [N,D]       weighted aggregation by destination
    pair_sum(u [N,D])    -> [E,D]       u[senders]+u[receivers] (masked 0)
    gather_slots(x [N,D]) -> [B,Et,D]   sender rows in dst-slot order
    gather_slots_sel(u1, u2, c_slot) -> [B,Et,D]  per-slot BRANCH-SELECTED
        sender rows: slot (b,e) holds u1[sender] when c_slot[b,e] else
        u2[sender] — the branch select folded into the gather INDEX over
        the stacked [2N, D] table. The gather engine is issue-rate-bound
        (DESIGN.md §2), so this costs the same gather time as one branch
        while every downstream stage (kernel reads, expands, logits,
        reduce) moves HALF the bytes of the concatenated [Et, 2D] form.

    All carry custom VJPs whose backward passes are blocked one-hot-matmul
    segment reductions (sender- and destination-sorted) instead of XLA
    scatters. ``gather_slots`` + ``lay_dst`` are the building blocks of the
    fused attention conv (ops/fused_attention.py) — the segment softmax and
    aggregation reuse one gather.
    """

    spmm: object
    pair_sum: object
    gather_slots: object
    lay_dst: PaddedLayout
    lay_src: PaddedLayout
    # src-slot -> dst-slot cotangent reorder map (kept so the ops can be
    # re-bound to traced arrays — see bind_blocked_ops)
    src_from_dst: object = None
    senders: object = None
    receivers: object = None
    edge_mask: object = None
    gather_slots_sel: object = None


def bind_blocked_ops(
    lay_dst: PaddedLayout,
    lay_src: PaddedLayout,
    src_from_dst: jax.Array,
    senders: jax.Array,
    receivers: jax.Array,
    edge_mask: jax.Array,
) -> BlockedOps:
    """Build the BlockedOps closures from prebuilt layout arrays.

    The arrays may be concrete (host-built layouts — make_blocked_ops
    path) or TRACED: jit arguments, or shard_map-local slices (the halo
    partition builds per-shard ops exactly this way,
    parallel/halopart.py). Passing layouts as jit arguments instead of
    closure constants keeps graph-sized arrays out of the compiled HLO —
    closure constants make compile time scale with graph size and, over
    this environment's remote-compile transport, overflow the request
    body above ~0.5M nodes (DESIGN.md §9).
    """
    senders_j = jnp.asarray(senders)
    receivers_j = jnp.asarray(receivers)
    mask_j = jnp.asarray(edge_mask)
    return _bind_blocked_ops_impl(
        lay_dst, lay_src, src_from_dst, senders_j, receivers_j, mask_j
    )


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
    dst_np = _padded_layout_np(
        r, s.astype(np.int32), eid, em, num_nodes_padded, node_block
    )
    lay_dst = _layout_from_np(dst_np, num_nodes_padded, node_block)
    # src-keyed layout for the backward-by-sender reduction
    perm = np.argsort(s, kind="stable")
    src_np = _padded_layout_np(
        s[perm], r[perm].astype(np.int32), eid[perm], em[perm],
        num_nodes_padded, node_block,
    )
    lay_src = _layout_from_np(src_np, num_nodes_padded, node_block)

    # edge -> dst-slot position, then composed src-slot -> dst-slot map so
    # gather_slots' backward can re-order slot cotangents without a scatter
    dst_slot_edge, dst_slot_mask = dst_np[2].reshape(-1), dst_np[3].reshape(-1)
    src_slot_edge = src_np[2].reshape(-1)
    pos_dst = np.zeros(max(e, 1), dtype=np.int32)
    pos_dst[dst_slot_edge[dst_slot_mask]] = np.nonzero(dst_slot_mask)[0]
    src_from_dst = jnp.asarray(pos_dst[src_slot_edge])

    senders_j = jnp.asarray(s.astype(np.int32))
    receivers_j = jnp.asarray(r.astype(np.int32))
    mask_j = jnp.asarray(em)
    return _bind_blocked_ops_impl(
        lay_dst, lay_src, src_from_dst, senders_j, receivers_j, mask_j
    )


def _bind_blocked_ops_impl(
    lay_dst, lay_src, src_from_dst, senders_j, receivers_j, mask_j
) -> BlockedOps:
    # All index/mask arrays ride through the custom VJPs as an explicit
    # aux primal with float0 cotangents (see make_slot_gather's
    # docstring for why closure capture is not an option); only static
    # dims live in the closures.
    meta_dst, meta_src = lay_dst, lay_src
    aux0 = dict(ld=_lay_arrays(lay_dst), ls=_lay_arrays(lay_src),
                sfd=src_from_dst, s=senders_j, r=receivers_j, m=mask_j)

    def _lays(aux):
        return _lay_from(aux["ld"], meta_dst), _lay_from(aux["ls"],
                                                         meta_src)

    def slot_w(lay, w):
        return (
            w[lay.slot_edge] * lay.slot_mask.astype(w.dtype)
        )

    @jax.custom_vjp
    def spmm_fast(x, w, aux):
        ld, _ = _lays(aux)
        wm = jnp.where(aux["m"], w, 0)
        return padded_gather_reduce(
            ld, x, slot_w(ld, wm.astype(x.dtype))
        ).astype(x.dtype)

    def spmm_fwd(x, w, aux):
        return spmm_fast(x, w, aux), (x, w, aux)

    def spmm_bwd(res, dout):
        x, w, aux = res
        _, ls = _lays(aux)
        dout = dout.astype(x.dtype)
        wm = jnp.where(aux["m"], w, 0).astype(x.dtype)
        # dx[u] = Σ_{(u,v)} w_uv · dout[v]  — src-keyed padded reduce
        dx = padded_gather_reduce(
            ls, dout, slot_w(ls, wm)
        ).astype(x.dtype)
        # dw_uv = dout[v] · x[u]
        dmsg = jnp.where(aux["m"][:, None], dout[aux["r"]], 0)
        dw = jnp.sum(dmsg * x[aux["s"]], axis=-1).astype(w.dtype)
        return dx, dw, float0_zeros(aux)

    spmm_fast.defvjp(spmm_fwd, spmm_bwd)

    # unweighted variant: skips the per-call edge->slot weight gather
    # (a 2M-row scalar gather costs as much as 2.4 ms of gather-engine
    # time at bench scale — the engine is issue-rate-bound regardless of
    # row width, DESIGN.md §2); the slot mask is a layout constant
    @jax.custom_vjp
    def spmm_unw(x, aux):
        ld, _ = _lays(aux)
        return padded_gather_reduce(ld, x).astype(x.dtype)

    def spmm_unw_fwd(x, aux):
        return spmm_unw(x, aux), aux

    def spmm_unw_bwd(aux, dout):
        _, ls = _lays(aux)
        dx = padded_gather_reduce(ls, dout)
        return dx.astype(dout.dtype), float0_zeros(aux)

    spmm_unw.defvjp(spmm_unw_fwd, spmm_unw_bwd)

    def spmm_dispatch(x, w=None):
        return (spmm_fast(x, w, aux0) if w is not None
                else spmm_unw(x, aux0))

    @jax.custom_vjp
    def _pair_sum(u, aux):
        e = u[aux["s"]] + u[aux["r"]]
        return jnp.where(aux["m"][:, None], e, 0)

    def ps_fwd(u, aux):
        return _pair_sum(u, aux), aux

    def ps_bwd(aux, de):
        ld, ls = _lays(aux)
        de = jnp.where(aux["m"][:, None], de, 0)
        # du = Σ_{e: s_e=u} de[e] + Σ_{e: r_e=u} de[e]; the padded
        # layouts reduce the de rows permuted into each slot order
        du = padded_slot_reduce(ld, de[ld.slot_edge]) + \
            padded_slot_reduce(ls, de[ls.slot_edge])
        return du.astype(de.dtype), float0_zeros(aux)

    _pair_sum.defvjp(ps_fwd, ps_bwd)

    def pair_sum(u):
        return _pair_sum(u, aux0)

    # Branch-selected gather (see BlockedOps docs): indices offset into
    # the stacked [2N, D] table by the per-slot destination-domain flag.
    # c_slot is an index ingredient, not a differentiable input (it is a
    # 0/1 domain mask) — its cotangent is zero by construction.
    # KEEP IN SYNC with fused_attention.make_adapted_attention_sel's
    # inlined _gather_sel_rows/_gather_sel_vjp (that module re-derives
    # the same fwd/transpose inside ITS custom VJP, where this op's own
    # VJP would be bypassed anyway).
    @jax.custom_vjp
    def _gather_sel(u1, u2, c_slot, aux):
        n = u1.shape[0]
        table = jnp.concatenate([u1, u2], axis=0)
        c_flat = c_slot.reshape(-1)
        idx = aux["ld"]["other"] + jnp.where(c_flat, 0, n).astype(jnp.int32)
        return table[idx].reshape(meta_dst.num_blocks, meta_dst.tile_e, -1)

    def gsel_fwd(u1, u2, c_slot, aux):
        return _gather_sel(u1, u2, c_slot, aux), (
            u1.shape[0], c_slot, aux
        )

    def gsel_bwd(res, dm):
        n_rows, c_slot, aux = res
        _, ls = _lays(aux)
        d = dm.shape[-1]
        c = c_slot.reshape(-1, 1).astype(dm.dtype)
        dm_flat = dm.reshape(-1, d)
        # one 2D-wide src-keyed reduce: [dm·c ‖ dm·(1−c)] by sender
        both = jnp.concatenate([dm_flat * c, dm_flat * (1.0 - c)], axis=1)
        du = padded_slot_reduce(ls, both[aux["sfd"]])[:n_rows]
        return (du[:, :d].astype(dm.dtype), du[:, d:].astype(dm.dtype),
                float0_zeros(c_slot), float0_zeros(aux))

    _gather_sel.defvjp(gsel_fwd, gsel_bwd)

    def gather_slots_sel(u1, u2, c_slot):
        return _gather_sel(u1, u2, c_slot, aux0)

    gather_slots = make_slot_gather(lay_dst, lay_src, src_from_dst)
    return BlockedOps(
        spmm=spmm_dispatch, pair_sum=pair_sum, gather_slots=gather_slots,
        lay_dst=lay_dst, lay_src=lay_src, src_from_dst=src_from_dst,
        senders=senders_j, receivers=receivers_j, edge_mask=mask_j,
        gather_slots_sel=gather_slots_sel,
    )


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


def blocked_ops_leaves(ops: BlockedOps) -> dict:
    """Array leaves of a BlockedOps, as a jit-passable pytree (dict).

    Pair with :func:`rebind_blocked_ops` inside the jitted function to
    keep the layout arrays out of the compiled HLO (they would otherwise
    be embedded as constants — compile time then scales with graph size
    and the remote-compile request overflows above ~0.5M nodes)."""
    def lay_leaves(lay):
        return dict(other=lay.other_slot, rel=lay.rel_key,
                    edge=lay.slot_edge, mask=lay.slot_mask)

    return dict(
        ld=lay_leaves(ops.lay_dst), ls=lay_leaves(ops.lay_src),
        src_from_dst=ops.src_from_dst, senders=ops.senders,
        receivers=ops.receivers, edge_mask=ops.edge_mask,
    )


def rebind_blocked_ops(leaves: dict, meta: BlockedOps) -> BlockedOps:
    """Rebuild BlockedOps from (possibly traced) array leaves + the
    static dims of the host-built ``meta`` ops. Call INSIDE the jitted
    step with ``leaves`` passed as an argument."""
    def lay(ll, ml):
        return PaddedLayout(
            other_slot=ll["other"], rel_key=ll["rel"],
            slot_edge=ll["edge"], slot_mask=ll["mask"],
            node_block=ml.node_block, tile_e=ml.tile_e,
            num_blocks=ml.num_blocks,
            num_nodes_padded=ml.num_nodes_padded,
        )

    return bind_blocked_ops(
        lay(leaves["ld"], meta.lay_dst), lay(leaves["ls"], meta.lay_src),
        leaves["src_from_dst"], leaves["senders"], leaves["receivers"],
        leaves["edge_mask"],
    )


class TieredOps(NamedTuple):
    """Degree-tiered dst-block slot layouts for skew-heavy graphs.

    A single PaddedLayout pads EVERY dst block to the max per-block edge
    count — real bridged graphs are skew-heavy (top-k proposals
    concentrate on popular sources), so the padding waste reaches 3–4×
    the real edges (the 35k pipeline graph: Et=9216 vs mean 2650).
    Here the dst blocks are partitioned by load into tiers; each tier is
    an independent slot layout whose tile_e fits ITS heaviest block
    (within 2×), so total slots stay within ~2× of the real edges. Every
    destination lives in exactly one tier, so per-tier attention/reduce
    outputs are disjoint row ranges in tier-concat order; one row
    permutation (``row_order``/``inv_order``) maps back to global rows.
    """

    tiers: tuple             # of ops objects (gather_slots + lay_dst)
    tier_spans: tuple        # (start_block, stop_block) per tier in
                             # concat block order (static ints)
    row_order: jax.Array     # [num_blocks*nb] global row per concat pos
    inv_order: jax.Array     # [num_blocks*nb] concat pos per global row
    num_nodes_padded: int
    node_block: int
    slots_single: int        # diagnostics: single-layout slot count
    slots_tiered: int


def make_tiered_blocked_ops(
    senders: np.ndarray,
    receivers: np.ndarray,
    edge_mask: np.ndarray,
    num_nodes_padded: int,
    node_block: int = 128,
    max_tiers: int = 4,
    src_space: int = 0,
) -> TieredOps:
    """``src_space``: size of the sender index space when it differs
    from the destination space (halo shards gather senders from
    x_ext = [own rows ‖ halo buffer]); 0 = same as num_nodes_padded."""
    src_space = src_space or num_nodes_padded
    s = np.asarray(senders).astype(np.int64)
    r = np.asarray(receivers).astype(np.int64)
    em = np.asarray(edge_mask)
    nb = node_block
    n_pad = num_nodes_padded
    num_blocks = -(-n_pad // nb)
    eid = np.arange(len(s))

    # per-block valid-edge counts (edges are dst-sorted)
    blk = (r // nb).astype(np.int64)
    counts = np.bincount(blk[em], minlength=num_blocks)
    order = np.argsort(-counts, kind="stable")       # heavy blocks first
    et_of = np.maximum(((counts + 127) // 128) * 128, 128)

    # tier boundaries: a tier spans blocks whose padded Et is within 2x
    # of the tier's heaviest block
    spans = []
    start = 0
    while start < num_blocks and len(spans) < max_tiers - 1:
        et0 = et_of[order[start]]
        stop = start + 1
        while stop < num_blocks and et_of[order[stop]] * 2 > et0:
            stop += 1
        spans.append((start, stop))
        start = stop
    if start < num_blocks:
        spans.append((start, num_blocks))

    # edge ranges per original block (dst-sorted input)
    bounds = np.searchsorted(r, np.arange(num_blocks + 1) * nb)

    tiers = []
    slots_tiered = 0
    for t0, t1 in spans:
        blocks_t = order[t0:t1]
        idx = np.concatenate(
            [np.arange(bounds[b], bounds[b + 1]) for b in blocks_t]
        ) if len(blocks_t) else np.zeros(0, np.int64)
        # tier-local dst key: local block index * nb + offset in block
        local_of = np.zeros(num_blocks, np.int64)
        local_of[blocks_t] = np.arange(len(blocks_t))
        r_t = local_of[blk[idx]] * nb + (r[idx] % nb)
        s_t = s[idx].astype(np.int32)
        em_t = em[idx]
        eid_t = np.arange(len(idx))
        n_out_t = len(blocks_t) * nb
        d_np = _padded_layout_np(r_t, s_t, eid_t, em_t, n_out_t, nb)
        lay_dst = _layout_from_np(d_np, n_out_t, nb)
        perm = np.argsort(s_t, kind="stable")
        s_np = _padded_layout_np(
            s_t[perm], r_t[perm].astype(np.int32), eid_t[perm],
            em_t[perm], src_space, nb,
        )
        lay_src = _layout_from_np(s_np, src_space, nb)
        d_edge = d_np[2].reshape(-1)
        d_mask = d_np[3].reshape(-1)
        pos_dst = np.zeros(max(len(idx), 1), np.int32)
        pos_dst[d_edge[d_mask]] = np.nonzero(d_mask)[0].astype(np.int32)
        src_from_dst = jnp.asarray(pos_dst[s_np[2].reshape(-1)])
        gather = make_slot_gather(lay_dst, lay_src, src_from_dst)

        class _TierOps:
            gather_slots = staticmethod(gather)

        _TierOps.lay_dst = lay_dst
        _TierOps.lay_src = lay_src
        _TierOps.src_from_dst = src_from_dst
        tiers.append(_TierOps)
        slots_tiered += lay_dst.num_blocks * lay_dst.tile_e

    row_order_np = (
        order[:, None] * nb + np.arange(nb)[None, :]
    ).reshape(-1)
    inv_order_np = np.zeros_like(row_order_np)
    inv_order_np[row_order_np] = np.arange(len(row_order_np))
    single_et = int(((counts.max() + 127) // 128) * 128) if len(counts) \
        else 128
    return TieredOps(
        tiers=tuple(tiers),
        tier_spans=tuple(spans),
        row_order=jnp.asarray(row_order_np.astype(np.int32)),
        inv_order=jnp.asarray(inv_order_np.astype(np.int32)),
        num_nodes_padded=n_pad,
        node_block=nb,
        slots_single=num_blocks * single_et,
        slots_tiered=int(slots_tiered),
    )


def tiered_ops_leaves(tops: TieredOps) -> dict:
    """Array leaves of a TieredOps as a jit-passable pytree — the tiered
    twin of :func:`blocked_ops_leaves` (same compile-hygiene rule: layout
    arrays as jit arguments, not HLO constants)."""
    def lay_leaves(lay):
        return dict(other=lay.other_slot, rel=lay.rel_key,
                    edge=lay.slot_edge, mask=lay.slot_mask)

    out = dict(row_order=tops.row_order, inv_order=tops.inv_order)
    for i, t in enumerate(tops.tiers):
        out[f"t{i}"] = dict(
            ld=lay_leaves(t.lay_dst), ls=lay_leaves(t.lay_src),
            src_from_dst=t.src_from_dst,
        )
    return out


def rebind_tiered_ops(leaves: dict, meta: TieredOps) -> TieredOps:
    """Rebuild a TieredOps from (possibly traced) leaves + the static
    dims of the host-built ``meta``. Call INSIDE the jitted step."""
    def lay(ll, ml):
        return PaddedLayout(
            other_slot=ll["other"], rel_key=ll["rel"],
            slot_edge=ll["edge"], slot_mask=ll["mask"],
            node_block=ml.node_block, tile_e=ml.tile_e,
            num_blocks=ml.num_blocks,
            num_nodes_padded=ml.num_nodes_padded,
        )

    tiers = []
    for i, t in enumerate(meta.tiers):
        ll = leaves[f"t{i}"]
        lay_dst = lay(ll["ld"], t.lay_dst)
        lay_src = lay(ll["ls"], t.lay_src)
        gather = make_slot_gather(lay_dst, lay_src, ll["src_from_dst"])

        class _TierOps:
            gather_slots = staticmethod(gather)

        _TierOps.lay_dst = lay_dst
        _TierOps.lay_src = lay_src
        _TierOps.src_from_dst = ll["src_from_dst"]
        tiers.append(_TierOps)
    return meta._replace(
        tiers=tuple(tiers),
        row_order=leaves["row_order"],
        inv_order=leaves["inv_order"],
    )


def permute_rows(x: jax.Array, perm: jax.Array,
                 inv_perm: jax.Array) -> jax.Array:
    """x[perm] with a permutation-aware backward (gather by the inverse,
    not XLA's scatter-add transpose-of-gather)."""
    return _permute_rows(x, dict(p=perm, ip=inv_perm))


@jax.custom_vjp
def _permute_rows(x, aux):
    return x[aux["p"]]


def _pr_fwd(x, aux):
    return x[aux["p"]], aux


def _pr_bwd(aux, dy):
    return dy[aux["ip"]], float0_zeros(aux)


_permute_rows.defvjp(_pr_fwd, _pr_bwd)
