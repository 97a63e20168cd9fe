"""Pallas TPU kernels over the padded dst-block slot layout.

Compiled (Mosaic) twins of the XLA batched one-hot reduces in
ops/blocked_segment.py: one grid step per destination node block; the
block's slot messages, relative keys, and weights arrive in VMEM; the
one-hot is regenerated from an iota compare (bytes-free) and the reduce
is a single MXU ``dot``. The row gather stays in XLA — on v5e the gather
engine (~474 Mrows/s), not HBM bandwidth, bounds any one-row-per-edge
formulation (DESIGN.md §2), and XLA's gather already saturates it.

Replaces the reference's torch scatter-add aggregation hot loop
(models/KTGNN.py:303-324) at the kernel level. Selected via
``bridged_gnn_tpu.ops.blocked_segment.set_reduce_impl('pallas')`` or env
``BGNN_PALLAS=1``; parity is tested in interpreter mode on CPU and
compiled on the real-TPU lane (tests/test_pallas_kernels.py,
tests/test_tpu_lane.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget guard: fall back to XLA when a block's working set would not
# comfortably fit (msg tile + one-hot + out tile, double-buffered).
_VMEM_BUDGET = 12 * 1024 * 1024


def _reduce_kernel(rel_ref, w_ref, msg_ref, out_ref, *, node_block):
    rel = rel_ref[:]                                      # [Et] (1-D block)
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (node_block, rel.shape[0]), 0
    )
    oh = (rows == rel[None, :]).astype(msg_ref.dtype)
    oh = oh * w_ref[:][None, :].astype(msg_ref.dtype)
    out_ref[0] = jax.lax.dot(
        oh, msg_ref[0], preferred_element_type=jnp.float32
    )


@functools.partial(
    jax.jit,
    static_argnames=("node_block", "num_nodes_padded", "interpret"),
)
def _slot_reduce_call(
    rel_key: jax.Array,   # [B, Et] int32
    w: jax.Array,         # [B, Et] weights (mask already folded in)
    vals: jax.Array,      # [B, Et, D]
    node_block: int,
    num_nodes_padded: int,
    interpret: bool = False,
) -> jax.Array:
    B, Et, d = vals.shape
    nb = node_block
    # rel/w ride as 1-D blocks (Mosaic requires the last two block dims be
    # (8k, 128m) or match the array; a (1, Et) 2-D block is neither)
    out = pl.pallas_call(
        functools.partial(_reduce_kernel, node_block=nb),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((Et,), lambda b: (b,)),
            pl.BlockSpec((Et,), lambda b: (b,)),
            pl.BlockSpec((1, Et, d), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, nb, d), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, nb, d), jnp.float32),
        interpret=interpret,
    )(rel_key.reshape(-1), w.reshape(-1), vals)
    return out.reshape(B * nb, d)[:num_nodes_padded]


def fits_vmem(tile_e: int, node_block: int, d: int, itemsize: int) -> bool:
    per_block = (
        tile_e * d * itemsize          # msg tile
        + node_block * tile_e * itemsize  # one-hot
        + node_block * d * 4              # f32 out tile
        + 2 * tile_e * 4                  # rel + w
    )
    return 2 * per_block <= _VMEM_BUDGET


def slot_reduce_pallas(
    lay, vals: jax.Array, w_slot=None, interpret: bool = False
) -> jax.Array:
    """Drop-in twin of blocked_segment.padded_slot_reduce (Mosaic)."""
    B, Et = lay.num_blocks, lay.tile_e
    vals = vals.reshape(B, Et, -1)
    w = lay.slot_mask.reshape(B, Et).astype(vals.dtype)
    if w_slot is not None:
        w = w * w_slot.reshape(B, Et).astype(vals.dtype)
    return _slot_reduce_call(
        lay.rel_key, w, vals, lay.node_block, lay.num_nodes_padded,
        interpret=interpret,
    )


def gather_reduce_pallas(
    lay, x: jax.Array, w_slot=None, interpret: bool = False
) -> jax.Array:
    """Drop-in twin of blocked_segment.padded_gather_reduce: XLA row
    gather feeding the Mosaic one-hot reduce."""
    msg = x[lay.other_slot].reshape(lay.num_blocks, lay.tile_e, -1)
    return slot_reduce_pallas(lay, msg, w_slot, interpret=interpret)
