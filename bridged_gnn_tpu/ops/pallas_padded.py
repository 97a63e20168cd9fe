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


def _reduce_kernel(rel_ref, msg_ref, out_ref, acc, *, node_block):
    # rel arrives as [Et/128, 128] 2-D tiles (every block shape
    # (8,128)-divisible). Mosaic's matmul needs a single contracting dim
    # and no cross-lane reshapes, so the reduce runs as a fori_loop of
    # [nb, 128] x [128, D] matmuls (128-wide one-hot slices) accumulating
    # into VMEM scratch. Per-slot weights are pre-folded into msg OUTSIDE
    # the kernel: the in-kernel [nb,128]x[1,128] broadcast multiply is
    # precisely the op this terminal's remote Mosaic compiler crashes on
    # (tools/probe_pallas_feature2.log case 6), and XLA fuses the
    # weighting into the gather that produces msg anyway.
    et128 = rel_ref.shape[1]
    nb = node_block
    acc[...] = jnp.zeros_like(acc)
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, 128), 0)

    def body(ci, _):
        rel_c = rel_ref[0, pl.ds(ci, 1)]                  # [1, 128]
        oh = (rows == rel_c).astype(msg_ref.dtype)        # [nb, 128]
        msg_c = msg_ref[0, pl.ds(ci, 1)][0]               # [128, D]
        # precision pinned to DEFAULT: the package sets
        # jax_default_matmul_precision='highest' globally (fp32 reference
        # parity), and Mosaic's HIGHEST lowering of this dot crashes the
        # remote compile helper (tools/probe_pallas_feature9.py case 28).
        # The reduce is exact anyway: one-hot 0/1 times bf16 values into
        # an f32 accumulator.
        acc[...] += jax.lax.dot(
            oh, msg_c, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        return 0

    jax.lax.fori_loop(0, et128, body, 0)
    out_ref[0] = acc[...]


@functools.partial(
    jax.jit,
    static_argnames=("node_block", "num_nodes_padded", "interpret"),
)
def _slot_reduce_call(
    rel_key: jax.Array,   # [B, Et] int32 (Et a multiple of 1024)
    vals: jax.Array,      # [B, Et, D] — weights/mask already folded in
    node_block: int,
    num_nodes_padded: int,
    interpret: bool = False,
) -> jax.Array:
    B, Et, d = vals.shape
    nb = node_block
    et128 = Et // 128
    out = pl.pallas_call(
        functools.partial(_reduce_kernel, node_block=nb),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, et128, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, et128, 128, d), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, nb, d), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, nb, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nb, d), jnp.float32)],
        interpret=interpret,
    )(
        rel_key.reshape(B, et128, 128),
        vals.reshape(B, et128, 128, d),
    )
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
    """Drop-in twin of blocked_segment.padded_slot_reduce (Mosaic).

    Slots are padded up to a multiple of 1024 so every kernel block tiles
    as (8k, 128m); pad slots carry rel=node_block (no one-hot hit) and
    weight 0."""
    B, Et = lay.num_blocks, lay.tile_e
    vals = vals.reshape(B, Et, -1)
    w = lay.slot_mask.reshape(B, Et).astype(vals.dtype)
    if w_slot is not None:
        w = w * w_slot.reshape(B, Et).astype(vals.dtype)
    # weights folded into the messages host-of-kernel (fuses with the
    # producing gather; the in-kernel broadcast multiply crashes this
    # terminal's remote Mosaic compiler — see _reduce_kernel docstring)
    vals = vals * w[..., None]
    rel = lay.rel_key
    pad = (-Et) % 1024
    if pad:
        vals = jnp.pad(vals, ((0, 0), (0, pad), (0, 0)))
        rel = jnp.pad(
            rel, ((0, 0), (0, pad)), constant_values=lay.node_block
        )
    return _slot_reduce_call(
        rel, vals, lay.node_block, lay.num_nodes_padded,
        interpret=interpret,
    )


def gather_reduce_pallas(
    lay, x: jax.Array, w_slot=None, interpret: bool = False
) -> jax.Array:
    """Drop-in twin of blocked_segment.padded_gather_reduce: XLA row
    gather feeding the Mosaic one-hot reduce."""
    msg = x[lay.other_slot].reshape(lay.num_blocks, lay.tile_e, -1)
    return slot_reduce_pallas(lay, msg, w_slot, interpret=interpret)
