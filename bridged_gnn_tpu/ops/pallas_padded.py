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


def _reduce_kernel(rel_ref, msg_ref, out_ref, oh, *, node_block):
    # rel arrives as [Et/128, 128] 2-D tiles (every block shape
    # (8,128)-divisible). The one-hot [nb, Et] is built bytes-free in VMEM
    # scratch by a STATIC unrolled loop of 128-wide iota compares, then
    # the whole block reduces in ONE [nb, Et] x [Et, D] MXU dot — 2.4x
    # faster than the earlier fori_loop of [nb,128]x[128,D] slices, which
    # was MXU-pipeline-drain-bound (tools/probe_pallas_bigdot.json:
    # 3.94 ms vs 9.51 ms at bench scale, bit-exact). Per-slot weights are
    # pre-folded into msg OUTSIDE the kernel: the in-kernel
    # [nb,128]x[1,128] broadcast multiply is precisely the op this
    # terminal's remote Mosaic compiler crashes on (feature-bisect
    # round 2 case 6 — findings consolidated in DESIGN.md §8; the
    # final bisect round is kept as tools/probe_pallas_feature9.py),
    # and XLA fuses the
    # weighting into the gather that produces msg anyway.
    et128 = rel_ref.shape[1]
    nb = node_block
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, 128), 0)
    for ci in range(et128):  # static unroll: compare + aligned VMEM store
        oh[:, ci * 128:(ci + 1) * 128] = (
            rows == rel_ref[0, ci:ci + 1]
        ).astype(oh.dtype)
    # precision pinned to DEFAULT: the package sets
    # jax_default_matmul_precision='highest' globally (fp32 reference
    # parity), and Mosaic's HIGHEST lowering of an unpinned dot crashes
    # the remote compile helper (tools/probe_pallas_feature9.py case 28).
    # The reduce is exact anyway: one-hot 0/1 times bf16 values into an
    # f32 accumulator.
    out_ref[0] = jax.lax.dot(
        oh[...], msg_ref[0], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


@functools.partial(
    jax.jit,
    static_argnames=("node_block", "num_nodes_padded", "interpret"),
)
def _slot_reduce_call(
    rel_key: jax.Array,   # [B, Et] int32 (Et a multiple of 128)
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
            pl.BlockSpec((1, Et, d), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, nb, d), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, nb, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nb, Et), vals.dtype)],
        interpret=interpret,
    )(
        rel_key.reshape(B, et128, 128),
        vals,
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

    Padding slots carry rel=node_block, which hits no one-hot row, so no
    separate mask multiply is needed in the unweighted case — the
    [B,Et,D]-sized elementwise pass it would cost (~1.2 GB of HBM traffic
    at bench scale) is pure overhead. tile_e is already a multiple of 128
    and the kernel block spans the full slot axis, so no extra padding."""
    B, Et = lay.num_blocks, lay.tile_e
    vals = vals.reshape(B, Et, -1)
    if w_slot is not None:
        # weights folded into the messages outside the kernel (fuses with
        # the producing gather; the in-kernel broadcast multiply crashes
        # this terminal's remote Mosaic compiler — see _reduce_kernel).
        # The mask is implicit: pad slots have rel=node_block regardless.
        w = w_slot.reshape(B, Et).astype(vals.dtype)
        vals = vals * w[..., None]
    return _slot_reduce_call(
        lay.rel_key, vals, lay.node_block, lay.num_nodes_padded,
        interpret=interpret,
    )


def gather_reduce_pallas(
    lay, x: jax.Array, w_slot=None, interpret: bool = False
) -> jax.Array:
    """Drop-in twin of blocked_segment.padded_gather_reduce: XLA row
    gather feeding the Mosaic one-hot reduce."""
    msg = x[lay.other_slot].reshape(lay.num_blocks, lay.tile_e, -1)
    return slot_reduce_pallas(lay, msg, w_slot, interpret=interpret)
