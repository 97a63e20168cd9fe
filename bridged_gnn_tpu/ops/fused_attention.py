"""Fused domain-adapted attention message passing (TPU padded-tile form).

The reference computes KT-GNN attention as separate PyG ``propagate``
passes: per-edge endpoint gathers for the GATv2 logits, a scatter-softmax,
then scatter-add aggregation (models/KTGNN.py:263-315) — on TPU that costs
~6 issue-rate-bound row gathers per conv layer plus scatter lowerings.

This module evaluates the whole attention conv from TWO row gathers (one
per domain branch) using the padded dst-block slot layout
(ops/blocked_segment.py::PaddedLayout):

  * sender rows arrive via ``BlockedOps.gather_slots`` (custom VJP — its
    backward is a src-keyed one-hot reduce, not a scatter);
  * destination rows, per-destination softmax statistics, and the branch
    select are *expanded to slots via one-hot batched matmuls* on the MXU
    (``padded_block_expand``) — no per-element gathers, which matters
    because the gather engine (~474 Mrows/s on v5e, DESIGN.md §2), not
    HBM bandwidth, bounds every gather-based formulation;
  * the segment softmax max/denominator are per-block masked VPU
    reductions; aggregation is the same batched one-hot matmul as SpMM.

Everything except the two row gathers is a matmul or elementwise op, so
the *autodiff* backward is also scatter-free.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from bridged_gnn_tpu.ops.blocked_segment import (
    BlockedOps,
    padded_block_expand,
    padded_dst_expand,
    padded_slot_reduce,
)

_NEG = -1e30


def adapted_attention(
    ops: BlockedOps,
    u1: jax.Array,            # [N_in, D] messages when dst is central (t2s)
    u2: jax.Array,            # [N_in, D] messages when dst is target (s2t)
    central: jax.Array,       # [N_out] bool destination-domain flag
    logit_fn1: Callable,      # [..., D] -> [..., 1] (a_f_t2s projection)
    logit_fn2: Callable,      # [..., D] -> [..., 1] (a_f_s2t projection)
    negative_slope: float = 0.1,
    u1_dst: jax.Array = None,  # destination-side rows, when the sender
    u2_dst: jax.Array = None,  # index space differs (halo: u*_ext[:rows])
) -> jax.Array:
    """out[v] = Σ_u softmax_v(logit) · (central[v] ? u1[u] : u2[u]).

    Matches AdaptedConv's attention + joint segment softmax + aggregation
    (reference models/KTGNN.py:263-315) with GATv2-style logits
    ``a·leaky_relu(u[src] + u[dst])``, branch chosen by destination
    domain. Returns [N_out, D_out]. In the halo row partition, senders
    index the extended local array while destinations index owned rows
    only — pass ``u?_dst`` for the destination side then.
    """
    lay = ops.lay_dst
    B, Et, nb = lay.num_blocks, lay.tile_e, lay.node_block
    valid = lay.slot_mask.reshape(B, Et)
    if u1_dst is None:
        u1_dst, u2_dst = u1, u2
    dch = u1.shape[-1]

    # ONE row gather of both branches — the only gather-engine traffic in
    # the layer. The engine is issue-rate-bound (~474 Mrows/s on v5e
    # regardless of row width, DESIGN.md §2), so gathering the
    # concatenated [N, 2D] rows costs half of two separate gathers.
    m = ops.gather_slots(jnp.concatenate([u1, u2], axis=-1))
    m1, m2 = m[..., :dch], m[..., dch:]             # [B, Et, D] each
    d = padded_dst_expand(
        lay, jnp.concatenate([u1_dst, u2_dst], axis=-1)
    )
    d1, d2 = d[..., :dch], d[..., dch:]

    h1 = jax.nn.leaky_relu(m1 + d1, negative_slope)
    h2 = jax.nn.leaky_relu(m2 + d2, negative_slope)
    l1 = logit_fn1(h1)[..., 0].astype(jnp.float32)  # [B, Et]
    l2 = logit_fn2(h2)[..., 0].astype(jnp.float32)

    # destination-domain branch select, expanded to slots without a gather
    n_full = B * nb
    c_pad = jnp.pad(central.astype(jnp.float32), (0, n_full - central.shape[0]))
    c_slot = padded_block_expand(lay, c_pad.reshape(B, nb, 1))[..., 0]
    is_c = c_slot > 0.5
    logit = jnp.where(is_c, l1, l2)
    lm = jnp.where(valid, logit, _NEG)

    # per-destination softmax: max + denominator as per-block masked
    # reductions (torch_geometric.utils.softmax semantics, KTGNN.py:299)
    ohb = lay.rel_key[:, None, :] == jax.lax.broadcasted_iota(
        jnp.int32, (1, nb, 1), 1
    )                                               # [B, nb, Et]
    mx = jnp.max(jnp.where(ohb, lm[:, None, :], _NEG), axis=2)  # [B, nb]
    mx = jax.lax.stop_gradient(mx)
    mx_slot = padded_block_expand(lay, mx[:, :, None])[..., 0]
    ex = jnp.where(valid, jnp.exp(lm - mx_slot), 0.0)           # [B, Et]
    denom = jax.lax.dot_general(
        ohb.astype(jnp.float32), ex[:, :, None],
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                               # [B, nb, 1]
    den_slot = padded_block_expand(lay, denom)[..., 0]
    alpha = ex / jnp.where(den_slot == 0, 1.0, den_slot)

    # aggregation reuses the already-gathered messages — no further gathers
    w1 = jnp.where(is_c, alpha, 0.0).astype(u1.dtype)
    w2 = jnp.where(is_c, 0.0, alpha).astype(u1.dtype)
    out = padded_slot_reduce(lay, m1, w1) + padded_slot_reduce(lay, m2, w2)
    return out.astype(u1.dtype)
