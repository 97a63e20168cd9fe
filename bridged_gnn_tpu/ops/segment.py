"""Segment reductions over edges keyed by destination node.

These are the TPU-native replacements for the reference's dependency kernels
(SURVEY §2b): ``torch_geometric.utils.softmax`` (scatter-softmax, used in
AdaptedConv — reference models/KTGNN.py:299) and the scatter-add inside
``MessagePassing.propagate`` (KTGNN.py:303-304).

All functions take explicit ``num_segments`` (static) and a validity mask so
padded edges contribute nothing. Edges are expected sorted by segment id
(the Graph container guarantees this), which lets XLA use the sorted-scatter
path on TPU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30

# When ``axis_name`` is given, the edge arrays are assumed sharded across
# that mesh axis (inside shard_map) while node-indexed outputs are
# replicated: each device reduces its local edge shard, then a collective
# (psum / pmax) combines the per-node partials. This is the SPMD
# graph-parallel execution mode (SURVEY §2c pattern 1).


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = True,
    axis_name: Optional[str] = None,
) -> jax.Array:
    if mask is not None:
        shape = mask.shape + (1,) * (data.ndim - mask.ndim)
        data = jnp.where(mask.reshape(shape), data, 0)
    out = jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    if axis_name is not None:
        out = jax.lax.psum(out, axis_name)
    return out


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = True,
    axis_name: Optional[str] = None,
) -> jax.Array:
    s = segment_sum(data, segment_ids, num_segments, mask,
                    indices_are_sorted, axis_name)
    ones = jnp.ones(segment_ids.shape, dtype=s.dtype)
    cnt = segment_sum(ones, segment_ids, num_segments, mask,
                      indices_are_sorted, axis_name)
    cnt = jnp.maximum(cnt, 1)
    return s / cnt.reshape(cnt.shape + (1,) * (s.ndim - cnt.ndim))


def segment_max(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = True,
    axis_name: Optional[str] = None,
) -> jax.Array:
    if mask is not None:
        shape = mask.shape + (1,) * (data.ndim - mask.ndim)
        data = jnp.where(mask.reshape(shape), data, _NEG_INF)
    out = jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    if axis_name is not None:
        # pmax has no AD rule; all_gather+max is differentiable and this max
        # only feeds the (gradient-cancelling) softmax shift anyway
        gathered = jax.lax.all_gather(out, axis_name)
        out = jnp.max(gathered, axis=0)
    return out


def segment_softmax(
    logits: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = True,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Numerically-stable softmax within each segment.

    Matches ``torch_geometric.utils.softmax(alpha, index, num_nodes=N)`` as
    invoked at reference models/KTGNN.py:299 (max-shifted exp / segment-sum).
    Masked (padded) entries get probability 0. With ``axis_name`` the
    normalization spans edge shards on all devices.
    """
    m = segment_max(logits, segment_ids, num_segments, mask,
                    indices_are_sorted, axis_name)
    # the max shift cancels in softmax; detach it so pmax (no VJP) and the
    # segment_max gather stay out of the backward graph
    m = jax.lax.stop_gradient(jnp.maximum(m, _NEG_INF))
    shifted = logits - m[segment_ids]
    if mask is not None:
        # mask BEFORE exp: a padded edge in an empty segment would otherwise
        # produce exp(x + 1e30) = inf, and inf·0 in the VJP poisons grads
        shape = mask.shape + (1,) * (shifted.ndim - mask.ndim)
        shifted = jnp.where(mask.reshape(shape), shifted, _NEG_INF)
    e = jnp.exp(shifted)
    denom = jax.ops.segment_sum(
        e, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    if axis_name is not None:
        denom = jax.lax.psum(denom, axis_name)
    denom = jnp.where(denom == 0, 1.0, denom)
    return e / denom[segment_ids]
