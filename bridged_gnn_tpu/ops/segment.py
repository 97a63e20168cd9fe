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


def segment_sum(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = True,
) -> jax.Array:
    if mask is not None:
        shape = mask.shape + (1,) * (data.ndim - mask.ndim)
        data = jnp.where(mask.reshape(shape), data, 0)
    return jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_mean(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = True,
) -> jax.Array:
    s = segment_sum(data, segment_ids, num_segments, mask, indices_are_sorted)
    ones = jnp.ones(segment_ids.shape, dtype=s.dtype)
    cnt = segment_sum(ones, segment_ids, num_segments, mask, indices_are_sorted)
    cnt = jnp.maximum(cnt, 1)
    return s / cnt.reshape(cnt.shape + (1,) * (s.ndim - cnt.ndim))


def segment_max(
    data: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = True,
) -> jax.Array:
    if mask is not None:
        shape = mask.shape + (1,) * (data.ndim - mask.ndim)
        data = jnp.where(mask.reshape(shape), data, _NEG_INF)
    return jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )


def segment_softmax(
    logits: jax.Array,
    segment_ids: jax.Array,
    num_segments: int,
    mask: Optional[jax.Array] = None,
    indices_are_sorted: bool = True,
) -> jax.Array:
    """Numerically-stable softmax within each segment.

    Matches ``torch_geometric.utils.softmax(alpha, index, num_nodes=N)`` as
    invoked at reference models/KTGNN.py:299 (max-shifted exp / segment-sum).
    Masked (padded) entries get probability 0.
    """
    m = segment_max(logits, segment_ids, num_segments, mask, indices_are_sorted)
    m = jnp.maximum(m, _NEG_INF)  # empty segments
    shifted = logits - m[segment_ids]
    e = jnp.exp(shifted)
    if mask is not None:
        shape = mask.shape + (1,) * (e.ndim - mask.ndim)
        e = jnp.where(mask.reshape(shape), e, 0)
    denom = jax.ops.segment_sum(
        e, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    denom = jnp.where(denom == 0, 1.0, denom)
    return e / denom[segment_ids]
