"""VS-graph feature complementor: completes unobserved target features.

Re-design of the reference ``Adapted_complementor`` /
``Adapted_complete_layer`` (models/KTGNN.py:22-208): target-domain nodes
observe only a feature prefix; the unobserved suffix is propagated in from
source-domain nodes along BFS frontiers, with a domain-difference gate on
the first (adapted) step.

Frontier construction (reference ``prepare_graph``, KTGNN.py:166-185) is a
host-side preprocessing step here: step t keeps edges source-front →
target-front, then the reached targets become the next front. Each
frontier's edge set is padded into the static-shape Graph discipline.

The run.sh configs disable this module (need_complement=False,
main_graph_knowledge_transfer.py:179) but it is part of the reference's
capability surface, so it is complete and tested.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bridged_gnn_tpu.nn.common import torch_dense, masked_mean
from bridged_gnn_tpu.ops.segment import segment_softmax, segment_sum


def build_frontier_edges(
    edge_index: np.ndarray, central_mask: np.ndarray, step: int = 2
) -> List[np.ndarray]:
    """Per-step frontier edge sets (reference prepare_graph,
    KTGNN.py:166-185): edges from the current source-front into
    still-unreached target nodes; reached targets become the next front."""
    mask_src = central_mask.copy()
    mask_tar = ~central_mask
    out = []
    for _ in range(step):
        keep = mask_src[edge_index[0]] & mask_tar[edge_index[1]]
        sub = edge_index[:, keep]
        new_src = np.unique(sub[1])
        out.append(sub)
        mask_tar[new_src] = False
        mask_src[:] = False
        mask_src[new_src] = True
    return out


def pad_frontiers(fronts: List[np.ndarray], num_nodes_padded: int,
                  edge_pad: int = 128):
    """Pad frontier edge sets into static-shape (senders, receivers, mask)
    triples (jnp arrays)."""
    out = []
    for ei in fronts:
        e = ei.shape[1]
        e_pad = max(((e + edge_pad - 1) // edge_pad) * edge_pad, edge_pad)
        s = np.full(e_pad, num_nodes_padded - 1, dtype=np.int32)
        r = np.full(e_pad, num_nodes_padded - 1, dtype=np.int32)
        m = np.zeros(e_pad, dtype=bool)
        s[:e], r[:e], m[:e] = ei[0], ei[1], True
        out.append((jnp.asarray(s), jnp.asarray(r), jnp.asarray(m)))
    return out


class AdaptedCompleteLayer(nn.Module):
    """One propagation step (reference Adapted_complete_layer,
    KTGNN.py:22-136): GAT-simplified attention over observed features,
    messages are the unobserved features, optionally domain-shift-adapted."""

    adapted: bool = False
    dropout: float = 0.5
    negative_slope: float = 0.1

    @nn.compact
    def __call__(
        self,
        x_o: jax.Array,          # [N_pad, D_o] observed features
        x_u: jax.Array,          # [N_pad, D_u] unobserved features/messages
        senders: jax.Array,
        receivers: jax.Array,
        edge_mask: jax.Array,
        domain_diff: Optional[jax.Array] = None,   # [D_o]
        source_mask: Optional[jax.Array] = None,   # [N_pad] bool
        train: bool = False,
    ):
        n_pad = x_o.shape[0]
        d_u = x_u.shape[1]
        # f: neighbor importance from observed features (KTGNN.py:95-101)
        a_src = torch_dense(1, use_bias=False, name="lin_f_src_0")(x_o)
        a_tar = torch_dense(1, use_bias=False, name="lin_f_tar_0")(x_o)
        logits = nn.leaky_relu(
            a_src[senders] + a_tar[receivers],
            negative_slope=self.negative_slope,
        )[:, 0]

        adapted_domain_diff = None
        if self.adapted:
            # g: domain difference function (KTGNN.py:76-93)
            add = torch_dense(d_u, name="lin_diff")(domain_diff[None, :])
            support = torch_dense(d_u, use_bias=False, name="lin_g")(
                jnp.concatenate(
                    [x_u, jnp.broadcast_to(add, x_u.shape)], axis=-1
                )
            )
            message_u = x_u - support * source_mask[:, None].astype(x_u.dtype)
            adapted_domain_diff = add
        else:
            message_u = x_u

        alpha = segment_softmax(
            logits, receivers, n_pad, mask=edge_mask, indices_are_sorted=False
        )
        alpha = nn.Dropout(self.dropout, deterministic=not train)(alpha)
        out = segment_sum(
            message_u[senders] * alpha[:, None], receivers, n_pad,
            mask=edge_mask, indices_are_sorted=False,
        )
        return out, adapted_domain_diff


class AdaptedComplementor(nn.Module):
    """Reference Adapted_complementor (KTGNN.py:138-208)."""

    dim_o: int
    dim_u: int
    hidden_o: int = 128
    hidden_u: int = 128
    step: int = 2
    use_dist_loss: bool = False
    use_complement: bool = True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                 # [N_pad, dim_o + dim_u]
        frontiers,                    # list of (senders, receivers, mask)
        central_mask: jax.Array,
        node_mask: jax.Array,
        train: bool = False,
    ):
        x_o = torch_dense(self.hidden_o, use_bias=False,
                           name="input_layer_o")(x[:, : self.dim_o])
        x_u = torch_dense(self.hidden_u, use_bias=False,
                           name="input_layer_u")(x[:, self.dim_o:])
        if not self.use_complement:
            return jnp.concatenate([x_o, x_u], axis=1), None

        central = central_mask & node_mask
        target = (~central_mask) & node_mask
        delta = (
            masked_mean(x_o, central, axis=0)
            - masked_mean(x_o, target, axis=0)
        )
        s, r, em = frontiers[0]
        x_u_hat, add = AdaptedCompleteLayer(
            adapted=True, name="adapted_layer"
        )(x_o, x_u, s, r, em, delta, central_mask, train)

        loss_dist = None
        if train and self.use_dist_loss:
            # distribution loss (KTGNN.py:187-189): MSE between the new
            # domain diff (central vs first-front targets) and the adapted
            # diff
            front_mask = jnp.zeros_like(central_mask).at[r].set(
                em
            ) & (~central_mask)
            new_diff = (
                masked_mean(x_u_hat, central, axis=0, keepdims=True)
                - masked_mean(x_u_hat, front_mask, axis=0, keepdims=True)
            )
            loss_dist = jnp.mean((new_diff - add) ** 2)

        for i, (s, r, em) in enumerate(frontiers[1:]):
            x_u_hat, _ = AdaptedCompleteLayer(
                adapted=False, name=f"layers_{i}"
            )(x_o, x_u_hat, s, r, em, train=train)

        cm = central_mask[:, None].astype(x_u.dtype)
        out = jnp.concatenate([x_o, x_u * cm + x_u_hat * (1 - cm)], axis=1)
        return out, loss_dist
