"""Baseline GNN zoo for stage-2 comparison runs.

TPU-native counterparts of the reference backbone collection
(models/backbones.py): GCN, GraphSAGE, GAT, GATv2, GIN, JKNet, APPNP, MLP.
All models consume the framework Graph/Adjacency pair and return per-node
log-probabilities. Aggregations are the shared SpMM/segment primitives, so
every model runs on the dense-MXU path on small graphs and the segment path
at scale.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bridged_gnn_tpu.graph import Graph
from bridged_gnn_tpu.nn.common import glorot_dense, torch_dense
from bridged_gnn_tpu.nn.stage1 import SAGEConv
from bridged_gnn_tpu.ops.segment import segment_softmax, segment_sum
from bridged_gnn_tpu.ops.spmm import Adjacency, spmm


def gcn_norm_weights(adj: Adjacency) -> jax.Array:
    """Symmetric GCN normalization weights per edge: 1/sqrt(d_u d_v).

    Assumes self loops are already present exactly once (the stage-2 graph
    preparation guarantees this), matching PyG gcn_norm output.
    """
    deg = adj.in_degree  # includes self loop
    dis = jax.lax.rsqrt(jnp.maximum(deg, 1.0))
    w = dis[adj.senders] * dis[adj.receivers]
    return jnp.where(adj.edge_mask, w, 0.0)


def row_norm_weights(adj: Adjacency) -> jax.Array:
    """Row (random-walk) normalization weights per edge: 1/d_v.

    Mirror of reference ``adj_norm(norm='row')``
    (models/backbones.py:521-539 — every call site there is commented
    out, so no reference model reaches it; provided for API parity).
    Zero-degree rows get weight 0, matching the masked_fill there.
    """
    inv = jnp.where(adj.in_degree > 0, 1.0 / jnp.maximum(adj.in_degree, 1.0), 0.0)
    return jnp.where(adj.edge_mask, inv[adj.receivers], 0.0)


class GCNConv(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, adj: Adjacency, norm_w):
        h = glorot_dense(self.out_channels, use_bias=False, name="lin")(x)
        out = spmm(adj, h, edge_weights=norm_w)
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return out + bias


class GATConv(nn.Module):
    """Multi-head GATv1 attention conv (PyG GATConv semantics)."""

    out_channels: int
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    att_dropout: float = 0.0
    v2: bool = False

    @nn.compact
    def __call__(self, x, adj: Adjacency, train: bool = False):
        H, C = self.heads, self.out_channels
        s, r, em = adj.senders, adj.receivers, adj.edge_mask
        n_pad = adj.num_nodes_padded
        h = glorot_dense(H * C, use_bias=False, name="lin")(x)
        h = h.reshape(-1, H, C)
        if self.v2:
            # GATv2: score = a · leaky_relu(W_l x_i + W_r x_j)
            hr = glorot_dense(H * C, use_bias=False, name="lin_r")(x)
            hr = hr.reshape(-1, H, C)
            e = nn.leaky_relu(
                h[s] + hr[r], negative_slope=self.negative_slope
            )  # [E, H, C]
            att = self.param(
                "att", nn.initializers.glorot_uniform(), (H, C)
            )
            logits = jnp.einsum("ehc,hc->eh", e, att)
        else:
            att_src = self.param(
                "att_src", nn.initializers.glorot_uniform(), (H, C)
            )
            att_dst = self.param(
                "att_dst", nn.initializers.glorot_uniform(), (H, C)
            )
            a_src = jnp.einsum("nhc,hc->nh", h, att_src)
            a_dst = jnp.einsum("nhc,hc->nh", h, att_dst)
            logits = nn.leaky_relu(
                a_src[s] + a_dst[r], negative_slope=self.negative_slope
            )  # [E, H]
        alpha = segment_softmax(logits, r, n_pad, mask=em)
        alpha = nn.Dropout(self.att_dropout, deterministic=not train)(alpha)
        msg = h[s] * alpha[:, :, None]
        out = segment_sum(msg, r, n_pad, mask=em)  # [N, H, C]
        if self.concat:
            out = out.reshape(-1, H * C)
        else:
            out = out.mean(axis=1)
        bias = self.param(
            "bias", nn.initializers.zeros,
            (H * C if self.concat else C,),
        )
        return out + bias


class GCNNet(nn.Module):
    num_classes: int
    layer_num: int = 2
    hidden: int = 16
    dropout: float = 0.5

    @nn.compact
    def __call__(self, g: Graph, adj: Adjacency, train: bool = False):
        norm_w = gcn_norm_weights(adj)
        x = g.x
        dims = (
            [self.num_classes]
            if self.layer_num == 1
            else [self.hidden] * (self.layer_num - 1) + [self.num_classes]
        )
        for i, d in enumerate(dims):
            x = GCNConv(d, name=f"convs_{i}")(x, adj, norm_w)
            if i < len(dims) - 1:
                x = nn.relu(x)
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.log_softmax(x, axis=1)


class GraphSAGENet(nn.Module):
    num_classes: int
    layer_num: int = 2
    hidden: int = 16
    root_weight: bool = True
    dropout: float = 0.5

    @nn.compact
    def __call__(self, g: Graph, adj: Adjacency, train: bool = False):
        x = g.x
        dims = (
            [self.num_classes]
            if self.layer_num == 1
            else [self.hidden] * (self.layer_num - 1) + [self.num_classes]
        )
        for i, d in enumerate(dims):
            x = SAGEConv(d, root_weight=self.root_weight, name=f"convs_{i}")(
                x, adj
            )
            if i < len(dims) - 1:
                x = nn.relu(x)
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.log_softmax(x, axis=1)


class GATNet(nn.Module):
    """2-layer GAT (reference backbones.py:404-430)."""

    num_classes: int
    hidden: int = 16
    heads: int = 8
    dropout: float = 0.6
    v2: bool = False
    layer_num: int = 2
    att_dropout: float = 0.6

    @nn.compact
    def __call__(self, g: Graph, adj: Adjacency, train: bool = False):
        x = g.x
        for i in range(self.layer_num - 1):
            x = GATConv(
                self.hidden, heads=self.heads, concat=True,
                att_dropout=self.att_dropout, v2=self.v2, name=f"convs_{i}",
            )(x, adj, train)
            x = nn.elu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = GATConv(
            self.num_classes, heads=1, concat=False,
            att_dropout=self.att_dropout, v2=self.v2,
            name=f"convs_{self.layer_num - 1}",
        )(x, adj, train)
        return nn.log_softmax(x, axis=1)


class MLPNet(nn.Module):
    """Graph-free MLP baseline (reference backbones.py:214-244)."""

    num_classes: int
    hidden: int = 64
    dropout: float = 0.5

    @nn.compact
    def __call__(self, g: Graph, adj: Adjacency = None, train: bool = False):
        x = torch_dense(self.hidden, name="input_layer")(g.x)
        x = nn.Dropout(self.dropout, deterministic=not train)(nn.relu(x))
        x = torch_dense(self.num_classes, name="out_layer")(x)
        return nn.log_softmax(x, axis=1)


class GINNet(nn.Module):
    """GIN with linear update and learnable eps
    (reference backbones.py:26-57)."""

    num_classes: int
    layer_num: int = 2
    hidden: int = 16
    dropout: float = 0.5

    @nn.compact
    def __call__(self, g: Graph, adj: Adjacency, train: bool = False):
        x = g.x
        dims = (
            [self.num_classes]
            if self.layer_num == 1
            else [self.hidden] * (self.layer_num - 1) + [self.num_classes]
        )
        for i, d in enumerate(dims):
            eps = self.param(f"eps_{i}", nn.initializers.zeros, ())
            agg = spmm(adj, x) + (1.0 + eps) * x
            x = torch_dense(d, name=f"nn_{i}")(agg)
            if i < len(dims) - 1:
                x = nn.relu(x)
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.log_softmax(x, axis=1)


class JKNet(nn.Module):
    """GCN stack + jumping knowledge concat (reference backbones.py:60-107)."""

    num_classes: int
    hidden: int = 16
    layer_num: int = 2
    dropout: float = 0.5

    @nn.compact
    def __call__(self, g: Graph, adj: Adjacency, train: bool = False):
        norm_w = gcn_norm_weights(adj)
        x = g.x
        xs = []
        for i in range(self.layer_num):
            x = GCNConv(self.hidden, name=f"convs_{i}")(x, adj, norm_w)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            xs.append(x)
        x = jnp.concatenate(xs, axis=1)
        x = glorot_dense(self.num_classes, name="lin")(x)
        return nn.log_softmax(x, axis=1)


class APPNPNet(nn.Module):
    """MLP + personalized-PageRank propagation
    (reference backbones.py:110-128): K=10, alpha=0.1."""

    num_classes: int
    hidden: int = 16
    K: int = 10
    alpha: float = 0.1
    dropout: float = 0.5

    @nn.compact
    def __call__(self, g: Graph, adj: Adjacency, train: bool = False):
        norm_w = gcn_norm_weights(adj)
        x = nn.Dropout(self.dropout, deterministic=not train)(g.x)
        x = nn.relu(torch_dense(self.hidden, name="lin1")(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = torch_dense(self.num_classes, name="lin2")(x)
        h0 = x
        for _ in range(self.K):
            x = (1 - self.alpha) * spmm(adj, x, edge_weights=norm_w) \
                + self.alpha * h0
        return nn.log_softmax(x, axis=1)


class GCN2Net(nn.Module):
    """GCNII: initial-residual + identity-mapping convs
    (reference backbones.py:163-197): x' = ((1-α)Âx + αx₀)((1-β)I + βW),
    β = log(θ/ℓ + 1)."""

    num_classes: int
    hidden: int = 64
    num_layers: int = 8
    alpha: float = 0.1
    theta: float = 0.5
    dropout: float = 0.0

    @nn.compact
    def __call__(self, g: Graph, adj: Adjacency, train: bool = False):
        import math

        norm_w = gcn_norm_weights(adj)
        x = nn.Dropout(self.dropout, deterministic=not train)(g.x)
        x = x0 = nn.relu(glorot_dense(self.hidden, name="lin_in")(x))
        for layer in range(self.num_layers):
            beta = math.log(self.theta / (layer + 1) + 1.0)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            h = (1 - self.alpha) * spmm(adj, x, edge_weights=norm_w) \
                + self.alpha * x0
            w = glorot_dense(self.hidden, use_bias=False,
                             name=f"convs_{layer}")(h)
            x = nn.relu((1 - beta) * h + beta * w)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = glorot_dense(self.num_classes, name="lin_out")(x)
        return nn.log_softmax(x, axis=1)


class DeeperGCNNet(nn.Module):
    """DeeperGCN-style residual stack (reference backbones.py:130-161):
    pre-activation res+ blocks of LayerNorm → ReLU → softmax-aggregated
    conv, with a learnable aggregation temperature per block."""

    num_classes: int
    hidden: int = 64
    num_layers: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, g: Graph, adj: Adjacency, train: bool = False):
        x = glorot_dense(self.hidden, name="node_encoder")(g.x)
        s, r, em = adj.senders, adj.receivers, adj.edge_mask
        n_pad = adj.num_nodes_padded

        def gen_conv(h, i):
            # softmax aggregation with learnable temperature t
            t = self.param(f"t_{i}", nn.initializers.ones, ())
            msg = glorot_dense(self.hidden, name=f"msg_{i}")(h)
            msg_e = nn.relu(msg[s]) + 1e-7
            w = segment_softmax(
                jnp.sum(msg_e, axis=-1) * t, r, n_pad, mask=em
            )
            agg = segment_sum(msg_e * w[:, None], r, n_pad, mask=em)
            return glorot_dense(self.hidden, name=f"upd_{i}")(h + agg)

        for i in range(self.num_layers):
            h = nn.LayerNorm(name=f"norm_{i}")(x)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            x = x + gen_conv(h, i)
        x = nn.Dropout(self.dropout, deterministic=not train)(nn.relu(x))
        x = glorot_dense(self.num_classes, name="lin")(x)
        return nn.log_softmax(x, axis=1)


def spline_basis(pseudo: jax.Array, kernel_size, edge_mask: jax.Array):
    """Degree-1 open B-spline basis, densified to ``[E_pad, K]``.

    TPU formulation of the basis torch_spline_conv computes edge-sparsely
    (PyG ``SplineConv`` with ``degree=1``, ``is_open_spline=True`` — the
    configuration the reference's ConvNet uses, backbones.py:199-212):
    pseudo-coordinates in [0, 1] are scaled by ``k_i - 1`` per dimension;
    each edge activates the 2^d surrounding kernel slots with hat-function
    weights.  Instead of (slot-index, weight) pairs, the basis is expanded
    to a dense ``[E, K]`` coefficient matrix (K = prod(kernel_size)): at
    most 2^d nonzeros per row, and the downstream aggregation becomes K
    weighted MXU reductions — no scatters.

    Slot flattening uses the same mixed-radix order as torch_spline_conv
    (dimension i strides by ``prod_{j<i} k_j``).
    """
    if pseudo.ndim == 1:
        pseudo = pseudo[:, None]
    dim = pseudo.shape[1]
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size,) * dim
    assert len(kernel_size) == dim
    K = 1
    strides = []
    for k_i in kernel_size:
        strides.append(K)
        K *= k_i

    u = jnp.clip(pseudo.astype(jnp.float32), 0.0, 1.0)
    scaled = u * (jnp.asarray(kernel_size, jnp.float32) - 1.0)
    lo = jnp.floor(scaled)
    frac = scaled - lo
    lo = lo.astype(jnp.int32)

    basis = jnp.zeros((pseudo.shape[0], K), jnp.float32)
    valid = edge_mask.astype(jnp.float32)
    for corner in range(1 << dim):
        w = valid
        slot = jnp.zeros(pseudo.shape[0], jnp.int32)
        for i in range(dim):
            bit = (corner >> i) & 1
            w = w * (frac[:, i] if bit else 1.0 - frac[:, i])
            idx = jnp.minimum(lo[:, i] + bit, kernel_size[i] - 1)
            slot = slot + idx * strides[i]
        basis = basis + w[:, None] * jax.nn.one_hot(slot, K, dtype=jnp.float32)
    return basis


class SplineConv(nn.Module):
    """Degree-1 B-spline kernel conv (PyG ``SplineConv`` semantics:
    mean aggregation, root weight, bias — reference backbones.py:199-212).

    The K kernel weight matrices are applied as one batched MXU matmul
    ``x @ W → [K, N, F_out]``; each slot is then aggregated with its dense
    basis column as the per-edge weight (shared weighted-SpMM primitive),
    so the op is scatter-free on every execution path.
    """

    out_channels: int
    dim: int = 1
    kernel_size: int = 2
    root_weight: bool = True

    @nn.compact
    def __call__(self, x, adj: Adjacency, pseudo: jax.Array):
        K = self.kernel_size ** self.dim
        f_in = x.shape[-1]
        # torch_geometric.nn.inits.uniform(K * f_in, weight)
        bound = 1.0 / float(np.sqrt(K * f_in))
        weight = self.param(
            "weight",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -bound, bound),
            (K, f_in, self.out_channels),
        )
        basis = spline_basis(pseudo, self.kernel_size, adj.edge_mask)
        xw = jnp.einsum("nf,kfo->kno", x, weight)
        agg = jnp.zeros((x.shape[0], self.out_channels), x.dtype)
        for k in range(K):
            agg = agg + spmm(adj, xw[k], edge_weights=basis[:, k])
        deg = jnp.maximum(adj.in_degree, 1.0)
        out = agg / deg[:, None]  # aggr='mean': divide by neighbor count
        if self.root_weight:
            out = out + torch_dense(self.out_channels, use_bias=False,
                                    name="root")(x)
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return out + bias


class ConvNet(nn.Module):
    """Two-layer SplineConv net (reference backbones.py:199-212).

    The reference reads pseudo-coordinates from ``data.edge_attr``, which
    no shipped dataset provides — the model is unreachable from the
    reference mains.  Here the pseudo array is an explicit argument; a
    clear error replaces the reference's AttributeError when it's absent.
    """

    num_classes: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, g: Graph, adj: Adjacency, train: bool = False,
                 pseudo: Optional[jax.Array] = None):
        if pseudo is None:
            raise ValueError(
                "ConvNet/SplineConv needs per-edge pseudo-coordinates "
                "(reference data.edge_attr); pass pseudo=[E_pad, dim] "
                "in [0, 1]."
            )
        x = nn.Dropout(self.dropout, deterministic=not train)(g.x)
        x = nn.elu(SplineConv(16, dim=1, kernel_size=2,
                              name="conv1")(x, adj, pseudo))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = SplineConv(self.num_classes, dim=1, kernel_size=2,
                       name="conv2")(x, adj, pseudo)
        return nn.log_softmax(x, axis=1)


_ZOO = {
    "GCN": lambda cfg, c: GCNNet(c, cfg.num_layer, cfg.hidden,
                                 dropout=cfg.dropout),
    "GraphSAGE": lambda cfg, c: GraphSAGENet(
        c, cfg.num_layer, cfg.hidden, dropout=cfg.dropout
    ),
    "GAT": lambda cfg, c: GATNet(c, cfg.hidden, heads=3,
                                 layer_num=cfg.num_layer),
    "GATv2": lambda cfg, c: GATNet(
        c, cfg.hidden, heads=1, v2=True, layer_num=cfg.num_layer,
        att_dropout=0.5,
    ),
    "MLP": lambda cfg, c: MLPNet(c, cfg.hidden, dropout=cfg.dropout),
    "GIN": lambda cfg, c: GINNet(c, cfg.num_layer, cfg.hidden,
                                 dropout=cfg.dropout),
    "JKNet": lambda cfg, c: JKNet(c, cfg.hidden, cfg.num_layer,
                                  dropout=cfg.dropout),
    "APPNP": lambda cfg, c: APPNPNet(c, cfg.hidden, dropout=cfg.dropout),
    "GCN2": lambda cfg, c: GCN2Net(c, cfg.hidden,
                                   num_layers=max(cfg.num_layer, 2)),
    "DeeperGCN": lambda cfg, c: DeeperGCNNet(
        c, cfg.hidden, num_layers=max(cfg.num_layer, 2)
    ),
    "ConvNet": lambda cfg, c: ConvNet(c, dropout=cfg.dropout),
}


def build_backbone(name: str, cfg, num_classes: int):
    if name not in _ZOO:
        raise NotImplementedError(f"Not Implemented Model: {name}")
    return _ZOO[name](cfg, num_classes)
