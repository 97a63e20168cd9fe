"""Stage-1 adversarial similarity learner (bridged-graph learning).

Re-design of the reference model family (models/models.py):

  * ``SimilarV2`` — similarity head with 'cosine' (lin_self + biasatt
    residual + cosine + sigmoid, models.py:895-917) and 'mlp'
    (BN→Linear(2H,128)→BN→ReLU→Linear(128,1) over concatenated pairs,
    models.py:918-925) modes, plus an optional node classifier head.
  * ``SourceLearnerV2`` — backbone (MLP or SAGE GraphEncoder) → SimilarV2
    (models.py:999-1052).
  * ``TargetLearnerAEV2`` — equivalence-translation layer + encoder +
    decoder autoencoder (models.py:1055-1107).
  * ``AdversarialLearnerV2`` — composition with the domain discriminator and
    the two inference APIs used by evaluation and bridge construction
    (models.py:1110-1142).

Sub-module names mirror the torch ``state_dict`` layout (SURVEY §3.5) so the
checkpoint import shim is a mechanical rename+transpose.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from bridged_gnn_tpu.nn.common import (
    Decoder,
    Discriminator,
    MaskedBatchNorm,
    MLPBackbone,
    torch_dense,
    pair_norm,
)
from bridged_gnn_tpu.ops.spmm import Adjacency, spmm


def cosine_similarity(a: jax.Array, b: jax.Array, eps: float = 1e-8):
    """torch.nn.CosineSimilarity(dim=1) semantics."""
    na = jnp.maximum(jnp.linalg.norm(a, axis=-1), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=-1), eps)
    return jnp.sum(a * b, axis=-1) / (na * nb)


class SAGEConv(nn.Module):
    """GraphSAGE conv: lin_l(mean-aggregate(x)) [+ lin_r(x)].

    Matches PyG SAGEConv defaults (aggr='mean', bias on lin_l) as used by the
    reference GraphEncoder (models/models.py:220-263).
    """

    out_channels: int
    root_weight: bool = True

    @nn.compact
    def __call__(self, x, adj: Adjacency):
        agg = spmm(adj, x, reduce="mean")
        out = torch_dense(self.out_channels, name="lin_l")(agg)
        if self.root_weight:
            out = out + torch_dense(
                self.out_channels, use_bias=False, name="lin_r"
            )(x)
        return out


class GraphEncoder(nn.Module):
    """SAGE stack with PairNorm+ReLU+dropout between layers
    (reference models/models.py:220-263)."""

    dim_out: int
    dim_hidden: int = 64
    layer_num: int = 2
    root_weight: bool = True
    norm_mode: str = "PN-SCS"
    norm_scale: float = 1.0

    @nn.compact
    def __call__(self, x, adj: Adjacency, mask=None, train: bool = False):
        dims = (
            [self.dim_out]
            if self.layer_num == 1
            else [self.dim_hidden] * (self.layer_num - 1) + [self.dim_out]
        )
        for i, d in enumerate(dims):
            # named convs_{i} to mirror the torch state_dict layout
            # (GraphEncoder.convs, models/models.py:224)
            x = SAGEConv(d, root_weight=self.root_weight, name=f"convs_{i}")(
                x, adj
            )
            if i < len(dims) - 1:
                x = pair_norm(x, mask, mode=self.norm_mode,
                              scale=self.norm_scale)
                x = nn.relu(x)
                x = nn.Dropout(0.5, deterministic=not train)(x)
        return x


class SimilarV2(nn.Module):
    """Similarity head (reference models/models.py:895-997)."""

    in_channels: int
    num_clf_classes: int
    dropout: float = 0.6
    use_clf: bool = True
    mode: str = "mlp"  # 'cosine' | 'mlp'

    def setup(self):
        if self.mode == "cosine":
            self.lin_self_0 = MaskedBatchNorm()
            self.lin_self_1 = torch_dense(64, use_bias=False)
            self.lin_self_2 = MaskedBatchNorm()
            self.lin_self_4 = torch_dense(128, use_bias=False)
            self.biasatt_0 = torch_dense(64)
            self.biasatt_2 = torch_dense(128)
        elif self.mode == "mlp":
            self.lin_self_0 = MaskedBatchNorm()
            self.lin_self_1 = torch_dense(128)
            self.lin_self_2 = MaskedBatchNorm()
            self.lin_self_4 = torch_dense(1)
        else:
            raise ValueError(f"unsupported mode: {self.mode}")
        if self.use_clf:
            self.lin_clf = torch_dense(self.num_clf_classes)
        self.clf_dropout = nn.Dropout(self.dropout)

    def _embed_cosine(self, x, train: bool):
        """lin_self pipeline for cosine mode: BN→Linear→BN→tanh→Linear."""
        z = self.lin_self_0(x, use_running_average=not train)
        z = self.lin_self_1(z)
        z = self.lin_self_2(z, use_running_average=not train)
        z = jnp.tanh(z)
        return self.lin_self_4(z)

    def _pair_mlp(self, x_pair, train: bool):
        """lin_self pipeline for mlp mode: BN→Linear→BN→relu→Linear."""
        z = self.lin_self_0(x_pair, use_running_average=not train)
        z = self.lin_self_1(z)
        z = self.lin_self_2(z, use_running_average=not train)
        z = nn.relu(z)
        return self.lin_self_4(z)

    def similarity(self, x, idx1, idx2, train: bool = False):
        if self.mode == "cosine":
            z = self._embed_cosine(x, train)
            z1, z2 = z[idx1], z[idx2]
            a1 = z1 + self.biasatt_2(jnp.tanh(self.biasatt_0(z1)))
            a2 = z2 + self.biasatt_2(jnp.tanh(self.biasatt_0(z2)))
            alpha = cosine_similarity(a1, a2)
        else:
            x_pair = jnp.concatenate([x[idx1], x[idx2]], axis=1)
            alpha = self._pair_mlp(x_pair, train)[:, 0]
        return nn.sigmoid(alpha)

    def similarity_cross_domain(
        self, x_src, x_tar, idx1, idx2, train: bool = False
    ):
        if self.mode == "cosine":
            z1 = self._embed_cosine(x_src, train)[idx1]
            z2 = self._embed_cosine(x_tar, train)[idx2]
            a1 = z1 + self.biasatt_2(jnp.tanh(self.biasatt_0(z1)))
            a2 = z2 + self.biasatt_2(jnp.tanh(self.biasatt_0(z2)))
            alpha = cosine_similarity(a1, a2)
        else:
            x_pair = jnp.concatenate([x_src[idx1], x_tar[idx2]], axis=1)
            alpha = self._pair_mlp(x_pair, train)[:, 0]
        return nn.sigmoid(alpha)

    def classify(self, z, train: bool = False):
        """log-softmax classifier over node embeddings
        (models.py:993-995)."""
        h = nn.relu(z)
        h = self.clf_dropout(h, deterministic=not train)
        return nn.log_softmax(self.lin_clf(h), axis=-1)

    def __call__(self, x, idx1, idx2, train: bool = False):
        log_probs_clf = self.classify(x, train) if self.use_clf else None
        alpha = self.similarity(x, idx1, idx2, train)
        return alpha[:, None], log_probs_clf


class SimilarNoTrans(nn.Module):
    """Raw-feature cosine similarity head (reference models.py:171-217):
    no learned transform — cosine of the inputs, sigmoid'd — plus the
    optional classifier head."""

    in_channels: int
    num_clf_classes: int
    dropout: float = 0.6
    use_clf: bool = True

    def setup(self):
        if self.use_clf:
            self.lin_clf = torch_dense(self.num_clf_classes)
        self.clf_dropout = nn.Dropout(self.dropout)

    def similarity(self, x, idx1, idx2, train: bool = False):
        return nn.sigmoid(cosine_similarity(x[idx1], x[idx2]))

    def similarity_cross_domain(self, x_src, x_tar, idx1, idx2,
                                train: bool = False):
        return nn.sigmoid(cosine_similarity(x_src[idx1], x_tar[idx2]))

    def __call__(self, x, idx1, idx2, train: bool = False):
        log_probs_clf = None
        if self.use_clf:
            h = self.clf_dropout(nn.relu(x), deterministic=not train)
            log_probs_clf = nn.log_softmax(self.lin_clf(h), axis=-1)
        return self.similarity(x, idx1, idx2, train)[:, None], log_probs_clf


class SimNet(nn.Module):
    """Generic pair-MLP similarity scorer (reference models.py:520-574):
    Linear(2H→H) [+BN] + act ×(L−1) → Linear(H→1) → sigmoid."""

    dim_hidden: int
    num_layer: int = 2
    use_bn: bool = False
    dropout: float = 0.5
    act_fn: str = "relu"

    @nn.compact
    def __call__(self, z, idx1, idx2, train: bool = False):
        act = {
            "relu": nn.relu,
            "leakyrelu": lambda v: nn.leaky_relu(v, 0.2),
            "tanh": jnp.tanh,
            "sigmoid": nn.sigmoid,
        }[self.act_fn]
        x = jnp.concatenate([z[idx1], z[idx2]], axis=1)
        for i in range(self.num_layer - 1):
            x = torch_dense(self.dim_hidden, name=f"layers_{i}")(x)
            if self.use_bn:
                x = MaskedBatchNorm(name=f"bns_{i}")(
                    x, use_running_average=not train
                )
            x = act(x)
        logits = torch_dense(1, name=f"layers_{self.num_layer - 1}")(x)
        return nn.sigmoid(logits)


class SourceLearnerV2(nn.Module):
    """Backbone + similarity head over the source graph
    (reference models/models.py:999-1052)."""

    dim_in: int
    num_classes: int
    dim_hidden: int = 64
    use_clf: bool = True
    use_norm: bool = True
    backbone: str = "mlp"  # 'mlp' | 'gnn'
    sim_mode: str = "cosine"
    norm_mode: str = "None"
    norm_scale: float = 1.0
    num_layer: int = 2

    def setup(self):
        if self.backbone == "mlp":
            self.backbone_net = MLPBackbone(
                self.dim_hidden,
                dim_hidden=self.dim_hidden,
                layer_num=self.num_layer,
                use_norm=self.use_norm,
                norm_mode=self.norm_mode,
                norm_scale=self.norm_scale,
            )
        elif self.backbone == "gnn":
            self.backbone_net = GraphEncoder(
                self.dim_hidden,
                dim_hidden=self.dim_hidden,
                layer_num=self.num_layer,
                norm_mode=self.norm_mode,
                norm_scale=self.norm_scale,
            )
        else:
            raise ValueError(self.backbone)
        self.sim_net = SimilarV2(
            self.dim_hidden,
            num_clf_classes=self.num_classes,
            dropout=0.6,
            use_clf=self.use_clf,
            mode=self.sim_mode,
        )

    def encode(self, x, adj: Optional[Adjacency], mask=None,
               train: bool = False):
        if self.backbone == "mlp":
            return self.backbone_net(x, mask=mask, train=train)
        return self.backbone_net(x, adj, mask=mask, train=train)

    def __call__(self, x, adj, idx1, idx2, mask=None, train: bool = False):
        h = self.encode(x, adj, mask, train)
        probs_pair, log_probs_clf = self.sim_net(h, idx1, idx2, train)
        return probs_pair, log_probs_clf, h


class TargetLearnerAEV2(nn.Module):
    """Equivalence translation + encoder + decoder AE over the target graph
    (reference models/models.py:1055-1107)."""

    dim_in: int
    dim_eq_trans: int = 128
    dim_hidden: int = 64
    use_norm: bool = True
    backbone: str = "mlp"
    norm_mode: str = "None"
    norm_scale: float = 1.0
    num_layer: int = 2

    def setup(self):
        self.equavilent_trans_layer_0 = torch_dense(self.dim_eq_trans)
        if self.backbone == "mlp":
            self.encoder = MLPBackbone(
                self.dim_hidden,
                dim_hidden=self.dim_hidden,
                layer_num=self.num_layer,
                use_norm=self.use_norm,
                norm_mode=self.norm_mode,
                norm_scale=self.norm_scale,
            )
        elif self.backbone == "gnn":
            self.encoder = GraphEncoder(
                self.dim_hidden,
                dim_hidden=self.dim_hidden,
                layer_num=self.num_layer,
                norm_mode=self.norm_mode,
                norm_scale=self.norm_scale,
            )
        else:
            raise ValueError(self.backbone)
        self.decoder = Decoder(
            self.dim_hidden,
            self.dim_eq_trans,
            num_layer=2,
            use_norm=True,
            norm_mode=self.norm_mode,
            norm_scale=self.norm_scale,
        )

    def encode(self, x, adj: Optional[Adjacency] = None, mask=None,
               train: bool = False):
        h0 = self.equavilent_trans_layer_0(x)
        h0 = pair_norm(h0, mask, mode=self.norm_mode, scale=self.norm_scale)
        h0 = jnp.tanh(h0)
        if self.backbone == "mlp":
            z = self.encoder(h0, mask=mask, train=train)
        else:
            z = self.encoder(h0, adj, mask=mask, train=train)
        return z, h0

    def decode(self, z, mask=None, train: bool = False):
        recons = self.decoder(z, mask=mask, train=train)
        return jnp.tanh(recons)

    def __call__(self, x, adj=None, mask=None, train: bool = False):
        z, h0 = self.encode(x, adj, mask, train)
        recons = self.decode(z, mask, train)
        return h0, z, recons


class AdversarialLearnerV2(nn.Module):
    """Top-level stage-1 model (reference models/models.py:1110-1142)."""

    dim_in_src: int
    dim_in_tar: int
    num_classes_src: int
    num_classes_tar: int
    dim_hidden: int = 64
    source_clf: bool = True
    use_norm: bool = True
    norm_mode: str = "None"
    norm_scale: float = 1.0
    backbone: str = "mlp"
    sim_mode: str = "cosine"
    num_layer: int = 2

    def setup(self):
        self.source_learner = SourceLearnerV2(
            dim_in=self.dim_in_src,
            num_classes=self.num_classes_src,
            dim_hidden=self.dim_hidden,
            use_clf=self.source_clf,
            use_norm=self.use_norm,
            backbone=self.backbone,
            sim_mode=self.sim_mode,
            norm_mode=self.norm_mode,
            norm_scale=self.norm_scale,
            num_layer=self.num_layer,
        )
        self.target_learner = TargetLearnerAEV2(
            dim_in=self.dim_in_tar,
            dim_eq_trans=128,
            dim_hidden=self.dim_hidden,
            use_norm=self.use_norm,
            backbone=self.backbone,
            norm_mode=self.norm_mode,
            norm_scale=self.norm_scale,
            num_layer=self.num_layer,
        )
        self.discriminator = Discriminator(
            self.dim_hidden, num_layer=2, act_fn="relu", sigmoid_output=True
        )

    def __call__(self, x_src, adj_src, x_tar, adj_tar, idx1, idx2,
                 mask_src=None, mask_tar=None, train: bool = False):
        """Convenience forward used for initialization: scores cross pairs."""
        return self.get_probs_cross_domain(
            x_src, adj_src, x_tar, adj_tar, idx1, idx2,
            mask_src, mask_tar, train,
        )

    # --- inference APIs used by eval + bridge construction ----------------

    def get_probs_within_domain(
        self, x, adj, idx1, idx2, domain: str = "target",
        mask=None, train: bool = False,
    ):
        if domain == "source":
            probs_pair, log_probs_clf, _ = self.source_learner(
                x, adj, idx1, idx2, mask=mask, train=train
            )
        else:
            z, _ = self.target_learner.encode(x, adj, mask, train)
            probs_pair, log_probs_clf = self.source_learner.sim_net(
                z, idx1, idx2, train
            )
        probs_clf = (
            jnp.exp(log_probs_clf) if log_probs_clf is not None else None
        )
        return probs_pair, probs_clf

    def get_probs_cross_domain(
        self, x_src, adj_src, x_tar, adj_tar, idx1, idx2,
        mask_src=None, mask_tar=None, train: bool = False,
    ):
        z_src = self.source_learner.encode(x_src, adj_src, mask_src, train)
        z_tar, _ = self.target_learner.encode(x_tar, adj_tar, mask_tar, train)
        sim = self.source_learner.sim_net
        probs_pair = sim.similarity_cross_domain(
            z_src, z_tar, idx1, idx2, train
        )[:, None]
        if self.source_clf:
            probs_clf_src = jnp.exp(sim.classify(z_src, train))
            probs_clf_tar = jnp.exp(sim.classify(z_tar, train))
        else:
            probs_clf_src = probs_clf_tar = None
        return probs_pair, probs_clf_src, probs_clf_tar, z_src, z_tar

    def encode_domains(self, x_src, adj_src, x_tar, adj_tar,
                       mask_src=None, mask_tar=None, train: bool = False):
        """Embeddings for both domains (bridge construction front end)."""
        z_src = self.source_learner.encode(x_src, adj_src, mask_src, train)
        z_tar, _ = self.target_learner.encode(x_tar, adj_tar, mask_tar, train)
        return z_src, z_tar

    def discriminate(self, z, train: bool = False):
        return self.discriminator(z, train=train)

    def train_forward(
        self, x_src, adj_src, x_tar, adj_tar,
        idx1_src, idx2_src, idx1_tar, idx2_tar, idx1_cross, idx2_cross,
        mask_src=None, mask_tar=None, train: bool = True,
    ):
        """One stage-1 forward in the reference's exact call order
        (scripts.py:34-54): source pairs, target AE + target pairs scored by
        the source sim head, cross pairs, discriminator-on-target — so
        BatchNorm running stats see the same update sequence."""
        probs_pair_src, log_clf_src, h_src = self.source_learner(
            x_src, adj_src, idx1_src, idx2_src, mask=mask_src, train=train
        )
        h0_tar, h_tar, recons = self.target_learner(
            x_tar, adj_tar, mask_tar, train
        )
        sim = self.source_learner.sim_net
        probs_pair_tar, log_clf_tar = sim(h_tar, idx1_tar, idx2_tar, train)
        probs_pair_cross = sim.similarity_cross_domain(
            h_src, h_tar, idx1_cross, idx2_cross, train
        )[:, None]
        d_tar = self.discriminator(h_tar, train=train)
        return dict(
            probs_pair_src=probs_pair_src,
            probs_pair_tar=probs_pair_tar,
            probs_pair_cross=probs_pair_cross,
            log_clf_src=log_clf_src,
            log_clf_tar=log_clf_tar,
            h_src=h_src,
            h_tar=h_tar,
            h0_tar=h0_tar,
            recons=recons,
            d_tar=d_tar,
        )

    def init_all(self, x_src, adj_src, x_tar, adj_tar, idx1, idx2,
                 mask_src=None, mask_tar=None):
        """Touches every submodule so flax init creates all parameters."""
        out = self.get_probs_cross_domain(
            x_src, adj_src, x_tar, adj_tar, idx1, idx2, mask_src, mask_tar
        )
        h0, z, recons = self.target_learner(x_tar, adj_tar, mask_tar)
        d = self.discriminator(z)
        # within-domain source path (shares submodules; cheap at init)
        p, _ = self.get_probs_within_domain(
            x_src, adj_src, idx1[:1], idx1[:1], domain="source",
            mask=mask_src,
        )
        return out[0]
