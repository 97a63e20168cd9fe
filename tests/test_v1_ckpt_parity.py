"""v1-family (SAGE GraphEncoder + cosine head) parity with the shipped
twitter_unrelational checkpoint, vs a pure-torch eval-mode oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import torch_oracle as oracle
from bridged_gnn_tpu.graph import graph_from_dict
from bridged_gnn_tpu.io import load_torch_state_dict
from bridged_gnn_tpu.io.ckpt_import import (
    merge_into_variables,
    torch_state_dict_to_flax,
)
from bridged_gnn_tpu.nn.stage1 import AdversarialLearnerV2
from bridged_gnn_tpu.ops.spmm import adjacency_from_graph

TWITTER_CKPT = (
    "/root/reference/ckpt/model_AdvLearner_twitter_unrelational_best.ckpt"
)


def sage_conv(x, ei, sd, prefix):
    """PyG SAGEConv eval math: lin_l(mean-agg) + lin_r(x)."""
    n = x.shape[0]
    agg = torch.zeros_like(x)
    cnt = torch.zeros(n)
    agg = agg.index_add(0, torch.from_numpy(ei[1]), x[torch.from_numpy(ei[0])])
    cnt = cnt.index_add(0, torch.from_numpy(ei[1]),
                        torch.ones(ei.shape[1]))
    agg = agg / cnt.clamp(min=1)[:, None]
    out = oracle.linear(agg, sd, f"{prefix}.lin_l")
    w_r = oracle.t(sd[f"{prefix}.lin_r.weight"])
    return out + x @ w_r.T


def graph_encoder(x, ei, sd, prefix, norm_mode="None"):
    """2-layer GraphEncoder eval forward (models.py:245-263). The twitter
    recipe runs with norm_mode='None' (CLI default)."""
    h = sage_conv(x, ei, sd, f"{prefix}.convs.0")
    h = torch.relu(h)  # PairNorm 'None' = identity; dropout eval off
    return sage_conv(h, ei, sd, f"{prefix}.convs.1")


def cosine_head(z1, z2, idx1, idx2, sd, prefix="source_learner.sim_net"):
    """Similar cosine scoring (models.py:944-954), eval mode."""
    def embed(z):
        h = oracle.bn_eval(z, sd, f"{prefix}.lin_self.0")
        h = oracle.linear(h, sd, f"{prefix}.lin_self.1")
        h = oracle.bn_eval(h, sd, f"{prefix}.lin_self.2")
        h = torch.tanh(h)
        return oracle.linear(h, sd, f"{prefix}.lin_self.4")

    def biasatt(z):
        h = torch.tanh(oracle.linear(z, sd, f"{prefix}.biasatt.0"))
        return oracle.linear(h, sd, f"{prefix}.biasatt.2")

    e1, e2 = embed(z1), embed(z2)
    a1 = e1[idx1] + biasatt(e1[idx1])
    a2 = e2[idx2] + biasatt(e2[idx2])
    cos = torch.nn.functional.cosine_similarity(a1, a2, dim=1)
    return torch.sigmoid(cos)


@pytest.fixture(scope="module")
def twitter_setup():
    rng = np.random.default_rng(7)
    sd = load_torch_state_dict(TWITTER_CKPT)
    model = AdversarialLearnerV2(
        dim_in_src=300, dim_in_tar=300, num_classes_src=2,
        num_classes_tar=2, dim_hidden=64, source_clf=True,
        use_norm=True, norm_mode="None", backbone="gnn", sim_mode="cosine",
    )
    n_src, n_tar = 50, 40
    src = dict(
        x=rng.normal(size=(n_src, 300)).astype(np.float32),
        edge_index=rng.integers(0, n_src, size=(2, 150)),
        y=rng.integers(0, 2, size=n_src),
    )
    tar = dict(
        x=rng.normal(size=(n_tar, 300)).astype(np.float32),
        edge_index=rng.integers(0, n_tar, size=(2, 120)),
        y=rng.integers(0, 2, size=n_tar),
    )
    g_src, g_tar = graph_from_dict(src), graph_from_dict(tar)
    adj_src = adjacency_from_graph(g_src, method="dense")
    adj_tar = adjacency_from_graph(g_tar, method="dense")
    idx = jnp.zeros(4, dtype=jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(0), g_src.x, adj_src, g_tar.x, adj_tar, idx, idx,
        mask_src=g_src.node_mask, mask_tar=g_tar.node_mask,
        method=AdversarialLearnerV2.init_all,
    )
    params, bs = torch_state_dict_to_flax(sd)
    variables = merge_into_variables(variables, params, bs)
    return sd, model, variables, src, tar, g_src, g_tar, adj_src, adj_tar


def test_v1_ckpt_imports_fully(twitter_setup):
    pass  # merge_into_variables raises on any unmatched/mismatched leaf


def test_v1_cross_domain_parity(twitter_setup, rng):
    sd, model, variables, src, tar, g_src, g_tar, adj_src, adj_tar = \
        twitter_setup
    idx1 = rng.integers(0, 50, size=100)
    idx2 = rng.integers(0, 40, size=100)

    zs_t = graph_encoder(
        oracle.t(src["x"]), src["edge_index"], sd, "source_learner.backbone"
    )
    h0_t = torch.tanh(oracle.linear(
        oracle.t(tar["x"]), sd, "target_learner.equavilent_trans_layer.0"
    ))
    zt_t = graph_encoder(h0_t, tar["edge_index"], sd,
                         "target_learner.encoder")
    probs_t = cosine_head(zs_t, zt_t, torch.from_numpy(idx1),
                          torch.from_numpy(idx2), sd)

    probs_j, *_ = model.apply(
        variables, g_src.x, adj_src, g_tar.x, adj_tar,
        jnp.asarray(idx1), jnp.asarray(idx2),
        method=AdversarialLearnerV2.get_probs_cross_domain,
        mask_src=g_src.node_mask, mask_tar=g_tar.node_mask,
    )
    np.testing.assert_allclose(
        np.asarray(probs_j)[:, 0], probs_t.numpy(), rtol=1e-3, atol=1e-5
    )
