"""Bridge-construction pipeline tests against the shipped a2d checkpoint."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import torch_oracle as oracle
from bridged_gnn_tpu.bridge.build import (
    check_cross_validity,
    check_within_validity,
    decompose_pair_mlp_head,
    gen_bridged_graph,
    propose_cross_edges,
)
from bridged_gnn_tpu.graph import domain_split_np, graph_from_dict
from bridged_gnn_tpu.io.ckpt_import import (
    merge_into_variables,
    torch_state_dict_to_flax,
)
from bridged_gnn_tpu.nn.stage1 import AdversarialLearnerV2
from bridged_gnn_tpu.ops.sddmm import pair_mlp_score_block


@pytest.fixture(scope="module")
def model_and_vars(a2d_ckpt):
    model = AdversarialLearnerV2(
        dim_in_src=256, dim_in_tar=256, num_classes_src=31,
        num_classes_tar=31, dim_hidden=128, source_clf=True,
        use_norm=True, norm_mode="None", backbone="mlp", sim_mode="mlp",
    )
    x = jnp.zeros((8, 256))
    idx = jnp.zeros(4, dtype=jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(0), x, None, x, None, idx, idx,
        method=AdversarialLearnerV2.init_all,
    )
    params, batch_stats = torch_state_dict_to_flax(a2d_ckpt)
    return model, merge_into_variables(variables, params, batch_stats)


def test_mlp_head_decomposition(a2d_ckpt, model_and_vars, rng):
    """Decomposed per-side scoring == full concat-pair head (eval mode)."""
    model, variables = model_and_vars
    ns, nt, h = 30, 20, 128
    z_src = rng.normal(size=(ns, h)).astype(np.float32)
    z_tar = rng.normal(size=(nt, h)).astype(np.float32)

    d = decompose_pair_mlp_head(variables)
    a_rows = jnp.asarray((z_tar @ d["w_tar"]).astype(np.float32))
    b_cols = jnp.asarray((z_src @ d["w_src"]).astype(np.float32))
    fn = pair_mlp_score_block(
        a_rows, b_cols, jnp.asarray(d["bias"]), jnp.asarray(d["w2"]),
        jnp.asarray(np.float32(d["b2"])),
    )
    got = np.asarray(fn(jnp.arange(nt)))  # [nt, ns]

    idx1 = np.repeat(np.arange(ns), nt)
    idx2 = np.tile(np.arange(nt), ns)
    expect = oracle.pair_mlp_score(
        oracle.t(z_src), oracle.t(z_tar),
        torch.from_numpy(idx1), torch.from_numpy(idx2), a2d_ckpt,
    ).numpy().reshape(ns, nt).T
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-6)


def _synthetic_domains(rng, n_src=50, n_tar=35, d=256, c=31):
    def mk(n):
        return dict(
            x=rng.normal(size=(n, d)).astype(np.float32),
            edge_index=rng.integers(0, n, size=(2, 3 * n)),
            y=rng.integers(0, c, size=n),
            train_mask=rng.random(n) < 0.6,
            val_mask=np.zeros(n, dtype=bool),
            test_mask=np.zeros(n, dtype=bool),
        )
    return mk(n_src), mk(n_tar)


def test_propose_cross_edges_vs_bruteforce(a2d_ckpt, model_and_vars, rng):
    model, variables = model_and_vars
    src_d, tar_d = _synthetic_domains(rng)
    g_src = graph_from_dict(src_d)
    g_tar = graph_from_dict(tar_d)
    k = 5
    ei, sims, p_src, p_tar, homo = propose_cross_edges(
        model, variables, g_src, None, g_tar, None, k,
        row_block=16, sim_mode="mlp",
    )
    assert ei.shape == (2, g_tar.num_nodes * k)

    # brute force with the torch oracle
    n_src, n_tar = 50, 35
    idx1 = np.repeat(np.arange(n_src), n_tar)
    idx2 = np.tile(np.arange(n_tar), n_src)
    probs, cs, ct, zs, zt = oracle.get_probs_cross_domain(
        oracle.t(src_d["x"]), oracle.t(tar_d["x"]),
        torch.from_numpy(idx1), torch.from_numpy(idx2), a2d_ckpt,
    )
    scores = probs.numpy().reshape(n_src, n_tar).T  # [n_tar, n_src]
    for t_node in range(n_tar):
        expect_top = np.sort(scores[t_node])[-k:][::-1]
        np.testing.assert_allclose(
            np.sort(sims[t_node])[::-1], expect_top, rtol=1e-4, atol=1e-6
        )
    # classifier probabilities match too
    np.testing.assert_allclose(p_src, cs.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(p_tar, ct.numpy(), rtol=1e-4, atol=1e-6)


def test_cross_filters_individually():
    """Hand-built case exercising each of the 4 filters."""
    y_src = np.array([0, 1, 2, -1])
    y_tar = np.array([0, 1, 0])
    x_src = np.array([[1, 0], [0, 1], [1, 1], [1, 0]], dtype=np.float32)
    x_tar = np.array([[1, 0], [0, 1], [-1, 0]], dtype=np.float32)
    train_tar = np.array([True, True, False])
    # clf predictions: src preds [0,1,0,0]; tar preds [0,1,1]
    p_src = np.eye(3)[[0, 1, 0, 0]].astype(np.float32)
    p_tar = np.eye(3)[[0, 1, 1]].astype(np.float32)
    edges = np.array([
        [0, 0],   # keep: pred 0==y 0, preds equal, cos=1
        [1, 1],   # keep
        [2, 0],   # drop: pred_src[2]=0 != y_src[2]=2 (filter 2)
        [1, 2],   # tar 2 not train → filter-2 tar check skipped; but
                  # pred_src[1]=1 != pred_tar[2]=1? equal → kept by f3;
                  # cos(x_src[1],x_tar[2])=0 ≥ 0 → keep
        [0, 2],   # drop: pred_src[0]=0 != pred_tar[2]=1 (filter 3)
    ]).T
    sims = np.array([0.9, 0.9, 0.9, 0.9, 0.9])
    kept = check_cross_validity(
        edges, sims, y_src, y_tar, x_src, x_tar, train_tar, p_src, p_tar,
        thres_conf_quantile=0.0, thres_feat_sim=0.0,
    )
    assert set(map(tuple, kept.T)) == {(0, 0), (1, 1), (1, 2)}

    # quantile filter drops the lowest-sim 20%
    sims2 = np.array([0.1, 0.9, 0.9, 0.9, 0.9])
    kept2 = check_cross_validity(
        edges, sims2, y_src, y_tar, x_src, x_tar, train_tar, p_src, p_tar,
        thres_conf_quantile=0.3, thres_feat_sim=0.0,
    )
    assert (0, 0) not in set(map(tuple, kept2.T))

    # feature-sim filter: cos(x_src[1], x_tar[2]) = -? x_src[1]=(0,1),
    # x_tar[2]=(-1,0) → cos 0 < 0.5 → dropped
    kept3 = check_cross_validity(
        edges, sims, y_src, y_tar, x_src, x_tar, train_tar, p_src, p_tar,
        thres_conf_quantile=0.0, thres_feat_sim=0.5,
    )
    assert (1, 2) not in set(map(tuple, kept3.T))


def test_propose_cross_edges_sharded_matches(model_and_vars, rng):
    """mesh= path (sharded top-k) must reproduce the single-device sims."""
    from bridged_gnn_tpu.parallel import make_mesh

    model, variables = model_and_vars
    src_d, tar_d = _synthetic_domains(rng)
    g_src = graph_from_dict(src_d)
    g_tar = graph_from_dict(tar_d)
    k = 5
    ei1, sims1, *_ = propose_cross_edges(
        model, variables, g_src, None, g_tar, None, k,
        row_block=16, sim_mode="mlp",
    )
    mesh = make_mesh(8)
    ei2, sims2, *_ = propose_cross_edges(
        model, variables, g_src, None, g_tar, None, k,
        row_block=16, sim_mode="mlp", mesh=mesh,
    )
    np.testing.assert_allclose(
        np.sort(sims1, axis=1), np.sort(sims2, axis=1), rtol=1e-4, atol=1e-6
    )


def test_gen_bridged_graph_end_to_end(model_and_vars, rng):
    model, variables = model_and_vars
    src_d, tar_d = _synthetic_domains(rng)
    g_src = graph_from_dict(src_d)
    g_tar = graph_from_dict(tar_d)
    n_src, n_tar = 50, 35
    # identity mappers: source occupies original ids [0,50), target [50,85)
    m_src = {i: i for i in range(n_src)}
    m_tar = {i + n_src: i for i in range(n_tar)}
    # checks off: with random labels the clf-consistency filters remove
    # essentially every proposal (correct behavior, separately tested above)
    out = gen_bridged_graph(
        model, variables, g_src, None, g_tar, None, m_src, m_tar,
        k_cross=4, k_within=2, check_cross=False, check_within=False,
        thres_conf_quantile=0.1, thres_feat_sim=0.0, sim_mode="mlp",
        row_block=16,
    )
    n = n_src + n_tar
    assert out["x"].shape == (n, 256)
    assert out["central_mask"].sum() == n_src
    assert out["central_mask"][:n_src].all()
    # all labeled source nodes are train
    np.testing.assert_array_equal(
        out["train_mask"][:n_src], src_d["y"] != -1
    )
    # cross edges are directed src→tar only (no tar→src)
    ei = out["edge_index"]
    central = out["central_mask"]
    tar2src = (~central[ei[0]]) & central[ei[1]]
    assert tar2src.sum() == 0
    src2tar = central[ei[0]] & (~central[ei[1]])
    assert src2tar.sum() > 0


def test_gen_bridged_graph_approx_recall_plumbing(model_and_vars, rng):
    """approx_recall threads end to end; CPU approx_max_k is an exact
    sort, so the bridged graph must be identical to the exact run."""
    model, variables = model_and_vars
    src_d, tar_d = _synthetic_domains(rng)
    g_src = graph_from_dict(src_d)
    g_tar = graph_from_dict(tar_d)
    m_src = {i: i for i in range(50)}
    m_tar = {i + 50: i for i in range(35)}
    kw = dict(
        k_cross=4, k_within=2, check_cross=False, check_within=False,
        thres_conf_quantile=0.1, thres_feat_sim=0.0, sim_mode="mlp",
        row_block=16,
    )
    exact = gen_bridged_graph(
        model, variables, g_src, None, g_tar, None, m_src, m_tar, **kw
    )
    approx = gen_bridged_graph(
        model, variables, g_src, None, g_tar, None, m_src, m_tar,
        approx_recall=0.95, **kw
    )
    np.testing.assert_array_equal(exact["edge_index"], approx["edge_index"])


def test_propose_cross_edges_rerank_full_cover_matches(model_and_vars, rng):
    """rerank_candidates >= N_src with exact phase-1 degenerates to the
    exact sweep; small candidate budgets still return valid shapes and
    achievable scores (recall on the shipped checkpoints is measured in
    tools/probe_mlp_rerank.py)."""
    model, variables = model_and_vars
    src_d, tar_d = _synthetic_domains(rng)
    g_src = graph_from_dict(src_d)
    g_tar = graph_from_dict(tar_d)
    k = 5
    ei_e, sims_e, *_ = propose_cross_edges(
        model, variables, g_src, None, g_tar, None, k,
        row_block=16, sim_mode="mlp",
    )
    ei_r, sims_r, *_ = propose_cross_edges(
        model, variables, g_src, None, g_tar, None, k,
        row_block=16, sim_mode="mlp", rerank_candidates=g_src.num_nodes,
    )
    np.testing.assert_array_equal(ei_r, ei_e)
    np.testing.assert_allclose(sims_r, sims_e, rtol=1e-5)

    # tight candidate budget: sims must be exact head scores at the
    # returned indices (subset-of-columns property), rows sorted desc
    ei_t, sims_t, *_ = propose_cross_edges(
        model, variables, g_tar, None, g_tar, None, k,
        row_block=16, sim_mode="mlp", rerank_candidates=8,
    )
    assert ei_t.shape == (2, g_tar.num_nodes * k)
    assert (np.diff(sims_t, axis=1) <= 1e-6).all()


def test_rerank_sharded_matches_exact_when_covering(model_and_vars, rng):
    """Sharded rerank (per-shard cosine screen + exact-MLP rerank +
    k-way merge) degenerates to the exact sharded sweep when every local
    column is a candidate and phase-1 selection is exact."""
    from bridged_gnn_tpu.parallel import make_mesh

    model, variables = model_and_vars
    src_d, tar_d = _synthetic_domains(rng)
    g_src = graph_from_dict(src_d)
    g_tar = graph_from_dict(tar_d)
    k = 5
    mesh = make_mesh(8)
    ei_e, sims_e, *_ = propose_cross_edges(
        model, variables, g_src, None, g_tar, None, k,
        row_block=16, sim_mode="mlp",
    )
    ei_r, sims_r, *_ = propose_cross_edges(
        model, variables, g_src, None, g_tar, None, k,
        row_block=16, sim_mode="mlp",
        rerank_candidates=g_src.num_nodes, mesh=mesh,
    )
    np.testing.assert_allclose(sims_r, sims_e, rtol=1e-4, atol=1e-6)

    # tight budget per shard: valid shapes, desc-sorted exact scores
    ei_t, sims_t, *_ = propose_cross_edges(
        model, variables, g_tar, None, g_tar, None, k,
        row_block=16, sim_mode="mlp", rerank_candidates=5, mesh=mesh,
    )
    assert ei_t.shape == (2, g_tar.num_nodes * k)
    assert (np.diff(sims_t, axis=1) <= 1e-6).all()


def test_rerank_recall_on_shipped_ckpt(a2d_ckpt, model_and_vars, a2d_dict):
    """Golden recall guard for the cosine-prescreen proxy: on the shipped
    a2d checkpoint scoring the shipped office features (reconstructed per
    domain from the golden bridged graph), the rerank top-20 at 256
    candidates must keep >=0.99 mean recall vs the exact pair-MLP sweep
    (measured 0.9985 — tools/probe_mlp_rerank.json). Catches regressions
    in the head decomposition or the proxy path."""
    from bridged_gnn_tpu.bridge.build import _encode, _topk_grid

    model, variables = model_and_vars
    src_d, tar_d, _, _ = domain_split_np(dict(a2d_dict))
    g_src = graph_from_dict(src_d)
    g_tar = graph_from_dict(tar_d)
    z_src, z_tar = _encode(model, variables, g_src, None, g_tar, None)
    z_src, z_tar = np.asarray(z_src), np.asarray(z_tar)
    k = 20
    _, ie = _topk_grid(variables, z_tar, z_src, k, "mlp", 512)
    _, ir = _topk_grid(variables, z_tar, z_src, k, "mlp", 512,
                       rerank_candidates=256)
    recall = np.mean([
        len(set(ie[i]) & set(ir[i])) / k for i in range(ie.shape[0])
    ])
    assert recall >= 0.99, f"rerank recall regressed: {recall:.4f}"
