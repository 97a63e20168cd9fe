"""Bridged-graph construction: top-k edge proposal → validity filters → merge.

TPU-native re-design of the reference pipeline (main_bridged_graph.py:33-321):

  * the all-pairs scoring loop becomes the blocked SDDMM+top-k harness
    (ops/sddmm.py): node embeddings are encoded **once** (the reference
    re-encodes both full domains for every batch — main_bridged_graph.py:56),
    the eval-mode pair-MLP head is decomposed into per-side projections so a
    score tile is two matmuls + one broadcast add, and top-k runs on device;
  * the four validity filters (reference :123-161, :225-264) are cheap
    host-side numpy over the proposed edge lists, preserved in exact order;
  * merge/reorder are pure index transforms (graph.py).

Quirk parity (SURVEY §7.4): the ``epsilon`` argument is accepted and unused,
exactly like the reference (:33); selection is pure top-k. Cross edges are
directed src→tar. Within-domain proposals keep self-pairs (reference :97).

Documented intentional deviation: the reference coalesces proposed edges
*before* filtering but passes the pre-coalesce similarity vector, so its
filter thresholds act on a misaligned edge↔sim pairing whenever coalesce
reorders (main_bridged_graph.py:75 + :235-239). We filter on the flat
(row-major, sim-aligned) proposals and coalesce afterwards — same filters,
correctly aligned. ``gen_bridged_graph(reference_compat=True)`` reproduces
the reference's exact sequencing instead (sort edges into PyG-coalesce
order FIRST, then filter with the row-major sim vector): it exists so the
shipped office bridged graphs can be regenerated edge-for-edge from the
shipped checkpoints (tests/test_bridge_repro.py) and so the effect of the
alignment fix is quantifiable (tools/repro_office_bridge.py).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bridged_gnn_tpu.graph import coalesce_np, merge_graphs_np, reorder_np
from bridged_gnn_tpu.nn.stage1 import AdversarialLearnerV2
from bridged_gnn_tpu.ops.sddmm import (
    blockwise_pair_scores_topk,
    cosine_score_block,
    pair_mlp_score_block,
)

_BN_EPS = 1e-5


def _bn_affine(params, stats):
    """Eval-mode BatchNorm as (scale, shift) per channel."""
    g = np.asarray(params["scale"])
    b = np.asarray(params["bias"])
    mu = np.asarray(stats["mean"])
    var = np.asarray(stats["var"])
    s = g / np.sqrt(var + _BN_EPS)
    return s, b - mu * s


def decompose_pair_mlp_head(variables) -> Dict[str, np.ndarray]:
    """Split the eval-mode 'mlp' similarity head into per-side projections.

    Head (reference models/models.py:918-925):
      BN0(2H) → Linear1(2H,128) → BN2(128) → ReLU → Linear4(128,1) → sigmoid
    over pairs concat(z_src[i], z_tar[j]). Both BNs are affine in eval mode,
    so pre-ReLU activations decompose as  A(z_src) + B(z_tar) + bias.
    """
    p = variables["params"]["source_learner"]["sim_net"]
    st = variables["batch_stats"]["source_learner"]["sim_net"]
    s0, t0 = _bn_affine(p["lin_self_0"], st["lin_self_0"])
    w1 = np.asarray(p["lin_self_1"]["kernel"])   # [2H, 128]
    b1 = np.asarray(p["lin_self_1"]["bias"])
    h = w1.shape[0] // 2
    s2, t2 = _bn_affine(p["lin_self_2"], st["lin_self_2"])
    w2 = np.asarray(p["lin_self_4"]["kernel"])[:, 0]  # [128]
    b2 = float(np.asarray(p["lin_self_4"]["bias"])[0])

    # side projections with BN0 folded in; BN2 folded into both sides + bias
    w_src = (s0[:h, None] * w1[:h]) * s2[None, :]       # [H, 128]
    w_tar = (s0[h:, None] * w1[h:]) * s2[None, :]
    bias = (t0[:h] @ w1[:h] + t0[h:] @ w1[h:] + b1) * s2 + t2
    return dict(w_src=w_src, w_tar=w_tar, bias=bias, w2=w2, b2=b2)


def _embed_cosine_side(variables, z):
    """Apply the cosine head's lin_self + biasatt residual (eval mode)."""
    p = variables["params"]["source_learner"]["sim_net"]
    st = variables["batch_stats"]["source_learner"]["sim_net"]
    s0, t0 = _bn_affine(p["lin_self_0"], st["lin_self_0"])
    h = z * s0 + t0
    h = h @ np.asarray(p["lin_self_1"]["kernel"])
    s2, t2 = _bn_affine(p["lin_self_2"], st["lin_self_2"])
    h = jnp.tanh(h * s2 + t2)
    zz = h @ np.asarray(p["lin_self_4"]["kernel"])
    ba = jnp.tanh(zz @ np.asarray(p["biasatt_0"]["kernel"])
                  + np.asarray(p["biasatt_0"]["bias"]))
    ba = ba @ np.asarray(p["biasatt_2"]["kernel"]) + np.asarray(
        p["biasatt_2"]["bias"]
    )
    return zz + ba


def _topk_grid(
    variables,
    z_rows: np.ndarray,    # target-side embeddings [R, H]
    z_cols: np.ndarray,    # source-side embeddings [C, H]
    k: int,
    sim_mode: str,
    row_block: int,
    mesh=None,
    approx_recall=None,
    rerank_candidates=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Row-wise top-k of the pair-similarity matrix: (values [R,k],
    column indices [R,k]).

    ``rerank_candidates`` (mlp mode only): screen columns with the
    MXU-speed cosine of the raw stage-1 embeddings, then evaluate the
    exact pair-MLP head only at the top ``rerank_candidates`` columns per
    row (ops/sddmm.py::blockwise_rerank_topk). Ranking exactness becomes
    proxy recall — measured on the shipped office checkpoints in
    tools/probe_mlp_rerank.json."""
    n_rows, n_cols = z_rows.shape[0], z_cols.shape[0]
    rows_padded = ((n_rows + row_block - 1) // row_block) * row_block
    # all pre-math stays on device: embeddings arrive as device arrays
    # from the jitted encoders, and host round-trips cost seconds over
    # the tunneled chip (DESIGN.md §8)
    z_rows, z_cols = jnp.asarray(z_rows), jnp.asarray(z_cols)

    if sim_mode == "mlp":
        d = decompose_pair_mlp_head(variables)
        a_rows = z_rows @ jnp.asarray(d["w_tar"])
        b_cols = z_cols @ jnp.asarray(d["w_src"])
        a_pad = jnp.zeros(
            (rows_padded, a_rows.shape[1]), jnp.float32
        ).at[:n_rows].set(a_rows)
        if rerank_candidates is not None and mesh is not None:
            from bridged_gnn_tpu.parallel import sharded_pair_topk

            z_pad = jnp.zeros(
                (rows_padded, z_rows.shape[1]), jnp.float32
            ).at[:n_rows].set(z_rows.astype(jnp.float32))
            vals, idxs = sharded_pair_topk(
                mesh, jnp.asarray(a_pad), jnp.asarray(b_cols),
                n_rows, n_cols, k, mode="mlp",
                mlp_bias1=jnp.asarray(d["bias"]),
                mlp_w2=jnp.asarray(d["w2"]),
                mlp_b2=jnp.asarray(np.float32(d["b2"])),
                row_block=row_block, approx_recall=approx_recall,
                rerank_candidates=int(rerank_candidates),
                z_rows=z_pad, z_cols=z_cols.astype(jnp.float32),
            )
        elif rerank_candidates is not None:
            from bridged_gnn_tpu.ops.sddmm import (
                blockwise_rerank_topk,
                mlp_score_candidates,
            )

            # bf16 proxy: the screen only has to put the true top-k
            # inside the candidate set, so bf16 rounding at the candidate
            # boundary is immaterial (recall measured with this exact
            # path in tools/probe_mlp_rerank.json)
            z_pad = jnp.zeros(
                (rows_padded, z_rows.shape[1]), jnp.float32
            ).at[:n_rows].set(z_rows.astype(jnp.float32))
            proxy = cosine_score_block(
                z_pad.astype(jnp.bfloat16), z_cols.astype(jnp.bfloat16)
            )
            exact = mlp_score_candidates(
                jnp.asarray(a_pad), jnp.asarray(b_cols),
                jnp.asarray(d["bias"]), jnp.asarray(d["w2"]),
                jnp.asarray(np.float32(d["b2"])),
            )
            vals, idxs = blockwise_rerank_topk(
                proxy, exact, n_rows, n_cols, k,
                candidates=int(rerank_candidates), row_block=row_block,
                approx_recall=approx_recall,
            )
        elif mesh is not None:
            from bridged_gnn_tpu.parallel import sharded_pair_topk

            vals, idxs = sharded_pair_topk(
                mesh, jnp.asarray(a_pad), jnp.asarray(b_cols),
                n_rows, n_cols, k, mode="mlp",
                mlp_bias1=jnp.asarray(d["bias"]),
                mlp_w2=jnp.asarray(d["w2"]),
                mlp_b2=jnp.asarray(np.float32(d["b2"])),
                row_block=row_block, approx_recall=approx_recall,
            )
        else:
            fn = pair_mlp_score_block(
                jnp.asarray(a_pad), jnp.asarray(b_cols),
                jnp.asarray(d["bias"]), jnp.asarray(d["w2"]),
                jnp.asarray(np.float32(d["b2"])),
            )
            vals, idxs = blockwise_pair_scores_topk(
                fn, n_rows, n_cols, k, row_block=row_block,
                approx_recall=approx_recall,
            )
    elif sim_mode == "cosine":
        a_rows = _embed_cosine_side(variables, z_rows).astype(jnp.float32)
        b_cols = _embed_cosine_side(variables, z_cols).astype(jnp.float32)
        a_pad = jnp.zeros(
            (rows_padded, a_rows.shape[1]), jnp.float32
        ).at[:n_rows].set(a_rows)
        if mesh is not None:
            from bridged_gnn_tpu.parallel import sharded_pair_topk

            vals, idxs = sharded_pair_topk(
                mesh, jnp.asarray(a_pad), jnp.asarray(b_cols),
                n_rows, n_cols, k, mode="cosine", row_block=row_block,
                approx_recall=approx_recall,
            )
        else:
            fn = cosine_score_block(jnp.asarray(a_pad), jnp.asarray(b_cols))
            vals, idxs = blockwise_pair_scores_topk(
                fn, n_rows, n_cols, k, row_block=row_block,
                approx_recall=approx_recall,
            )
    else:
        raise ValueError(sim_mode)
    return np.asarray(vals)[:n_rows], np.asarray(idxs)[:n_rows]


# Jitted inference wrappers, cached per model config (flax modules are
# frozen dataclasses — hashable). Eager model.apply against the tunneled
# TPU dispatches hundreds of ops with a round trip each (~5 s per encode
# at 35k nodes, profiled); one jitted dispatch is milliseconds.
#
# Cache-retention note: each distinct Adjacency object adds a trace entry
# inside the cached jitted function (fast_fn is a static pytree field
# compared by identity) that retains its layout's device arrays. The lru
# caches are bounded so stale models evict, and long-lived processes
# sweeping many graphs should call :func:`clear_inference_caches`
# between sweeps.
@functools.lru_cache(maxsize=4)
def _jit_encode_domains(model):
    def fn(variables, x_src, adj_src, x_tar, adj_tar, m_src, m_tar):
        return model.apply(
            variables, x_src, adj_src, x_tar, adj_tar,
            mask_src=m_src, mask_tar=m_tar, train=False,
            method=AdversarialLearnerV2.encode_domains,
        )
    return jax.jit(fn)


@functools.lru_cache(maxsize=4)
def _jit_classify(model):
    def fn(variables, z):
        return jnp.exp(
            model.apply(
                variables, z,
                method=lambda m, z: m.source_learner.sim_net.classify(
                    z, train=False
                ),
            )
        )
    return jax.jit(fn)


@functools.lru_cache(maxsize=8)
def _jit_encode_within(model, domain: str):
    def fn(variables, x, adj, node_mask):
        if domain == "source":
            method = lambda m, x, adj, mask, train: (  # noqa: E731
                m.source_learner.encode(x, adj, mask, train)
            )
        else:
            method = lambda m, x, adj, mask, train: (  # noqa: E731
                m.target_learner.encode(x, adj, mask, train)[0]
            )
        return model.apply(variables, x, adj, node_mask, False,
                           method=method)
    return jax.jit(fn)


def clear_inference_caches() -> None:
    """Release the jitted encode/classify wrappers and every per-adjacency
    trace they retain (device buffers of old graph layouts included)."""
    _jit_encode_domains.cache_clear()
    _jit_classify.cache_clear()
    _jit_encode_within.cache_clear()


def _encode(model, variables, g_src, adj_src, g_tar, adj_tar):
    z_src, z_tar = _jit_encode_domains(model)(
        variables, g_src.x, adj_src, g_tar.x, adj_tar,
        g_src.node_mask, g_tar.node_mask,
    )
    return (
        z_src[: g_src.num_nodes].astype(jnp.float32),
        z_tar[: g_tar.num_nodes].astype(jnp.float32),
    )


def _classify(model, variables, z):
    return np.asarray(_jit_classify(model)(variables, jnp.asarray(z)))


def labeled_homophily(y_from, y_to, edge_index) -> float:
    labeled = (y_from[edge_index[0]] != -1) & (y_to[edge_index[1]] != -1)
    return float(
        ((y_from[edge_index[0]] == y_to[edge_index[1]]) & labeled).sum()
        / max(labeled.sum(), 1)
    )


def propose_cross_edges(
    model, variables, g_src, adj_src, g_tar, adj_tar,
    k: int, row_block: int = 512, sim_mode: str = "mlp",
    epsilon: float = 0.5,  # accepted and unused — reference parity (:33)
    mesh=None, approx_recall=None, rerank_candidates=None,
):
    """Top-k source neighbors for every target node.

    Mirror of `add_topk_sim_cross_domain_edges` (main_bridged_graph.py:33-75)
    with encoding hoisted out of the batch loop. Returns
    (flat edge_index [2, N_tar·k] in row-major (tar, k) order — aligned with
    sims.reshape(-1) — sims [N_tar, k], probs_clf_src, probs_clf_tar,
    homophily ratio of labeled proposals).
    """
    z_src, z_tar = _encode(model, variables, g_src, adj_src, g_tar, adj_tar)
    vals, idxs = _topk_grid(
        variables, z_tar, z_src, k, sim_mode, row_block, mesh,
        approx_recall=approx_recall, rerank_candidates=rerank_candidates,
    )
    n_tar = g_tar.num_nodes
    tar_idx = np.repeat(np.arange(n_tar), k)
    src_idx = idxs.reshape(-1)
    edge_index = np.stack([src_idx, tar_idx]).astype(np.int64)

    y_src = np.asarray(g_src.y)[: g_src.num_nodes]
    y_tar = np.asarray(g_tar.y)[:n_tar]
    homo = labeled_homophily(y_src, y_tar, edge_index)
    probs_clf_src = _classify(model, variables, z_src)
    probs_clf_tar = _classify(model, variables, z_tar)
    return edge_index, vals, probs_clf_src, probs_clf_tar, homo


def propose_within_edges(
    model, variables, g, adj, domain: str, k: int,
    row_block: int = 512, sim_mode: str = "mlp", mesh=None,
    approx_recall=None, rerank_candidates=None,
):
    """Top-k within-domain neighbors for every node (self-pairs retained,
    like the reference — main_bridged_graph.py:97). Returns flat sim-aligned
    edges + the sim grid."""
    z = _jit_encode_within(model, domain)(variables, g.x, adj, g.node_mask)
    z = z[: g.num_nodes].astype(jnp.float32)
    vals, idxs = _topk_grid(variables, z, z, k, sim_mode, row_block, mesh,
                            approx_recall=approx_recall,
                            rerank_candidates=rerank_candidates)
    n = g.num_nodes
    to_idx = np.repeat(np.arange(n), k)
    from_idx = idxs.reshape(-1)
    edge_index = np.stack([from_idx, to_idx]).astype(np.int64)
    return edge_index, vals


def _pyg_coalesce_order(edge_index: np.ndarray) -> np.ndarray:
    """Sort edges by (src, dst) — the order ``torch_geometric.utils.coalesce``
    leaves top-k proposals in (key = row·N + col, sort_by_row=True). Top-k
    proposal sets contain no duplicates (indices are unique per row and the
    destination differs across rows), so the reference's coalesce is a pure
    lexicographic sort there."""
    order = np.lexsort((edge_index[1], edge_index[0]))
    return edge_index[:, order]


def check_cross_validity(
    edge_index: np.ndarray,
    e_sim: np.ndarray,
    y_src: np.ndarray,
    y_tar: np.ndarray,
    x_src: np.ndarray,
    x_tar: np.ndarray,
    train_mask_tar: np.ndarray,
    probs_clf_src: np.ndarray,
    probs_clf_tar: np.ndarray,
    thres_conf_quantile: float = 0.1,
    thres_feat_sim: float = 0.0,
    verbose: bool = False,
) -> np.ndarray:
    """The four sequential cross-domain filters, in reference order
    (main_bridged_graph.py:225-264), applied to sim-aligned flat edges."""
    # Coerce to host numpy ONCE: callers hand device arrays (graph
    # fields / classifier probs live on the TPU), and running the filter
    # chain op-by-op against the tunneled chip costs ~20 s in round
    # trips at 300k proposals vs ~0.1 s in host numpy (profiled).
    y_src, y_tar = np.asarray(y_src), np.asarray(y_tar)
    x_src, x_tar = np.asarray(x_src), np.asarray(x_tar)
    train_mask_tar = np.asarray(train_mask_tar)
    pred_src = np.asarray(probs_clf_src).argmax(1)
    pred_tar = np.asarray(probs_clf_tar).argmax(1)
    e0, e1 = edge_index[0], edge_index[1]
    remove = np.zeros(edge_index.shape[1], dtype=bool)
    e_sim = np.asarray(e_sim).reshape(-1)

    # 1. low similarity-confidence edges (quantile threshold)
    thres_conf = np.quantile(e_sim, thres_conf_quantile)
    remove[e_sim < thres_conf] = True
    # 2. endpoints whose predicted label contradicts the training label
    remove[pred_src[e0] != y_src[e0]] = True
    remove[(pred_tar[e1] != y_tar[e1]) & train_mask_tar[e1]] = True
    # 3. endpoints predicted differently
    remove[pred_src[e0] != pred_tar[e1]] = True
    # 4. low raw-feature cosine similarity
    num = (x_src[e0] * x_tar[e1]).sum(1)
    den = np.maximum(
        np.linalg.norm(x_src[e0], axis=1) * np.linalg.norm(x_tar[e1], axis=1),
        1e-8,
    )
    remove[num / den < thres_feat_sim] = True
    if verbose:
        print(f"cross filters removed {remove.sum()}/{len(remove)}")
    return edge_index[:, ~remove]


def check_within_validity(
    edge_index: np.ndarray,
    e_sim: np.ndarray,
    y: np.ndarray,
    x: np.ndarray,
    train_mask: np.ndarray,
    probs_clf: np.ndarray,
    thres_conf_quantile: float = 0.1,
    thres_feat_sim: float = 0.8,
    verbose: bool = False,
) -> np.ndarray:
    """Within-domain filters (main_bridged_graph.py:123-161). Reference
    quirk kept: filter 2 gates BOTH endpoint checks on the *destination's*
    train membership (:140-141)."""
    # host-numpy coercion — see check_cross_validity
    y, x, train_mask = np.asarray(y), np.asarray(x), np.asarray(train_mask)
    pred = np.asarray(probs_clf).argmax(1)
    e0, e1 = edge_index[0], edge_index[1]
    remove = np.zeros(edge_index.shape[1], dtype=bool)
    e_sim = np.asarray(e_sim).reshape(-1)

    thres_conf = np.quantile(e_sim, thres_conf_quantile)
    remove[e_sim < thres_conf] = True
    remove[(pred[e0] != y[e0]) & train_mask[e1]] = True
    remove[(pred[e1] != y[e1]) & train_mask[e1]] = True
    remove[pred[e0] != pred[e1]] = True
    num = (x[e0] * x[e1]).sum(1)
    den = np.maximum(
        np.linalg.norm(x[e0], axis=1) * np.linalg.norm(x[e1], axis=1), 1e-8
    )
    remove[num / den < thres_feat_sim] = True
    if verbose:
        print(f"within filters removed {remove.sum()}/{len(remove)}")
    return edge_index[:, ~remove]


def _graph_to_dict(g) -> Dict[str, np.ndarray]:
    n = g.num_nodes
    return dict(
        x=np.asarray(g.x)[:n],
        y=np.asarray(g.y)[:n],
        edge_index=g.edge_index_np(),
        train_mask=np.asarray(g.train_mask)[:n],
        val_mask=np.asarray(g.val_mask)[:n],
        test_mask=np.asarray(g.test_mask)[:n],
    )


def gen_bridged_graph(
    model, variables, g_src, adj_src, g_tar, adj_tar,
    mapper_idx_src: Dict[int, int], mapper_idx_tar: Dict[int, int],
    k_cross: int = 20, k_within: int = 0,
    check_cross: bool = False, check_within: bool = False,
    thres_conf_quantile: float = 0.1, thres_feat_sim: float = 0.0,
    sim_mode: str = "mlp", epsilon: float = 0.5, row_block: int = 512,
    mesh=None, verbose: bool = False, approx_recall=None,
    rerank_candidates=None, reference_compat: bool = False,
) -> Dict[str, np.ndarray]:
    """End-to-end bridge construction (reference
    main_bridged_graph.py:267-321). Returns the merged + reordered graph
    dict ready for stage 2 or serialization.

    ``reference_compat=True`` replays the reference's exact filter
    sequencing: proposals are sorted into PyG-coalesce (src, dst) order
    BEFORE the validity checks, while the similarity vector stays in
    row-major proposal order — reproducing the reference's misaligned
    filter-1 quantile cut bit-for-bit (main_bridged_graph.py:75,235-239
    for cross; :113 + :132 for within). Default (False) filters on the
    sim-aligned flat proposals — the documented fix."""
    ei_cross, sims, p_src, p_tar, homo = propose_cross_edges(
        model, variables, g_src, adj_src, g_tar, adj_tar, k_cross,
        row_block=row_block, sim_mode=sim_mode, epsilon=epsilon, mesh=mesh,
        approx_recall=approx_recall, rerank_candidates=rerank_candidates,
    )
    if verbose:
        print(f"cross proposals: {ei_cross.shape[1]} (homophily {homo:.4f})")
    src_d = _graph_to_dict(g_src)
    tar_d = _graph_to_dict(g_tar)
    if reference_compat:
        # reference order: coalesce(sort) first (:75), filter after with
        # the row-major sim vector (misaligned quantile cut, :235-239)
        ei_cross = _pyg_coalesce_order(ei_cross)
    if check_cross:
        ei_cross = check_cross_validity(
            ei_cross, sims, src_d["y"], tar_d["y"], src_d["x"], tar_d["x"],
            tar_d["train_mask"], p_src, p_tar,
            thres_conf_quantile, thres_feat_sim, verbose,
        )
    ei_cross = coalesce_np(
        ei_cross, max(g_src.num_nodes, g_tar.num_nodes) + 1
    )

    ei_within_src = ei_within_tar = None
    if k_within > 0:
        ei_within_src, sims_s = propose_within_edges(
            model, variables, g_src, adj_src, "source", k_within,
            row_block=row_block, sim_mode=sim_mode, mesh=mesh,
            approx_recall=approx_recall,
            rerank_candidates=rerank_candidates,
        )
        ei_within_tar, sims_t = propose_within_edges(
            model, variables, g_tar, adj_tar, "target", k_within,
            row_block=row_block, sim_mode=sim_mode, mesh=mesh,
            approx_recall=approx_recall,
            rerank_candidates=rerank_candidates,
        )
        if reference_compat:
            # reference coalesces within-proposals inside the proposer
            # (:113) before the checks see them
            ei_within_src = _pyg_coalesce_order(ei_within_src)
            ei_within_tar = _pyg_coalesce_order(ei_within_tar)
        if check_within:
            # hardcoded thresholds mirror the reference call site
            # (main_bridged_graph.py:302-306)
            ei_within_src = check_within_validity(
                ei_within_src, sims_s, src_d["y"], src_d["x"],
                src_d["train_mask"], p_src, 0.1, 0.8, verbose,
            )
            ei_within_tar = check_within_validity(
                ei_within_tar, sims_t, tar_d["y"], tar_d["x"],
                tar_d["train_mask"], p_tar, 0.1, 0.8, verbose,
            )
        ei_within_src = coalesce_np(ei_within_src, g_src.num_nodes)
        ei_within_tar = coalesce_np(ei_within_tar, g_tar.num_nodes)

    src_d["central_mask"] = np.ones(g_src.num_nodes, dtype=bool)
    tar_d["central_mask"] = np.zeros(g_tar.num_nodes, dtype=bool)
    merged = merge_graphs_np(
        src_d, tar_d, ei_cross.copy(), ei_within_src, ei_within_tar
    )
    return reorder_np(
        merged, g_src.num_nodes, mapper_idx_src, mapper_idx_tar
    )
