import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bridged_gnn_tpu.graph import build_graph
from bridged_gnn_tpu.ops import (
    Adjacency,
    blockwise_pair_scores_topk,
    build_adjacency,
    segment_mean,
    segment_softmax,
    segment_sum,
    spmm,
)
from bridged_gnn_tpu.ops.sddmm import cosine_score_block, pair_mlp_score_block
from bridged_gnn_tpu.ops.spmm import adjacency_from_graph, spmm_edges


def np_scatter_softmax(logits, seg, n):
    out = np.zeros_like(logits)
    for s in range(n):
        m = seg == s
        if m.any():
            e = np.exp(logits[m] - logits[m].max())
            out[m] = e / e.sum()
    return out


def test_segment_sum_mask(rng):
    data = rng.normal(size=(10, 4)).astype(np.float32)
    seg = np.sort(rng.integers(0, 5, size=10)).astype(np.int32)
    mask = rng.random(10) < 0.7
    got = segment_sum(jnp.asarray(data), jnp.asarray(seg), 5, jnp.asarray(mask))
    expect = np.zeros((5, 4), dtype=np.float32)
    for i in range(10):
        if mask[i]:
            expect[seg[i]] += data[i]
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5)


def test_segment_mean(rng):
    data = rng.normal(size=12).astype(np.float32)
    seg = np.sort(rng.integers(0, 4, size=12)).astype(np.int32)
    got = segment_mean(jnp.asarray(data)[:, None], jnp.asarray(seg), 4)
    for s in range(4):
        m = seg == s
        if m.any():
            np.testing.assert_allclose(
                np.asarray(got)[s, 0], data[m].mean(), rtol=1e-5
            )


def test_segment_softmax_matches_scatter(rng):
    logits = rng.normal(size=20).astype(np.float32) * 5
    seg = np.sort(rng.integers(0, 6, size=20)).astype(np.int32)
    got = np.asarray(
        segment_softmax(jnp.asarray(logits), jnp.asarray(seg), 6)
    )
    expect = np_scatter_softmax(logits, seg, 6)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_segment_softmax_masked(rng):
    logits = rng.normal(size=16).astype(np.float32)
    seg = np.sort(rng.integers(0, 4, size=16)).astype(np.int32)
    mask = rng.random(16) < 0.6
    got = np.asarray(
        segment_softmax(jnp.asarray(logits), jnp.asarray(seg), 4,
                        jnp.asarray(mask))
    )
    assert np.all(got[~mask] == 0)
    for s in range(4):
        m = (seg == s) & mask
        if m.any():
            np.testing.assert_allclose(got[m].sum(), 1.0, rtol=1e-5)


def _ref_spmm(ei, x, n, w=None, reduce="sum"):
    out = np.zeros((n, x.shape[1]), dtype=np.float64)
    cnt = np.zeros(n)
    for e in range(ei.shape[1]):
        s, d = ei[0, e], ei[1, e]
        wv = 1.0 if w is None else w[e]
        out[d] += wv * x[s]
        cnt[d] += 1
    if reduce == "mean":
        out = out / np.maximum(cnt, 1)[:, None]
    return out


@pytest.mark.parametrize("method", ["dense", "gather", "blocked"])
@pytest.mark.parametrize("reduce", ["sum", "mean"])
def test_spmm_paths(rng, method, reduce):
    n, e, d = 30, 100, 16
    ei = rng.integers(0, n, size=(2, e))
    x = rng.normal(size=(n, d)).astype(np.float32)
    g = build_graph(x, ei)
    adj = adjacency_from_graph(g, method=method)
    got = np.asarray(spmm(adj, g.x, reduce=reduce))[:n]
    # build expected against the sorted (possibly deduped? no — coalesce not
    # applied in build_graph, duplicates retained) edge list
    expect = _ref_spmm(g.edge_index_np(), x, n, reduce=reduce)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("method", ["dense", "gather", "blocked"])
def test_spmm_edge_weights(rng, method):
    n, e, d = 25, 80, 8
    ei = rng.integers(0, n, size=(2, e))
    x = rng.normal(size=(n, d)).astype(np.float32)
    g = build_graph(x, ei)
    adj = adjacency_from_graph(g, method=method)
    w_pad = rng.normal(size=g.num_edges_padded).astype(np.float32)
    got = np.asarray(spmm(adj, g.x, edge_weights=jnp.asarray(w_pad)))[:n]
    em = np.asarray(g.edge_mask)
    expect = _ref_spmm(g.edge_index_np(), x, n, w=w_pad[em])
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_spmm_edges_functional(rng):
    n, e, d = 20, 60, 4
    ei = rng.integers(0, n, size=(2, e))
    x = rng.normal(size=(n, d)).astype(np.float32)
    g = build_graph(x, ei)
    got = np.asarray(
        spmm_edges(g.senders, g.receivers, g.edge_mask, g.x,
                   g.num_nodes_padded)
    )[:n]
    expect = _ref_spmm(g.edge_index_np(), x, n)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)


def test_blockwise_topk_cosine(rng):
    nt, ns, d, k = 37, 53, 16, 5
    zt = rng.normal(size=(nt, d)).astype(np.float32)
    zs = rng.normal(size=(ns, d)).astype(np.float32)
    # pad rows so the closure can index any row id in the padded range
    zt_pad = np.zeros((64, d), dtype=np.float32)
    zt_pad[:nt] = zt
    fn = cosine_score_block(jnp.asarray(zt_pad), jnp.asarray(zs))
    vals, idxs = blockwise_pair_scores_topk(fn, nt, ns, k, row_block=16)
    vals, idxs = np.asarray(vals)[:nt], np.asarray(idxs)[:nt]
    # numpy oracle
    def sigmoid(x):
        return 1 / (1 + np.exp(-x))
    zs_n = zs / np.linalg.norm(zs, axis=1, keepdims=True)
    zt_n = zt / np.linalg.norm(zt, axis=1, keepdims=True)
    scores = sigmoid(zt_n @ zs_n.T)
    for i in range(nt):
        top = np.sort(scores[i])[-k:][::-1]
        np.testing.assert_allclose(np.sort(vals[i])[::-1], top, rtol=1e-5)
        # indices actually achieve the scores
        np.testing.assert_allclose(
            scores[i, idxs[i]], vals[i], rtol=1e-5
        )


def test_pair_mlp_score_block(rng):
    nt, ns, h = 10, 20, 8
    a = rng.normal(size=(16, h)).astype(np.float32)  # padded rows
    b = rng.normal(size=(ns, h)).astype(np.float32)
    b1 = rng.normal(size=h).astype(np.float32)
    w2 = rng.normal(size=h).astype(np.float32)
    b2 = np.float32(0.3)
    fn = pair_mlp_score_block(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(b1), jnp.asarray(w2), b2
    )
    vals, idxs = blockwise_pair_scores_topk(fn, nt, ns, 3, row_block=8)
    def sigmoid(x):
        return 1 / (1 + np.exp(-x))
    scores = sigmoid(
        np.maximum(a[:nt, None, :] + b[None, :, :] + b1, 0) @ w2 + b2
    )
    for i in range(nt):
        np.testing.assert_allclose(
            np.asarray(vals)[i], np.sort(scores[i])[-3:][::-1], rtol=1e-5
        )


def test_blockwise_topk_approx_recall_plumbing(rng):
    """approx_recall path: on CPU approx_max_k falls back to an exact
    sort, so values/indices must equal the exact selector — this guards
    the plumbing; on-chip recall is asserted in the TPU lane."""
    nt, ns, d, k = 37, 53, 16, 5
    zt = rng.normal(size=(nt, d)).astype(np.float32)
    zs = rng.normal(size=(ns, d)).astype(np.float32)
    zt_pad = np.zeros((64, d), dtype=np.float32)
    zt_pad[:nt] = zt
    fn = cosine_score_block(jnp.asarray(zt_pad), jnp.asarray(zs))
    ve, ie = blockwise_pair_scores_topk(fn, nt, ns, k, row_block=16)
    va, ia = blockwise_pair_scores_topk(fn, nt, ns, k, row_block=16,
                                        approx_recall=0.95)
    np.testing.assert_allclose(np.asarray(ve)[:nt], np.asarray(va)[:nt],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ie)[:nt], np.asarray(ia)[:nt])


def test_blockwise_topk_approx_recall_validation():
    import pytest as _pytest

    from bridged_gnn_tpu.ops.sddmm import blockwise_pair_scores_topk

    with _pytest.raises(ValueError, match="percentage"):
        blockwise_pair_scores_topk(lambda i: None, 8, 8, 2,
                                   approx_recall=95.0)


def _mlp_head(rng, ns, h):
    b = rng.normal(size=(ns, h)).astype(np.float32)
    b1 = rng.normal(size=h).astype(np.float32)
    w2 = rng.normal(size=h).astype(np.float32)
    return b, b1, w2, np.float32(0.3)


def test_mlp_score_candidates_matches_full(rng):
    """The candidate-restricted exact scorer equals the full-sweep scores
    gathered at the same candidate columns."""
    from bridged_gnn_tpu.ops.sddmm import mlp_score_candidates

    nt_pad, ns, h, m = 16, 20, 8, 7
    a = rng.normal(size=(nt_pad, h)).astype(np.float32)
    b, b1, w2, b2 = _mlp_head(rng, ns, h)
    cand = rng.integers(0, ns, size=(8, m)).astype(np.int32)
    fn = mlp_score_candidates(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(b1),
        jnp.asarray(w2), b2, h_chunk=3,  # non-divisor chunk on purpose
    )
    got = np.asarray(fn(jnp.arange(8, dtype=jnp.int32), jnp.asarray(cand)))

    def sigmoid(x):
        return 1 / (1 + np.exp(-x))

    full = sigmoid(
        np.maximum(a[:8, None, :] + b[None, :, :] + b1, 0) @ w2 + b2
    )
    want = np.take_along_axis(full, cand, axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_rerank_topk_exact_when_candidates_cover(rng):
    """candidates >= num_cols + exact phase-1 selection degenerates to
    the exact full sweep: same values, same indices."""
    from bridged_gnn_tpu.ops.sddmm import (
        blockwise_rerank_topk,
        mlp_score_candidates,
    )

    nt, ns, h, k = 11, 21, 8, 4
    a = rng.normal(size=(16, h)).astype(np.float32)
    b, b1, w2, b2 = _mlp_head(rng, ns, h)
    args = (jnp.asarray(a), jnp.asarray(b), jnp.asarray(b1),
            jnp.asarray(w2), b2)
    ve, ie = blockwise_pair_scores_topk(
        pair_mlp_score_block(*args), nt, ns, k, row_block=8
    )
    # proxy is irrelevant when every column is a candidate; use garbage
    proxy = cosine_score_block(
        jnp.asarray(rng.normal(size=(16, h)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(ns, h)).astype(np.float32)),
    )
    vr, ir = blockwise_rerank_topk(
        proxy, mlp_score_candidates(*args), nt, ns, k,
        candidates=ns + 5, row_block=8, approx_recall=None,
    )
    np.testing.assert_allclose(np.asarray(vr)[:nt], np.asarray(ve)[:nt],
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ir)[:nt], np.asarray(ie)[:nt])


def test_rerank_topk_perfect_proxy_and_mask(rng):
    """With the exact head as its own proxy, candidates=k suffices; a
    col_mask excludes columns from both phases."""
    from bridged_gnn_tpu.ops.sddmm import (
        blockwise_rerank_topk,
        mlp_score_candidates,
    )

    nt, ns, h, k = 9, 17, 8, 3
    a = rng.normal(size=(16, h)).astype(np.float32)
    b, b1, w2, b2 = _mlp_head(rng, ns, h)
    args = (jnp.asarray(a), jnp.asarray(b), jnp.asarray(b1),
            jnp.asarray(w2), b2)
    mask = rng.random(ns) < 0.7
    mask[:k] = True  # keep enough valid columns
    ve, ie = blockwise_pair_scores_topk(
        pair_mlp_score_block(*args), nt, ns, k, row_block=8,
        col_mask=jnp.asarray(mask),
    )
    vr, ir = blockwise_rerank_topk(
        pair_mlp_score_block(*args), mlp_score_candidates(*args),
        nt, ns, k, candidates=k, row_block=8, approx_recall=None,
        col_mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(vr)[:nt], np.asarray(ve)[:nt],
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(ir)[:nt], np.asarray(ie)[:nt])
    assert mask[np.asarray(ir)[:nt].reshape(-1)].all()


def test_rerank_topk_validates_candidates():
    from bridged_gnn_tpu.ops.sddmm import blockwise_rerank_topk

    with pytest.raises(ValueError, match="candidates"):
        blockwise_rerank_topk(lambda i: None, lambda i, c: None,
                              8, 8, k=5, candidates=3)
