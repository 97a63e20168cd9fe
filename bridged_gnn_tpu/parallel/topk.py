"""Sharded all-pairs top-k: the distributed bridge-construction kernel.

Each device owns a shard of the source (column) embeddings, computes a
blocked local top-k per target row, then the per-shard candidates are
all-gathered over ICI and reduced with one final top-k — a k-way merge.
This is the distributed analogue of the reference's dense scoring loop
(main_bridged_graph.py:45-67), which is single-GPU only.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from bridged_gnn_tpu.graph import round_up
from bridged_gnn_tpu.ops.sddmm import (
    blockwise_pair_scores_topk,
    blockwise_rerank_topk,
    cosine_score_block,
    mlp_score_candidates,
    pair_mlp_score_block,
)


def sharded_pair_topk(
    mesh: Mesh,
    a_rows: jax.Array,   # [R_pad, D] replicated (target-side precompute)
    b_cols: jax.Array,   # [C, D] source-side precompute (sharded here)
    num_rows: int,
    num_cols: int,
    k: int,
    mode: str = "cosine",
    mlp_bias1: Optional[jax.Array] = None,
    mlp_w2: Optional[jax.Array] = None,
    mlp_b2: Optional[jax.Array] = None,
    row_block: int = 512,
    axis: str = "edges",
    approx_recall: Optional[float] = None,
    rerank_candidates: Optional[int] = None,
    z_rows: Optional[jax.Array] = None,   # [R_pad, H] raw embeddings
    z_cols: Optional[jax.Array] = None,   # [C, H] raw embeddings
) -> Tuple[jax.Array, jax.Array]:
    """Returns (values [R_pad, k], global col indices [R_pad, k]),
    replicated on all devices.

    ``rerank_candidates`` (mlp mode): each shard screens its local
    columns with the bf16-cosine proxy over the raw stage-1 embeddings
    (``z_rows``/``z_cols``) and evaluates the exact pair-MLP head only
    at its local top-M candidates before the k-way merge — the sharded
    form of ops/sddmm.py::blockwise_rerank_topk. The union of per-shard
    candidate sets is at least as rich as the single-device screen at
    the same M, so recall is ≥ the measured single-device numbers
    (tools/probe_mlp_rerank.json)."""
    n_dev = mesh.devices.size
    c_pad = round_up(max(num_cols, 1), n_dev)
    c_local = c_pad // n_dev
    b_padded = jnp.zeros((c_pad, b_cols.shape[1]), dtype=b_cols.dtype)
    b_padded = b_padded.at[:num_cols].set(b_cols[:num_cols])
    col_valid = (jnp.arange(c_pad) < num_cols)
    use_rerank = rerank_candidates is not None
    if use_rerank:
        if mode != "mlp" or z_rows is None or z_cols is None:
            raise ValueError(
                "rerank_candidates requires mode='mlp' with z_rows/z_cols"
            )
        z_pad = jnp.zeros((c_pad, z_cols.shape[1]), jnp.float32)
        z_pad = z_pad.at[:num_cols].set(
            z_cols[:num_cols].astype(jnp.float32)
        )
    else:
        # placeholder so shard_map's arity is static
        z_pad = jnp.zeros((c_pad, 1), jnp.float32)
        z_rows = jnp.zeros((a_rows.shape[0], 1), jnp.float32)

    def body(a_rows, z_rows, b_shard, z_shard, valid_shard):
        if use_rerank:
            proxy = cosine_score_block(
                z_rows.astype(jnp.bfloat16), z_shard.astype(jnp.bfloat16)
            )
            exact = mlp_score_candidates(
                a_rows, b_shard, mlp_bias1, mlp_w2, mlp_b2
            )
            vals, idxs = blockwise_rerank_topk(
                proxy, exact, num_rows, c_local, min(k, c_local),
                candidates=min(int(rerank_candidates), c_local),
                row_block=row_block, col_mask=valid_shard,
                approx_recall=approx_recall,
            )
        else:
            if mode == "cosine":
                fn = cosine_score_block(a_rows, b_shard)
            elif mode == "mlp":
                fn = pair_mlp_score_block(
                    a_rows, b_shard, mlp_bias1, mlp_w2, mlp_b2
                )
            else:
                raise ValueError(mode)
            vals, idxs = blockwise_pair_scores_topk(
                fn, num_rows, c_local, min(k, c_local),
                row_block=row_block, col_mask=valid_shard,
                approx_recall=approx_recall,
            )
        offset = jax.lax.axis_index(axis) * c_local
        gidx = idxs + offset
        # k-way merge: gather every shard's candidates, final top-k
        vals_all = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
        gidx_all = jax.lax.all_gather(gidx, axis, axis=1, tiled=True)
        mvals, mpos = jax.lax.top_k(vals_all, k)
        midx = jnp.take_along_axis(gidx_all, mpos, axis=1)
        return mvals, midx

    f = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,  # outputs are replicated by the all_gather merge
    )
    return f(a_rows, z_rows, b_padded, z_pad, col_valid)
