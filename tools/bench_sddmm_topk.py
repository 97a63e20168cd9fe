"""Bridge-construction scoring bench: SDDMM + row top-k at 49k x 49k, k=20.

Measures the production harness (ops/sddmm.blockwise_pair_scores_topk)
for both similarity heads and both selectors:
  * exact lax.top_k          (reference torch.topk parity)
  * approx_max_k 0.95 / 0.99 (TPU PartialReduce, production knob)
plus observed recall of the approx selectors vs exact.

Replaces the reference's edge-proposal hot loop
(main_bridged_graph.py:45-67). Writes results_sddmm_topk_tpu.json at the
repo root.
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from bridged_gnn_tpu.ops.sddmm import (
    blockwise_pair_scores_topk,
    cosine_score_block,
    pair_mlp_score_block,
)

R = C = 49152
D = 128
H = 128
K = 20
BLOCK = 512

rng = np.random.default_rng(0)
zt = rng.normal(size=(R, D)).astype(np.float32)
zs = rng.normal(size=(C, D)).astype(np.float32)
zt /= np.linalg.norm(zt, axis=1, keepdims=True)
zs /= np.linalg.norm(zs, axis=1, keepdims=True)


def timeit(fn, n=5):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


res = {"platform": jax.devices()[0].platform, "rows": R, "cols": C, "k": K}

# --- cosine head (bf16 block matmul, f32 accumulate)
fn_cos = cosine_score_block(
    jnp.asarray(zt, dtype=jnp.bfloat16), jnp.asarray(zs, dtype=jnp.bfloat16)
)
variants = {"exact": None, "approx_0.95": 0.95, "approx_0.99": 0.99}
idx_exact = None
for name, ar in variants.items():
    f = jax.jit(
        lambda ar=ar: blockwise_pair_scores_topk(
            fn_cos, R, C, K, row_block=BLOCK, approx_recall=ar
        )
    )
    t, (v, i) = timeit(f)
    res[f"cosine_{name}_pairs_per_s"] = R * C / t
    if ar is None:
        idx_exact = np.asarray(i)[:R]
    else:
        ia = np.asarray(i)[:R]
        rows = range(0, R, 97)
        res[f"cosine_{name}_recall"] = float(np.mean(
            [len(set(idx_exact[r]) & set(ia[r])) / K for r in rows]
        ))

# --- pair-MLP head (decomposed eval-mode head)
a_rows = jnp.asarray(rng.normal(size=(R, H)).astype(np.float32))
b_cols = jnp.asarray(rng.normal(size=(C, H)).astype(np.float32))
bias1 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32))
w2 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32))
b2 = jnp.float32(0.1)
fn_mlp = pair_mlp_score_block(a_rows, b_cols, bias1, w2, b2)
for name, ar in (("exact", None), ("approx_0.95", 0.95)):
    f = jax.jit(
        lambda ar=ar: blockwise_pair_scores_topk(
            fn_mlp, R, C, K, row_block=BLOCK, approx_recall=ar
        )
    )
    t, _ = timeit(f, n=3)
    res[f"mlp_{name}_pairs_per_s"] = R * C / t

# --- cosine-prescreen + exact-MLP rerank (ops/sddmm.blockwise_rerank_topk)
# Timing-only here: synthetic random weights make the cosine proxy
# uncorrelated with the mlp head, so recall on THIS data is meaningless;
# recall on the shipped office checkpoints (0.992 at 128 / 0.997+ at 256
# candidates) is measured in tools/probe_mlp_rerank.json.
from bridged_gnn_tpu.ops.sddmm import (  # noqa: E402
    blockwise_rerank_topk,
    mlp_score_candidates,
)

proxy_fn = cosine_score_block(
    jnp.asarray(zt, dtype=jnp.bfloat16), jnp.asarray(zs, dtype=jnp.bfloat16)
)
cand_fn = mlp_score_candidates(a_rows, b_cols, bias1, w2, b2)
for m in (128, 256):
    f = jax.jit(
        lambda m=m: blockwise_rerank_topk(
            proxy_fn, cand_fn, R, C, K, candidates=m, row_block=BLOCK,
            approx_recall=0.95,
        )
    )
    t, _ = timeit(f, n=3)
    res[f"mlp_rerank_{m}_pairs_per_s"] = R * C / t

# back-compat keys
res["cosine_pairs_per_s"] = res["cosine_exact_pairs_per_s"]
res["mlp_pairs_per_s"] = res["mlp_exact_pairs_per_s"]

print(json.dumps(res, indent=2))
with open("results_sddmm_topk_tpu.json", "w") as f:
    json.dump(res, f, indent=2)
