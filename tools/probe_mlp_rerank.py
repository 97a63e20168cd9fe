"""Measure the cosine-prescreen + exact-MLP rerank bridge sweep
(VERDICT r2 weak-8 follow-up; ops/sddmm.py::blockwise_rerank_topk).

Two questions, two sections in the output JSON:

1. **Recall on real data** — the shipped office checkpoints scoring the
   shipped office features (reconstructed per domain from the golden
   bridged graphs' x + central_mask; the stage-1 backbone is an MLP so
   no adjacency is needed to encode). For each candidate budget, mean
   per-row overlap between the exact pair-MLP top-k and the reranked
   top-k. This is the number that decides whether the production recipe
   can use rerank.
2. **Throughput at sweep scale** — synthetic 49152×49152 / H=128
   embeddings (the scale of results_sddmm_topk_tpu.json): wall time and
   effective Gpairs/s of the exact chunked sweep vs rerank at several
   candidate budgets (exact phase-1 and approx_max_k 0.95 phase-1).

Usage: python tools/probe_mlp_rerank.py [out.json]
"""
import json
import sys
import time

import numpy as np

repo = __file__.rsplit("/", 2)[0]
sys.path.insert(0, repo)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bridged_gnn_tpu.bridge.build import (  # noqa: E402
    _encode,
    _topk_grid,
)
from bridged_gnn_tpu.graph import domain_split_np, graph_from_dict  # noqa: E402
from bridged_gnn_tpu.io import (  # noqa: E402
    load_pyg_data_dict,
    load_torch_state_dict,
)
from bridged_gnn_tpu.io.ckpt_import import (  # noqa: E402
    merge_into_variables,
    torch_state_dict_to_flax,
)
from bridged_gnn_tpu.nn.stage1 import AdversarialLearnerV2  # noqa: E402

REF = "/root/reference"
K = 20
CAND_GRID = [64, 128, 256, 512, 1024]


def load_office(name):
    g = load_pyg_data_dict(
        f"{REF}/data_bridged_graph/office_amazon2{name}_bridged_graph.dat"
    )
    ckpt = load_torch_state_dict(
        f"{REF}/ckpt/model_AdvLearner_office_amazon2{name}_best.ckpt"
    )
    src_d, tar_d, _, _ = domain_split_np(dict(g))
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
    params, batch_stats = torch_state_dict_to_flax(ckpt)
    variables = merge_into_variables(variables, params, batch_stats)
    return model, variables, graph_from_dict(src_d), graph_from_dict(tar_d)


def recall_real(name):
    model, variables, g_src, g_tar = load_office(name)
    z_src, z_tar = _encode(model, variables, g_src, None, g_tar, None)
    z_src = np.asarray(z_src)
    z_tar = np.asarray(z_tar)
    _, ie = _topk_grid(variables, z_tar, z_src, K, "mlp", 512)
    out = {"n_src": int(z_src.shape[0]), "n_tar": int(z_tar.shape[0]),
           "k": K, "recall": {}}
    for m in CAND_GRID:
        if m >= z_src.shape[0]:
            continue
        for tag, ar in (("exact_p1", None), ("approx95_p1", 0.95)):
            _, ir = _topk_grid(
                variables, z_tar, z_src, K, "mlp", 512,
                approx_recall=ar, rerank_candidates=m,
            )
            hits = [
                len(set(ie[i]) & set(ir[i])) / K
                for i in range(ie.shape[0])
            ]
            out["recall"].setdefault(str(m), {})[tag] = round(
                float(np.mean(hits)), 4
            )
    return out


def bench(fn, iters=10):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def throughput_synth():
    from bridged_gnn_tpu.ops.sddmm import (
        blockwise_pair_scores_topk,
        blockwise_rerank_topk,
        cosine_score_block,
        mlp_score_candidates,
        pair_mlp_score_block,
    )

    n, h, k, rb = 49152, 128, K, 512
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    zc = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=h).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=h).astype(np.float32))
    b2 = jnp.float32(0.3)
    pairs = float(n) * n
    res = {"n": n, "h": h, "k": k, "row_block": rb}

    exact_fn = pair_mlp_score_block(a, b, b1, w2, b2)
    t = bench(jax.jit(lambda: blockwise_pair_scores_topk(
        exact_fn, n, n, k, row_block=rb)), iters=3)
    res["exact_chunked"] = {"s": round(t, 3),
                            "gpairs_s": round(pairs / t / 1e9, 2)}
    t = bench(jax.jit(lambda: blockwise_pair_scores_topk(
        exact_fn, n, n, k, row_block=rb, approx_recall=0.95)), iters=3)
    res["exact_chunked_approxk"] = {
        "s": round(t, 3), "gpairs_s": round(pairs / t / 1e9, 2)}

    proxy = cosine_score_block(z.astype(jnp.bfloat16),
                               zc.astype(jnp.bfloat16))
    cand_fn = mlp_score_candidates(a, b, b1, w2, b2)
    for m in (128, 256, 512, 1024):
        t = bench(jax.jit(lambda m=m: blockwise_rerank_topk(
            proxy, cand_fn, n, n, k, candidates=m, row_block=rb,
            approx_recall=0.95)), iters=3)
        res[f"rerank_{m}"] = {"s": round(t, 3),
                              "gpairs_s": round(pairs / t / 1e9, 2)}
    return res


def main():
    out_path = (sys.argv[1] if len(sys.argv) > 1
                else repo + "/tools/probe_mlp_rerank.json")
    res = {"platform": jax.devices()[0].platform, "recall_real": {}}
    for name in ("dslr", "webcam"):
        res["recall_real"][f"office_amazon2{name}"] = recall_real(name)
        print(name, res["recall_real"][f"office_amazon2{name}"],
              flush=True)
    res["throughput_synth"] = throughput_synth()
    print(json.dumps(res["throughput_synth"], indent=1), flush=True)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
