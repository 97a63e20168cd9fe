"""Decompose the office bridge-reproduction gap (VERDICT r4 #2).

Two questions, answered on the shipped a2d/a2w artifacts:

  1. LOGIC: run the reference's *algorithm* (compat filter chain, torch
     tie-ordering) on torch-oracle scores — does it reproduce the shipped
     edge set exactly? This certifies proposers + filters + merge/reorder
     and the seed-1 source-split regeneration, independent of scoring fp.
  2. SCORING: how far are the framework's decomposed-head scores from the
     torch oracle, and how much top-k membership flips at the boundary?
     This bounds the achievable end-to-end IoU.

Writes tools/probe_bridge_repro_parity.json.
"""

import json
import os
import sys

repo = __file__.rsplit("/", 2)[0]
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "tests"))

from bridged_gnn_tpu.utils.platform import honor_jax_platforms_env  # noqa: E402

os.environ.setdefault("JAX_PLATFORMS", "cpu")
honor_jax_platforms_env()

import numpy as np  # noqa: E402
import torch  # noqa: E402

import torch_oracle as oracle  # noqa: E402
from bridged_gnn_tpu.data.datasets import reconstruct_office_domains  # noqa: E402
from bridged_gnn_tpu.io import load_pyg_data_dict, load_torch_state_dict  # noqa: E402

REF = os.environ.get("BGNN_REFERENCE_DIR", "/root/reference")
RECIPES = {
    "office_amazon2dslr": dict(k_cross=20, k_within=3),
    "office_amazon2webcam": dict(k_cross=8, k_within=3),
}


def torch_scores_cross(sd, x_src, x_tar):
    """Full [N_tar, N_src] pair-MLP score grid, eval mode, via the torch
    oracle (reference models.py:944-954 path)."""
    with torch.no_grad():
        zs = oracle.mlp_backbone(oracle.t(x_src), sd,
                                 "source_learner.backbone")
        zt, _ = oracle.target_encode(oracle.t(x_tar), sd)
        return grid(sd, zs, zt), zs, zt


def grid(sd, z_cols, z_rows):
    """[rows, cols] score grid: pair (col i, row j) like the reference's
    pair_enumeration(all_src, batch_tar)."""
    n_cols, n_rows = z_cols.shape[0], z_rows.shape[0]
    out = torch.empty(n_rows, n_cols)
    with torch.no_grad():
        for i0 in range(0, n_rows, 64):
            i1 = min(i0 + 64, n_rows)
            bs = i1 - i0
            idx2 = torch.arange(i0, i1).repeat_interleave(n_cols)
            idx1 = torch.arange(n_cols).repeat(bs)
            out[i0:i1] = oracle.pair_mlp_score(
                z_cols, z_rows, idx1, idx2, sd
            ).view(bs, n_cols)
    return out


def reference_algorithm(sd, src_d, tar_d, k_cross, k_within):
    """The reference bridge pipeline executed in torch/numpy on oracle
    scores: topk(sorted=False→sorted on CPU at these shapes), coalesce
    (src,dst)-sort, THEN filters with the row-major sim vector
    (main_bridged_graph.py:33-320)."""
    S, zs, zt = torch_scores_cross(sd, src_d["x"], tar_d["x"])
    n_src, n_tar = zs.shape[0], zt.shape[0]
    with torch.no_grad():
        probs_src = oracle.classify(zs, sd).exp().numpy()
        probs_tar = oracle.classify(zt, sd).exp().numpy()

    def topk_flat(S, k):
        v, i = S.topk(k, dim=1, largest=True, sorted=False)
        rows = np.repeat(np.arange(S.shape[0]), k)
        return np.stack([i.numpy().reshape(-1), rows]), v.numpy().reshape(-1)

    def pyg_sort(ei):
        order = np.lexsort((ei[1], ei[0]))
        return ei[:, order]

    def filt_cross(ei, sims):
        remove = np.zeros(ei.shape[1], bool)
        thres = np.quantile(sims, 0.1)
        remove[sims < thres] = True
        pred_s, pred_t = probs_src.argmax(1), probs_tar.argmax(1)
        remove[pred_s[ei[0]] != src_d["y"][ei[0]]] = True
        remove[(pred_t[ei[1]] != tar_d["y"][ei[1]])
               & tar_d["train_mask"][ei[1]]] = True
        remove[pred_s[ei[0]] != pred_t[ei[1]]] = True
        num = (src_d["x"][ei[0]] * tar_d["x"][ei[1]]).sum(1)
        den = np.maximum(np.linalg.norm(src_d["x"][ei[0]], axis=1)
                         * np.linalg.norm(tar_d["x"][ei[1]], axis=1), 1e-8)
        remove[num / den < 0.0] = True
        return ei[:, ~remove]

    def filt_within(ei, sims, d, probs):
        remove = np.zeros(ei.shape[1], bool)
        thres = np.quantile(sims, 0.1)
        remove[sims < thres] = True
        pred = probs.argmax(1)
        remove[(pred[ei[0]] != d["y"][ei[0]]) & d["train_mask"][ei[1]]] = True
        remove[(pred[ei[1]] != d["y"][ei[1]]) & d["train_mask"][ei[1]]] = True
        remove[pred[ei[0]] != pred[ei[1]]] = True
        num = (d["x"][ei[0]] * d["x"][ei[1]]).sum(1)
        den = np.maximum(np.linalg.norm(d["x"][ei[0]], axis=1)
                         * np.linalg.norm(d["x"][ei[1]], axis=1), 1e-8)
        remove[num / den < 0.8] = True
        return ei[:, ~remove]

    ei_cross, sims = topk_flat(S, k_cross)
    ei_cross = filt_cross(pyg_sort(ei_cross), sims)

    with torch.no_grad():
        S_src = grid(sd, zs, zs)
        zt_within, _ = oracle.target_encode(oracle.t(tar_d["x"]), sd)
        S_tar = grid(sd, zt_within, zt_within)
    ei_ws, sims_s = topk_flat(S_src, k_within)
    ei_ws = filt_within(pyg_sort(ei_ws), sims_s, src_d, probs_src)
    ei_wt, sims_t = topk_flat(S_tar, k_within)
    ei_wt = filt_within(pyg_sort(ei_wt), sims_t, tar_d, probs_tar)

    # merge (reference :163-193): originals are self-loops, offset target,
    # union, dedup
    n = n_src + n_tar
    loops = np.arange(n)
    cross = ei_cross.copy()
    cross[1] += n_src
    parts = [np.stack([loops, loops]), cross, ei_ws, ei_wt + n_src]
    ei = np.concatenate(parts, axis=1)
    key = ei[0] * n + ei[1]
    ei = ei[:, np.unique(key, return_index=True)[1]]
    return ei, S


def main():
    out = {"datasets": []}
    for name, rc in RECIPES.items():
        shipped = load_pyg_data_dict(
            f"{REF}/data_bridged_graph/{name}_bridged_graph.dat")
        sd = load_torch_state_dict(
            f"{REF}/ckpt/model_AdvLearner_{name}_best.ckpt")
        src_d, tar_d, m_src, m_tar = reconstruct_office_domains(shipped, name)
        ei_merged, S_t = reference_algorithm(sd, src_d, tar_d, **{
            "k_cross": rc["k_cross"], "k_within": rc["k_within"]})
        # map merged (src-order, tar offset) ids back to original VS order
        n_src = src_d["x"].shape[0]
        n = n_src + tar_d["x"].shape[0]
        perm = np.empty(n, np.int64)
        for orig, newi in m_src.items():
            perm[orig] = newi
        for orig, newi in m_tar.items():
            perm[orig] = newi + n_src
        inv = np.empty(n, np.int64)
        inv[perm] = np.arange(n)
        ei_orig = inv[ei_merged]
        want = set(zip(*np.asarray(shipped["edge_index"]).tolist()))
        got = set(zip(*ei_orig.tolist()))
        logic = dict(
            shipped=len(want), reproduced=len(got),
            missing=len(want - got), extra=len(got - want),
            iou=round(len(want & got) / len(want | got), 6),
        )

        # scoring-gap stats: framework decomposed head vs torch oracle
        import jax.numpy as jnp  # noqa: F401

        from bridged_gnn_tpu.bridge.build import (
            _encode,
            decompose_pair_mlp_head,
        )
        from bridged_gnn_tpu.graph import graph_from_dict
        from bridged_gnn_tpu.io.ckpt_import import (
            load_adv_learner_variables,
        )
        from bridged_gnn_tpu.nn.stage1 import AdversarialLearnerV2

        model = AdversarialLearnerV2(
            dim_in_src=256, dim_in_tar=256, num_classes_src=31,
            num_classes_tar=31, dim_hidden=128, source_clf=True,
            use_norm=True, norm_mode="None", backbone="mlp",
            sim_mode="mlp")
        variables = load_adv_learner_variables(model, sd)
        g_src = graph_from_dict(src_d)
        g_tar = graph_from_dict(tar_d)
        z_src, z_tar = _encode(model, variables, g_src, None, g_tar, None)
        z_src, z_tar = np.asarray(z_src), np.asarray(z_tar)
        d = decompose_pair_mlp_head(variables)
        a = z_tar @ d["w_tar"]
        b = z_src @ d["w_src"]
        St = S_t.numpy()
        n_tar_real = z_tar.shape[0]
        S_j = np.empty_like(St)
        for i0 in range(0, n_tar_real, 128):
            i1 = min(i0 + 128, n_tar_real)
            pre = a[i0:i1, None, :] + b[None, :, :] + d["bias"][None, None, :]
            S_j[i0:i1] = 1 / (1 + np.exp(-(np.maximum(pre, 0) @ d["w2"]
                                           + d["b2"])))
        k = rc["k_cross"]
        tk_t = torch.topk(S_t, k, dim=1).indices.numpy()
        tk_j = np.argsort(-S_j, axis=1, kind="stable")[:, :k]
        agree = float(np.mean([
            len(set(tk_t[i]) & set(tk_j[i])) / k for i in range(n_tar_real)
        ]))
        srt = np.sort(St, axis=1)[:, ::-1]
        err = float(np.abs(S_j - St).max())
        scoring = dict(
            max_abs_score_diff=err,
            mean_abs_score_diff=float(np.abs(S_j - St).mean()),
            saturated_to_1=int((St == 1.0).sum()),
            topk_set_agreement=round(agree, 6),
            rows_with_boundary_tie=int((srt[:, k - 1] == srt[:, k]).sum()),
            rows_with_boundary_gap_below_err=int(
                (srt[:, k - 1] - srt[:, k] < err).sum()),
            n_rows=n_tar_real,
        )
        rec = dict(dataset=name, logic_oracle=logic, scoring_gap=scoring)
        print(json.dumps(rec, indent=1))
        out["datasets"].append(rec)
    with open(os.path.join(repo, "tools/probe_bridge_repro_parity.json"),
              "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
