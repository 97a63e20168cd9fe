"""Forensic decomposition of the bridge-reproduction residual.

With near-exact scoring (probe_bridge_repro_parity.json: max score diff
1.2e-5, top-k agreement 0.999), the shipped edge set itself identifies the
reference's effective filter behavior:

    shipped_cross = proposals \\ (R1 ∪ R234)

R234 (filters 2-4) is order-independent and computable exactly from the
torch-oracle probs + reconstructed masks; R1 (the quantile cut) depends on
the e_sim↔edge alignment the author's torch build actually produced. So:

  * shipped ∩ R234 must be EMPTY — any hit means our probs/mask
    reconstruction or filter logic is wrong;
  * R1_true = proposals \\ shipped \\ R234 reveals the author's actual
    filter-1 edge assignment, which we compare against candidate
    alignments (sorted-edges + row-major sims = the CPU-torch story;
    aligned row-major; others).

Writes tools/probe_bridge_filter_forensics.json.
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


def grid(sd, z_cols, z_rows):
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


def analyze(name):
    rc = RECIPES[name]
    shipped = load_pyg_data_dict(
        f"{REF}/data_bridged_graph/{name}_bridged_graph.dat")
    sd = load_torch_state_dict(
        f"{REF}/ckpt/model_AdvLearner_{name}_best.ckpt")
    src_d, tar_d, m_src, m_tar = reconstruct_office_domains(shipped, name)
    with torch.no_grad():
        zs = oracle.mlp_backbone(oracle.t(src_d["x"]), sd,
                                 "source_learner.backbone")
        zt, _ = oracle.target_encode(oracle.t(tar_d["x"]), sd)
        probs_src = oracle.classify(zs, sd).exp().numpy()
        probs_tar = oracle.classify(zt, sd).exp().numpy()
    S = grid(sd, zs, zt)
    n_src, n_tar = zs.shape[0], zt.shape[0]
    k = rc["k_cross"]
    v, i = S.topk(k, dim=1, largest=True, sorted=False)
    sims = v.numpy().reshape(-1)                 # row-major e_sim vector
    prop = np.stack([i.numpy().reshape(-1),
                     np.repeat(np.arange(n_tar), k)])  # (src, tar)

    # shipped cross set, mapped to per-domain ids
    cm = np.asarray(shipped["central_mask"]).astype(bool)
    ei = np.asarray(shipped["edge_index"])
    sel = cm[ei[0]] & ~cm[ei[1]]
    lut_s = {o: nn for o, nn in m_src.items()}
    lut_t = {o: nn for o, nn in m_tar.items()}
    ship = set(
        (lut_s[int(u)], lut_t[int(v_)])
        for u, v_ in zip(ei[0][sel], ei[1][sel])
    )
    prop_set = set(zip(prop[0].tolist(), prop[1].tolist()))
    not_proposed = len(ship - prop_set)

    # order-independent filters 2-4 (R234)
    pred_s, pred_t = probs_src.argmax(1), probs_tar.argmax(1)
    e0, e1 = prop[0], prop[1]
    r2 = (pred_s[e0] != src_d["y"][e0]) | (
        (pred_t[e1] != tar_d["y"][e1]) & tar_d["train_mask"][e1])
    r3 = pred_s[e0] != pred_t[e1]
    num = (src_d["x"][e0] * tar_d["x"][e1]).sum(1)
    den = np.maximum(np.linalg.norm(src_d["x"][e0], axis=1)
                     * np.linalg.norm(tar_d["x"][e1], axis=1), 1e-8)
    # run.sh passes no --thres_feat_sim for office -> argparse default
    # 0.8 (verified: min shipped cross cosine 0.8005/0.8000)
    r4 = num / den < 0.8
    r234 = r2 | r3 | r4
    r234_set = set(map(tuple, prop[:, r234].T.tolist()))
    ship_hit_r234 = len(ship & r234_set)

    # the reference's true filter-1-only removals
    removed = prop_set - ship
    r1_true = removed - r234_set
    thres = np.quantile(sims, 0.1)
    below = sims < thres                        # row-major positions

    # candidate alignments of the filter-1 cut
    order_sorted = np.lexsort((prop[1], prop[0]))  # PyG (src,dst) order
    order_bydst = np.lexsort((prop[0], prop[1]))   # (dst,src) order
    cand = {}
    # (a) aligned: cut the row-major proposals themselves
    cand["aligned_rowmajor"] = set(
        map(tuple, prop[:, below].T.tolist()))
    # (b) misaligned CPU-torch: (src,dst)-sorted edges, row-major sims
    cand["srcdst_edges_rowmajor_sims"] = set(
        map(tuple, prop[:, order_sorted[below]].T.tolist()))
    # (c) (dst,src)-sorted edges, row-major desc sims (within-row-only
    # scramble: rows align, the k slots within a row don't)
    cand["dstsrc_edges_rowmajor_sims"] = set(
        map(tuple, prop[:, order_bydst[below]].T.tolist()))
    # (d) sims permuted within rows by ascending src index ("index
    # order", a GPU radix-select candidate), edges (src,dst)-sorted
    srt_in_row = np.argsort(i.numpy(), axis=1, kind="stable")
    sims_idxorder = np.take_along_axis(v.numpy(), srt_in_row,
                                       axis=1).reshape(-1)
    below_idx = sims_idxorder < thres
    cand["srcdst_edges_idxorder_sims"] = set(
        map(tuple, prop[:, order_sorted[below_idx]].T.tolist()))
    # (e) same sims permutation, (dst,src)-sorted edges: this is FULLY
    # aligned per edge (position p in the (dst,src) sort is row p//k,
    # j-th-smallest src) — distinct from (a) only via the threshold side
    cand["dstsrc_edges_idxorder_sims"] = set(
        map(tuple, prop[:, order_bydst[below_idx]].T.tolist()))

    # sort-order diagnostic that is π-invariant: per-row below counts
    # must equal per-row removal counts iff rows stay aligned
    b_r = below.reshape(n_tar, k).sum(1)
    removed_rows = np.zeros(n_tar, np.int64)
    for (_, t) in r1_true:
        removed_rows[t] += 1
    rows_matching = int((b_r == removed_rows).sum())
    out = dict(
        dataset=name,
        proposals=prop.shape[1],
        shipped_cross=len(ship),
        shipped_not_in_proposals=not_proposed,
        shipped_hit_by_r234=ship_hit_r234,
        r234_size=int(r234.sum()),
        r1_true_size=len(r1_true),
        filter1_below_count=int(below.sum()),
        rows_where_removalcount_matches_belowcount=rows_matching,
        n_rows=int(n_tar),
    )
    for cname, cset in cand.items():
        c_only = cset - r234_set    # what this candidate removes beyond R234
        inter = len(r1_true & c_only)
        out[f"cand_{cname}"] = dict(
            removes_beyond_r234=len(c_only),
            overlap_with_r1_true=inter,
            jaccard_vs_r1_true=round(
                inter / max(len(r1_true | c_only), 1), 4),
        )
    return out


def main():
    res = {"datasets": [analyze(n) for n in RECIPES]}
    print(json.dumps(res, indent=1))
    with open(os.path.join(repo,
                           "tools/probe_bridge_filter_forensics.json"),
              "w") as f:
        json.dump(res, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
