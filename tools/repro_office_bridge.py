"""Reproduce the shipped office bridged graphs end-to-end (VERDICT r4 #2).

The reference ships the two *outputs* of its stage-1→bridge pipeline
(data_bridged_graph/office_amazon2{dslr,webcam}_bridged_graph.dat, written
at main_bridged_graph.py:320) and the checkpoints that produced them. This
tool regenerates each graph from the shipped AdvLearner checkpoint with the
framework's gen_bridged_graph under the run.sh recipe parameters
(run.sh:11-13,17-19: k_cross 20/8, k_within 3, check_cross, check_within)
and compares edge sets — the strongest end-to-end oracle for stage-1
inference + proposers + filters + merge/reorder in one shot.

Two modes are measured:
  * reference_compat=True  — replays the reference's coalesce-then-filter
    sequencing (misaligned filter-1 quantile cut); expected IoU ~1.0
    modulo fp-rounding at the top-k / quantile boundaries;
  * reference_compat=False — the framework's sim-aligned filtering (the
    documented fix); the IoU delta QUANTIFIES the alignment bug's effect.

Writes results_bridge_repro.json. CPU-safe (office graphs are tiny).
"""

import json
import os
import sys

repo = __file__.rsplit("/", 2)[0]
sys.path.insert(0, repo)

from bridged_gnn_tpu.utils.platform import honor_jax_platforms_env  # noqa: E402

# CPU-pinned for determinism: the compat mode's misaligned filter-1 cut
# is sensitive to within-row top-k ORDER, and backend fp differences
# (CPU vs the tunneled chip) flip near-ties — measured ~1-5 IoU points
# of wobble on the within-domain kinds. One fixed backend makes the
# artifact reproducible; the sensitivity itself is part of the finding
# (the reference's own GPU ordering is the irrecoverable piece).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
honor_jax_platforms_env()

import numpy as np  # noqa: E402

from bridged_gnn_tpu.bridge.build import gen_bridged_graph  # noqa: E402
from bridged_gnn_tpu.data.datasets import reconstruct_office_domains  # noqa: E402
from bridged_gnn_tpu.graph import graph_from_dict  # noqa: E402
from bridged_gnn_tpu.io import load_pyg_data_dict, load_torch_state_dict  # noqa: E402
from bridged_gnn_tpu.io.ckpt_import import load_adv_learner_variables  # noqa: E402
from bridged_gnn_tpu.nn.stage1 import AdversarialLearnerV2  # noqa: E402

REF = os.environ.get("BGNN_REFERENCE_DIR", "/root/reference")

RECIPES = {
    # run.sh:11-13 / :17-19. Neither office recipe passes
    # --thres_feat_sim, so the reference ran the CROSS filter-4 cosine
    # cut at the argparse DEFAULT 0.8 (main_bridged_graph.py:380) —
    # confirmed from the artifact itself: min cross-edge cosine is
    # 0.8005 (a2d) / 0.8000 (a2w) over every shipped cross edge.
    "office_amazon2dslr": dict(k_cross=20, k_within=3,
                               thres_feat_sim=0.8),
    "office_amazon2webcam": dict(k_cross=8, k_within=3,
                                 thres_feat_sim=0.8),
}


def edge_set(ei: np.ndarray) -> set:
    return set(zip(ei[0].tolist(), ei[1].tolist()))


def categorize(edges: set, central: np.ndarray) -> dict:
    out = {"self": set(), "cross": set(), "within_src": set(),
           "within_tar": set()}
    for u, v in edges:
        if u == v:
            out["self"].add((u, v))
        elif central[u] and not central[v]:
            out["cross"].add((u, v))
        elif central[u] and central[v]:
            out["within_src"].add((u, v))
        else:
            out["within_tar"].add((u, v))
    return out


def iou(a: set, b: set) -> float:
    return len(a & b) / max(len(a | b), 1)


def run_dataset(name: str) -> dict:
    shipped = load_pyg_data_dict(
        f"{REF}/data_bridged_graph/{name}_bridged_graph.dat"
    )
    sd = load_torch_state_dict(
        f"{REF}/ckpt/model_AdvLearner_{name}_best.ckpt"
    )
    src_d, tar_d, m_src, m_tar = reconstruct_office_domains(shipped, name)
    g_src = graph_from_dict(src_d)
    g_tar = graph_from_dict(tar_d)
    model = AdversarialLearnerV2(
        dim_in_src=src_d["x"].shape[1], dim_in_tar=tar_d["x"].shape[1],
        num_classes_src=int(src_d["y"].max()) + 1,
        num_classes_tar=int(src_d["y"].max()) + 1,
        dim_hidden=128, source_clf=True, use_norm=True, norm_mode="None",
        backbone="mlp", sim_mode="mlp",
    )
    variables = load_adv_learner_variables(model, sd)

    want = edge_set(np.asarray(shipped["edge_index"]))
    central = np.asarray(shipped["central_mask"]).astype(bool)
    want_cat = categorize(want, central)

    rec = dict(dataset=name, shipped_edges=len(want),
               shipped_by_kind={k: len(v) for k, v in want_cat.items()})
    for mode, compat in (("reference_compat", True), ("sim_aligned", False)):
        out = gen_bridged_graph(
            model, variables, g_src, None, g_tar, None,
            m_src, m_tar, check_cross=True, check_within=True,
            reference_compat=compat, verbose=True,
            **RECIPES[name],
        )
        got = edge_set(out["edge_index"])
        got_cat = categorize(got, central)
        rec[mode] = dict(
            edges=len(got),
            iou=round(iou(want, got), 6),
            missing=len(want - got),
            extra=len(got - want),
            by_kind={
                k: dict(
                    iou=round(iou(want_cat[k], got_cat[k]), 6),
                    missing=len(want_cat[k] - got_cat[k]),
                    extra=len(got_cat[k] - want_cat[k]),
                )
                for k in want_cat
            },
        )
        # masks/labels/features must round-trip exactly in both modes
        for key in ("y", "train_mask", "val_mask", "test_mask",
                    "central_mask"):
            assert (np.asarray(out[key]) == np.asarray(shipped[key])).all(), key
        assert np.allclose(out["x"], shipped["x"])
    return rec


def main():
    results = {"datasets": [run_dataset(n) for n in RECIPES]}
    for r in results["datasets"]:
        print(f"{r['dataset']}: compat IoU {r['reference_compat']['iou']}"
              f" | sim-aligned IoU {r['sim_aligned']['iou']}")
    out_path = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(repo, "results_bridge_repro.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    print("wrote", out_path)


if __name__ == "__main__":
    main()
