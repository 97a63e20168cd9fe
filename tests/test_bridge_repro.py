"""End-to-end reproduction of the shipped office bridged graphs
(VERDICT r4 #2): the reference ships the *outputs* of its pipeline
(data_bridged_graph/*.dat, written at main_bridged_graph.py:320) and the
checkpoints that produced them — the strongest remaining oracle for
stage-1 inference + proposers + filters + merge/reorder in one shot.

What is and isn't reproducible (tools/probe_bridge_filter_forensics.json,
tools/probe_bridge_repro_parity.json):

  * proposals: top-k agreement 0.999 vs the torch oracle; 12 of ~10k
    shipped cross edges fall outside the CPU-torch top-k (the author's
    GPU run's fp boundary);
  * filters 2-4 + mask/label/feature reconstruction (incl. the seed-1
    torch.randperm source-split replay): EXACT — zero shipped edges
    violate them on either dataset;
  * filter 1's quantile threshold: exact; its *victim assignment* rides
    the author's GPU topk(sorted=False) within-row value ordering
    through the misaligned cut (main_bridged_graph.py:75 + :235-239) —
    an environment detail the artifact does not pin down (every
    candidate ordering plateaus at jaccard ~0.5 vs the recovered
    removal set), which bounds exact-edge-set IoU at ~0.93-0.95.
"""

import numpy as np
import pytest
import torch

import torch_oracle as oracle
from bridged_gnn_tpu.data.datasets import reconstruct_office_domains
from bridged_gnn_tpu.graph import graph_from_dict
from bridged_gnn_tpu.io import load_torch_state_dict
from bridged_gnn_tpu.io.ckpt_import import load_adv_learner_variables
from bridged_gnn_tpu.nn.stage1 import AdversarialLearnerV2

from conftest import REFERENCE_DIR


def _edge_set(ei):
    return set(zip(ei[0].tolist(), ei[1].tolist()))


@pytest.fixture(scope="module")
def a2d(a2d_dict):
    name = "office_amazon2dslr"
    sd = load_torch_state_dict(
        REFERENCE_DIR + f"/ckpt/model_AdvLearner_{name}_best.ckpt")
    src_d, tar_d, m_src, m_tar = reconstruct_office_domains(
        dict(a2d_dict), name)
    return dict(name=name, sd=sd, src=src_d, tar=tar_d,
                m_src=m_src, m_tar=m_tar)


def test_target_masks_roundtrip(a2d, a2d_dict):
    """The reconstructed target split must be exactly the shipped one
    (merge_graphs carried it through — reference :188-190)."""
    cm = np.asarray(a2d_dict["central_mask"]).astype(bool)
    idx_tar = np.where(~cm)[0]
    for mask in ("train_mask", "val_mask", "test_mask"):
        want = np.asarray(a2d_dict[mask])[idx_tar]
        np.testing.assert_array_equal(a2d["tar"][mask], want)
    # source split regeneration: exactly 60%-ceil per class of train rows
    y = a2d["src"]["y"]
    for c in range(int(y.max()) + 1):
        n_c = int((y == c).sum())
        got = int(a2d["src"]["train_mask"][y == c].sum())
        assert got == int(np.ceil(n_c * 0.6))


@pytest.mark.parametrize("name", ["office_amazon2dslr",
                                  "office_amazon2webcam"])
def test_shipped_edges_never_violate_deterministic_filters(
        name, a2d_dict, a2w_dict):
    """LOGIC oracle on BOTH shipped artifacts: every shipped cross edge
    must pass filters 2-4 computed from the reconstructed inputs +
    shipped-ckpt classifier — zero tolerance. Filter 4 runs at the
    verified threshold 0.8 (the office recipes pass no --thres_feat_sim,
    so the reference used the argparse default — confirmed from the
    artifacts: min shipped cross cosine 0.8005 / 0.8000). Certifies
    filter logic, classifier path and mask reconstruction in one
    assertion (filter 1's victim assignment is the author's GPU
    ordering; see module docs)."""
    shipped = dict(a2d_dict if name == "office_amazon2dslr"
                   else a2w_dict)
    sd = load_torch_state_dict(
        REFERENCE_DIR + f"/ckpt/model_AdvLearner_{name}_best.ckpt")
    src_d, tar_d, m_src, m_tar = reconstruct_office_domains(shipped, name)
    with torch.no_grad():
        zs = oracle.mlp_backbone(oracle.t(src_d["x"]), sd,
                                 "source_learner.backbone")
        zt, _ = oracle.target_encode(oracle.t(tar_d["x"]), sd)
        pred_s = oracle.classify(zs, sd).argmax(1).numpy()
        pred_t = oracle.classify(zt, sd).argmax(1).numpy()

    cm = np.asarray(shipped["central_mask"]).astype(bool)
    ei = np.asarray(shipped["edge_index"])
    sel = cm[ei[0]] & ~cm[ei[1]]
    e0 = np.array([m_src[int(u)] for u in ei[0][sel]])
    e1 = np.array([m_tar[int(v)] for v in ei[1][sel]])

    # filter 2: endpoint pred contradicts training label
    assert (pred_s[e0] == src_d["y"][e0]).all()
    viol = (pred_t[e1] != tar_d["y"][e1]) & tar_d["train_mask"][e1]
    assert not viol.any()
    # filter 3: endpoint preds must agree
    assert (pred_s[e0] == pred_t[e1]).all()
    # filter 4: raw-feature cosine >= 0.8 (verified recipe default)
    num = (src_d["x"][e0] * tar_d["x"][e1]).sum(1)
    den = np.maximum(
        np.linalg.norm(src_d["x"][e0], axis=1)
        * np.linalg.norm(tar_d["x"][e1], axis=1), 1e-8)
    assert (num / den >= 0.8 - 1e-6).all()


@pytest.mark.slow
def test_end_to_end_reproduction_iou(a2d, a2d_dict):
    """Full framework pipeline from the shipped ckpt reproduces the
    shipped a2d graph at IoU >= 0.94 in reference_compat mode (measured
    0.9525 CPU-pinned with the verified 0.8 cross filter-4 threshold;
    the gap is the author-GPU filter-1 assignment, module docs), with
    x/y/masks bit-exact."""
    from bridged_gnn_tpu.bridge.build import gen_bridged_graph

    model = AdversarialLearnerV2(
        dim_in_src=256, dim_in_tar=256, num_classes_src=31,
        num_classes_tar=31, dim_hidden=128, source_clf=True,
        use_norm=True, norm_mode="None", backbone="mlp", sim_mode="mlp")
    variables = load_adv_learner_variables(model, a2d["sd"])
    g_src = graph_from_dict(a2d["src"])
    g_tar = graph_from_dict(a2d["tar"])
    out = gen_bridged_graph(
        model, variables, g_src, None, g_tar, None,
        a2d["m_src"], a2d["m_tar"], k_cross=20, k_within=3,
        thres_feat_sim=0.8,  # verified recipe default (module docs)
        check_cross=True, check_within=True, reference_compat=True,
    )
    for key in ("y", "train_mask", "val_mask", "test_mask",
                "central_mask"):
        np.testing.assert_array_equal(
            np.asarray(out[key]), np.asarray(a2d_dict[key]))
    np.testing.assert_allclose(out["x"], a2d_dict["x"])
    want = _edge_set(np.asarray(a2d_dict["edge_index"]))
    got = _edge_set(out["edge_index"])
    iou = len(want & got) / len(want | got)
    assert iou >= 0.94, f"a2d edge-set IoU regressed: {iou:.4f}"
    # self-loops (the original UD edges) must survive exactly
    n = np.asarray(a2d_dict["x"]).shape[0]
    assert all((i, i) in got for i in range(n))
