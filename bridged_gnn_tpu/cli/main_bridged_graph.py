"""Stage-1 CLI: train the similarity learner and build the bridged graph.

Flag surface mirrors the reference (main_bridged_graph.py:360-391); the
``--gpu`` flag is replaced by JAX device selection, checkpoints are flax
variable pickles, and the bridged graph is written as npz (native format)
with the same field set as the reference's torch pickle.

Example (office A→D recipe, run.sh:11-13):
  python -m bridged_gnn_tpu.cli.main_bridged_graph --hidden_dim 128 \
      --num_epoch 400 --start_eval_epoch 300 --epsilon 0.5 --k_within 3 \
      --k_cross 20 --seed 0 --save --dataset_name office_amazon2dslr \
      --version v2 --check_within --check_cross
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from bridged_gnn_tpu.bridge import gen_bridged_graph
from bridged_gnn_tpu.data import prepare_datasets
from bridged_gnn_tpu.graph import graph_from_dict
from bridged_gnn_tpu.io.serialize import save_graph_npz
from bridged_gnn_tpu.ops.spmm import adjacency_from_graph
from bridged_gnn_tpu.train.stage1 import Stage1Config, train_adversarial
from bridged_gnn_tpu.utils import (
    eval_bridged_graph,
    eval_homophily,
    set_random_seed,
)
from bridged_gnn_tpu.utils.diagnostics import degree_stats


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        description="Training Scripts for Similarity Learner part of "
        "Bridged-GNN (TPU-native)"
    )
    ap.add_argument("--dataset_name", type=str,
                    default="twitter_unrelational")
    ap.add_argument("--data_root", type=str, default="../datasets")
    ap.add_argument("--save", action="store_true", default=False)
    ap.add_argument("--check_within", action="store_true", default=False)
    ap.add_argument("--check_cross", action="store_true", default=False)
    ap.add_argument("--norm_mode", type=str, default="None")
    ap.add_argument("--version", type=str, default="v1",
                    choices=["v1", "v2"])
    ap.add_argument("--norm_scale", type=float, default=1.0)
    ap.add_argument("--num_epoch", type=int, default=400)
    ap.add_argument("--start_eval_epoch", type=int, default=300)
    ap.add_argument("--eval_per_epoch", type=int, default=1)
    ap.add_argument("--num_layer", type=int, default=2)
    ap.add_argument("--hidden_dim", type=int, default=64)
    ap.add_argument("--sim_mode", type=str, default="mlp",
                    choices=["cosine", "mlp"])
    ap.add_argument("--backbone", type=str, default="mlp",
                    choices=["gnn", "mlp"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--epsilon", type=float, default=0.5)
    ap.add_argument("--thres_conf_quantile", type=float, default=0.1)
    ap.add_argument("--thres_feat_sim", type=float, default=0.8)
    ap.add_argument("--k_within", type=int, default=6)
    ap.add_argument("--k_cross", type=int, default=20)
    ap.add_argument("--batch_size", type=int, default=1000)
    # None = exact top-k (reference parity); a float in (0,1] uses the
    # TPU-native approx_max_k selector at that recall target (11x sweep
    # speedup at 0.95 — production knob, tools/probe_topk_cosine.json)
    def _recall(v):
        f = float(v)
        if not 0.0 < f <= 1.0:
            raise argparse.ArgumentTypeError(
                f"--topk_recall must be in (0, 1], got {v} "
                "(did you pass a percentage?)"
            )
        return f

    ap.add_argument("--topk_recall", type=_recall, default=None)
    # mlp mode: cosine-prescreen + exact-MLP rerank of the top-N
    # candidates per row (BridgeConfig.rerank_candidates)
    ap.add_argument("--mlp_rerank", type=int, default=None)
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--max_class_num", type=int, default=10)
    ap.add_argument("--eval_mode", type=str, default="sampling",
                    choices=["all", "sampling"])
    ap.add_argument("--sample_size", type=int, default=40000)
    ap.add_argument("--ckpt_dir", type=str, default="../ckpt")
    ap.add_argument(
        "--export_torch_ckpt", type=str, default=None,
        help="also write the best model as a reference-layout torch "
             "state_dict pickle (loadable by the reference's "
             "gen_bridged_graph, main_bridged_graph.py:274)")
    ap.add_argument("--out_dir", type=str, default="../data_bridged_graph")
    ap.add_argument("--verbose", action="store_true", default=True)
    # >0: run up to this many epochs per device dispatch (lax.scan over
    # pre-sampled pair-index stacks; segments land on eval boundaries)
    ap.add_argument("--scan_epochs", type=int, default=0)
    # draw training pairs on device (jax.random) inside the scanned epoch
    # body: zero H2D per segment. Distribution-equivalent to the host
    # sampler, different stream (production knob; requires --scan_epochs)
    ap.add_argument("--device_sampling", action="store_true")
    # node-row-sharded GSPMD encode over an n-device mesh (VERDICT r4 #7)
    ap.add_argument("--n_shards", type=int, default=1)
    # operational numerics guard: assert params + losses finite at every
    # eval boundary
    ap.add_argument("--check_numerics", action="store_true")
    # capture an XLA profiler trace of stage-1 training into this
    # directory (TensorBoard/XProf-viewable; SURVEY §5.1)
    ap.add_argument("--profile_dir", type=str, default=None)
    return ap


def main(args):
    from bridged_gnn_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    set_random_seed(0)
    src_d, tar_d, data, m_src, m_tar = prepare_datasets(
        args.dataset_name, args.data_root
    )

    # twitter stage-1 quirk: the source graph is reduced to self loops
    # before training (reference main_bridged_graph.py:335-340)
    if args.dataset_name.split("_")[0] == "twitter":
        n = src_d["x"].shape[0]
        loops = np.arange(n, dtype=np.int64)
        src_d = dict(src_d, edge_index=np.stack([loops, loops]))

    # --version v1 is the GraphEncoder(SAGE)-backbone + cosine-head family
    # (reference Adversarial_Learner, models/models.py:815-844); v2 selects
    # backbone/sim head from the flags (models.py:1110-1142)
    backbone = "gnn" if args.version == "v1" else args.backbone
    sim_mode = "cosine" if args.version == "v1" else args.sim_mode

    cfg = Stage1Config(
        hidden_dim=args.hidden_dim,
        num_layer=args.num_layer,
        num_epoch=args.num_epoch,
        start_eval_epoch=args.start_eval_epoch,
        eval_per_epoch=args.eval_per_epoch,
        max_class_num=args.max_class_num,
        sample_size=args.sample_size,
        sim_mode=sim_mode,
        backbone=backbone,
        norm_mode=args.norm_mode,
        norm_scale=args.norm_scale,
        eval_mode=args.eval_mode,
        seed=args.seed,
        repeat=args.repeat,
        verbose=args.verbose,
        scan_epochs=args.scan_epochs,
        device_sampling=args.device_sampling,
        n_shards=args.n_shards,
        check_numerics=args.check_numerics,
    )
    os.makedirs(args.ckpt_dir, exist_ok=True)
    ckpt_path = os.path.join(
        args.ckpt_dir, f"model_AdvLearner_{args.dataset_name}_best.pkl"
    )
    if args.profile_dir:
        from bridged_gnn_tpu.utils.profiling import trace

        with trace(args.profile_dir):
            res = train_adversarial(
                src_d, tar_d, cfg, ckpt_path=ckpt_path if args.save else None
            )
        print(f"profiler trace written to {args.profile_dir}")
    else:
        res = train_adversarial(
            src_d, tar_d, cfg, ckpt_path=ckpt_path if args.save else None
        )
    print("[stage-1 best]", res["best"])
    if args.export_torch_ckpt:
        from bridged_gnn_tpu.io.ckpt_import import (
            flax_variables_to_torch_state_dict,
            save_torch_state_dict,
        )

        save_torch_state_dict(
            flax_variables_to_torch_state_dict(res["variables"]),
            args.export_torch_ckpt,
        )
        print("exported torch state_dict to", args.export_torch_ckpt)

    # bridge construction from the best checkpoint
    g_src = graph_from_dict(src_d)
    g_tar = graph_from_dict(tar_d)
    adj_src = adjacency_from_graph(g_src) if backbone == "gnn" else None
    adj_tar = adjacency_from_graph(g_tar) if backbone == "gnn" else None
    merged = gen_bridged_graph(
        res["model"], res["variables"], g_src, adj_src, g_tar, adj_tar,
        m_src, m_tar,
        k_cross=args.k_cross, k_within=args.k_within,
        check_cross=args.check_cross, check_within=args.check_within,
        thres_conf_quantile=args.thres_conf_quantile,
        thres_feat_sim=args.thres_feat_sim,
        sim_mode=sim_mode, epsilon=args.epsilon,
        # reference --batch_size is the scoring-chunk size
        # (main_bridged_graph.py:45,90); here it sets the SDDMM row tile
        row_block=args.batch_size,
        verbose=args.verbose,
        approx_recall=args.topk_recall,
        rerank_candidates=args.mlp_rerank,
    )
    h1, h2 = eval_homophily(merged)
    local = eval_bridged_graph(merged)
    deg = degree_stats(merged["edge_index"], merged["x"].shape[0])
    print(f"homophily ratio: {h1:.4f} | 2nd-order: {h2:.4f} | "
          f"local>0.5 on test: {local:.4f} | degrees: {deg}")
    if args.save:
        os.makedirs(args.out_dir, exist_ok=True)
        out_path = os.path.join(
            args.out_dir, f"{args.dataset_name}_bridged_graph.npz"
        )
        save_graph_npz(out_path, merged)
        print("saved bridged graph to", out_path)
    return merged


if __name__ == "__main__":
    main(build_argparser().parse_args())


def cli_entry():
    main(build_argparser().parse_args())
