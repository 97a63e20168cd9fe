"""Stage-2 CLI: knowledge-transfer GNN training on a bridged graph.

Flag surface mirrors the reference (main_graph_knowledge_transfer.py:423-439).
``--path_data`` accepts either the framework's npz format or the
reference's torch ``.dat`` pickle (read through the PyG-compat shim).

Example (office A→D recipe, run.sh:14):
  python -m bridged_gnn_tpu.cli.main_graph_knowledge_transfer \
      --num_layer 2 --hidden_dim 64 \
      --path_data /root/reference/data_bridged_graph/office_amazon2dslr_bridged_graph.dat \
      --to_undirected
"""

from __future__ import annotations

import argparse

from bridged_gnn_tpu.io.pyg_compat import load_pyg_data_dict
from bridged_gnn_tpu.io.serialize import load_graph_npz
from bridged_gnn_tpu.train.stage2 import Stage2Config, train_ktgnn
from bridged_gnn_tpu.utils import eval_bridged_graph, set_random_seed


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        description="Knowledge transfer on a learned bridged-graph "
        "(TPU-native)"
    )
    ap.add_argument("--dataset_name", type=str,
                    default="twitter_unrelational")
    ap.add_argument("--model_name", type=str, default="KTGNN",
                    choices=["MLP", "GCN", "GAT", "GATv2", "GraphSAGE", "GIN",
                             "JKNet", "APPNP", "GCN2", "DeeperGCN", "KTGNN"])
    ap.add_argument("--eval_metric", type=str, default="f1",
                    choices=["f1", "auc", "acc"])
    ap.add_argument("--save", action="store_true", default=False)
    ap.add_argument("--to_undirected", action="store_true", default=False)
    ap.add_argument("--no_dtc", action="store_true", default=False)
    ap.add_argument("--num_layer", type=int, default=2)
    ap.add_argument("--num_epoch", type=int, default=300)
    ap.add_argument("--hidden_dim", type=int, default=64)
    ap.add_argument("--path_data", type=str, required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log_every", type=int, default=10)
    ap.add_argument("--ckpt_dir", type=str, default="../ckpt")
    # None = framework default ('highest', reference-parity fp32).
    # 'default'/'bfloat16' is the production knob: MXU-native matmul
    # passes, and on the TPU backend the Mosaic attention kernels
    # auto-engage (ops/pallas_fused.auto_kernel)
    ap.add_argument("--matmul_precision", type=str, default=None,
                    choices=["highest", "float32", "default", "bfloat16"])
    # bf16 conv messages (KTGNN family): halves the bytes the gather
    # engine moves per edge slot — the hot-path bound (DESIGN.md §2)
    ap.add_argument("--message_dtype", type=str, default=None,
                    choices=["bfloat16"])
    # >0: run this many epochs per device dispatch (lax.scan; per-epoch
    # eval streams O(num_classes) confusion counts instead of O(N)
    # predictions). Ignored with --save or --eval_metric auc.
    ap.add_argument("--scan_epochs", type=int, default=0)
    # operational numerics guard: finite params/loss + attention-logit
    # spread inside the block-max softmax envelope at every eval boundary
    ap.add_argument("--check_numerics", action="store_true")
    # HBM policy: auto (default) picks the fastest of three tiers that
    # fits ~80% of device HBM — plain (Mosaic kernels + stored
    # residuals), xla_plain (kernels off, stored residuals; ~30% less
    # HBM), lean (recompute-backward + remat, the capacity config)
    ap.add_argument("--memory_policy", type=str, default="auto",
                    choices=["auto", "plain", "xla_plain", "lean"])
    # capture an XLA profiler trace of the whole training run into this
    # directory (TensorBoard/XProf-viewable; SURVEY §5.1)
    ap.add_argument("--profile_dir", type=str, default=None)
    # multi-device training: run the SAME runtime loop (eval heads,
    # best-by-loss_clf_t2, scan, checkpoints) over an n-device mesh
    # (parallel/stage2_runtime.py). KTGNN only; 1 = single device.
    # CPU testing: XLA_FLAGS=--xla_force_host_platform_device_count=N
    ap.add_argument("--n_shards", type=int, default=1)
    # 'halo' = row partition + boundary all_to_all (wire ∝ edge cut);
    # 'edgeshard' = 1-D edge partition with full-array psums
    ap.add_argument("--shard_layout", type=str, default="halo",
                    choices=["halo", "edgeshard"])
    # halo only: overlap the boundary all_to_all with the local
    # attention pipeline (split slot layouts + streaming-softmax combine)
    ap.add_argument("--halo_overlap", action="store_true", default=False)
    return ap


def load_bridged_graph(path: str):
    if path.endswith(".npz"):
        return load_graph_npz(path)
    return load_pyg_data_dict(path)


def main(args):
    import os

    from bridged_gnn_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    set_random_seed(0)
    data = load_bridged_graph(args.path_data)
    print("local homophily of test nodes:", eval_bridged_graph(data))

    save_best_path = None
    if args.save:
        os.makedirs(args.ckpt_dir, exist_ok=True)
        gnn = "GraphSAGE" if args.no_dtc else args.model_name
        save_best_path = os.path.join(
            args.ckpt_dir, f"model_{gnn}_{args.dataset_name}_best.pkl"
        )

    # the no_dtc recipe runs GraphSAGE without scheduler
    # (reference main_graph_knowledge_transfer.py:414-421)
    if args.no_dtc:
        cfg = Stage2Config(
            model_name="GraphSAGE", num_layer=args.num_layer,
            hidden=args.hidden_dim, num_epoch=args.num_epoch,
            use_scheduler=False, metric=args.eval_metric,
            to_undirected=args.to_undirected, seed=args.seed,
            log_every=args.log_every, save_best_path=save_best_path,
            matmul_precision=args.matmul_precision,
            message_dtype=args.message_dtype,
            scan_epochs=args.scan_epochs,
            check_numerics=args.check_numerics,
        )
    else:
        cfg = Stage2Config(
            model_name=args.model_name, num_layer=args.num_layer,
            hidden=args.hidden_dim, num_epoch=args.num_epoch,
            metric=args.eval_metric, to_undirected=args.to_undirected,
            seed=args.seed, log_every=args.log_every,
            save_best_path=save_best_path,
            matmul_precision=args.matmul_precision,
            message_dtype=args.message_dtype,
            scan_epochs=args.scan_epochs,
            check_numerics=args.check_numerics,
            memory_policy=args.memory_policy,
            n_shards=args.n_shards,
            shard_layout=args.shard_layout,
            halo_overlap=args.halo_overlap,
        )
    if args.profile_dir:
        from bridged_gnn_tpu.utils.profiling import trace

        with trace(args.profile_dir):
            res = train_ktgnn(data, cfg)
        print(f"profiler trace written to {args.profile_dir}")
    else:
        res = train_ktgnn(data, cfg)
    print("[stage-2 best]", {k: v for k, v in res["best"].items()
                             if k != "per_head"})
    if "per_head" in res["best"]:
        print("[per-head test]", res["best"]["per_head"])
    print(f"mean s/epoch: {res['mean_epoch_time']:.4f}")
    return res


if __name__ == "__main__":
    main(build_argparser().parse_args())


def cli_entry():
    main(build_argparser().parse_args())
