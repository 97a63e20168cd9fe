"""One-call orchestration of the full two-stage KBL pipeline.

``run_pipeline(cfg)`` = prepare datasets → stage-1 adversarial training →
bridge construction → stage-2 KT-GNN training, with optional elastic
retries and artifact persistence. This is the programmatic equivalent of
running the reference's two CLIs back-to-back (run.sh recipes).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

from bridged_gnn_tpu.bridge import gen_bridged_graph
from bridged_gnn_tpu.config import PipelineConfig
from bridged_gnn_tpu.data import prepare_datasets
from bridged_gnn_tpu.graph import graph_from_dict
from bridged_gnn_tpu.io.serialize import save_graph_npz
from bridged_gnn_tpu.ops.spmm import adjacency_from_graph
from bridged_gnn_tpu.train.stage1 import train_adversarial
from bridged_gnn_tpu.train.stage2 import train_ktgnn
from bridged_gnn_tpu.utils import eval_bridged_graph, eval_homophily


def run_pipeline(
    cfg: PipelineConfig,
    out_dir: Optional[str] = None,
    mesh=None,
    elastic: bool = False,
) -> Dict[str, Any]:
    src_d, tar_d, data, m_src, m_tar = prepare_datasets(
        cfg.dataset_name, cfg.data_root
    )

    stage1_fn = train_adversarial
    stage2_fn = train_ktgnn
    if elastic:
        from functools import partial

        from bridged_gnn_tpu.train.elastic import run_elastic

        stage1_fn = partial(run_elastic, train_adversarial)
        stage2_fn = partial(run_elastic, train_ktgnn)

    res1 = stage1_fn(src_d, tar_d, cfg.stage1)

    g_src = graph_from_dict(src_d)
    g_tar = graph_from_dict(tar_d)
    use_adj = cfg.stage1.backbone == "gnn"
    adj_src = adjacency_from_graph(g_src) if use_adj else None
    adj_tar = adjacency_from_graph(g_tar) if use_adj else None
    merged = gen_bridged_graph(
        res1["model"], res1["variables"], g_src, adj_src, g_tar, adj_tar,
        m_src, m_tar,
        k_cross=cfg.bridge.k_cross, k_within=cfg.bridge.k_within,
        check_cross=cfg.bridge.check_cross,
        check_within=cfg.bridge.check_within,
        thres_conf_quantile=cfg.bridge.thres_conf_quantile,
        thres_feat_sim=cfg.bridge.thres_feat_sim,
        sim_mode=cfg.stage1.sim_mode, epsilon=cfg.bridge.epsilon,
        row_block=cfg.bridge.row_block, mesh=mesh,
        approx_recall=cfg.bridge.approx_recall,
        rerank_candidates=cfg.bridge.rerank_candidates,
    )
    diagnostics = dict(
        homophily=eval_homophily(merged),
        local_homophily_test=eval_bridged_graph(merged),
    )
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        save_graph_npz(
            os.path.join(out_dir, f"{cfg.dataset_name}_bridged_graph.npz"),
            merged,
        )

    res2 = stage2_fn(merged, cfg.stage2)
    return dict(
        stage1=res1["best"],
        stage2=res2["best"],
        bridged_graph=merged,
        diagnostics=diagnostics,
    )


def main(argv=None) -> Dict[str, Any]:
    """``python -m bridged_gnn_tpu.pipeline --recipe <name>`` (or
    ``--config cfg.json``) — run an end-to-end pipeline from a pinned
    recipe (config.RECIPES; the programmatic twin of the reference's
    run.sh entries) or from a PipelineConfig JSON file."""
    import argparse

    from bridged_gnn_tpu.config import RECIPES
    from bridged_gnn_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    ap = argparse.ArgumentParser(description=main.__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--recipe", choices=sorted(RECIPES))
    src.add_argument("--config", metavar="JSON",
                     help="path to a PipelineConfig JSON file")
    ap.add_argument("--data_root", default=None,
                    help="override the recipe's dataset root")
    ap.add_argument("--out_dir", default=None,
                    help="persist the bridged graph npz here")
    ap.add_argument("--elastic", action="store_true", default=False)
    args = ap.parse_args(argv)
    cfg = (RECIPES[args.recipe] if args.recipe
           else PipelineConfig.from_file(args.config))
    if args.data_root:
        import dataclasses

        cfg = dataclasses.replace(cfg, data_root=args.data_root)
    res = run_pipeline(cfg, out_dir=args.out_dir, elastic=args.elastic)
    print("[stage-1 best]", res["stage1"])
    print("[stage-2 best]", {k: v for k, v in res["stage2"].items()
                             if k != "per_head"})
    print("[diagnostics]", res["diagnostics"])
    return res


if __name__ == "__main__":
    main()
