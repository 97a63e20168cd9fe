"""Quickstart: the full Knowledge Bridge Learning pipeline in ~30 lines.

Runs entirely on synthetic data (no downloads):
  1. generate a cross-domain VS-graph,
  2. train the stage-1 adversarial similarity learner,
  3. build the bridged graph (top-k proposals + validity filters),
  4. train KT-GNN on it,
  5. serve predictions.

    python examples/quickstart.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bridged_gnn_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()  # JAX_PLATFORMS=cpu works under the axon plugin

from bridged_gnn_tpu.config import BridgeConfig, PipelineConfig
from bridged_gnn_tpu.pipeline import run_pipeline
from bridged_gnn_tpu.train.stage1 import Stage1Config
from bridged_gnn_tpu.train.stage2 import Stage2Config


def main():
    cfg = PipelineConfig(
        dataset_name="sync_relational-intra",
        stage1=Stage1Config(
            hidden_dim=64, num_epoch=60, start_eval_epoch=40,
            eval_per_epoch=10, max_class_num=4, sample_size=10000,
            eval_sample_size=10000,
        ),
        bridge=BridgeConfig(k_cross=8, k_within=0, check_cross=True,
                            thres_conf_quantile=0.1, thres_feat_sim=0.0),
        stage2=Stage2Config(num_epoch=80, hidden=64, to_undirected=True),
    )
    out = run_pipeline(cfg)
    print("stage-1 best (src/tar/cross pair F1):", out["stage1"]["val"])
    print("bridged-graph homophily:", out["diagnostics"]["homophily"][0])
    print("stage-2 target-test macro-F1:", out["stage2"]["test"])

    # serving: reload the bridged graph into a predictor
    from bridged_gnn_tpu.serve import KTGNNPredictor
    from bridged_gnn_tpu.train.stage2 import build_model, train_ktgnn

    res = train_ktgnn(out["bridged_graph"], cfg.stage2)
    model = build_model(cfg.stage2, int(out["bridged_graph"]["y"].max()) + 1)
    predictor = KTGNNPredictor(
        model, {"params": res["params"], "batch_stats": res["batch_stats"]},
        out["bridged_graph"], to_undirected=True,
    )
    labels = predictor.predict_labels()
    print("served predictions:", labels[:10], "...")


if __name__ == "__main__":
    main()
