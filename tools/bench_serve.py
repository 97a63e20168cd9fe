"""Serving-path benchmark: SimilarityScorer top-k QPS and KTGNNPredictor
full-graph latency on the shipped office a2d artifacts.

Loads the reference's raw AdvLearner checkpoint + bridged graph (the same
artifacts the HTTP CLI serves), embeds the corpus once, then measures:
  * topk_sources over query batches of 1 / 32 / 256 rows (warm, jitted);
  * KTGNNPredictor.predict() full-graph latency (3 heads).

Runs on whichever backend JAX selects (CPU fallback-safe; pass
JAX_PLATFORMS=cpu to pin). Writes results_serve_<platform>.json.

Usage: nohup python tools/bench_serve.py > tools/bench_serve.log 2>&1 &
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bridged_gnn_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import numpy as np

from bridged_gnn_tpu.io.ckpt_import import load_adv_learner_variables
from bridged_gnn_tpu.io.pyg_compat import (
    load_pyg_data_dict,
    load_torch_state_dict,
)
from bridged_gnn_tpu.nn.stage1 import AdversarialLearnerV2
from bridged_gnn_tpu.serve import KTGNNPredictor, SimilarityScorer
from bridged_gnn_tpu.train.stage2 import (
    Stage2Config,
    build_model,
    train_ktgnn,
)

CKPT = "/root/reference/ckpt/model_AdvLearner_office_amazon2dslr_best.ckpt"
GRAPH = (
    "/root/reference/data_bridged_graph/"
    "office_amazon2dslr_bridged_graph.dat"
)

res = {"platform": jax.devices()[0].platform}
data = load_pyg_data_dict(GRAPH)
central = np.asarray(data["central_mask"])
x = np.asarray(data["x"])
x_src = x[central]
x_tar = x[~central]

model = AdversarialLearnerV2(
    dim_in_src=x.shape[1], dim_in_tar=x.shape[1],
    num_classes_src=int(data["y"].max()) + 1,
    num_classes_tar=int(data["y"].max()) + 1,
    dim_hidden=128, backbone="mlp", sim_mode="mlp",
)
variables = load_adv_learner_variables(
    model, load_torch_state_dict(CKPT)
)

from bridged_gnn_tpu.graph import build_graph  # noqa: E402

loops = np.arange(len(x_src), dtype=np.int64)
g_src = build_graph(x_src, np.stack([loops, loops]))
t0 = time.time()
scorer = SimilarityScorer(model, variables, g_src)
res["scorer_build_s"] = round(time.time() - t0, 3)

rng = np.random.default_rng(0)
for bs in (1, 32, 256):
    q = x_tar[rng.integers(0, len(x_tar), size=bs)]
    scorer.topk_sources(q, k=5)          # compile + warm
    iters = 20
    t0 = time.time()
    for _ in range(iters):
        vals, idx = scorer.topk_sources(q, k=5)
    dt = (time.time() - t0) / iters
    res[f"topk_bs{bs}_ms"] = round(dt * 1e3, 3)
    res[f"topk_bs{bs}_qps"] = round(bs / dt, 1)

# stage-2 predictor: quick-train a model on the same graph, then measure
# the jitted full-graph forward
cfg = Stage2Config(num_epoch=5, hidden=64, to_undirected=True,
                   scan_epochs=5)
trained = train_ktgnn(data, cfg)
pred = KTGNNPredictor(
    build_model(cfg, int(np.asarray(data["y"]).max()) + 1),
    {"params": trained["params"], "batch_stats": trained["batch_stats"]},
    data,
)
pred.predict()                            # compile + warm
iters = 20
t0 = time.time()
for _ in range(iters):
    out = pred.predict()
dt = (time.time() - t0) / iters
res["predict_fullgraph_ms"] = round(dt * 1e3, 3)
res["predict_nodes_per_s"] = round(x.shape[0] / dt)

print(json.dumps(res, indent=2))
with open(f"results_serve_{res['platform']}.json", "w") as f:
    json.dump(res, f, indent=2)
