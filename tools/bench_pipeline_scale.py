"""Production-scale two-stage pipeline on one chip (round-1 rerun with
the round-2 production knobs).

35k-node synthetic VS-graph (20k source / 15k target, dim 128, RD_intra)
— the same scale as results_large_pipeline_tpu.json (473 s round 1).
Round-2 knobs: approx_max_k bridge selector (--topk_recall 0.95
equivalent) and matmul_precision='default' in stage 2, which auto-engages
the Mosaic attention kernels on the TPU backend
(ops/pallas_fused.auto_kernel).

Phases timed separately: stage-1 train, bridge construction (propose +
filters + merge), stage-2 train. Writes results_large_pipeline_tpu_r4.json
(at full scale; _smoke.json on reduced sizes).

Usage: nohup python tools/bench_pipeline_scale.py > log 2>&1 &
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bridged_gnn_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import numpy as np

from bridged_gnn_tpu.bridge import gen_bridged_graph
from bridged_gnn_tpu.data import dataset_conversion
from bridged_gnn_tpu.data.synthetic import make_sync_dataset
from bridged_gnn_tpu.graph import graph_from_dict
from bridged_gnn_tpu.train.stage1 import Stage1Config, train_adversarial
from bridged_gnn_tpu.train.stage2 import Stage2Config, train_ktgnn
from bridged_gnn_tpu.utils import eval_bridged_graph, eval_homophily

N_SRC = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
N_TAR = int(sys.argv[2]) if len(sys.argv) > 2 else 15000
EPOCHS1 = 60 if N_SRC > 5000 else 8
EPOCHS2 = 100 if N_SRC > 5000 else 10
# smoke lane must still fire stage-1 eval (epoch % eval_per_epoch == 0
# within EPOCHS1), or stage1_cross_f1 stays at the sentinel
EVAL_EVERY1 = 10 if EPOCHS1 > 20 else 2
OUT = ("results_large_pipeline_tpu_r4.json" if N_SRC > 5000
       else "/tmp/pipeline_smoke.json")

t_all = time.time()
data = make_sync_dataset(
    "relational-intra", n_src=N_SRC, n_tar=N_TAR, dim=128,
    num_classes=8, avg_degree=10, seed=0,
)
src_d, tar_d, m_src, m_tar = dataset_conversion(dict(data), seed=0)

res = {}
t0 = time.time()
cfg1 = Stage1Config(
    hidden_dim=128, num_epoch=EPOCHS1,
    start_eval_epoch=max(EPOCHS1 - 20, 2), eval_per_epoch=EVAL_EVERY1,
    sample_size=40000, sim_mode="mlp", backbone="mlp", max_class_num=8,
    scan_epochs=10,               # round-2 TPU-native loop: one dispatch
                                  # per 10-epoch segment instead of one
                                  # host round trip per epoch
    device_sampling=True,         # pairs drawn inside the scan body +
                                  # counts-based device eval: zero H2D
                                  # per segment (train/device_sampler.py)
)
res1 = train_adversarial(src_d, tar_d, cfg1)
res["stage1_s"] = time.time() - t0
res["stage1_throughput"] = res1.get("throughput")
res["stage1_cross_f1"] = float(res1["best"]["val"][2])

t0 = time.time()
g_src = graph_from_dict(src_d)
g_tar = graph_from_dict(tar_d)
merged = gen_bridged_graph(
    res1["model"], res1["variables"], g_src, None, g_tar, None,
    m_src, m_tar, k_cross=20, k_within=3,
    check_cross=True, check_within=False,
    thres_conf_quantile=0.1, thres_feat_sim=0.0,
    sim_mode="mlp", row_block=512,
    approx_recall=0.95,           # round-2 production selector
)
res["bridge_s"] = time.time() - t0
# warm repeat: first call is cold-compile dominated on this terminal
# (three distinct top-k grid shapes compile serially); the steady-state
# number is what a production sweep over many graphs would see
t0 = time.time()
gen_bridged_graph(
    res1["model"], res1["variables"], g_src, None, g_tar, None,
    m_src, m_tar, k_cross=20, k_within=3,
    check_cross=True, check_within=False,
    thres_conf_quantile=0.1, thres_feat_sim=0.0,
    sim_mode="mlp", row_block=512, approx_recall=0.95,
)
res["bridge_warm_s"] = time.time() - t0
res["bridged_edges"] = int(merged["edge_index"].shape[1])
h1, h2 = eval_homophily(merged)
res["homophily"] = float(h1)
res["local_homophily_test"] = float(eval_bridged_graph(merged))

t0 = time.time()
cfg2 = Stage2Config(
    num_epoch=EPOCHS2, hidden=64, to_undirected=True,
    matmul_precision="default",   # auto-engages the Mosaic kernels on TPU
    message_dtype="bfloat16",     # halve gather bytes on the hot path
    adjacency_method="blocked", log_every=50,
    scan_epochs=25,               # lax.scan epochs: per-epoch eval preds
                                  # stream out as stacked arrays, one D2H
                                  # per chunk instead of per epoch
)
res2 = train_ktgnn(merged, cfg2)
res["stage2_s"] = time.time() - t0
res["stage2_test"] = float(res2["best"]["test"])
res["stage2_s_per_epoch"] = float(res2["mean_epoch_time"])

res["total_s"] = time.time() - t_all
res["round1_total_s"] = 473.4  # results_large_pipeline_tpu.json
res["round2_total_s"] = 489.9  # results_large_pipeline_tpu_r2.json
res["round3_total_s"] = 489.9  # results_large_pipeline_tpu_r3.json (stage1 134.9 / bridge 76.4 / stage2 236.5)
print(json.dumps(res, indent=2))
with open(OUT, "w") as f:
    json.dump(res, f, indent=2)
