"""Where does stage-1 wall time go at pipeline scale (20k/15k, 40k pairs)?

Splits one scan chunk into: host numpy sampling, H2D transfer of the
stacked pair-index arrays over the tunnel, and the device scan dispatch.
Also times a no-eval train run end to end for cross-checking.

Usage: nohup python tools/probe_stage1_breakdown.py > tools/probe_stage1_breakdown.log 2>&1 &
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bridged_gnn_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import jax.numpy as jnp
import numpy as np

from bridged_gnn_tpu.data import dataset_conversion
from bridged_gnn_tpu.data.synthetic import make_sync_dataset
from bridged_gnn_tpu.train.samplers import PairEnumerator, PairEnumeratorCross
from bridged_gnn_tpu.train.stage1 import Stage1Config, train_adversarial

N_SRC, N_TAR, K = 20000, 15000, 10
SAMPLE = 40000

out = {"platform": jax.devices()[0].platform}

data = make_sync_dataset(
    "relational-intra", n_src=N_SRC, n_tar=N_TAR, dim=128,
    num_classes=8, avg_degree=10, seed=0,
)
src_d, tar_d, m_src, m_tar = dataset_conversion(dict(data), seed=0)

rng = np.random.default_rng(0)
enu_src = PairEnumerator(src_d, "train", rng)
enu_tar = PairEnumerator(tar_d, "train", rng)
enu_cross = PairEnumeratorCross(src_d, tar_d, "train", rng)
y_src = np.asarray(src_d["y"])
y_tar = np.asarray(tar_d["y"])


def sample_epoch():
    i1s, i2s = enu_src.sampling(8, SAMPLE)
    i1t, i2t = enu_tar.sampling(8, SAMPLE)
    i1c, i2c = enu_cross.sampling(8, SAMPLE)
    idxs = dict(
        src1=i1s.astype(np.int32), src2=i2s.astype(np.int32),
        tar1=i1t.astype(np.int32), tar2=i2t.astype(np.int32),
        cross1=i1c.astype(np.int32), cross2=i2c.astype(np.int32),
    )
    y_pairs = dict(
        src=(y_src[i1s] == y_src[i2s]).astype(np.float32),
        tar=(y_tar[i1t] == y_tar[i2t]).astype(np.float32),
        cross=(y_src[i1c] == y_tar[i2c]).astype(np.float32),
    )
    return idxs, y_pairs


# warm the samplers once
sample_epoch()

t0 = time.time()
samples = [sample_epoch() for _ in range(K)]
out["host_sampling_s_per_chunk"] = time.time() - t0

stacked_idxs = {
    k: np.stack([s[0][k] for s in samples]) for k in samples[0][0]
}
stacked_y = {
    k: np.stack([s[1][k] for s in samples]) for k in samples[0][1]
}
nbytes = sum(a.nbytes for a in stacked_idxs.values()) + sum(
    a.nbytes for a in stacked_y.values()
)
out["h2d_bytes_per_chunk"] = int(nbytes)

# cold + warm H2D
for tag in ("h2d_s_cold", "h2d_s_warm"):
    t0 = time.time()
    dev = jax.tree.map(jnp.asarray, (stacked_idxs, stacked_y))
    jax.block_until_ready(dev)
    out[tag] = time.time() - t0
    del dev

# full no-eval scan-mode run: 30 epochs in 3 chunks; first chunk carries
# the compile
cfg = Stage1Config(
    hidden_dim=128, num_epoch=30, start_eval_epoch=999, eval_per_epoch=10,
    sample_size=SAMPLE, sim_mode="mlp", backbone="mlp", max_class_num=8,
    scan_epochs=K, repeat=1,
)
t0 = time.time()
res = train_adversarial(src_d, tar_d, cfg)
out["train_noeval_30ep_s"] = time.time() - t0
out["throughput"] = res.get("throughput")

# same run with device-resident sampling (train/device_sampler.py)
cfg_dev = Stage1Config(**{**cfg.__dict__, "device_sampling": True})
t0 = time.time()
res_dev = train_adversarial(src_d, tar_d, cfg_dev)
out["train_noeval_30ep_device_sampling_s"] = time.time() - t0
out["throughput_device_sampling"] = res_dev.get("throughput")

# --- eval cost (VERDICT r3 item 4): the production recipe evaluates
# EVERY epoch from start_eval_epoch (eval_per_epoch=1, reference
# parity), so epochs 300-400 pay train-segment + eval dispatches. Time
# the per-split device evaluator (2 dispatches, 12 full-graph encodes)
# vs the fused both-splits form (1 dispatch, 2 encodes).
from bridged_gnn_tpu.graph import graph_from_dict
from bridged_gnn_tpu.train.stage1 import (
    DeviceStage1Evaluator,
    build_model,
)

variables = res_dev["variables"]
model = build_model(cfg_dev, src_d, tar_d)
g_src = graph_from_dict(src_d)
g_tar = graph_from_dict(tar_d)
ev = DeviceStage1Evaluator(
    model, g_src, None, g_tar, None, src_d, tar_d, cfg_dev
)
ev(variables, "val", 1); ev(variables, "test", 1)     # compile
ev.both(variables, 1)
for name, fn in (
    ("eval_per_split_s", lambda e: (ev(variables, "val", e),
                                    ev(variables, "test", e))),
    ("eval_both_s", lambda e: ev.both(variables, e)),
):
    t0 = time.time()
    for e in range(10):
        fn(e)
    out[name] = (time.time() - t0) / 10

# --- production-shaped run: 400 epochs, eval every epoch from 300
# (the office_amazon2dslr_tpu stage-1 shape at pipeline scale)
cfg_prod = Stage1Config(
    hidden_dim=128, num_epoch=400, start_eval_epoch=300, eval_per_epoch=1,
    sample_size=SAMPLE, sim_mode="mlp", backbone="mlp", max_class_num=8,
    scan_epochs=25, device_sampling=True, repeat=1,
)
t0 = time.time()
res_prod = train_adversarial(src_d, tar_d, cfg_prod)
out["train_prod_400ep_s"] = time.time() - t0
out["throughput_prod"] = res_prod.get("throughput")

print(json.dumps(out, indent=2))
with open("tools/probe_stage1_breakdown.json", "w") as f:
    json.dump(out, f, indent=2)
