"""Multi-chip KT-GNN training with the halo row partition.

Each device owns a contiguous block of node rows; per layer it exchanges
only the *boundary* sender features its edges need (all_to_all over ICI)
and runs the fused attention conv on its local padded edge layout —
wire bytes scale with the partition cut, not with N·D
(parallel/halopart.py, SURVEY §2c item 1).

Runs anywhere: on a TPU slice this uses the real devices; on CPU set

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/multichip.py

to simulate 8 devices. The same script is the template for multi-host
pods — replace make_mesh with parallel.multihost.make_pod_mesh after
parallel.multihost.init_distributed().
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bridged_gnn_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import jax
import numpy as np

from bridged_gnn_tpu.data.synthetic import make_sync_dataset
from bridged_gnn_tpu.graph import graph_from_dict, with_self_loops
from bridged_gnn_tpu.nn.ktgnn import KTGNN
from bridged_gnn_tpu.ops.spmm import adjacency_from_graph
from bridged_gnn_tpu.parallel import make_mesh
from bridged_gnn_tpu.parallel.halopart import (
    build_halo_partition,
    make_halo_ktgnn_train_step,
    wire_bytes_per_layer,
)
from bridged_gnn_tpu.train.optim import torch_adam
from bridged_gnn_tpu.train.stage2 import Stage2Config


def main():
    n_dev = len(jax.devices())
    print(f"devices: {n_dev} × {jax.devices()[0].platform}")

    # synthetic bridged graph (a real one comes from the stage-1 CLI or
    # io.load_graph_npz / io.pyg_compat.load_pyg_data_dict)
    data = make_sync_dataset(
        "relational-intra", n_src=2000, n_tar=1500, dim=64,
        num_classes=6, avg_degree=8, seed=0,
    )
    g = with_self_loops(graph_from_dict(dict(data)))

    # what the partition costs on the wire, per layer, vs edge sharding
    part = build_halo_partition(g, n_dev)
    acct = wire_bytes_per_layer(part, d=64)
    print(
        f"halo bytes/layer: {acct['halo_bytes']:,} vs edge-shard "
        f"{acct['edgeshard_bytes']:,} ({acct['ratio']:.1f}x fewer)"
    )

    cfg = Stage2Config(hidden=64, use_scheduler=False)
    model = KTGNN(num_classes=6, layer_num=2, hidden=64)
    adj = adjacency_from_graph(g, method="gather")  # init only
    variables = model.init(jax.random.PRNGKey(0), g, adj, False)
    params, bs = variables["params"], variables["batch_stats"]

    mesh = make_mesh(n_dev)
    train_step, _ = make_halo_ktgnn_train_step(mesh, model, g, cfg)
    tx = torch_adam(cfg.lr, weight_decay=cfg.weight_decay)
    opt_state = tx.init(params)

    key = jax.random.PRNGKey(7)
    for epoch in range(1, 11):
        key, k = jax.random.split(key)
        params, bs, opt_state, loss = train_step(params, bs, opt_state, k)
        print(f"epoch {epoch:02d} loss {float(loss):.4f}")
    assert np.isfinite(float(loss))
    print("halo-partitioned training OK")


if __name__ == "__main__":
    main()
