"""bridged_gnn_tpu — a TPU-native Knowledge Bridge Learning (Bridged-GNN) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
Bridged-GNN (CIKM 2023) codebase:

  * Stage 1 — bridged-graph learning: adversarial similarity learner over a
    source graph and a target graph, dense all-pairs similarity + top-k edge
    proposal (blocked SDDMM + device-side top-k), validity filtering, graph
    merge → "bridged graph".
  * Stage 2 — knowledge-transfer GNN: KT-GNN (domain-adapted attention message
    passing with three classifier heads + KL distillation) and a baseline GNN
    zoo, trained full-batch on the bridged graph.

Everything is built TPU-first: static shapes with padding masks, MXU-friendly
dense/block-sparse aggregation, XLA segment ops with Pallas kernels for the
hot paths, and `shard_map` device-mesh parallelism for multi-chip scale.
"""

__version__ = "0.1.0"

import jax as _jax

# Parity with the fp32 reference requires true-fp32 matmuls; the TPU default
# (bf16 passes) is opted into explicitly on perf paths by passing bf16 data.
_jax.config.update("jax_default_matmul_precision", "highest")

from bridged_gnn_tpu.graph import Graph, build_graph  # noqa: F401
