from bridged_gnn_tpu.parallel.mesh import make_mesh  # noqa: F401
from bridged_gnn_tpu.parallel.edgeshard import (  # noqa: F401
    make_sharded_ktgnn_train_step,
    pad_graph_edges_for_sharding,
    sharded_spmm,
)
from bridged_gnn_tpu.parallel.topk import sharded_pair_topk  # noqa: F401
from bridged_gnn_tpu.parallel.halopart import (  # noqa: F401
    build_halo_partition,
    make_halo_ktgnn_train_step,
    wire_bytes_per_layer,
)
from bridged_gnn_tpu.parallel.stage2_runtime import (  # noqa: F401
    EdgeShardStage2Backend,
    HaloStage2Backend,
    make_stage2_backend,
)
