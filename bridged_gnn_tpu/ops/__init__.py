from bridged_gnn_tpu.ops.segment import (  # noqa: F401
    segment_mean,
    segment_softmax,
    segment_sum,
)
from bridged_gnn_tpu.ops.spmm import (  # noqa: F401
    Adjacency,
    build_adjacency,
    spmm,
)
from bridged_gnn_tpu.ops.sddmm import (  # noqa: F401
    blockwise_pair_scores_topk,
)
