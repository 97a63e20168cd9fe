from bridged_gnn_tpu.utils.diagnostics import (  # noqa: F401
    edge_homophily,
    eval_bridged_graph,
    eval_homophily,
)
from bridged_gnn_tpu.utils.seeding import set_random_seed  # noqa: F401
