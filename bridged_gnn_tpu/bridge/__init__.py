from bridged_gnn_tpu.bridge.build import (  # noqa: F401
    check_cross_validity,
    check_within_validity,
    gen_bridged_graph,
    propose_cross_edges,
    propose_within_edges,
)
