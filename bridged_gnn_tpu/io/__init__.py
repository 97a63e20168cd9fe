from bridged_gnn_tpu.io.pyg_compat import (  # noqa: F401
    load_pyg_data_dict,
    load_torch_state_dict,
)
from bridged_gnn_tpu.io.serialize import (  # noqa: F401
    load_graph_npz,
    save_graph_npz,
)
