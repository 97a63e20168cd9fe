from bridged_gnn_tpu.data.datasets import (  # noqa: F401
    dataset_conversion,
    dataset_split,
    prepare_datasets,
)
from bridged_gnn_tpu.data.synthetic import make_sync_dataset  # noqa: F401
