from bridged_gnn_tpu.train.metrics import eval_metric  # noqa: F401
from bridged_gnn_tpu.train.stage2 import Stage2Config, train_ktgnn  # noqa: F401
