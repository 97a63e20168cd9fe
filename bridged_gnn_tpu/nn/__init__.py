from bridged_gnn_tpu.nn.common import (  # noqa: F401
    Decoder,
    Discriminator,
    MaskedBatchNorm,
    MLPBackbone,
    pair_norm,
)
from bridged_gnn_tpu.nn.ktgnn import AdaptedConv, KTGNN, KTGNNNoDTC  # noqa: F401
from bridged_gnn_tpu.nn.stage1 import (  # noqa: F401
    AdversarialLearnerV2,
    SimilarV2,
    SourceLearnerV2,
    TargetLearnerAEV2,
)
