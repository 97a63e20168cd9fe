"""Unified typed configuration tree for the full two-stage pipeline.

Replaces the reference's two argparse surfaces plus its scattered
hardcoded hyperparameters (SURVEY §5.6) with one dataclass tree that
serializes to/from JSON. The CLI front ends populate this tree; programmatic
users construct it directly.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict

from bridged_gnn_tpu.train.stage1 import Stage1Config
from bridged_gnn_tpu.train.stage2 import Stage2Config


@dataclasses.dataclass
class BridgeConfig:
    """Bridge-construction knobs (reference main_bridged_graph.py flags)."""

    k_cross: int = 20
    k_within: int = 6
    check_cross: bool = False
    check_within: bool = False
    thres_conf_quantile: float = 0.1
    thres_feat_sim: float = 0.8
    epsilon: float = 0.5          # accepted and unused (reference parity)
    row_block: int = 512
    # None = exact top-k (reference torch.topk parity). A float in (0,1]
    # switches proposal selection to TPU-native lax.approx_max_k with that
    # per-element recall target — 11x faster sweeps at 0.95
    # (tools/probe_topk_cosine.json); production knob
    approx_recall: "float | None" = None
    # mlp mode only: screen columns with the MXU-speed cosine of the raw
    # stage-1 embeddings, exact pair-MLP scores only at the top-N
    # candidates per row (ops/sddmm.py::blockwise_rerank_topk). The exact
    # head is VPU-elementwise-bound (37x below the cosine sweep); recall
    # of the screen is model/data-dependent — measured on the shipped
    # office checkpoints in tools/probe_mlp_rerank.json. None = off
    rerank_candidates: "int | None" = None


@dataclasses.dataclass
class PipelineConfig:
    dataset_name: str = "sync_unrelational"
    data_root: str = "../datasets"
    stage1: Stage1Config = dataclasses.field(default_factory=Stage1Config)
    bridge: BridgeConfig = dataclasses.field(default_factory=BridgeConfig)
    stage2: Stage2Config = dataclasses.field(default_factory=Stage2Config)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "PipelineConfig":
        raw = json.loads(text)
        return cls(
            dataset_name=raw.get("dataset_name", cls.dataset_name),
            data_root=raw.get("data_root", "../datasets"),
            stage1=Stage1Config(**raw.get("stage1", {})),
            bridge=BridgeConfig(**raw.get("bridge", {})),
            stage2=Stage2Config(**raw.get("stage2", {})),
        )

    @classmethod
    def from_file(cls, path: str) -> "PipelineConfig":
        with open(path) as f:
            return cls.from_json(f.read())


# Pinned recipes mirroring reference run.sh:1-31
RECIPES: Dict[str, PipelineConfig] = {
    # the a2d reference recipe with every production-TPU knob engaged:
    # scan-mode loops (one dispatch per epoch segment, device-side eval
    # counts), device-resident pair sampling (zero H2D per segment),
    # Mosaic attention kernels via non-parity precision, and the
    # approx_max_k bridge selector (recall 0.95, 9x sweep speedup)
    "office_amazon2dslr_tpu": PipelineConfig(
        dataset_name="office_amazon2dslr",
        stage1=Stage1Config(hidden_dim=128, num_epoch=400,
                            start_eval_epoch=300, sim_mode="mlp",
                            backbone="mlp", seed=0, scan_epochs=25,
                            device_sampling=True),
        bridge=BridgeConfig(k_within=3, k_cross=20, check_within=True,
                            check_cross=True, approx_recall=0.95,
                            # cosine-prescreen + exact-MLP rerank:
                            # measured recall 0.997+ on both shipped
                            # office ckpts at 256 candidates, 2.6-5.6x
                            # sweep speedup (tools/probe_mlp_rerank.json)
                            rerank_candidates=256),
        stage2=Stage2Config(num_layer=2, hidden=64, to_undirected=True,
                            scan_epochs=50, matmul_precision="default",
                            message_dtype="bfloat16"),
    ),
    "office_amazon2dslr": PipelineConfig(
        dataset_name="office_amazon2dslr",
        stage1=Stage1Config(hidden_dim=128, num_epoch=400,
                            start_eval_epoch=300, sim_mode="mlp",
                            backbone="mlp", seed=0),
        bridge=BridgeConfig(k_within=3, k_cross=20, check_within=True,
                            check_cross=True),
        stage2=Stage2Config(num_layer=2, hidden=64, to_undirected=True),
    ),
    "office_amazon2webcam": PipelineConfig(
        dataset_name="office_amazon2webcam",
        stage1=Stage1Config(hidden_dim=128, num_epoch=400,
                            start_eval_epoch=300, seed=0),
        bridge=BridgeConfig(k_within=3, k_cross=8, check_within=True,
                            check_cross=True),
        stage2=Stage2Config(num_layer=2, hidden=128, to_undirected=True),
    ),
    "twitter_unrelational": PipelineConfig(
        dataset_name="twitter_unrelational",
        stage1=Stage1Config(num_epoch=400, start_eval_epoch=300, seed=0),
        bridge=BridgeConfig(k_within=6, k_cross=20, check_within=True),
        stage2=Stage2Config(num_layer=2, hidden=128, to_undirected=True),
    ),
    "fb_hamilton2caltech": PipelineConfig(
        dataset_name="fb_hamilton2caltech",
        stage1=Stage1Config(hidden_dim=64, num_epoch=400,
                            start_eval_epoch=300, seed=0),
        bridge=BridgeConfig(k_within=0, k_cross=50, check_within=True,
                            check_cross=True, thres_feat_sim=0.0),
        stage2=Stage2Config(num_epoch=300, num_layer=2, hidden=64,
                            to_undirected=True, no_dtc=True,
                            model_name="GraphSAGE", use_scheduler=False),
    ),
    "fb_howard2simmons": PipelineConfig(
        dataset_name="fb_howard2simmons",
        stage1=Stage1Config(hidden_dim=64, num_epoch=400,
                            start_eval_epoch=300, eval_per_epoch=5, seed=0),
        bridge=BridgeConfig(k_within=0, k_cross=50, check_within=True,
                            check_cross=True, thres_feat_sim=0.0),
        stage2=Stage2Config(num_epoch=200, num_layer=2, hidden=64),
    ),
    "sync_unrelational": PipelineConfig(
        dataset_name="sync_unrelational",
        stage1=Stage1Config(num_epoch=100, start_eval_epoch=80,
                            eval_per_epoch=5, seed=0),
        bridge=BridgeConfig(k_within=3, k_cross=10),
        stage2=Stage2Config(num_layer=2, hidden=64, to_undirected=True),
    ),
}
