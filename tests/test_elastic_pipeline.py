"""Elastic retry wrapper + one-call pipeline orchestration."""

import numpy as np
import pytest

from bridged_gnn_tpu.config import BridgeConfig, PipelineConfig
from bridged_gnn_tpu.pipeline import run_pipeline
from bridged_gnn_tpu.train.elastic import Heartbeat, is_transient, run_elastic
from bridged_gnn_tpu.train.stage1 import Stage1Config
from bridged_gnn_tpu.train.stage2 import Stage2Config


def test_retry_on_transient(tmp_path):
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("backend UNAVAILABLE: tunnel dropped")
        return {"ok": True}

    hb = str(tmp_path / "hb.json")
    out = run_elastic(flaky, max_retries=3, retry_delay_s=0.01,
                      heartbeat_path=hb)
    assert out == {"ok": True}
    assert calls["n"] == 3
    assert Heartbeat(hb).age() is not None


def test_no_retry_on_permanent():
    def broken():
        raise ValueError("shape mismatch (3,) vs (4,)")

    with pytest.raises(ValueError):
        run_elastic(broken, max_retries=3, retry_delay_s=0.01)
    assert not is_transient(ValueError("shape mismatch"))


def test_run_pipeline_sync(tmp_path):
    cfg = PipelineConfig(
        dataset_name="sync_relational-intra",
        stage1=Stage1Config(
            hidden_dim=16, num_epoch=12, start_eval_epoch=10,
            eval_per_epoch=2, max_class_num=4, sample_size=1600,
            eval_sample_size=1600,
        ),
        bridge=BridgeConfig(k_cross=5, k_within=0, row_block=128),
        stage2=Stage2Config(num_epoch=20, hidden=16, to_undirected=True),
    )
    out = run_pipeline(cfg, out_dir=str(tmp_path))
    assert out["stage2"]["test"] > 0.3
    assert (tmp_path / "sync_relational-intra_bridged_graph.npz").exists()
    h1, h2 = out["diagnostics"]["homophily"]
    assert np.isfinite(h1)


def test_pipeline_cli_config_file(tmp_path):
    """``python -m bridged_gnn_tpu.pipeline --config cfg.json`` runs the
    same tiny sync pipeline through the CLI surface."""
    from bridged_gnn_tpu.pipeline import main

    cfg = PipelineConfig(
        dataset_name="sync_relational-intra",
        stage1=Stage1Config(
            hidden_dim=16, num_epoch=12, start_eval_epoch=10,
            eval_per_epoch=2, max_class_num=4, sample_size=1600,
            eval_sample_size=1600,
        ),
        bridge=BridgeConfig(k_cross=5, k_within=0, row_block=128),
        stage2=Stage2Config(num_epoch=20, hidden=16, to_undirected=True),
    )
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(cfg.to_json())
    out = main(["--config", str(cfg_path), "--out_dir", str(tmp_path)])
    assert out["stage2"]["test"] > 0.3
    assert (tmp_path / "sync_relational-intra_bridged_graph.npz").exists()


def test_tpu_recipe_roundtrip():
    """The production-TPU recipe survives JSON serialization and keeps
    its production knobs (scan loops, approx selector, bf16 kernels)."""
    from bridged_gnn_tpu.config import RECIPES

    cfg = RECIPES["office_amazon2dslr_tpu"]
    back = PipelineConfig.from_json(cfg.to_json())
    assert back == cfg
    assert back.bridge.approx_recall == 0.95
    assert back.stage1.scan_epochs > 0 and back.stage2.scan_epochs > 0
    assert back.stage2.matmul_precision == "default"
    # same science as the parity recipe: only TPU execution knobs differ
    base = RECIPES["office_amazon2dslr"]
    assert back.dataset_name == base.dataset_name
    assert back.bridge.k_cross == base.bridge.k_cross
    assert back.stage2.hidden == base.stage2.hidden
