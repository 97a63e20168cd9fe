"""Capacity-scaling artifact assertions (VERDICT r3 item 2).

tools/bench_ktgnn_scale_multichip.py trains KT-GNN configs past the
single-chip ceiling (1M nodes / 17.8M edges OOMs on one v5e at 19.0 G,
results_ktgnn_scale_r3.json) through the FIRST-CLASS multi-device
runtime on the virtual 8-device mesh and commits
results_ktgnn_scale_multichip.json. This test pins the artifact's
claims: a >10M-edge point actually trained (loss finite and improving,
eval sane) and the per-shard estimator tracked the partition it built.
"""

import json
import os

import numpy as np
import pytest

ART = os.path.join(os.path.dirname(__file__), "..",
                   "results_ktgnn_scale_multichip.json")


@pytest.fixture(scope="module")
def artifact():
    if not os.path.exists(ART):
        pytest.skip("capacity artifact not yet committed")
    with open(ART) as f:
        return json.load(f)


def test_past_ceiling_point_trained(artifact):
    big = [p for p in artifact["points"] if p["edges"] > 10_000_000]
    # HARD assertion (VERDICT r4 weak #8): the >10M-edge trained point
    # exists (round 5, 600k/10.2M lean on the virtual 8-mesh with the
    # swapfile backstop — DESIGN.md §10); regressing to a skip would
    # hide losing the capacity north star.
    assert big, "capacity artifact lost its >10M-edge trained point"
    for p in big:
        losses = p["losses"]
        assert all(np.isfinite(losses)), losses
        assert losses[-1] < losses[0], "loss did not improve"
        for k in ("test", "val", "train"):
            assert 0.0 <= p["best"][k] <= 1.0
        assert p["n_shards"] >= 8


def test_per_shard_footprint_shrinks(artifact):
    """The halo partition's reason to exist: per-shard dst slots a small
    fraction of the global edge count (clustered cut), and the per-shard
    estimate far below the single-chip 19 G OOM point."""
    for p in artifact["points"]:
        if p["edges"] <= 10_000_000:
            continue
        part = p["partition"]
        slots = part["dst_slots_per_shard"]
        # slots within ~3x of the shard's real edge share
        assert slots < 3.0 * p["edges"] / p["n_shards"]
        assert p["est_plain_hbm_per_shard_gib"] < 19.0 / 2


def test_estimator_vs_xla_accounting(artifact):
    """XLA's buffer-assignment accounting for the sharded step must not
    exceed the analytic per-shard estimate times the shard count (the
    estimate is per shard; the virtual-mesh program is compiled across
    all 8) — i.e. the estimator is a safe upper bound at this scale."""
    for p in artifact["points"]:
        ma = p.get("xla_memory_analysis")
        if not ma:
            continue
        est_total = p["est_plain_hbm_per_shard_gib"] * p["n_shards"]
        assert ma["temp_bytes"] / 2**30 <= est_total * 1.25, (
            p["nodes"], ma["temp_bytes"] / 2**30, est_total
        )
