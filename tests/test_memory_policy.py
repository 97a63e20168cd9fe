"""Three-tier auto HBM policy (VERDICT r3 item 7).

resolve_memory_mode picks the fastest tier whose calibrated estimate
fits ~80% of device HBM: plain (kernel residuals, ~7.5 msg-space
copies, r3-OOM-calibrated) → xla_plain (~5.2 copies, round-4 on-chip
probe: the 524k plain step EXECUTED at 12.66 G where the old 2-tier
policy engaged lean) → lean. The tier thresholds are exercised here
with an injected HBM limit; the on-chip never-OOM guarantee is pinned
in tests/test_tpu_lane.py.
"""

import numpy as np
import pytest

from bridged_gnn_tpu.graph import graph_from_dict, with_self_loops
from bridged_gnn_tpu.ops.spmm import adjacency_from_graph
from bridged_gnn_tpu.train.stage2 import (
    Stage2Config,
    build_model,
    estimate_plain_hbm,
    resolve_memory_mode,
    train_ktgnn,
)


@pytest.fixture(scope="module")
def graph_and_adj():
    rng = np.random.default_rng(0)
    n, e = 4096, 65536
    data = dict(
        x=rng.normal(size=(n, 128)).astype(np.float32),
        edge_index=rng.integers(0, n, size=(2, e)),
        y=rng.integers(0, 8, size=n),
        train_mask=np.ones(n, dtype=bool),
        val_mask=np.zeros(n, dtype=bool),
        test_mask=np.zeros(n, dtype=bool),
        central_mask=np.arange(n) % 2 == 0,
    )
    g = with_self_loops(graph_from_dict(data))
    return g, adjacency_from_graph(g, method="blocked", node_block=128)


def test_estimates_ordered(graph_and_adj):
    g, adj = graph_and_adj
    cfg = Stage2Config(hidden=64, message_dtype="bfloat16")
    e_kernel = estimate_plain_hbm(g, adj, cfg, kernel_path=True)
    e_xla = estimate_plain_hbm(g, adj, cfg, kernel_path=False)
    assert e_kernel > e_xla > 0


def test_auto_tiers_by_injected_limit(graph_and_adj, monkeypatch):
    g, adj = graph_and_adj
    cfg = Stage2Config(hidden=64, message_dtype="bfloat16")
    # force the kernel-tier consideration regardless of host backend
    from bridged_gnn_tpu.ops import pallas_fused

    monkeypatch.setattr(pallas_fused, "auto_kernel", lambda: True)
    e_kernel = estimate_plain_hbm(g, adj, cfg, kernel_path=True)
    e_xla = estimate_plain_hbm(g, adj, cfg, kernel_path=False)
    # generous limit → plain
    assert resolve_memory_mode(
        g, adj, cfg, hbm_limit=int(e_kernel / 0.8) + 1, on_tpu=True
    ) == "plain"
    # between the two estimates → xla_plain (the new middle tier)
    mid = int(((e_kernel + e_xla) / 2) / 0.8)
    assert resolve_memory_mode(
        g, adj, cfg, hbm_limit=mid, on_tpu=True
    ) == "xla_plain"
    # below both → lean
    assert resolve_memory_mode(
        g, adj, cfg, hbm_limit=int(e_xla / 2), on_tpu=True
    ) == "lean"
    # kernels unavailable → the kernel tier is skipped
    monkeypatch.setattr(pallas_fused, "auto_kernel", lambda: False)
    assert resolve_memory_mode(
        g, adj, cfg, hbm_limit=int(e_kernel / 0.8) + 1, on_tpu=True
    ) == "xla_plain"
    # explicit values pass through
    for v in ("plain", "xla_plain", "lean"):
        cfg2 = Stage2Config(memory_policy=v)
        assert resolve_memory_mode(g, adj, cfg2, on_tpu=True) == v
    # non-TPU backends stay plain under auto
    assert resolve_memory_mode(g, adj, cfg, on_tpu=False) == "plain"


def test_modes_share_param_tree_and_match_numerically(graph_and_adj):
    """All three tiers are the same function with the same parameters —
    checkpoints transfer and losses agree."""
    import jax

    g, adj = graph_and_adj
    cfg = Stage2Config(hidden=16, dropout=0.0)
    trees = {}
    outs = {}
    v0 = None
    for mode in ("plain", "xla_plain", "lean"):
        m = build_model(cfg, 8, mode=mode)
        v = m.init(jax.random.PRNGKey(0), g, adj, False)
        trees[mode] = jax.tree_util.tree_structure(v["params"])
        if v0 is None:
            v0 = v
        outs[mode] = m.apply(v0, g, adj, False)
    assert trees["plain"] == trees["xla_plain"] == trees["lean"]
    for mode in ("xla_plain", "lean"):
        for a, b in zip(outs["plain"][:3], outs[mode][:3]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-6)


def test_train_ktgnn_accepts_xla_plain(graph_and_adj):
    rng = np.random.default_rng(1)
    n = 300
    data = dict(
        x=rng.normal(size=(n, 16)).astype(np.float32),
        edge_index=rng.integers(0, n, size=(2, 1500)),
        y=rng.integers(0, 4, size=n),
        train_mask=rng.random(n) < 0.5,
        val_mask=rng.random(n) < 0.2,
        test_mask=rng.random(n) < 0.2,
        central_mask=np.arange(n) % 2 == 0,
    )
    res = train_ktgnn(data, Stage2Config(
        hidden=16, num_epoch=4, dropout=0.0, memory_policy="xla_plain",
    ))
    losses = [h["loss"] for h in res["history"]]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
