"""Tracing/profiling subsystem (SURVEY §5.1 — absent in the reference).

Covers the `utils.profiling.trace` capture primitive and its CLI
exposure (`--profile_dir` on the stage-2 entry point): both must leave
an XProf-viewable trace on disk.
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from bridged_gnn_tpu.data.synthetic import make_sync_dataset
from bridged_gnn_tpu.io.serialize import save_graph_npz
from bridged_gnn_tpu.utils.profiling import StepTimer, annotate, trace


def _trace_files(log_dir):
    return glob.glob(os.path.join(log_dir, "plugins", "profile", "*", "*"))


def test_trace_captures_jitted_work(tmp_path):
    log_dir = str(tmp_path / "tr")
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64))
    with trace(log_dir):
        with annotate("probe-matmul"):
            f(x).block_until_ready()
    assert _trace_files(log_dir), "profiler trace produced no artifacts"


def test_stage2_cli_profile_dir(tmp_path):
    from bridged_gnn_tpu.cli.main_graph_knowledge_transfer import (
        build_argparser, main)

    d = make_sync_dataset("relational-intra", n_src=120, n_tar=80, dim=12,
                          num_classes=3, seed=2)
    rng = np.random.default_rng(0)
    r = rng.random(d["x"].shape[0])
    d["train_mask"] = r < 0.6
    d["val_mask"] = (r >= 0.6) & (r < 0.8)
    d["test_mask"] = r >= 0.8
    path = str(tmp_path / "g.npz")
    save_graph_npz(path, d)

    log_dir = str(tmp_path / "prof")
    args = build_argparser().parse_args([
        "--path_data", path, "--num_epoch", "3", "--hidden_dim", "16",
        "--to_undirected", "--profile_dir", log_dir,
        "--ckpt_dir", str(tmp_path),
    ])
    res = main(args)
    assert "best" in res
    assert _trace_files(log_dir), "CLI --profile_dir produced no trace"


def test_steptimer_throughput():
    t = StepTimer(num_edges=1000, warmup=1)
    for _ in range(4):
        with t:
            pass
    s = t.summary()
    assert s["steps"] == 4
    assert s["edges_per_sec"] > 0
