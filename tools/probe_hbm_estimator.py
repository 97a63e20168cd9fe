"""Calibrate estimate_plain_hbm across (hidden, message_dtype, size)
corners (VERDICT r3 item 7).

The auto memory policy's estimator was fitted at ONE point (20.65 G at
524k nodes, hidden 64, bf16 messages). This probe AOT-compiles the
PLAIN production train step (same structure as train/stage2.py:
value_and_grad over the KTGNN loss + torch-adam update, layouts as jit
arguments) at a grid of corners and records XLA's own accounting
(Compiled.memory_analysis().temp_size_in_bytes — the quantity OOM
reports cite) next to the estimator. Compile-only: no step runs, no OOM
risk, ~40-90 s per corner on the tunneled chip.

Usage: nohup python tools/probe_hbm_estimator.py > tools/probe_hbm_estimator.log 2>&1 &
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from bridged_gnn_tpu.utils.platform import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from bridged_gnn_tpu.graph import build_graph  # noqa: E402
from bridged_gnn_tpu.nn.ktgnn import KTGNN  # noqa: E402
from bridged_gnn_tpu.ops.blocked_segment import (  # noqa: E402
    blocked_ops_leaves,
    rebind_blocked_ops,
)
from bridged_gnn_tpu.ops.spmm import adjacency_from_graph  # noqa: E402
from bridged_gnn_tpu.train.optim import torch_adam  # noqa: E402
from bridged_gnn_tpu.train.stage2 import (  # noqa: E402
    Stage2Config,
    estimate_plain_hbm,
    kl_batchmean,
    masked_nll,
)

D_IN = 128
DEG = 17


def probe(n_nodes: int, hidden: int, msg_dtype):
    rng = np.random.default_rng(0)
    e = n_nodes * DEG
    s = rng.integers(0, n_nodes, size=e).astype(np.int64)
    r = rng.integers(0, n_nodes, size=e).astype(np.int64)
    g = build_graph(
        rng.normal(size=(n_nodes, D_IN)).astype(np.float32),
        np.stack([s, r]),
        y=rng.integers(0, 8, size=n_nodes).astype(np.int64),
        train_mask=rng.random(n_nodes) < 0.6,
        central_mask=np.arange(n_nodes) % 2 == 0,
    )
    # the production TPU config: Mosaic kernels auto-engage → nb=128
    adj = adjacency_from_graph(g, method="blocked", node_block=128)
    assert adj.fast_fn is not None
    cfg = Stage2Config(hidden=hidden, message_dtype=msg_dtype)
    est = estimate_plain_hbm(g, adj, cfg)

    model = KTGNN(num_classes=8, layer_num=2, hidden=hidden,
                  msg_dtype=msg_dtype)
    lay_leaves = blocked_ops_leaves(adj.fast_fn)
    meta_ops = adj.fast_fn

    variables = jax.eval_shape(
        lambda k: model.init(k, g, adj, False), jax.random.PRNGKey(0)
    )
    params = jax.tree.map(
        lambda a: np.zeros(a.shape, a.dtype), variables["params"]
    )
    batch_stats = jax.tree.map(
        lambda a: np.zeros(a.shape, a.dtype), variables["batch_stats"]
    )
    tx = torch_adam(1e-3, weight_decay=5e-3)
    opt_state = tx.init(params)
    tt = np.asarray(g.train_mask) & ~np.asarray(g.central_mask)

    def loss_fn(params, batch_stats, drop, g, adj):
        outs, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            g, adj, True, rngs={"dropout": drop},
            mutable=["batch_stats"],
        )
        lp_s, lp_t, lp_that, _ = outs
        loss = (
            2.0 * masked_nll(lp_s, g.y, g.train_mask)
            + masked_nll(lp_t, g.y, tt)
            + masked_nll(lp_that, g.y, tt)
        ) / 4.0 + kl_batchmean(lp_that, lp_t, g.node_mask)
        return loss, mut["batch_stats"]

    @jax.jit
    def step(params, batch_stats, opt_state, key, g, adj, leaves):
        adj = adj.replace(fast_fn=rebind_blocked_ops(leaves, meta_ops))
        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, key, g, adj
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bs, opt_state, loss

    t0 = time.time()
    compiled = step.lower(
        params, batch_stats, opt_state, jax.random.PRNGKey(1), g, adj,
        lay_leaves,
    ).compile()
    ma = compiled.memory_analysis()

    # ground truth: RUN the step and read the allocator's live peak —
    # memory_analysis is the buffer-assignment estimate; the runtime
    # peak includes arguments, donation behavior and allocator slack
    # (the r3 OOM at 524k reported 20.65 G where the assignment-level
    # estimate extrapolates to ~12 G — this measurement resolves which
    # number the auto policy must respect)
    peak = before_peak = -1
    step_ran = False
    dev = jax.devices()[0]

    def _peak():
        try:
            stats = dev.memory_stats()
            return int(stats.get("peak_bytes_in_use", -1)) if stats else -1
        except Exception:  # noqa: BLE001 — backends without stats
            return -1

    before_peak = _peak()
    # even without allocator stats (the axon backend returns None), the
    # run-or-OOM outcome of executing the step IS the signal
    out = compiled(params, batch_stats, opt_state,
                   jax.random.PRNGKey(1), g, adj, lay_leaves)
    jax.block_until_ready(out)
    step_ran = True
    del out
    peak = _peak()

    lay = adj.fast_fn.lay_dst
    return dict(
        nodes=n_nodes, edges=e, hidden=hidden,
        msg_dtype=str(msg_dtype), d_in=D_IN,
        slots=int(lay.num_blocks * lay.tile_e),
        tile_e=int(lay.tile_e),
        est_bytes=int(est),
        xla_temp_bytes=int(ma.temp_size_in_bytes),
        xla_arg_bytes=int(ma.argument_size_in_bytes),
        runtime_peak_bytes=peak,
        runtime_peak_before_bytes=before_peak,
        step_ran=step_ran,
        ratio_est_over_xla=round(
            est / max(ma.temp_size_in_bytes, 1), 3
        ),
        compile_s=round(time.time() - t0, 1),
    )


def main():
    out = {"platform": jax.devices()[0].platform, "points": []}
    # ascending expected peak: peak_bytes_in_use is process-cumulative,
    # so each corner's runtime peak is observable only when it exceeds
    # every earlier corner's
    grid = [
        (131072, 64, "bfloat16"),
        (131072, 128, "bfloat16"),
        (131072, 64, None),
        (262144, 64, "bfloat16"),
        (131072, 128, None),
        (262144, 128, None),
        (393216, 64, "bfloat16"),
        # the decisive point: r3's capacity ladder recorded plain OOM
        # "20.65 G" at 524k bf16/H64, but the assignment-level estimate
        # extrapolates to ~12 G — if this step RUNS, the capacity model
        # was conservative by ~1.7x and gets recalibrated; if it OOMs,
        # the ladder stands (incremental JSON writes keep earlier points
        # either way)
        (524288, 64, "bfloat16"),
    ]
    for n, h, md in grid:
        pt = probe(n, h, md)
        print(json.dumps(pt), flush=True)
        out["points"].append(pt)
        with open("tools/probe_hbm_estimator.json", "w") as f:
            json.dump(out, f, indent=1)
    print("done")


if __name__ == "__main__":
    main()
