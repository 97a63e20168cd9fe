"""Full KT-GNN train-step epoch time at production scale (one chip).

Synthetic bridged graph (same generator as round-1's scale runs: random
edges, half central), blocked adjacency -> padded layouts -> fused
attention conv. Measures jitted train-step wall time (fwd+bwd+adam) and
edges/s; compares against the round-1 numbers in
results_ktgnn_scale_tpu.json (unfused: 5.98 s/epoch at N=131072).

Usage: nohup python tools/bench_ktgnn_scale.py out.json > log 2>&1 &
"""

import json
import sys
import time

import numpy as np

out_path = sys.argv[1] if len(sys.argv) > 1 else "results_ktgnn_scale_r2.json"
repo = __file__.rsplit("/", 2)[0]
sys.path.insert(0, repo)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from bridged_gnn_tpu.graph import build_graph  # noqa: E402
from bridged_gnn_tpu.nn.ktgnn import KTGNN  # noqa: E402
from bridged_gnn_tpu.ops.spmm import adjacency_from_graph  # noqa: E402
from bridged_gnn_tpu.train.optim import torch_adam  # noqa: E402
from bridged_gnn_tpu.train.stage2 import kl_batchmean, masked_nll  # noqa: E402

res = {"platform": jax.devices()[0].platform}
rng = np.random.default_rng(0)

# BGNN_SCALE_NODES: comma-separated node counts (default 65536,131072);
# larger runs prove HBM capacity headroom (remat available via
# KTGNN(remat=True) if a size overflows)
import os as _os_sizes

_sizes = tuple(
    int(s) for s in _os_sizes.environ.get(
        "BGNN_SCALE_NODES", "65536,131072"
    ).split(",")
)

for n_nodes in _sizes:
    e = n_nodes * 17
    s = rng.integers(0, n_nodes, size=e).astype(np.int64)
    r = rng.integers(0, n_nodes, size=e).astype(np.int64)
    x = rng.normal(size=(n_nodes, 128)).astype(np.float32)
    y = rng.integers(0, 8, size=n_nodes).astype(np.int64)
    central = np.zeros(n_nodes, bool)
    central[: n_nodes // 2] = True
    train = rng.random(n_nodes) < 0.6
    g = build_graph(
        x, np.stack([s, r]), y=y, train_mask=train, central_mask=central
    )
    # BGNN_KTGNN_KERNEL=1: full Mosaic kernel path (fwd+bwd attention
    # kernels, nb=128 layout) — tools/bench_fused_kernel2.json
    import os as _os

    use_kernel = _os.environ.get("BGNN_KTGNN_KERNEL") == "1"
    # BGNN_MSG_BF16=1: bf16 conv messages (Stage2Config.message_dtype) —
    # halves gather bytes on the hot path
    msg_dtype = (
        "bfloat16" if _os.environ.get("BGNN_MSG_BF16") == "1" else None
    )
    adj = adjacency_from_graph(
        g, method="blocked", node_block=128 if use_kernel else 256
    )
    assert adj.fast_fn is not None, "blocked ops unavailable (skew)"
    # BGNN_RECOMPUTE=1: memory-lean custom-VJP attention backward
    # (recompute instead of storing slot residuals; ~19% slower) — the
    # second HBM knob after remat
    recompute = _os.environ.get("BGNN_RECOMPUTE") == "1"
    model = KTGNN(num_classes=8, layer_num=2, hidden=64,
                  fused_kernel_fwd=use_kernel and not recompute,
                  fused_kernel_bwd=use_kernel and not recompute,
                  fused_recompute_bwd=recompute,
                  msg_dtype=msg_dtype,
                  # BGNN_REMAT=1: jax.checkpoint on the convs — the HBM
                  # knob for sizes whose backward residuals overflow
                  remat=_os.environ.get("BGNN_REMAT") == "1")
    # "lay" mode: ALSO pass the blocked layout arrays as jit arguments
    # (rebind_blocked_ops) — above ~0.5M nodes the layout constants
    # overflow this environment's remote-compile request body (HTTP 413)
    pass_lay = _os.environ.get("BGNN_PASS_GRAPH") == "lay"
    if pass_lay:
        from bridged_gnn_tpu.ops.blocked_segment import (
            blocked_ops_leaves,
            rebind_blocked_ops,
        )

        lay_leaves = blocked_ops_leaves(adj.fast_fn)
        meta_ops = adj.fast_fn

        def adj_traced(adj_in, leaves):
            return adj_in.replace(
                fast_fn=rebind_blocked_ops(leaves, meta_ops)
            )

    # jit the init: the eager init-forward materializes every
    # intermediate and OOMs at ~524k nodes; under jit XLA frees them
    if pass_lay:
        variables = jax.jit(
            lambda k, g, adj_in, leaves: model.init(
                k, g, adj_traced(adj_in, leaves), False
            )
        )(jax.random.PRNGKey(0), g, adj, lay_leaves)
    else:
        variables = jax.jit(
            lambda k: model.init(k, g, adj, False)
        )(jax.random.PRNGKey(0))
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = torch_adam(1e-3, weight_decay=5e-4)
    opt_state = tx.init(params)
    tt = g.train_mask & ~g.central_mask

    # BGNN_PASS_GRAPH=1: pass the graph + adjacency pytrees as jit
    # ARGUMENTS instead of closure constants. Closure-captured
    # graph-sized arrays are embedded into HLO as constants and XLA
    # constant-folds over them, so compile time scales with graph size
    # (measured: 9.2 -> 2.6 s at 32k, 20.8 -> 5.0 s at 65k on CPU)
    # "1"/"both" = pass g and adj; "g" / "adj" = pass only that pytree
    # (the other stays a closure constant) — for isolating compile-time
    # vs runtime effects of constant embedding
    pass_mode = _os.environ.get("BGNN_PASS_GRAPH", "0")
    pass_graph = pass_mode in ("1", "both", "g", "adj", "lay")

    def loss_fn(params, batch_stats, drop, g=g, adj=adj):
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
        ) / 4.0 + 1.0 * kl_batchmean(lp_that, lp_t, g.node_mask)
        return loss, mut["batch_stats"]

    if pass_graph:
        g_c, adj_c = g, adj

        if pass_mode == "g":
            @jax.jit
            def step(params, batch_stats, opt_state, key, g):
                (loss, bs), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params, batch_stats, key, g, adj_c)
                updates, opt_state = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), bs,
                        opt_state, loss)

            extra = (g,)
        elif pass_mode == "adj":
            @jax.jit
            def step(params, batch_stats, opt_state, key, adj):
                (loss, bs), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params, batch_stats, key, g_c, adj)
                updates, opt_state = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), bs,
                        opt_state, loss)

            extra = (adj,)
        elif pass_mode == "lay":
            @jax.jit
            def step(params, batch_stats, opt_state, key, g, adj_in,
                     leaves):
                (loss, bs), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params, batch_stats, key, g, adj_traced(adj_in, leaves))
                updates, opt_state = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), bs,
                        opt_state, loss)

            extra = (g, adj, lay_leaves)
        else:
            @jax.jit
            def step(params, batch_stats, opt_state, key, g, adj):
                (loss, bs), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params, batch_stats, key, g, adj)
                updates, opt_state = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), bs,
                        opt_state, loss)

            extra = (g, adj)
    else:
        @jax.jit
        def step(params, batch_stats, opt_state, key):
            (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch_stats, key
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), bs, opt_state,
                    loss)

        extra = ()

    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    params, batch_stats, opt_state, loss = step(
        params, batch_stats, opt_state, key, *extra
    )
    jax.block_until_ready(loss)
    compile_s = time.perf_counter() - t0
    # per-iteration timing (block each step): the tunneled chip can
    # stall for seconds mid-loop, so the mean over a blind 10-iter loop
    # is unstable — record the median and the per-iter spread too
    iters = 10
    per_iter = []
    for i in range(iters):
        t0 = time.perf_counter()
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, jax.random.fold_in(key, i),
            *extra
        )
        jax.block_until_ready(loss)
        per_iter.append(time.perf_counter() - t0)
    per_iter_s = sorted(per_iter)
    epoch_s = per_iter_s[len(per_iter_s) // 2]
    edges = int(np.asarray(g.edge_mask).sum())
    res[str(n_nodes)] = dict(
        epoch_s=round(epoch_s, 4),
        epoch_s_mean=round(sum(per_iter) / iters, 4),
        epoch_s_min=round(per_iter_s[0], 4),
        epoch_s_max=round(per_iter_s[-1], 4),
        compile_s=round(compile_s, 1),
        edges=edges,
        edges_per_s=round(edges / epoch_s),
        loss=float(loss),
    )
    print(json.dumps(res[str(n_nodes)]))
    # incremental write: an OOM at a later size must not lose this one
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)

print(json.dumps(res))
