"""Capacity scaling past the single-chip ceiling (VERDICT r3 item 2).

The 1M-node / 17.8M-edge KT-GNN config OOMs on one v5e at 19.0 G of
15.75 G HBM (results_ktgnn_scale_r3.json). The halo row partition exists
so per-shard footprint shrinks ~1/n_shards: this tool runs that config —
and 2M/35.6M — through the FIRST-CLASS multi-device runtime
(train_ktgnn(n_shards=8), parallel/stage2_runtime.py) on the virtual
8-device CPU mesh, trains real epochs (loss-finite, eval-sane), and
records XLA's own per-device memory accounting
(Compiled.memory_analysis(), the same quantity OOM reports cite) next to
the analytic per-shard estimator
(stage2_runtime.estimate_plain_hbm_per_shard).

Graph: clustered synthetic (90% intra-shard edges, 10% uniform) — the
cut regime partitioned production graphs actually live in (random graphs
have ~no locality, so a halo layout degenerates to replication; the
wire-accounting test test_halopart.py::test_wire_bytes_halo_beats_edgeshard
documents the same). Node/edge/feature dims match the r3 ceiling ladder
(deg 17, D=128, hidden 64, 8 classes, bf16 messages).

Usage: python tools/bench_ktgnn_scale_multichip.py [out.json]
"""

import json
import os
import sys
import time

out_path = (
    sys.argv[1] if len(sys.argv) > 1
    else "results_ktgnn_scale_multichip.json"
)
repo = __file__.rsplit("/", 2)[0]
sys.path.insert(0, repo)



def _env_bool(name, default):
    """Tolerant boolean env parse: 0/""/false/no → False, else True."""
    v = os.environ.get(name)
    if v is None:
        return default
    return v.strip().lower() not in ("0", "", "false", "no", "off")


def _env_int(name, default):
    v = os.environ.get(name)
    if v is None:
        return default
    try:
        return int(v)
    except ValueError:
        sys.exit(f"{name}={v!r} is not an integer")


# all knobs validated up front — a typo must fail before the multi-hour
# graph/partition build, not after it (ADVICE r4)
N_SHARDS = _env_int("BGNN_MC_SHARDS", 8)
FEAT_D = _env_int("BGNN_MC_D", 128)
HIDDEN = _env_int("BGNN_MC_HIDDEN", 64)
DEG = _env_int("BGNN_MC_DEG", 17)
POLICY = os.environ.get("BGNN_MC_POLICY", "auto")
if POLICY not in ("auto", "lean", "plain"):
    sys.exit(
        f"BGNN_MC_POLICY={POLICY!r}: the sharded runtime accepts "
        "auto|lean|plain (xla_plain is single-chip only)"
    )
NODE_BLOCK = _env_int("BGNN_MC_NODE_BLOCK", 0) or None
EPOCHS = _env_int("BGNN_MC_EPOCHS", 3)
SCAN = _env_bool("BGNN_MC_SCAN", True)
SKIP_MA = _env_bool("BGNN_MC_SKIP_MA", False)

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={N_SHARDS}"
    # XLA-CPU in-process collectives enforce a 40 s rendezvous
    # termination timeout (rendezvous.cc) — at 1M+ nodes on a few host
    # cores the 8 virtual shards legitimately take longer than that to
    # reach the boundary all_to_all, which aborts the process. Raise
    # the limits: this is a simulation-environment knob, not a TPU one
    # (ICI collectives have no such in-process rendezvous).
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
    + " --xla_cpu_collective_timeout_seconds=7200"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from bridged_gnn_tpu.train.stage2 import Stage2Config, train_ktgnn  # noqa: E402


def clustered_graph(n_nodes, deg=DEG, d=FEAT_D, c=8, cross_frac=0.10, seed=0):
    rng = np.random.default_rng(seed)
    e = n_nodes * deg
    block = n_nodes // N_SHARDS
    blk = rng.integers(0, N_SHARDS, size=e)
    lo = blk * block
    src = lo + rng.integers(0, block, size=e)
    dst = lo + rng.integers(0, block, size=e)
    cross = rng.random(e) < cross_frac
    src = np.where(cross, rng.integers(0, n_nodes, size=e), src)
    central = np.zeros(n_nodes, dtype=bool)
    central[rng.permutation(n_nodes)[: n_nodes // 2]] = True
    val = np.zeros(n_nodes, dtype=bool)
    test = np.zeros(n_nodes, dtype=bool)
    tgt = ~central
    r = rng.random(n_nodes)
    val[tgt & (r < 0.15)] = True
    test[tgt & (r >= 0.15) & (r < 0.3)] = True
    return dict(
        x=rng.normal(size=(n_nodes, d)).astype(np.float32),
        edge_index=np.stack([src, dst]),
        y=rng.integers(0, c, size=n_nodes).astype(np.int64),
        train_mask=(rng.random(n_nodes) < 0.6),
        val_mask=val,
        test_mask=test,
        central_mask=central,
    )


def _rss_gib():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 2**20
    return 0.0


_PHASE = {"name": "start"}


def _rss_sampler():
    import threading

    def loop():
        while True:
            print(f"[rss] {_PHASE['name']}: {_rss_gib():.1f} GiB",
                  flush=True)
            time.sleep(15)

    threading.Thread(target=loop, daemon=True).start()


def run_point(n_nodes, epochs=3):
    _PHASE["name"] = "graph_build"
    data = clustered_graph(n_nodes)
    # PLAIN per shard is the partition's whole story: at 655k nodes the
    # per-shard plain estimate (~5.2 GiB) fits a real chip's 15.75 GiB
    # HBM where even the leanest single-chip config OOMs.
    #
    # Simulation limit — CORRECTED in round 5 (round 4 blamed compile;
    # phase-attributed probes show compile is flat at 1.6-5 GiB /
    # seconds with arrays as jit args, StableHLO size-invariant): the
    # wall is the per-shard EXECUTE arenas. Each virtual device
    # allocates its temp arena (memory_analysis().temp — the CPU
    # backend materializes the one-hot [nb, Et] expand/reduce tensors
    # the TPU backend fuses) in the ONE host process, so total RSS ≈
    # n_shards × temp + base; at 600k/10.2M that is ~130-150 GB for
    # every config family (five attempts died at ~122 GB). Fix on this
    # 125 GB host: a disk swapfile backstop (the arenas are touched
    # ~once per epoch) — `fallocate -l 60G /tmp/swapfile && mkswap
    # /tmp/swapfile && swapon /tmp/swapfile` — under which the
    # 600k/10.2M lean point trains end to end. Real slices don't share
    # the hazard (one arena per chip, TPU-fused and far smaller).
    # Details: DESIGN.md §10.
    policy = POLICY
    epochs = EPOCHS
    # scan mode: ONE compiled program (train+eval fused per epoch,
    # counts-based device eval) instead of two separately-arena'd
    # programs — the XLA-CPU allocator holds each program's temp arena,
    # and at 1M nodes the train (36.8 G) + eval (15.8 G) arenas plus
    # compile-time memory tipped the 125 G host over
    # scan fusion puts train+eval+counts in ONE HLO program — past ~0.5M
    # nodes XLA-CPU's compile of that fused 8-device program is itself
    # the host-memory hazard (the 655k scan attempt was OOM-killed at
    # 130 GB during compile); BGNN_MC_SCAN=0 compiles the train and eval
    # steps as separate smaller programs (their execute arenas co-reside
    # instead, which is the cheaper side of the trade at this scale)
    scan = SCAN
    cfg = Stage2Config(
        hidden=HIDDEN, num_epoch=epochs, scan_epochs=epochs if scan else 0,
        n_shards=N_SHARDS, message_dtype="bfloat16", log_every=1,
        memory_policy=policy, halo_node_block=NODE_BLOCK,
    )
    # build the backend through the runtime but grab memory stats from
    # the compiled step: reuse internals for honest accounting
    from bridged_gnn_tpu.graph import graph_from_dict, with_self_loops
    from bridged_gnn_tpu.parallel.halopart import build_halo_partition
    from bridged_gnn_tpu.parallel.stage2_runtime import (
        estimate_plain_hbm_per_shard,
    )
    from bridged_gnn_tpu.train.stage2 import to_undirected_np  # noqa: F401

    d2 = dict(data)
    d2["train_mask"] = np.asarray(d2["train_mask"]).copy()
    d2["train_mask"][np.asarray(d2["y"]) == -1] = False
    _PHASE["name"] = "partition_build"
    g = with_self_loops(graph_from_dict(d2))
    t0 = time.time()
    part = build_halo_partition(g, N_SHARDS, node_block=NODE_BLOCK)
    t_part = time.time() - t0
    est = estimate_plain_hbm_per_shard(part, g, cfg)
    edges_real = int(np.asarray(g.edge_mask).sum())
    part_summary = dict(
        rows=part.rows, ext_len=part.ext_len,
        halo_rows_real=part.halo_rows_real, e_shard=part.e_shard,
        dst_slots_per_shard=int(part.pd_blocks * part.pd_tile),
        build_s=round(t_part, 1),
    )
    # record the policy the runtime RESOLVES, not the one requested —
    # 'auto' may land on either side (ADVICE r4)
    from bridged_gnn_tpu.train.stage2 import resolve_memory_policy_sharded

    resolved_lean = resolve_memory_policy_sharded(
        part, g, cfg, estimate_plain_hbm_per_shard
    )

    import gc

    # XLA per-device memory accounting (compile-only — no buffers
    # execute), freed before the actual training run so the analysis
    # backend isn't co-resident. BGNN_MC_SKIP_MA=1 skips it entirely:
    # past ~0.5M nodes this second full compile is pure host-memory
    # overhead on the 125 GB simulation host (the artifact consumer,
    # tests/test_scale_multichip.py, tolerates a missing
    # xla_memory_analysis field).
    mem = None
    if not SKIP_MA:
        _PHASE["name"] = "memory_analysis_compile"
        from bridged_gnn_tpu.parallel.mesh import make_mesh
        from bridged_gnn_tpu.parallel.stage2_runtime import (
            HaloStage2Backend,
        )
        from bridged_gnn_tpu.train.optim import torch_adam
        from bridged_gnn_tpu.train.stage2 import (
            _surrogate_init_graph,
            build_model,
            prepare_stage2_graph,
        )

        g2, _ = prepare_stage2_graph(data, cfg, build_adj=False)
        num_classes = int(np.asarray(g2.y).max()) + 1
        model = build_model(
            cfg, num_classes, lean=resolved_lean, lean_remat=False
        )
        tx = torch_adam(cfg.lr, weight_decay=cfg.weight_decay)
        backend = HaloStage2Backend(
            make_mesh(N_SHARDS, ("nodes",)), model, g2, cfg, tx,
            num_classes, part=part,
        )
        gi, adji = _surrogate_init_graph(g2.num_features, num_classes)
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            gi, adji, False,
        )
        params = variables["params"]
        bs = variables["batch_stats"]
        opt_state = tx.init(params)
        lowered = backend._train_step.lower(
            params, bs, opt_state, jax.random.PRNGKey(2), *backend._args()
        )
        ma = lowered.compile().memory_analysis()
        mem = dict(
            temp_bytes=int(ma.temp_size_in_bytes),
            argument_bytes=int(ma.argument_size_in_bytes),
            output_bytes=int(ma.output_size_in_bytes),
        )
        del backend, lowered, variables, params, bs, opt_state, g2
        gc.collect()

    # the training run rebuilds graph + partition internally — drop the
    # accounting prelude's copies so they aren't co-resident
    del g, part, d2
    gc.collect()

    _PHASE["name"] = "train"
    t0 = time.time()
    res = train_ktgnn(data, cfg)
    t_total = time.time() - t0

    losses = [h["loss"] for h in res["history"]]
    assert all(np.isfinite(losses)), losses
    assert 0.0 <= res["best"]["test"] <= 1.0

    pt = dict(
        nodes=n_nodes,
        edges=edges_real,
        n_shards=N_SHARDS,
        feat_d=FEAT_D,
        hidden=HIDDEN,
        deg=DEG,
        scan=bool(scan),
        lean=resolved_lean,
        partition=part_summary,
        est_plain_hbm_per_shard_gib=round(est / 2**30, 2),
        epochs=epochs,
        losses=[round(float(v), 4) for v in losses],
        best=dict(
            test=res["best"]["test"], val=res["best"]["val"],
            train=res["best"]["train"], epoch=res["best"]["epoch"],
        ),
        mean_epoch_s=round(res["mean_epoch_time"], 2),
        total_s=round(t_total, 1),
    )
    if mem is not None:
        pt["xla_memory_analysis"] = mem
    return pt


def main():
    _rss_sampler()
    out = {
        "platform": "cpu (8 virtual devices; capacity accounting via "
                    "XLA memory_analysis, which is backend-portable)",
        "single_chip_reference":
            "1M nodes / 17.8M edges OOMs on one v5e at 19.0 G of 15.75 G "
            "(results_ktgnn_scale_r3.json, random graph, lean)",
        "points": [],
    }
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                prev = json.load(f)
            out["points"] = [
                p for p in prev.get("points", [])
            ]
        except Exception:  # noqa: BLE001 — corrupt partial file
            pass
    done = {p["nodes"] for p in out["points"]}
    sizes = [int(s) for s in os.environ.get(
        "BGNN_MC_NODES", "1048576,2097152").split(",")]
    for n in sizes:
        if n in done:
            print(f"=== {n} nodes: already in artifact, skipping ===",
                  flush=True)
            continue
        print(f"=== {n} nodes ===", flush=True)
        pt = run_point(n)
        out["points"].append(pt)
        print(json.dumps(pt, indent=1), flush=True)
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
