"""Measure the comm/compute-overlap halo attention path (VERDICT r2 item 2).

One real chip is available, so this records the measurable pieces of the
overlap story:

1. single-chip timed comparison of ONE shard's attention layer, the
   single-layout form (ops/fused_attention.py::adapted_attention, what
   the non-overlap halo step runs after the all_to_all completes) vs the
   split local+halo form (adapted_attention_overlap) at the exact
   per-shard layouts an 8-way partition of a production-scale clustered
   graph produces — the split's compute overhead is the price paid for
   making the local pipeline independent of the collective;
2. the local-pipeline fraction: time of the local partials alone (the
   work that hides the all_to_all) — the hideable window;
3. projected ICI-bound efficiency with and without overlap:
     serial : eff = t_comp / (t_comp + t_comm)
     overlap: eff = t_comp / (t_comp + max(0, t_comm - t_local))
   using measured per-layer times and the partition's measured wire
   bytes over a range of per-chip ICI bandwidths;
4. on the virtual CPU mesh (JAX_PLATFORMS=cpu): the full overlap train
   step at 2/4/8 devices (structure only — virtual devices share host
   cores).

Usage:
  python tools/bench_halo_overlap.py [out.json]          # real chip: 1-3
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/bench_halo_overlap.py out_cpu.json    # adds 4
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# the axon TPU plugin overrides JAX_PLATFORMS=cpu; honor it explicitly so
# the virtual-mesh structural variant actually runs on host CPU devices
from bridged_gnn_tpu.utils.platform import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N = 131_072
AVG_DEG = 16
D = 128
N_SHARDS = 8
CROSS_FRAC = 0.08          # fraction of edges crossing shard blocks


def make_clustered_graph():
    from bridged_gnn_tpu.graph import build_graph

    rng = np.random.default_rng(0)
    e = N * AVG_DEG
    blk = N // N_SHARDS
    lo = rng.integers(0, N_SHARDS, size=e) * blk
    src = lo + rng.integers(0, blk, size=e)
    dst = lo + rng.integers(0, blk, size=e)
    cross = rng.random(e) < CROSS_FRAC
    dst = np.where(cross, rng.integers(0, N, size=e), dst)
    x = rng.normal(size=(N, 8)).astype(np.float32)  # features unused here
    y = rng.integers(0, 8, size=N)
    central = rng.random(N) < 0.5
    return build_graph(
        x, np.stack([src, dst]), y=y, central_mask=central,
        train_mask=np.ones(N, dtype=bool),
        edge_capacity=((e + 1023) // 1024) * 1024,
    )


def shard0_views(part):
    """HaloView for shard 0 with per-shard slices (no collectives used)."""
    from bridged_gnn_tpu.parallel.halopart import HaloView

    def sl(a):
        return jnp.asarray(np.asarray(a).reshape(part.num_shards, -1)[0])

    pl = {k: sl(v) for k, v in part.pl.items()}
    pl2 = {k: sl(v) for k, v in part.pl2.items()}
    return HaloView(
        senders_local=sl(part.senders_local),
        receivers_local=sl(part.receivers_local),
        edge_mask=sl(part.edge_mask),
        send_idx=None, send_mask=None,
        central_ext=sl(part.central_ext),
        node_mask_ext=sl(part.node_mask_ext),
        block_start=sl(part.block_start),
        rows=part.rows, h_pair=part.h_pair,
        num_shards=part.num_shards, axis=None,
        block_node_block=part.block_node_block,
        block_max_edges=part.block_max_edges,
        block_num_blocks=part.block_num_blocks,
        pl=pl, pd_tile=part.pd_tile, pd_blocks=part.pd_blocks,
        ps_tile=part.ps_tile, ps_blocks=part.ps_blocks,
        ext_len=part.ext_len,
        pl2=pl2, t_ld=part.t_ld, t_ls=part.t_ls, b_ls=part.b_ls,
        t_hd=part.t_hd, t_hs=part.t_hs, b_hs=part.b_hs,
        halo_len=part.halo_len,
    )


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def measure_shard_layer(halo, dtype):
    from bridged_gnn_tpu.ops.fused_attention import (
        _attention_partials,
        adapted_attention,
        adapted_attention_overlap,
    )

    rng = np.random.default_rng(1)
    R, H = halo.rows, halo.halo_len
    ext = halo.ext_len
    u1 = jnp.asarray(rng.normal(size=(ext, D)), dtype)
    u2 = jnp.asarray(rng.normal(size=(ext, D)), dtype)
    central = jnp.asarray(rng.random(R) < 0.5)
    a1 = jnp.asarray(rng.normal(size=D), dtype)
    a2 = jnp.asarray(rng.normal(size=D), dtype)
    lf1 = lambda h: (h @ a1.astype(h.dtype)[:, None])  # noqa: E731
    lf2 = lambda h: (h @ a2.astype(h.dtype)[:, None])  # noqa: E731

    ops = halo.fused_ops()
    ops_l, ops_h = halo.fused_ops_split()
    u_cat_l = jnp.concatenate([u1[:R], u2[:R]], axis=-1)
    u_cat_h = jnp.concatenate([u1[R:R + H], u2[R:R + H]], axis=-1)

    @jax.jit
    def single(u1, u2):
        return adapted_attention(
            ops, u1, u2, central, lf1, lf2,
            u1_dst=u1[:R], u2_dst=u2[:R],
        )

    @jax.jit
    def split(u_cat_l, u_cat_h):
        return adapted_attention_overlap(
            ops_l, ops_h, u_cat_l, u_cat_h, u_cat_l, central, lf1, lf2,
        )

    @jax.jit
    def local_only(u_cat_l):
        return _attention_partials(
            ops_l.lay_dst, ops_l.gather_slots, u_cat_l, u_cat_l,
            central, lf1, lf2, 0.1,
        )[0]

    @jax.jit
    def single_bwd(u1, u2):
        return jax.grad(lambda a, b: single(a, b).astype(jnp.float32)
                        .sum(), argnums=(0, 1))(u1, u2)

    @jax.jit
    def split_bwd(u_cat_l, u_cat_h):
        return jax.grad(lambda a, b: split(a, b).astype(jnp.float32)
                        .sum(), argnums=(0, 1))(u_cat_l, u_cat_h)

    # --- control for honest overlap attribution (VERDICT r3 item 6):
    # a SINGLE layout with tight per-tier tiles (the tiered machinery
    # over this shard's full edge set, senders in x_ext space) — no
    # local/halo split, so any win of `split` beyond this row is the
    # schedule (hidden collective), not the tiles.
    from bridged_gnn_tpu.ops.blocked_segment import make_tiered_blocked_ops
    from bridged_gnn_tpu.ops.fused_attention import (
        adapted_attention_tiered,
    )

    tops = make_tiered_blocked_ops(
        np.asarray(halo.senders_local), np.asarray(halo.receivers_local),
        np.asarray(halo.edge_mask), halo.rows,
        node_block=halo.block_node_block, src_space=halo.ext_len,
    )

    @jax.jit
    def single_tight(u1, u2):
        return adapted_attention_tiered(
            tops, u1, u2, central, lf1, lf2,
        )

    @jax.jit
    def single_tight_bwd(u1, u2):
        return jax.grad(
            lambda a, b: single_tight(a, b).astype(jnp.float32).sum(),
            argnums=(0, 1),
        )(u1, u2)

    # numerical agreement of the forms (same math, different reduction
    # grouping)
    o1 = np.asarray(single(u1, u2), np.float32)
    o2 = np.asarray(split(u_cat_l, u_cat_h), np.float32)
    o3 = np.asarray(single_tight(u1, u2), np.float32)
    rel = float(np.abs(o1 - o2).max() / (np.abs(o1).max() + 1e-9))
    rel_t = float(np.abs(o1 - o3).max() / (np.abs(o1).max() + 1e-9))

    return dict(
        rel_err=rel,
        rel_err_tight=rel_t,
        tiered_slots=dict(single=tops.slots_single,
                          tiered=tops.slots_tiered,
                          tiers=[int(o.lay_dst.tile_e) for o in tops.tiers]),
        fwd_single_ms=round(timeit(single, u1, u2) * 1e3, 3),
        fwd_single_tight_ms=round(timeit(single_tight, u1, u2) * 1e3, 3),
        fwd_split_ms=round(timeit(split, u_cat_l, u_cat_h) * 1e3, 3),
        fwd_local_only_ms=round(timeit(local_only, u_cat_l) * 1e3, 3),
        bwd_single_ms=round(timeit(single_bwd, u1, u2) * 1e3, 3),
        bwd_single_tight_ms=round(
            timeit(single_tight_bwd, u1, u2) * 1e3, 3
        ),
        bwd_split_ms=round(timeit(split_bwd, u_cat_l, u_cat_h) * 1e3, 3),
    )


def main():
    out_path = (sys.argv[1] if len(sys.argv) > 1
                else "results_halo_overlap.json")
    from bridged_gnn_tpu.parallel.halopart import (
        build_halo_partition,
        make_halo_ktgnn_train_step,
        wire_bytes_per_layer,
    )

    g = make_clustered_graph()
    part = build_halo_partition(g, N_SHARDS, overlap=True)
    platform = jax.devices()[0].platform
    res = {
        "N": N, "E": N * AVG_DEG, "D": D, "n_shards": N_SHARDS,
        "platform": platform,
        "rows": part.rows, "e_shard": part.e_shard,
        "halo_rows_real": part.halo_rows_real,
        "tiles": dict(pd=part.pd_tile, ld=part.t_ld, hd=part.t_hd),
        "wire": wire_bytes_per_layer(part, D),
    }

    if platform != "cpu":
        halo = shard0_views(part)
        for name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
            res[f"shard_layer_{name}"] = measure_shard_layer(halo, dt)
            print(name, res[f"shard_layer_{name}"])
        # projected efficiency with/without overlap: per layer, comm is
        # the all_to_all both directions (fwd + transpose in bwd); the
        # hideable window is the local fwd partials (fwd) and the local
        # share of bwd (approximated by the same fraction)
        m = res["shard_layer_bf16"]
        t_layer = (m["fwd_split_ms"] + m["bwd_split_ms"]) / 1e3
        t_local = m["fwd_local_only_ms"] / 1e3 * (
            1 + m["bwd_split_ms"] / max(m["fwd_split_ms"], 1e-9)
        )
        wire = res["wire"]["halo_bytes"]
        proj = {}
        for bw_gbps in (25, 50, 100, 200):
            t_comm = 2 * wire / (bw_gbps * 1e9)
            proj[f"{bw_gbps}GBps"] = dict(
                serial=round(t_layer / (t_layer + t_comm), 4),
                overlap=round(
                    t_layer / (t_layer + max(0.0, t_comm - t_local)), 4
                ),
                t_comm_ms=round(t_comm * 1e3, 3),
                t_local_hideable_ms=round(t_local * 1e3, 3),
            )
        res["projected_efficiency"] = proj
    else:
        # structural run of the full overlap train step on virtual mesh
        from jax.sharding import Mesh

        from bridged_gnn_tpu.nn.ktgnn import KTGNN
        from bridged_gnn_tpu.ops.spmm import adjacency_from_graph
        from bridged_gnn_tpu.train.optim import torch_adam
        from bridged_gnn_tpu.train.stage2 import Stage2Config

        model = KTGNN(num_classes=8, hidden=64, layer_num=2)
        cfg = Stage2Config(hidden=64)
        adj = adjacency_from_graph(g, method="gather")
        devs = np.array(jax.devices())
        struct = {}
        for nd in (2, 4, 8):
            if nd > len(devs):
                continue
            mesh = Mesh(devs[:nd], ("rows",))
            step, _ = make_halo_ktgnn_train_step(mesh, model, g, cfg,
                                                 overlap=True)
            variables = model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}, g, adj, False,
            )
            tx = torch_adam(cfg.lr, weight_decay=cfg.weight_decay)
            opt = tx.init(variables["params"])
            p, bs, opt2, loss = step(
                variables["params"], variables["batch_stats"], opt,
                jax.random.PRNGKey(2),
            )
            jax.block_until_ready(loss)
            t0 = time.perf_counter()
            for i in range(3):
                p, bs, opt2, loss = step(p, bs, opt2,
                                         jax.random.PRNGKey(3 + i))
            jax.block_until_ready(loss)
            struct[str(nd)] = round((time.perf_counter() - t0) / 3, 4)
            assert np.isfinite(float(loss))
        res["virtual_mesh_overlap_step_s"] = struct

    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
        f.write("\n")
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
