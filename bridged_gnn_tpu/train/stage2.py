"""Stage-2 training runtime: KT-GNN knowledge transfer on a bridged graph.

Re-design of the reference training loop
(main_graph_knowledge_transfer.py:39-262):

  * 4-term loss ``(2·L_s + L_t + L_t̂)/4 + λ·KL(t̂ ‖ t)`` with the KL in
    torch ``kl_div(log_t̂, log_t, log_target=True, reduction='batchmean')``
    convention (lines 43-54);
  * Adam(lr 1e-3, wd 5e-3, torch L2 semantics) + StepLR(100, 0.1)
    (lines 205-207);
  * model selection by **minimum loss_clf_t2** (line 238), not val metric;
  * eval: source head macro-F1 on train mask; distilled target-hat head on
    val/test (lines 73-118); per-head test scores (lines 119-142).

The whole epoch step (forward, loss, backward, optimizer) is one jitted XLA
program; only per-epoch metric extraction crosses to host.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bridged_gnn_tpu.graph import Graph, graph_from_dict, with_self_loops
from bridged_gnn_tpu.nn.ktgnn import KTGNN, KTGNNNoDTC
from bridged_gnn_tpu.ops.spmm import Adjacency, adjacency_from_graph
from bridged_gnn_tpu.train.metrics import eval_metric, score_from_counts
from bridged_gnn_tpu.train.optim import step_lr, torch_adam
from bridged_gnn_tpu.utils.profiling import StepTimer


@dataclasses.dataclass
class Stage2Config:
    model_name: str = "KTGNN"
    num_layer: int = 2
    hidden: int = 64
    num_epoch: int = 300
    lr: float = 1e-3
    weight_decay: float = 5e-3
    use_scheduler: bool = True
    step_size: int = 100
    gamma: float = 0.1
    Lambda: float = 1.0
    dropout: float = 0.5
    use_bn: bool = True
    root_weight: bool = False
    metric: str = "f1"
    f1_average: str = "macro"
    seed: int = 0
    no_dtc: bool = False
    # halo-layout slot-block override (None = 128). The XLA-CPU
    # simulation mesh materializes every blocked reduce's one-hot
    # [nb, Et] tensors into the per-shard temp arena (∝ node_block);
    # capacity simulations pass 32/64 so n_shards arenas fit one host
    # (see parallel/halopart.build_halo_partition)
    halo_node_block: Optional[int] = None
    to_undirected: bool = False
    adjacency_method: str = "auto"
    log_every: int = 0  # 0 = silent
    ckpt_dir: Optional[str] = None   # enable periodic checkpoints + resume
    ckpt_every: int = 50
    resume: bool = False
    save_best_path: Optional[str] = None  # pickle best-model variables
    # feature-complementor options (reference KTGNN need_complement path;
    # disabled in all run.sh configs)
    need_complement: bool = False
    dim_share: int = 0
    complement_step: int = 1
    use_dist_loss: bool = False
    # >0: run this many epochs per device dispatch via lax.scan — the
    # TPU-native loop (one round trip per chunk instead of per epoch).
    # Requires metric in {'f1','acc'}; checkpointing lands on chunk
    # boundaries.
    scan_epochs: int = 0
    # matmul precision for this run: None = framework default (highest,
    # reference-parity fp32); 'bfloat16' trades ~5e-3 activation drift for
    # MXU-native throughput (production knob)
    matmul_precision: Optional[str] = None
    # bf16 conv messages for KTGNN-family models: halves the bytes the
    # gather engine moves per edge slot — the hot-path bound (DESIGN.md
    # §2). Output is cast back to f32 before BN; ~1e-2 activation drift.
    # None = parity (messages keep the feature dtype)
    message_dtype: Optional[str] = None
    # HBM policy for KTGNN-family training (resolve_memory_mode):
    # 'plain' = Mosaic kernels + stored residuals (fastest; parity
    # default), 'xla_plain' = kernels off / stored residuals (~30% less
    # HBM — the 524k/8.9M graph the old 2-tier policy sent to lean
    # actually fits here, round-4 on-chip probe), 'lean' =
    # jax.checkpoint + recompute-backward (the capacity config), 'auto'
    # = fastest tier whose calibrated estimate fits ~80% of device HBM
    memory_policy: str = "auto"
    # pass the blocked slot-layout arrays through jit as ARGUMENTS
    # (ops/blocked_segment.rebind_blocked_ops) instead of HLO constants:
    # compile time stops scaling with graph size (10.1 s vs 135-278 s at
    # 131k nodes; DESIGN.md §9) and the compiled module stays small.
    # 'auto' = engage when the layouts exceed ~1M slots (small/parity
    # graphs keep the constant form); True/False force
    pass_layouts: "str | bool" = "auto"
    # operational numerics guard (SURVEY §5.2): at every eval boundary,
    # assert params/loss finite (utils/sanitizers.assert_all_finite) and
    # — on KTGNN-family fused layouts — assert the per-dst-block
    # attention-logit spread stays below the Mosaic kernel's block-max
    # softmax envelope (silent exp-underflow otherwise; see
    # ops/pallas_fused docstring). CLI: --check_numerics
    check_numerics: bool = False
    # multi-device training (SURVEY §2c / §7.1-6): >1 runs the SAME
    # runtime loop (eval heads, best-by-loss_clf_t2, scan, checkpoints,
    # memory policy) over an n_shards-device mesh via
    # parallel/stage2_runtime.py; 1 (default) is the degenerate
    # single-device case of the same code path. KTGNN only.
    n_shards: int = 1
    # 'halo' (production: row partition + boundary all_to_all, wire
    # bytes ∝ edge cut) or 'edgeshard' (1-D edge partition, full-array
    # psums — no partition build cost)
    shard_layout: str = "halo"
    # halo layout only: split local/halo slot layouts so the boundary
    # all_to_all overlaps the local attention pipeline
    # (ops/fused_attention.adapted_attention_overlap). Numerically equal
    # up to fp reduction order (not bit-identical) to overlap=False
    halo_overlap: bool = False


def masked_nll(log_probs: jax.Array, y: jax.Array, mask: jax.Array,
               axis_name: Optional[str] = None):
    """Mean of -log p(y) over masked nodes (torch F.nll_loss semantics).

    ``axis_name``: psum numerator/denominator over row-sharded devices."""
    y_safe = jnp.clip(y, 0)
    picked = jnp.take_along_axis(log_probs, y_safe[:, None], axis=1)[:, 0]
    m = mask.astype(log_probs.dtype)
    num = -jnp.sum(picked * m)
    den = jnp.sum(m)
    if axis_name is not None:
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    return num / jnp.maximum(den, 1.0)


def kl_batchmean(log_q: jax.Array, log_p: jax.Array, mask: jax.Array,
                 axis_name: Optional[str] = None):
    """torch F.kl_div(log_q, log_p, log_target=True, reduction='batchmean')
    over masked rows: sum(exp(log_p)·(log_p − log_q)) / num_rows."""
    kl = jnp.exp(log_p) * (log_p - log_q)
    m = mask.astype(log_q.dtype)[:, None]
    num = jnp.sum(kl * m)
    den = jnp.sum(mask)
    if axis_name is not None:
        num = jax.lax.psum(num, axis_name)
        den = jax.lax.psum(den, axis_name)
    return num / jnp.maximum(den, 1)


def to_undirected_np(data: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """PyG ToUndirected(merge=True): union of edges and reversed edges,
    coalesced (reference main_graph_knowledge_transfer.py:410-411)."""
    from bridged_gnn_tpu.graph import coalesce_np

    ei = data["edge_index"]
    both = np.concatenate([ei, ei[::-1]], axis=1)
    out = dict(data)
    out["edge_index"] = coalesce_np(both, data["x"].shape[0])
    return out


# Models whose reference counterparts see a self-loop-augmented edge set:
# KTGNN's graph_partition adds them (KTGNN.py:390-394); PyG GCNConv/GCN2
# normalize with self loops; the reference GAT/GATv2 wrappers add them
# manually (backbones.py:336-341). GraphSAGE/MLP/GIN/DeeperGCN aggregate
# the raw edge set.
SELF_LOOP_MODELS = frozenset(
    {"KTGNN", "KTGNN_noDTC", "GCN", "GAT", "GATv2", "JKNet", "APPNP",
     "GCN2"}
)


def prepare_stage2_graph(
    data: Dict[str, np.ndarray], cfg: Stage2Config, build_adj: bool = True
) -> tuple[Graph, Optional[Adjacency]]:
    data = dict(data)
    # reference quirk kept: unlabeled nodes can never be train
    # (main_graph_knowledge_transfer.py:404)
    data["train_mask"] = np.asarray(data["train_mask"]).copy()
    data["train_mask"][np.asarray(data["y"]) == -1] = False
    if cfg.to_undirected:
        data = to_undirected_np(data)
    g = graph_from_dict(data)
    if cfg.model_name in SELF_LOOP_MODELS or cfg.model_name == "KTGNN_noDTC":
        g = with_self_loops(g)
    # When the Mosaic kernel auto-policy is active (TPU backend outside
    # fp32-parity precision) AND the model is KTGNN-family (the only
    # kernel consumer), build the nb=128 slot layout — the kernel's
    # VMEM envelope rejects the default nb=256 layout for f32 message
    # blocks at production hidden sizes (ops/pallas_fused.fits_vmem).
    # Zoo backbones keep the nb=256 layout tuned for the XLA reduce.
    from bridged_gnn_tpu.ops import pallas_fused

    kernel_capable = cfg.model_name in ("KTGNN", "KTGNN_noDTC")
    node_block = (
        128 if (kernel_capable and pallas_fused.auto_kernel()) else 256
    )
    if not build_adj:
        # sharded backends build their own per-shard layouts
        # (parallel/stage2_runtime.py); skip the O(E) host layout build
        return g, None
    adj = adjacency_from_graph(
        g, method=cfg.adjacency_method, node_block=node_block
    )
    return g, adj


def estimate_plain_hbm(g: Graph, adj, cfg: Stage2Config,
                       kernel_path: bool = True) -> int:
    """Estimated peak HBM bytes of the PLAIN (stored-residual) KT-GNN
    train step. Dominant term: live copies of the widest conv's
    [slots, 2*hidden] message-space tensors (residuals + backward
    temporaries), plus features/activations and the slot layouts.

    Two calibrated constants (VERDICT r3 item 7,
    tools/probe_hbm_estimator.json):

    * ``kernel_path=True`` (Mosaic fwd/bwd kernels): ~7.5 copies — the
      kernel backward stores the [B,Et,2D] residual stack; matches the
      r3 OOM ladder (predicted 20.6G at 524k/8.9M where XLA reported
      20.65G).
    * ``kernel_path=False`` (XLA autodiff fused path): ~5.2 copies —
      the round-4 on-chip probe measured XLA buffer-assignment peaks of
      2.90/9.50/12.66 GiB at 131k/393k/524k (bf16, hidden 64) and the
      524k plain step EXECUTED on the chip; 5.2 upper-bounds every
      probed corner by 4-17%.
    """
    if adj.fast_fn is not None:
        lay = adj.fast_fn.lay_dst
        slots = lay.num_blocks * lay.tile_e
    elif getattr(adj, "tiered_fn", None) is not None:
        slots = adj.tiered_fn.slots_tiered
    else:
        return 0
    msg_item = 2 if cfg.message_dtype == "bfloat16" else 4
    d_in = g.x.shape[1]
    copies = 7.5 if kernel_path else 5.2
    return int(
        copies * slots * 2 * cfg.hidden * msg_item  # bwd message space
        + 4 * g.num_nodes_padded * d_in * 4         # features/activations
        + 7 * slots * 4                             # 2 layouts, int arrays
    )


def _device_hbm_limit() -> int:
    dev = jax.devices()[0]
    try:
        stats = dev.memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:  # noqa: BLE001 — backends without memory_stats
        pass
    return 16 * 2**30


def resolve_pass_layouts(adj, cfg: Stage2Config) -> bool:
    tiered = getattr(adj, "tiered_fn", None)
    if adj.fast_fn is None and tiered is None:
        return False
    if cfg.pass_layouts is True or cfg.pass_layouts is False:
        return cfg.pass_layouts
    if cfg.pass_layouts != "auto":
        raise ValueError(f"pass_layouts: {cfg.pass_layouts!r}")
    if adj.fast_fn is not None:
        lay = adj.fast_fn.lay_dst
        return lay.num_blocks * lay.tile_e > 2**20
    return tiered.slots_tiered > 2**20


def resolve_memory_policy_sharded(part, g: Graph, cfg: Stage2Config,
                                  estimator) -> bool:
    """Halo-layout lean/plain decision from the PER-SHARD footprint
    (parallel/stage2_runtime.estimate_plain_hbm_per_shard): the whole
    point of the row partition is that the residual-dominated footprint
    shrinks ~1/n_shards, so auto re-decides after partitioning."""
    if cfg.memory_policy == "lean":
        return True
    if cfg.memory_policy == "plain":
        return False
    if cfg.memory_policy != "auto":
        raise ValueError(f"memory_policy: {cfg.memory_policy!r}")
    if jax.default_backend() != "tpu":
        return False
    return estimator(part, g, cfg) > 0.8 * _device_hbm_limit()


def resolve_memory_mode(g: Graph, adj, cfg: Stage2Config,
                        hbm_limit: Optional[int] = None,
                        on_tpu: Optional[bool] = None) -> str:
    """Three-tier HBM policy for the single-device KT-GNN runtime
    (VERDICT r3 item 7 recalibration):

      'plain'     — Mosaic kernels (when the VMEM gates admit them) +
                    stored residuals: fastest, biggest footprint
                    (~7.5 msg-space copies, r3-OOM-calibrated);
      'xla_plain' — kernels OFF, XLA autodiff fused path with stored
                    residuals (~5.2 copies, round-4 on-chip probe —
                    the 524k/8.9M plain step that the old policy sent
                    to lean actually executes on a v5e at 12.66 G);
      'lean'      — recompute-backward + remat (the capacity config).

    auto picks the fastest tier whose estimate fits in ~80% of HBM.
    ``hbm_limit`` / ``on_tpu`` exist for tests; defaults read the
    device."""
    if cfg.memory_policy in ("plain", "xla_plain", "lean"):
        return cfg.memory_policy
    if cfg.memory_policy != "auto":
        raise ValueError(f"memory_policy: {cfg.memory_policy!r}")
    if on_tpu is None:
        on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        return "plain"  # host backends page; the estimate is TPU-specific
    budget = 0.8 * (hbm_limit if hbm_limit is not None
                    else _device_hbm_limit())
    from bridged_gnn_tpu.ops import pallas_fused

    if pallas_fused.auto_kernel():
        if estimate_plain_hbm(g, adj, cfg, kernel_path=True) <= budget:
            return "plain"
    if estimate_plain_hbm(g, adj, cfg, kernel_path=False) <= budget:
        return "xla_plain"
    return "lean"


def resolve_memory_policy(g: Graph, adj, cfg: Stage2Config) -> bool:
    """True = lean (remat + recompute-backward attention). Back-compat
    boolean view of :func:`resolve_memory_mode`."""
    return resolve_memory_mode(g, adj, cfg) == "lean"


def build_model(cfg: Stage2Config, num_classes: int, lean: bool = False,
                lean_remat: bool = True, mode: Optional[str] = None):
    """``mode`` (three-tier policy, resolve_memory_mode): overrides the
    boolean ``lean`` — 'plain' = default kernels-when-they-fit,
    'xla_plain' = kernels off / stored residuals, 'lean' = recompute +
    remat."""
    if mode == "lean":
        lean = True
    elif mode == "xla_plain":
        if cfg.model_name == "KTGNN" and not cfg.no_dtc:
            return _build_ktgnn(cfg, num_classes,
                                dict(fused_kernel_fwd=False,
                                     fused_kernel_bwd=False))
    elif mode == "plain":
        lean = False
    return _build_model_impl(cfg, num_classes, lean, lean_remat)


def _build_ktgnn(cfg: Stage2Config, num_classes: int, extra_kw: dict):
    return KTGNN(
        num_classes=num_classes,
        layer_num=cfg.num_layer,
        hidden=cfg.hidden,
        root_weight=cfg.root_weight,
        dropout=cfg.dropout,
        use_bn=cfg.use_bn,
        need_complement=cfg.need_complement,
        dim_share=cfg.dim_share,
        step=cfg.complement_step,
        use_dist_loss=cfg.use_dist_loss,
        msg_dtype=cfg.message_dtype,
        **extra_kw,
    )


def _build_model_impl(cfg: Stage2Config, num_classes: int,
                      lean: bool = False, lean_remat: bool = True):
    # reference --no_dtc recipe trains a plain single-head model
    # (GraphSAGE in the run.sh configs); KTGNN_noDTC is the single-head
    # KT-GNN selected when the model name says so
    # (main_graph_knowledge_transfer.py:331-333,414-417)
    if cfg.model_name == "KTGNN_noDTC" or (
        cfg.no_dtc and cfg.model_name == "KTGNN"
    ):
        return KTGNNNoDTC(
            num_classes=num_classes,
            layer_num=cfg.num_layer,
            hidden=cfg.hidden,
            root_weight=cfg.root_weight,
            dropout=cfg.dropout,
            use_bn=cfg.use_bn,
            msg_dtype=cfg.message_dtype,
        )
    if cfg.model_name == "KTGNN" and not cfg.no_dtc:
        lean_kw = {}
        if lean:
            # the measured capacity config: remat + recompute-backward,
            # Mosaic kernels off (the kernel backward stores the
            # [B,Et,2D] residuals that recompute exists to avoid —
            # 35.6G vs 19.0G at 1M nodes, results_ktgnn_scale_r3.json).
            # lean_remat=False (sharded backends): recompute-backward
            # only — jax.checkpoint can't trace the HaloView's static
            # leaves, and the [slots, 2·hidden] residuals it avoids are
            # the dominant term anyway
            lean_kw = dict(remat=lean_remat, fused_recompute_bwd=True,
                           fused_kernel_fwd=False, fused_kernel_bwd=False)
        return _build_ktgnn(cfg, num_classes, lean_kw)
    from bridged_gnn_tpu.nn import backbones

    if cfg.message_dtype is not None:
        # refuse rather than silently ignore the knob on models that
        # don't consume it
        raise ValueError(
            "message_dtype applies to KTGNN-family models; "
            f"got model_name={cfg.model_name!r}"
        )
    return backbones.build_backbone(cfg.model_name, cfg, num_classes)


def train_ktgnn(
    data: Dict[str, np.ndarray],
    cfg: Optional[Stage2Config] = None,
) -> Dict[str, Any]:
    """Full stage-2 run. Returns best scores + timing diagnostics."""
    cfg = cfg or Stage2Config()
    if cfg.matmul_precision is not None:
        with jax.default_matmul_precision(cfg.matmul_precision):
            return _train_ktgnn_impl(data, cfg)
    return _train_ktgnn_impl(data, cfg)


def _surrogate_init_graph(num_features: int, num_classes: int):
    """O(1)-size graph with the real feature/class dims, for parameter
    init in sharded mode: every layer's param shapes depend only on
    (num_features, hidden, num_classes), so initializing on this
    surrogate yields the IDENTICAL param tree + init draws as a
    full-graph init (flax folds rngs by module path, not data) without
    the O(N·D) init forward."""
    rng = np.random.default_rng(0)
    n = max(16, num_classes + 8)  # every class present (y.max() drives C)
    data = dict(
        x=rng.normal(size=(n, num_features)).astype(np.float32),
        edge_index=rng.integers(0, n, size=(2, 4 * n)),
        y=np.concatenate([
            np.arange(num_classes),
            rng.integers(0, num_classes, size=n - num_classes),
        ]).astype(np.int64),
        train_mask=np.ones(n, dtype=bool),
        val_mask=np.zeros(n, dtype=bool),
        test_mask=np.zeros(n, dtype=bool),
        central_mask=np.arange(n) < n // 2,
    )
    g = with_self_loops(graph_from_dict(data))
    return g, adjacency_from_graph(g, method="gather")


def _train_ktgnn_impl(data, cfg):
    sharded = cfg.n_shards > 1
    sharded_single_head = cfg.no_dtc or cfg.model_name == "KTGNN_noDTC"
    if sharded and (cfg.model_name not in ("KTGNN", "KTGNN_noDTC")
                    or cfg.need_complement):
        raise ValueError(
            "n_shards > 1 supports the KTGNN and KTGNN_noDTC models "
            f"(need_complement=False); got model_name={cfg.model_name!r}, "
            f"need_complement={cfg.need_complement}"
        )
    g, adj = prepare_stage2_graph(data, cfg, build_adj=not sharded)
    num_classes = int(np.asarray(g.y).max()) + 1

    part = None
    if sharded and cfg.shard_layout == "halo":
        from bridged_gnn_tpu.parallel.halopart import build_halo_partition
        from bridged_gnn_tpu.parallel.stage2_runtime import (
            estimate_plain_hbm_per_shard,
        )

        part = build_halo_partition(g, cfg.n_shards,
                                    overlap=cfg.halo_overlap,
                                    node_block=cfg.halo_node_block)
        lean = resolve_memory_policy_sharded(
            part, g, cfg, estimate_plain_hbm_per_shard
        )
    elif sharded:
        # edge-shard keeps node arrays replicated: per-device message
        # residuals shrink 1/n but node terms don't — reuse the
        # single-device estimator shape with slots/n
        lean = cfg.memory_policy == "lean"
    if sharded:
        if sharded_single_head:
            # KTGNN_noDTC has no recompute-backward variant; the plain
            # path is its only (and much smaller) footprint
            lean = False
        mem_mode = "lean" if lean else "plain"
        model = build_model(cfg, num_classes, lean=lean,
                            lean_remat=False)
    else:
        mem_mode = (
            resolve_memory_mode(g, adj, cfg)
            if cfg.model_name == "KTGNN" and not cfg.no_dtc
            else "plain"
        )
        model = build_model(cfg, num_classes, mode=mem_mode)
    if mem_mode != "plain" and cfg.log_every:
        print(f"[memory_policy] {mem_mode} engaged"
              + (" (recompute-backward"
                 + ("" if sharded else " + remat") + ")"
                 if mem_mode == "lean" else " (kernels off)"))

    # layout argument-passing (compile hygiene; DESIGN.md §9): when
    # engaged, the slot-layout arrays enter every jitted step as the
    # `lay_leaves` argument and the ops are re-bound inside the trace
    if not sharded and resolve_pass_layouts(adj, cfg):
        if adj.fast_fn is not None:
            from bridged_gnn_tpu.ops.blocked_segment import (
                blocked_ops_leaves,
                rebind_blocked_ops,
            )

            lay_leaves = blocked_ops_leaves(adj.fast_fn)
            _meta_ops = adj.fast_fn

            def materialize_adj(adj_in, leaves):
                return adj_in.replace(
                    fast_fn=rebind_blocked_ops(leaves, _meta_ops)
                )
        else:
            # degree-tiered layouts: same rule, tiered twin
            from bridged_gnn_tpu.ops.blocked_segment import (
                rebind_tiered_ops,
                tiered_ops_leaves,
            )

            lay_leaves = tiered_ops_leaves(adj.tiered_fn)
            _meta_tops = adj.tiered_fn

            def materialize_adj(adj_in, leaves):
                return adj_in.replace(
                    tiered_fn=rebind_tiered_ops(leaves, _meta_tops)
                )
    else:
        lay_leaves = None

        def materialize_adj(adj_in, leaves):
            return adj_in

    frontiers = None
    if cfg.need_complement:
        from bridged_gnn_tpu.nn.complementor import (
            build_frontier_edges,
            pad_frontiers,
        )

        fr = build_frontier_edges(
            g.edge_index_np(),
            np.asarray(g.central_mask)[: g.num_nodes],
            step=cfg.complement_step,
        )
        frontiers = pad_frontiers(fr, g.num_nodes_padded)

    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng, drop_rng = jax.random.split(rng, 3)
    init_kwargs = (
        dict(frontiers=frontiers) if frontiers is not None else {}
    )
    if sharded:
        # O(1) init: param shapes/draws depend only on feature dims
        g_init, adj_init = _surrogate_init_graph(g.num_features,
                                                 num_classes)
    else:
        g_init, adj_init = g, adj
    variables = model.init(
        {"params": init_rng, "dropout": drop_rng}, g_init, adj_init,
        False, **init_kwargs,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    lr = (
        step_lr(cfg.lr, cfg.step_size, cfg.gamma)
        if cfg.use_scheduler
        else cfg.lr
    )
    tx = torch_adam(lr, weight_decay=cfg.weight_decay)
    opt_state = tx.init(params)

    is_ktgnn = not cfg.no_dtc and cfg.model_name == "KTGNN"

    # g and adj enter every jitted step as ARGUMENTS, never as closure
    # captures: closure-captured graph-sized arrays are embedded into
    # the HLO as constants and XLA constant-folds over them, which makes
    # compile time scale with graph size. Measured on chip at 131k nodes
    # (median-of-10 epochs; the tunneled chip stalls make means
    # unusable): closure compile 135-278 s vs 41 s with argument
    # passing, median epoch time equal (0.231 vs 0.242 s — DESIGN.md
    # §9). The blocked layouts inside adj.fast_fn remain static by
    # design (they feed Mosaic kernel shapes); frontiers stays closed
    # over (None in every run.sh config).
    def apply_model(variables, train, g, adj, **kw):
        if is_ktgnn and frontiers is not None:
            return model.apply(variables, g, adj, train,
                               frontiers=frontiers, **kw)
        return model.apply(variables, g, adj, train, **kw)

    def loss_fn(params, batch_stats, dropout_rng, g, adj):
        tar_train = g.train_mask & (~g.central_mask)
        outs, mutated = apply_model(
            {"params": params, "batch_stats": batch_stats}, True, g, adj,
            rngs={"dropout": dropout_rng},
            mutable=["batch_stats"],
        )
        if is_ktgnn:
            lp_s, lp_t, lp_that, loss_dist = outs
            loss_s = masked_nll(lp_s, g.y, g.train_mask)
            loss_t1 = masked_nll(lp_t, g.y, tar_train)
            loss_t2 = masked_nll(lp_that, g.y, tar_train)
            loss_kl = kl_batchmean(lp_that, lp_t, g.node_mask)
            loss = (
                (2.0 * loss_s + loss_t1 + loss_t2) / 4.0
                + cfg.Lambda * loss_kl
            )
            if loss_dist is not None:
                # complementor distribution loss added on top
                # (reference main_graph_knowledge_transfer.py:60-63)
                loss = loss + loss_dist
            aux = dict(
                loss_t2=loss_t2, loss_t1=loss_t1, loss_kl=loss_kl,
                loss_s=loss_s,
            )
        else:
            lp = outs[0] if isinstance(outs, tuple) else outs
            loss = masked_nll(lp, g.y, g.train_mask)
            aux = dict(loss_t2=loss, loss_t1=loss, loss_kl=0.0, loss_s=loss)
        return loss, (aux, mutated["batch_stats"])

    @jax.jit
    def train_step(params, batch_stats, opt_state, dropout_rng, g, adj,
                   leaves):
        adj = materialize_adj(adj, leaves)
        (loss, (aux, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, dropout_rng, g, adj)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss, aux

    @jax.jit
    def eval_step(params, batch_stats, g, adj, leaves):
        adj = materialize_adj(adj, leaves)
        outs = apply_model(
            {"params": params, "batch_stats": batch_stats}, False, g, adj
        )
        if is_ktgnn:
            lp_s, lp_t, lp_that, _ = outs
        else:
            lp_s = lp_t = lp_that = (
                outs[0] if isinstance(outs, tuple) else outs
            )
        return (
            jnp.argmax(lp_s, axis=1),
            jnp.argmax(lp_t, axis=1),
            jnp.argmax(lp_that, axis=1),
            lp_s, lp_t, lp_that,
        )

    def _confusion_counts(pred, mask, g):
        """[3, C+1] tp/pred/true counts over masked rows. Bin C holds
        y == -1 rows (never predicted) so host-side macro-F1 reproduces
        sklearn's label set exactly (metrics.score_from_counts)."""
        # int32 accumulation: exact up to 2^31 rows per bin (f32 one-hot
        # sums silently stop incrementing at 2^24)
        y_bin = jnp.where(g.y < 0, num_classes, g.y)
        m = mask.astype(jnp.int32)[:, None]
        oh_true = jax.nn.one_hot(y_bin, num_classes + 1,
                                 dtype=jnp.int32) * m
        oh_pred = jax.nn.one_hot(pred, num_classes + 1,
                                 dtype=jnp.int32) * m
        tp = jnp.sum(oh_true * oh_pred, axis=0)
        return jnp.stack(
            [tp, jnp.sum(oh_pred, axis=0), jnp.sum(oh_true, axis=0)]
        )

    def _epoch_body(carry, _, g, adj):
        params, bs, opt_state, rng = carry
        rng, drop = jax.random.split(rng)
        (loss, (aux, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, bs, drop, g, adj)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        outs = apply_model({"params": params, "batch_stats": new_bs},
                           False, g, adj)
        if is_ktgnn:
            lp_s, lp_t, lp_that, _ = outs
        else:
            lp_s = lp_t = lp_that = (
                outs[0] if isinstance(outs, tuple) else outs
            )
        p_s = jnp.argmax(lp_s, axis=1)
        p_t = jnp.argmax(lp_t, axis=1)
        p_that = jnp.argmax(lp_that, axis=1)
        # Per-epoch eval streams O(C) confusion counts, not O(N)
        # prediction stacks: the splits score the reference's head
        # assignment (train <- source head, val/test <- distilled
        # target-hat head) plus the per-head test rows used when a new
        # best epoch is recorded.
        counts = jnp.stack([
            _confusion_counts(p_s, g.train_mask, g),
            _confusion_counts(p_that, g.val_mask, g),
            _confusion_counts(p_that, g.test_mask, g),
            _confusion_counts(p_s, g.test_mask, g),
            _confusion_counts(p_t, g.test_mask, g),
        ])
        ys = (loss, aux["loss_t2"], counts)
        return (params, new_bs, opt_state, rng), ys

    _scan_cache = {}

    def scan_chunk(params, batch_stats, opt_state, rng, length):
        """Run `length` epochs in one device dispatch (lax.scan)."""
        if length not in _scan_cache:
            def _run(c, g, adj, leaves):
                adj = materialize_adj(adj, leaves)
                return jax.lax.scan(
                    lambda carry, x: _epoch_body(carry, x, g, adj),
                    c, None, length=length,
                )

            _scan_cache[length] = jax.jit(_run)
        return _scan_cache[length](
            (params, batch_stats, opt_state, rng), g, adj, lay_leaves
        )

    # --- backend selection (VERDICT r3 item 1): the SAME loop below
    # drives either the single-device jitted steps or an n_shards-device
    # mesh backend (parallel/stage2_runtime.py) — eval heads, best
    # selection, scan, checkpoints and guards are layout-blind
    if sharded:
        from bridged_gnn_tpu.parallel.stage2_runtime import (
            make_stage2_backend,
        )

        backend = make_stage2_backend(model, g, cfg, tx, num_classes,
                                      part=part)
        do_train_step = backend.train_step
        do_eval_arrays = backend.eval_arrays

        def do_scan(params, batch_stats, opt_state, rng, length):
            return backend.scan_chunk(params, batch_stats, opt_state,
                                      rng, length)
    else:
        def do_train_step(params, batch_stats, opt_state, drop_rng):
            return train_step(params, batch_stats, opt_state, drop_rng,
                              g, adj, lay_leaves)

        def do_eval_arrays(params, batch_stats):
            return tuple(
                np.asarray(a)
                for a in eval_step(params, batch_stats, g, adj,
                                   lay_leaves)
            )

        do_scan = scan_chunk

    y_np = np.asarray(g.y)
    masks_np = {
        "train": np.asarray(g.train_mask),
        "val": np.asarray(g.val_mask),
        "test": np.asarray(g.test_mask),
    }

    def evaluate(params, batch_stats):
        pred_s, pred_t, pred_that, lp_s, lp_t, lp_that = do_eval_arrays(
            params, batch_stats
        )

        def probs_pos(lp, mask):
            # positive-class probability for auc (reference
            # main_graph_knowledge_transfer.py:88,102 uses column 1)
            return np.exp(lp[mask, 1]) if lp.shape[1] > 1 else None

        scores = {}
        for split, mask in masks_np.items():
            # source head for train, distilled target-hat head for val/test
            pred, lp = (
                (pred_s, lp_s) if split == "train" else (pred_that, lp_that)
            )
            scores[split] = eval_metric(
                y_np[mask], pred[mask], cfg.metric, cfg.f1_average,
                probs_pos=probs_pos(lp, mask),
            )
        tmask = masks_np["test"]
        per_head = {
            name: eval_metric(
                y_np[tmask], pred[tmask], cfg.metric, cfg.f1_average,
                probs_pos=probs_pos(lp, tmask),
            )
            for name, pred, lp in (
                ("source", pred_s, lp_s),
                ("target", pred_t, lp_t),
                ("target_hat", pred_that, lp_that),
            )
        }
        return scores, per_head

    # --- check_numerics guards (cfg.check_numerics; SURVEY §5.2) ---
    spread_fn = None
    numerics_state = {"max_spread": 0.0}
    if cfg.check_numerics and is_ktgnn and not sharded and (
        adj.fast_fn is not None
        and getattr(adj.fast_fn, "gather_slots", None) is not None
        and not (adj.use_dense)
    ):
        # (sharded backends assert finite state only: the spread probe's
        # Mosaic envelope applies to the single-device kernel layouts)
        # re-run the model with spread diagnostics sown on the custom-VJP
        # fused branch (forced via fused_recompute_bwd — identical param
        # structure, see nn/common.ParamKernel)
        dbg_model = model.clone(debug_spread=True, fused_recompute_bwd=True)

        @jax.jit
        def spread_fn(params, batch_stats, g, adj, leaves):
            adj = materialize_adj(adj, leaves)
            _, diag = dbg_model.apply(
                {"params": params, "batch_stats": batch_stats},
                g, adj, False, mutable=["diagnostics"],
            )
            leaves = jax.tree_util.tree_leaves(diag)
            return jnp.max(jnp.stack([jnp.ravel(v)[0] for v in leaves]))

    def numerics_check(params, batch_stats, losses, epoch):
        """Raises FloatingPointError on non-finite state or a logit
        spread outside the block-max softmax envelope."""
        if not cfg.check_numerics:
            return
        from bridged_gnn_tpu.ops.pallas_fused import SOFTMAX_SPREAD_LIMIT
        from bridged_gnn_tpu.utils.sanitizers import assert_all_finite

        assert_all_finite(
            {"loss": np.asarray(losses), "params": params},
            f"train state at epoch {epoch}",
        )
        if spread_fn is not None:
            sp = float(spread_fn(params, batch_stats, g, adj, lay_leaves))
            numerics_state["max_spread"] = max(
                numerics_state["max_spread"], sp
            )
            if sp > SOFTMAX_SPREAD_LIMIT:
                raise FloatingPointError(
                    f"attention logit spread {sp:.1f} at epoch {epoch} "
                    f"exceeds the block-max softmax envelope "
                    f"({SOFTMAX_SPREAD_LIMIT}) — the Mosaic kernel path "
                    "would silently underflow; check feature scaling/init"
                )

    best = {"train": 0.0, "val": 0.0, "test": 0.0, "loss": 666.0,
            "epoch": -1}
    best_variables = None
    history = []
    start_epoch = 1
    ckptr = None
    if cfg.ckpt_dir:
        from flax import serialization

        from bridged_gnn_tpu.train.checkpoint import TrainCheckpointer

        ckptr = TrainCheckpointer(cfg.ckpt_dir)
        if cfg.resume:
            raw = ckptr.restore()
            if raw is not None:
                template = dict(params=params, batch_stats=batch_stats,
                                opt_state=opt_state, rng=rng)
                restored = serialization.from_state_dict(
                    template, raw["state"]
                )
                params = restored["params"]
                batch_stats = restored["batch_stats"]
                opt_state = restored["opt_state"]
                rng = jnp.asarray(restored["rng"])
                best = {
                    k: (int(v) if k == "epoch"
                        else float(v) if isinstance(v, (int, float, np.number))
                        else v)
                    for k, v in raw["best"].items()
                }
                start_epoch = int(raw["epoch"]) + 1
    t_start = time.time()
    timer = StepTimer(num_edges=g.num_edges)
    epoch_times = timer.times

    use_scan = (
        cfg.scan_epochs > 0
        and cfg.metric in ("f1", "acc")
        and cfg.f1_average in ("macro", "binary")
        and cfg.save_best_path is None
    )
    if use_scan:
        epoch = start_epoch
        while epoch <= cfg.num_epoch:
            k = min(cfg.scan_epochs, cfg.num_epoch - epoch + 1)
            t0 = time.time()
            (params, batch_stats, opt_state, rng), ys = do_scan(
                params, batch_stats, opt_state, rng, k
            )
            losses, losses_t2, counts = (np.asarray(a) for a in ys)
            numerics_check(params, batch_stats, losses, epoch + k - 1)
            chunk_dt = time.time() - t0
            epoch_times.extend([chunk_dt / k] * k)
            if epoch == start_epoch:
                # every entry of the first chunk carries an equal share
                # of the jit compile — exclude the whole chunk from
                # steady-state stats, not just the default 2 entries
                timer.warmup = max(timer.warmup, len(epoch_times))
            for j in range(k):
                e = epoch + j

                def _score(row):
                    return score_from_counts(
                        *counts[j, row], metric=cfg.metric,
                        f1_average=cfg.f1_average,
                    )

                scores = {
                    "train": _score(0), "val": _score(1), "test": _score(2)
                }
                history.append(dict(
                    epoch=e, loss=float(losses[j]),
                    loss_t2=float(losses_t2[j]), **scores,
                ))
                if losses_t2[j] < best["loss"]:
                    per_head = {
                        "source": _score(3),
                        "target": _score(4),
                        "target_hat": scores["test"],
                    }
                    best.update(
                        train=scores["train"], val=scores["val"],
                        test=scores["test"], loss=float(losses_t2[j]),
                        epoch=e, per_head=per_head,
                    )
                if cfg.log_every and e % cfg.log_every == 0:
                    print(
                        f"Epoch {e:03d} loss {float(losses[j]):.4f} "
                        f"train {scores['train']:.4f} "
                        f"val {scores['val']:.4f} test {scores['test']:.4f}"
                    )
            epoch += k
            if ckptr is not None:
                from flax import serialization

                ckptr.save(epoch - 1, dict(
                    state=serialization.to_state_dict(dict(
                        params=params, batch_stats=batch_stats,
                        opt_state=opt_state, rng=rng,
                    )),
                    best=best,
                    epoch=epoch - 1,
                ))
        return dict(
            best=best,
            history=history,
            total_time=time.time() - t_start,
            max_logit_spread=numerics_state["max_spread"],
            # steady-state mean: timer.warmup excludes the whole
            # compile-bearing first chunk (set above)
            mean_epoch_time=float(timer.steady.mean()),
            throughput=timer.summary(),
            params=params,
            batch_stats=batch_stats,
            num_edges=g.num_edges,
        )

    for epoch in range(start_epoch, cfg.num_epoch + 1):
        with timer:
            rng, drop_rng = jax.random.split(rng)
            params, batch_stats, opt_state, loss, aux = do_train_step(
                params, batch_stats, opt_state, drop_rng
            )
            loss_t2 = float(aux["loss_t2"])
            numerics_check(params, batch_stats, float(loss), epoch)
            scores, per_head = evaluate(params, batch_stats)
        history.append(
            dict(epoch=epoch, loss=float(loss), loss_t2=loss_t2, **scores)
        )
        if cfg.log_every and epoch % cfg.log_every == 0:
            print(
                f"Epoch {epoch:03d} loss {float(loss):.4f} "
                f"train {scores['train']:.4f} val {scores['val']:.4f} "
                f"test {scores['test']:.4f}"
            )
        if loss_t2 < best["loss"]:
            best.update(
                train=scores["train"], val=scores["val"],
                test=scores["test"], loss=loss_t2, epoch=epoch,
                per_head=per_head,
            )
            if cfg.save_best_path:
                best_variables = jax.tree.map(
                    np.asarray,
                    {"params": params, "batch_stats": batch_stats},
                )
        if ckptr is not None and (
            epoch % cfg.ckpt_every == 0 or epoch == cfg.num_epoch
        ):
            from flax import serialization

            ckptr.save(epoch, dict(
                state=serialization.to_state_dict(dict(
                    params=params, batch_stats=batch_stats,
                    opt_state=opt_state, rng=rng,
                )),
                best=best,
                epoch=epoch,
            ))

    if cfg.save_best_path and best_variables is not None:
        import pickle

        with open(cfg.save_best_path, "wb") as f:
            pickle.dump(best_variables, f)

    return dict(
        best=best,
        history=history,
        total_time=time.time() - t_start,
        max_logit_spread=numerics_state["max_spread"],
        mean_epoch_time=float(np.mean(epoch_times[2:]))
        if len(epoch_times) > 2
        else float(np.mean(epoch_times)),
        throughput=timer.summary(),
        params=params,
        batch_stats=batch_stats,
        num_edges=g.num_edges,
    )
