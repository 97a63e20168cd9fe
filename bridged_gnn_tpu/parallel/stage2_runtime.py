"""First-class multi-device backend for the stage-2 training runtime.

VERDICT r3 item 1: the halo row partition (parallel/halopart.py) and the
edge-shard layout (parallel/edgeshard.py) used to be bare step factories —
demonstration code whose only consumers were tests and the dryrun. This
module turns them into *backends of the production runtime*
(train/stage2.py::train_ktgnn): the same epoch loop, eval heads,
best-by-``loss_clf_t2`` selection, Orbax checkpoint/resume, scan mode and
numerics guards now drive either a single device (``n_shards=1``,
degenerate case) or an ``n_shards``-device mesh, selected purely by
``Stage2Config.n_shards`` / ``--n_shards``.

A backend exposes three entry points consumed by ``train_ktgnn``:

* ``train_step(params, batch_stats, opt_state, dropout_rng)`` →
  ``(params, batch_stats, opt_state, loss, aux)`` — one optimizer step;
  ``aux`` carries the reference's component losses (``loss_t2`` drives
  best-model selection, main_graph_knowledge_transfer.py:238-245).
* ``eval_arrays(params, batch_stats)`` →
  ``(pred_s, pred_t, pred_that, lp_s, lp_t, lp_that)`` in the GLOBAL
  padded node space ``[N_pad(, C)]`` — host metric code is layout-blind.
* ``scan_chunk(params, batch_stats, opt_state, rng, length)`` →
  ``((params, bs, opt_state, rng), (losses, losses_t2, counts))`` —
  ``length`` epochs in one device dispatch (train + eval + O(C)
  confusion counts per epoch, ``lax.scan``), the TPU-native loop.

Layouts:

* ``halo`` (production default): row partition + boundary all_to_all;
  wire bytes scale with the edge cut (halopart module docstring). With
  ``halo_overlap=True`` the comm/compute-overlap split layouts are used.
* ``edgeshard``: 1-D edge partition, node arrays replicated, psum
  combines — more wire bytes but no partition build cost; useful when
  the graph is edge-dominated and the cut is terrible.

All partition/layout arrays enter the jitted steps as ARGUMENTS (not
closure constants), keeping compile time flat in graph size — the same
hygiene rule the single-device runtime follows (DESIGN.md §9).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from bridged_gnn_tpu.graph import Graph
from bridged_gnn_tpu.parallel.halopart import (
    HaloPartition,
    HaloView,
    _shard_node,
    build_halo_partition,
)


def estimate_plain_hbm_per_shard(part: HaloPartition, g: Graph, cfg) -> int:
    """Per-shard analogue of train.stage2.estimate_plain_hbm for the halo
    layout: the widest conv's message-space residuals live per shard in
    the shard's dst slot layout ([pd_blocks·pd_tile, 2·hidden]), features
    and activations in the shard's extended row space. Same calibrated
    constants as the single-device estimator (results_ktgnn_scale_r3.json);
    the slot count shrinks ~1/n_shards (plus cut-dependent halo padding),
    which is the capacity-scaling story this layout exists for."""
    slots = part.pd_blocks * part.pd_tile
    msg_item = 2 if cfg.message_dtype == "bfloat16" else 4
    d_in = g.x.shape[1]
    return int(
        7.5 * slots * 2 * cfg.hidden * msg_item
        + 4 * part.ext_len * d_in * 4
        + 7 * slots * 4
        + 7 * part.ps_blocks * part.ps_tile * 4
    )


def _norm_outs(outs):
    """Normalize a model forward to the 4-tuple head layout: KTGNN
    returns (lp_s, lp_t, lp_that, loss_dist); single-head models
    (KTGNN_noDTC, baselines) return lp or (lp, aux) — triple the head so
    the eval/count machinery is model-shape-blind (same normalization as
    the single-device loop, train/stage2.py)."""
    if isinstance(outs, tuple) and len(outs) == 4:
        return outs
    lp = outs[0] if isinstance(outs, tuple) else outs
    return lp, lp, lp, None


def _is_single_head(cfg) -> bool:
    """Same predicate as train/stage2.py's sharded dispatch (the
    backends only ever see KTGNN / KTGNN_noDTC — _train_ktgnn_impl
    rejects everything else before construction)."""
    return bool(getattr(cfg, "no_dtc", False)) \
        or cfg.model_name == "KTGNN_noDTC"


def _confusion_counts(pred, y, mask, num_classes):
    """[3, C+1] tp/pred/true counts over masked rows (see
    train.stage2._confusion_counts — device-side macro-F1 ingredients;
    bin C holds y == -1 rows so host scoring reproduces sklearn)."""
    y_bin = jnp.where(y < 0, num_classes, y)
    m = mask.astype(jnp.int32)[:, None]
    oh_true = jax.nn.one_hot(y_bin, num_classes + 1, dtype=jnp.int32) * m
    oh_pred = jax.nn.one_hot(pred, num_classes + 1, dtype=jnp.int32) * m
    tp = jnp.sum(oh_true * oh_pred, axis=0)
    return jnp.stack(
        [tp, jnp.sum(oh_pred, axis=0), jnp.sum(oh_true, axis=0)]
    )


class HaloStage2Backend:
    """Halo row-partitioned backend of ``train_ktgnn`` (see module docs).

    Parameters/optimizer state replicated; node arrays, edge arrays and
    slot layouts row-sharded over the mesh axis. Gradients come out
    replicated because losses are psum'd inside the device loss (the
    collective transposes redistribute per-shard cotangents — same
    construction as make_halo_ktgnn_train_step, which remains as the
    minimal step factory for tests/examples).
    """

    def __init__(
        self,
        mesh: Mesh,
        model,
        g: Graph,
        cfg,
        tx: optax.GradientTransformation,
        num_classes: int,
        overlap: bool = False,
        part: Optional[HaloPartition] = None,
    ):
        from bridged_gnn_tpu.train.stage2 import kl_batchmean, masked_nll

        self.mesh = mesh
        self.axis = axis = mesh.axis_names[0]
        n_dev = mesh.devices.size
        self.part = part = part or build_halo_partition(
            g, n_dev, overlap=overlap,
            node_block=getattr(cfg, "halo_node_block", None),
        )
        self.num_nodes_padded = g.num_nodes_padded
        Lambda = cfg.Lambda

        # device-resident partition + node arrays, passed as jit
        # ARGUMENTS and pre-placed with their row sharding (one transfer
        # at build; per-step calls then reuse the committed buffers)
        row_sh = jax.sharding.NamedSharding(mesh, P(axis))

        def put(a):
            return jax.device_put(jnp.asarray(a), row_sh)

        self._edge_args = tuple(
            put(a)
            for a in (
                part.senders_local, part.receivers_local, part.edge_mask,
                part.send_idx, part.send_mask, part.central_ext,
                part.node_mask_ext, part.block_start,
            )
        )
        self._pl = {k: put(v) for k, v in part.pl.items()}
        self._pl2 = (
            {k: put(v) for k, v in part.pl2.items()}
            if part.pl2 is not None
            else {}
        )
        self._node_args = tuple(
            put(a)
            for a in (
                _shard_node(np.asarray(g.x), part),
                _shard_node(np.asarray(g.y), part, fill=-1),
                _shard_node(np.asarray(g.node_mask), part, fill=False),
                _shard_node(np.asarray(g.central_mask), part, fill=False),
                _shard_node(np.asarray(g.train_mask), part, fill=False),
                _shard_node(np.asarray(g.val_mask), part, fill=False),
                _shard_node(np.asarray(g.test_mask), part, fill=False),
            )
        )

        def halo_view(sl, rl, em, sidx, smask, ce, nme, bstart, pl, pl2):
            return HaloView(
                senders_local=sl, receivers_local=rl, edge_mask=em,
                send_idx=sidx, send_mask=smask, central_ext=ce,
                node_mask_ext=nme, block_start=bstart,
                rows=part.rows, h_pair=part.h_pair,
                num_shards=n_dev, axis=axis,
                block_node_block=part.block_node_block,
                block_max_edges=part.block_max_edges,
                block_num_blocks=part.block_num_blocks,
                pl=pl, pd_tile=part.pd_tile, pd_blocks=part.pd_blocks,
                ps_tile=part.ps_tile, ps_blocks=part.ps_blocks,
                ext_len=part.ext_len,
                pl2=pl2 if pl2 else None,
                t_ld=part.t_ld, t_ls=part.t_ls, b_ls=part.b_ls,
                t_hd=part.t_hd, t_hs=part.t_hs, b_hs=part.b_hs,
                halo_len=part.halo_len,
            )

        def local_graph(sl, rl, em, x, y, nm, cm, tm, vm, sm):
            # device-local Graph view: every leaf is a shard-local array
            # (no global closure constants enter the HLO); static counts
            # are per-shard and unused by the halo forward
            return Graph(
                x=x, y=y, senders=sl, receivers=rl, edge_mask=em,
                node_mask=nm, train_mask=tm, val_mask=vm, test_mask=sm,
                central_mask=cm, num_nodes=part.rows,
                num_edges=part.e_shard,
            )

        def device_forward(params, bs, train, drop_rng, args):
            (sl, rl, em, sidx, smask, ce, nme, bstart, pl, pl2,
             x, y, nm, cm, tm, vm, sm) = args
            hv = halo_view(sl, rl, em, sidx, smask, ce, nme, bstart, pl,
                           pl2)
            gl = local_graph(sl, rl, em, x, y, nm, cm, tm, vm, sm)
            variables = {"params": params, "batch_stats": bs}
            if train:
                drop = jax.random.fold_in(
                    drop_rng, jax.lax.axis_index(axis)
                )
                outs, mutated = model.apply(
                    variables, gl, None, True, halo=hv,
                    rngs={"dropout": drop}, mutable=["batch_stats"],
                )
                return outs, mutated["batch_stats"]
            return model.apply(variables, gl, None, False, halo=hv), bs

        single_head = _is_single_head(cfg)

        def device_loss(params, bs, drop_rng, *args):
            (_, y, nm, cm, tm) = args[10:15]
            tt = tm & ~cm
            outs, new_bs = device_forward(params, bs, True, drop_rng, args)
            lp_s, lp_t, lp_that, _ = _norm_outs(outs)
            if single_head:
                # plain NLL on the train mask — identical to the
                # single-device non-KTGNN branch (train/stage2.py)
                loss = masked_nll(lp_s, y, tm, axis_name=axis)
                aux = dict(loss_t2=loss, loss_t1=loss, loss_kl=0.0,
                           loss_s=loss)
                return loss, (aux, new_bs)
            loss_s = masked_nll(lp_s, y, tm, axis_name=axis)
            loss_t1 = masked_nll(lp_t, y, tt, axis_name=axis)
            loss_t2 = masked_nll(lp_that, y, tt, axis_name=axis)
            loss_kl = kl_batchmean(lp_that, lp_t, nm, axis_name=axis)
            loss = (
                (2.0 * loss_s + loss_t1 + loss_t2) / 4.0 + Lambda * loss_kl
            )
            aux = dict(loss_t2=loss_t2, loss_t1=loss_t1, loss_kl=loss_kl,
                       loss_s=loss_s)
            return loss, (aux, new_bs)

        def step(params, bs, opt_state, drop_rng, *args):
            (loss, (aux, new_bs)), grads = jax.value_and_grad(
                device_loss, has_aux=True
            )(params, bs, drop_rng, *args)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_bs, opt_state, loss, aux

        rowp, rep = P(axis), P()
        arg_specs = (rowp,) * 8 + (rowp, rowp) + (rowp,) * 7
        sharded_step = jax.shard_map(
            step, mesh=mesh,
            in_specs=(rep, rep, rep, rep) + arg_specs,
            out_specs=(rep, rep, rep, rep, rep),
        )

        # partition/node arrays enter every jitted step as ARGUMENTS
        # (varargs below), never closure captures — closure-captured
        # concrete arrays embed into the HLO as constants and compile
        # time scales with graph size (DESIGN.md §9; same rule as the
        # single-device runtime)
        @jax.jit
        def train_step(params, bs, opt_state, drop_rng, *args):
            return sharded_step(params, bs, opt_state, drop_rng, *args)

        def eval_fn(params, bs, *args):
            outs, _ = device_forward(params, bs, False, None, args)
            lp_s, lp_t, lp_that, _ = _norm_outs(outs)
            return (
                jnp.argmax(lp_s, axis=1),
                jnp.argmax(lp_t, axis=1),
                jnp.argmax(lp_that, axis=1),
                lp_s, lp_t, lp_that,
            )

        sharded_eval = jax.shard_map(
            eval_fn, mesh=mesh,
            in_specs=(rep, rep) + arg_specs,
            out_specs=(rowp,) * 6,
        )

        @jax.jit
        def eval_step(params, bs, *args):
            return sharded_eval(params, bs, *args)

        def epoch_body(carry, _, args):
            params, bs, opt_state, rng = carry
            rng, drop = jax.random.split(rng)
            (loss, (aux, new_bs)), grads = jax.value_and_grad(
                device_loss, has_aux=True
            )(params, bs, drop, *args)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            outs, _ = device_forward(params, new_bs, False, None, args)
            lp_s, lp_t, lp_that, _ = _norm_outs(outs)
            p_s = jnp.argmax(lp_s, axis=1)
            p_t = jnp.argmax(lp_t, axis=1)
            p_that = jnp.argmax(lp_that, axis=1)
            (_, y, _, _, tm, vm, sm) = args[10:]
            counts = jnp.stack([
                _confusion_counts(p_s, y, tm, num_classes),
                _confusion_counts(p_that, y, vm, num_classes),
                _confusion_counts(p_that, y, sm, num_classes),
                _confusion_counts(p_s, y, sm, num_classes),
                _confusion_counts(p_t, y, sm, num_classes),
            ])
            counts = jax.lax.psum(counts, axis)
            return (params, new_bs, opt_state, rng), (
                loss, aux["loss_t2"], counts
            )

        self._scan_cache = {}

        def make_scan(length):
            def scan_fn(params, bs, opt_state, rng, *args):
                return jax.lax.scan(
                    lambda c, x: epoch_body(c, x, args),
                    (params, bs, opt_state, rng), None, length=length,
                )

            sharded_scan = jax.shard_map(
                scan_fn, mesh=mesh,
                in_specs=(rep, rep, rep, rep) + arg_specs,
                out_specs=((rep, rep, rep, rep), (rep, rep, rep)),
            )

            @jax.jit
            def scan_chunk(params, bs, opt_state, rng, *args):
                return sharded_scan(params, bs, opt_state, rng, *args)

            return scan_chunk

        self._make_scan = make_scan
        self._train_step = train_step
        self._eval_step = eval_step

    def _args(self):
        return (*self._edge_args, self._pl, self._pl2, *self._node_args)

    # --- runtime protocol -------------------------------------------------
    def train_step(self, params, batch_stats, opt_state, dropout_rng):
        return self._train_step(params, batch_stats, opt_state,
                                dropout_rng, *self._args())

    def eval_arrays(self, params, batch_stats):
        """Global-node-space predictions + log-probs (sliced to the
        unsharded padded length so host metric code is layout-blind)."""
        outs = self._eval_step(params, batch_stats, *self._args())
        n = self.num_nodes_padded
        return tuple(np.asarray(a)[:n] for a in outs)

    def scan_chunk(self, params, batch_stats, opt_state, rng, length):
        if length not in self._scan_cache:
            self._scan_cache[length] = self._make_scan(length)
        return self._scan_cache[length](params, batch_stats, opt_state,
                                        rng, *self._args())


class EdgeShardStage2Backend:
    """Edge-partitioned backend: edges sharded 1-D, node arrays
    replicated, destination reductions psum'd (parallel/edgeshard.py).
    Higher wire volume than halo (3 full-array psums per conv) but no
    partition build cost; the eval/scan forwards reuse the same
    device code with ``train=False``."""

    def __init__(
        self,
        mesh: Mesh,
        model,
        g: Graph,
        cfg,
        tx: optax.GradientTransformation,
        num_classes: int,
    ):
        from bridged_gnn_tpu.ops.segment import segment_sum
        from bridged_gnn_tpu.ops.spmm import Adjacency
        from bridged_gnn_tpu.parallel.edgeshard import (
            pad_graph_edges_for_sharding,
        )
        from bridged_gnn_tpu.train.stage2 import kl_batchmean, masked_nll

        self.mesh = mesh
        self.axis = axis = mesh.axis_names[0]
        # the edge-sharded forward psums its segment reductions over the
        # mesh axis (ops/segment.py axis_name=) — same params, same tree
        model = model.clone(axis_name=axis)
        n_dev = mesh.devices.size
        g = pad_graph_edges_for_sharding(g, n_dev)
        self.num_nodes_padded = g.num_nodes_padded
        Lambda = cfg.Lambda

        in_degree = segment_sum(
            g.edge_mask.astype(jnp.float32), g.receivers,
            g.num_nodes_padded, indices_are_sorted=True,
        )
        edge_sh = jax.sharding.NamedSharding(mesh, P(axis))
        rep_sh = jax.sharding.NamedSharding(mesh, P())
        self._edge_args = tuple(
            jax.device_put(a, edge_sh)
            for a in (g.senders, g.receivers, g.edge_mask)
        )
        self._node_args = tuple(
            jax.device_put(a, rep_sh)
            for a in (
                g.x, g.y, g.node_mask, g.central_mask, g.train_mask,
                g.val_mask, g.test_mask, in_degree,
            )
        )
        num_nodes, num_edges = g.num_nodes, g.num_edges

        def device_forward(params, bs, train, drop_rng, args):
            (s, r, em, x, y, nm, cm, tm, vm, sm, deg) = args
            gl = Graph(
                x=x, y=y, senders=s, receivers=r, edge_mask=em,
                node_mask=nm, train_mask=tm, val_mask=vm, test_mask=sm,
                central_mask=cm, num_nodes=num_nodes, num_edges=num_edges,
            )
            adj = Adjacency(
                senders=s, receivers=r, edge_mask=em, dense=None,
                in_degree=deg, num_nodes=num_nodes,
            )
            variables = {"params": params, "batch_stats": bs}
            if train:
                outs, mutated = model.apply(
                    variables, gl, adj, True,
                    rngs={"dropout": drop_rng}, mutable=["batch_stats"],
                )
                return outs, mutated["batch_stats"]
            return model.apply(variables, gl, adj, False), bs

        single_head = _is_single_head(cfg)

        def device_loss(params, bs, drop_rng, *args):
            (y, nm, cm, tm) = args[4:8]
            tt = tm & ~cm
            outs, new_bs = device_forward(params, bs, True, drop_rng,
                                          args)
            lp_s, lp_t, lp_that, _ = _norm_outs(outs)
            if single_head:
                loss = masked_nll(lp_s, y, tm)
                aux = dict(loss_t2=loss, loss_t1=loss, loss_kl=0.0,
                           loss_s=loss)
                return loss, (aux, new_bs)
            # node arrays are replicated: losses need no psum
            loss_s = masked_nll(lp_s, y, tm)
            loss_t1 = masked_nll(lp_t, y, tt)
            loss_t2 = masked_nll(lp_that, y, tt)
            loss_kl = kl_batchmean(lp_that, lp_t, nm)
            loss = (
                (2.0 * loss_s + loss_t1 + loss_t2) / 4.0 + Lambda * loss_kl
            )
            aux = dict(loss_t2=loss_t2, loss_t1=loss_t1, loss_kl=loss_kl,
                       loss_s=loss_s)
            return loss, (aux, new_bs)

        def step(params, bs, opt_state, drop_rng, *args):
            (loss, (aux, new_bs)), grads = jax.value_and_grad(
                device_loss, has_aux=True
            )(params, bs, drop_rng, *args)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_bs, opt_state, loss, aux

        edgep, rep = P(axis), P()
        arg_specs = (edgep,) * 3 + (rep,) * 8
        sharded_step = jax.shard_map(
            step, mesh=mesh,
            in_specs=(rep, rep, rep, rep) + arg_specs,
            out_specs=(rep, rep, rep, rep, rep),
        )

        # graph arrays as jit ARGUMENTS (compile hygiene; see
        # HaloStage2Backend)
        @jax.jit
        def train_step(params, bs, opt_state, drop_rng, *args):
            return sharded_step(params, bs, opt_state, drop_rng, *args)

        def eval_fn(params, bs, *args):
            outs, _ = device_forward(params, bs, False, None, args)
            lp_s, lp_t, lp_that, _ = _norm_outs(outs)
            return (
                jnp.argmax(lp_s, axis=1),
                jnp.argmax(lp_t, axis=1),
                jnp.argmax(lp_that, axis=1),
                lp_s, lp_t, lp_that,
            )

        sharded_eval = jax.shard_map(
            eval_fn, mesh=mesh,
            in_specs=(rep, rep) + arg_specs,
            out_specs=(rep,) * 6,
        )

        @jax.jit
        def eval_step(params, bs, *args):
            return sharded_eval(params, bs, *args)

        def epoch_body(carry, _, args):
            params, bs, opt_state, rng = carry
            rng, drop = jax.random.split(rng)
            (loss, (aux, new_bs)), grads = jax.value_and_grad(
                device_loss, has_aux=True
            )(params, bs, drop, *args)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            outs, _ = device_forward(params, new_bs, False, None, args)
            lp_s, lp_t, lp_that, _ = _norm_outs(outs)
            p_s = jnp.argmax(lp_s, axis=1)
            p_t = jnp.argmax(lp_t, axis=1)
            p_that = jnp.argmax(lp_that, axis=1)
            (y, _, _, tm, vm, sm) = args[4:10]
            # replicated node arrays → identical counts on every shard
            counts = jnp.stack([
                _confusion_counts(p_s, y, tm, num_classes),
                _confusion_counts(p_that, y, vm, num_classes),
                _confusion_counts(p_that, y, sm, num_classes),
                _confusion_counts(p_s, y, sm, num_classes),
                _confusion_counts(p_t, y, sm, num_classes),
            ])
            return (params, new_bs, opt_state, rng), (
                loss, aux["loss_t2"], counts
            )

        self._scan_cache = {}

        def make_scan(length):
            def scan_fn(params, bs, opt_state, rng, *args):
                return jax.lax.scan(
                    lambda c, x: epoch_body(c, x, args),
                    (params, bs, opt_state, rng), None, length=length,
                )

            sharded_scan = jax.shard_map(
                scan_fn, mesh=mesh,
                in_specs=(rep, rep, rep, rep) + arg_specs,
                out_specs=((rep, rep, rep, rep), (rep, rep, rep)),
            )

            @jax.jit
            def scan_chunk(params, bs, opt_state, rng, *args):
                return sharded_scan(params, bs, opt_state, rng, *args)

            return scan_chunk

        self._make_scan = make_scan
        self._train_step = train_step
        self._eval_step = eval_step

    def _args(self):
        return (*self._edge_args, *self._node_args)

    def train_step(self, params, batch_stats, opt_state, dropout_rng):
        return self._train_step(params, batch_stats, opt_state,
                                dropout_rng, *self._args())

    def eval_arrays(self, params, batch_stats):
        outs = self._eval_step(params, batch_stats, *self._args())
        n = self.num_nodes_padded
        return tuple(np.asarray(a)[:n] for a in outs)

    def scan_chunk(self, params, batch_stats, opt_state, rng, length):
        if length not in self._scan_cache:
            self._scan_cache[length] = self._make_scan(length)
        return self._scan_cache[length](params, batch_stats, opt_state,
                                        rng, *self._args())


def make_stage2_backend(
    model,
    g: Graph,
    cfg,
    tx: optax.GradientTransformation,
    num_classes: int,
    part: Optional[HaloPartition] = None,
):
    """Build the sharded backend named by ``cfg.shard_layout`` over the
    first ``cfg.n_shards`` devices. Raises with a actionable message when
    fewer devices are visible (virtual CPU meshes:
    XLA_FLAGS=--xla_force_host_platform_device_count=N)."""
    from bridged_gnn_tpu.parallel.mesh import make_mesh

    n = cfg.n_shards
    if len(jax.devices()) < n:
        raise RuntimeError(
            f"n_shards={n} but only {len(jax.devices())} devices visible; "
            "for CPU testing set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n}"
        )
    if cfg.shard_layout == "halo":
        return HaloStage2Backend(
            make_mesh(n, ("nodes",)), model, g, cfg, tx, num_classes,
            overlap=cfg.halo_overlap, part=part,
        )
    if cfg.shard_layout == "edgeshard":
        return EdgeShardStage2Backend(
            make_mesh(n, ("edges",)), model, g, cfg, tx, num_classes
        )
    raise ValueError(f"shard_layout: {cfg.shard_layout!r}")
