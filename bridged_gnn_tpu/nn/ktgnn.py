"""KT-GNN: domain-adapted attention message passing (stage-2 flagship).

TPU-first re-design of the reference KT-GNN (models/KTGNN.py):

* The reference splits the edge set into ``edge_index1`` (edges into
  source-domain nodes) and ``edge_index2`` (edges into target-domain nodes),
  computes GATv2-style attention separately, concatenates the logits and
  applies one joint scatter-softmax keyed by destination, then runs two
  ``propagate`` scatter-adds (KTGNN.py:263-315). Because every destination is
  in exactly one domain, that is mathematically identical to a **single
  destination-sorted edge array** with a per-edge branch select — which is
  what we compute: one `segment_softmax`, one select, and aggregation via the
  dense-MXU SpMM path (two matmuls) or one masked segment-sum.
* Domain difference/shift (KTGNN.py:275-281) uses masked means so padded
  rows never contaminate statistics.
* BatchNorm between conv layers uses mask-aware batch statistics.

Parity quirks preserved (SURVEY §7.4): self-loops added after removing
existing ones; attention over x_t2s for central destinations / x_s2t for
target destinations; three heads (clf_base, clf_target,
clf_target∘clf_transformer); log-softmax outputs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bridged_gnn_tpu.graph import Graph
from bridged_gnn_tpu.nn.common import (
    MaskedBatchNorm,
    masked_mean,
    torch_dense,
)
from bridged_gnn_tpu.ops.segment import segment_softmax, segment_sum
from bridged_gnn_tpu.ops.spmm import Adjacency


class AdaptedConv(nn.Module):
    """Domain-adapted attention conv (reference models/KTGNN.py:218-328)."""

    out_channels: int
    root_weight: bool = False
    negative_slope: float = 0.1
    aggregate_dense: bool = True  # use MXU dense path when adj has dense
    axis_name: Optional[str] = None  # mesh axis for edge-sharded SPMD
    # fused attention (ops/fused_attention.py): logits + segment softmax +
    # aggregation from ONE row gather in the padded slot layout; used when
    # the adjacency carries blocked ops and the dense path doesn't apply
    use_fused: bool = True
    # opt-in memory-lean fused backward (recompute instead of residuals)
    fused_recompute_bwd: bool = False
    # single-Mosaic-kernel forward (ops/pallas_fused.py): 1.61x the
    # XLA fused forward on v5e (tools/bench_fused_kernel2.json).
    # None = auto (pallas_fused.auto_kernel): ON whenever running on the
    # TPU backend outside fp32-parity precision mode — parity runs keep
    # the deterministic autodiff ordering (kernel rounding order differs;
    # f32 interpret parity is 1e-4, tests/test_pallas_fused.py)
    fused_kernel_fwd: Optional[bool] = None
    # Mosaic backward kernel: with the forward kernel the full fwd+bwd
    # measures 54.0 ms vs 64.7 ms autodiff-XLA (1.20x) at bench scale —
    # the fastest training path. None = same auto policy
    fused_kernel_bwd: Optional[bool] = None
    # Message dtype for the per-edge attention/aggregation pass
    # ('bfloat16' production knob): the gather engine is the hot-path
    # bound (DESIGN.md §2) and moves one message row per edge slot, so
    # halving the row bytes targets ~2x on the gather-bound portion.
    # Gated shifts, logits math, softmax statistics, and the output
    # (cast back to x.dtype before BN) stay f32. None = x.dtype (parity)
    msg_dtype: Optional[str] = None
    # check-numerics diagnostic: sow the per-dst-block logit spread
    # (ops/fused_attention.block_logit_spread) into the 'diagnostics'
    # collection — the Mosaic kernel's block-max softmax shift silently
    # underflows if this exceeds ~80 (see pallas_fused module docstring).
    # Only active on the custom-VJP fused branch (where the kernel runs)
    debug_spread: bool = False
    # Branch-selected gather (VERDICT r4 #4): per edge slot only the
    # branch matching the destination's domain is consumed, so the
    # select is folded into the gather index over the stacked [2N, D]
    # table and every downstream slot tensor is D wide instead of 2D
    # (ops/fused_attention.make_adapted_attention_sel). Gather time is
    # unchanged (issue-rate-bound). Measured on v5e at bench scale
    # (results_fused_sel_tpu.json): the XLA fused forms are byte-bound
    # and the selective twin wins 1.56x (25.5 -> 16.4 ms fwd); the
    # Mosaic kernels are per-block-overhead-bound and do NOT profit, so
    # kernel paths keep the concatenated form. None = ON for the
    # non-kernel fused paths (bit-exact vs the concatenated form,
    # tests/test_fused_attention.py); False forces concatenated
    select_gather: Optional[bool] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,            # [N_pad, D]  (halo mode: [R, D] local)
        adj: Adjacency,          # self-loop-augmented adjacency
        central_mask: jax.Array,  # [N_pad] bool (halo mode: [R] local)
        node_mask: jax.Array,     # [N_pad] bool (halo mode: [R] local)
        halo=None,               # parallel.halopart.HaloView (row layout)
    ) -> jax.Array:
        if halo is not None:
            return self._halo_forward(x, central_mask, node_mask, halo)
        central = central_mask & node_mask
        target = (~central_mask) & node_mask

        # --- g: domain difference and gated shifts (KTGNN.py:275-281)
        mean_c = masked_mean(x, central, axis=0, keepdims=True)   # [1, D]
        mean_t = masked_mean(x, target, axis=0, keepdims=True)
        domain_diff = mean_c - mean_t                              # [1, D]
        dd = jnp.broadcast_to(domain_diff, x.shape)
        gcat = jnp.concatenate([x, dd], axis=-1)
        a_g_s2t = torch_dense(1, use_bias=False, name="a_g_s2t")(gcat)
        a_g_t2s = torch_dense(1, use_bias=False, name="a_g_t2s")(gcat)
        shift_s2t = jnp.tanh(a_g_s2t) * dd
        shift_t2s = jnp.tanh(a_g_t2s) * dd
        x_s2t = x - shift_s2t * central[:, None].astype(x.dtype)
        x_t2s = x + shift_t2s * target[:, None].astype(x.dtype)

        # --- f: two linear paths (KTGNN.py:283-284)
        u_s2t = torch_dense(self.out_channels, name="lin_t")(x_s2t)
        u_t2s = torch_dense(self.out_channels, name="lin_s")(x_t2s)
        if self.msg_dtype is not None:
            u_s2t = u_s2t.astype(self.msg_dtype)
            u_t2s = u_t2s.astype(self.msg_dtype)

        # --- fused path: attention + softmax + aggregation from two row
        # gathers in the padded slot layout (ops/fused_attention.py)
        fused_ok = (
            self.use_fused
            and self.axis_name is None
            and adj.fast_fn is not None
            and getattr(adj.fast_fn, "gather_slots", None) is not None
            and not (self.aggregate_dense and adj.use_dense)
        )
        if fused_ok:
            from bridged_gnn_tpu.ops import pallas_fused

            kernel_fwd = (
                pallas_fused.auto_kernel()
                if self.fused_kernel_fwd is None
                else self.fused_kernel_fwd
            )
            kernel_bwd = (
                pallas_fused.auto_kernel()
                if self.fused_kernel_bwd is None
                else self.fused_kernel_bwd
            )
            kernel_ok = kernel_bwd_ok = False
            if kernel_fwd:
                lay = adj.fast_fn.lay_dst
                isz = 2 if u_s2t.dtype == jnp.bfloat16 else 4
                kernel_ok = pallas_fused.fits_vmem(
                    lay.tile_e, lay.node_block, self.out_channels,
                    itemsize=isz,
                )
                kernel_bwd_ok = kernel_ok and pallas_fused.fits_vmem_bwd(
                    lay.tile_e, lay.node_block, self.out_channels,
                    itemsize=isz,
                )
            use_sel = (
                self.select_gather is not False
                and getattr(adj.fast_fn, "gather_slots_sel", None)
                is not None
            )
            if kernel_ok or self.fused_recompute_bwd:
                # custom-VJP variants. kernel_fwd: the whole attention
                # layer as ONE Mosaic kernel per dst block (inference
                # fast path, 1.65x the XLA forward on v5e). Otherwise the
                # memory-lean recompute backward: ~2 GB less residual
                # traffic per layer at bench scale but measured ~19%
                # slower fwd+bwd than autodiff (results_fused_tpu.json)
                from bridged_gnn_tpu.nn.common import ParamKernel
                from bridged_gnn_tpu.ops.fused_attention import (
                    make_adapted_attention,
                    make_adapted_attention_sel,
                )

                # Measured policy (results_fused_sel_tpu.json): the
                # Mosaic kernels are per-block-overhead-bound, not
                # byte-bound — the selective kernels move half the bytes
                # yet time equal (fwd) or worse (fwd+bwd), so kernel
                # paths keep the concatenated form; the XLA paths are
                # byte/flop-bound and the selective form wins there
                # (fwd 25.5 -> 16.4 ms at bench scale).
                # select_gather=True FORCES the selective form even on
                # the kernel path (A/B benching); None follows the
                # measured policy above
                make_fn = (
                    make_adapted_attention_sel
                    if use_sel and (self.select_gather is True
                                    or not kernel_ok)
                    else make_adapted_attention
                )
                a1 = ParamKernel(self.out_channels, name="a_f_t2s")()[:, 0]
                a2 = ParamKernel(self.out_channels, name="a_f_s2t")()[:, 0]
                if kernel_ok:
                    fn = make_fn(
                        adj.fast_fn, self.negative_slope,
                        kernel_fwd=True,
                        kernel_bwd=kernel_bwd and kernel_bwd_ok,
                        interpret=pallas_fused.default_interpret(),
                    )
                else:
                    fn = make_fn(
                        adj.fast_fn, self.negative_slope
                    )
                out = fn(
                    u_t2s, u_s2t, u_t2s, u_s2t,
                    central_mask.astype(jnp.float32), a1, a2,
                )
                if self.debug_spread:
                    from bridged_gnn_tpu.ops.fused_attention import (
                        block_logit_spread,
                    )

                    self.sow(
                        "diagnostics", "logit_spread",
                        block_logit_spread(
                            adj.fast_fn, u_t2s, u_s2t, central_mask,
                            a1, a2, self.negative_slope,
                        ),
                    )
            else:
                from bridged_gnn_tpu.ops.fused_attention import (
                    adapted_attention,
                    adapted_attention_sel,
                )

                att_fn = (
                    adapted_attention_sel if use_sel else adapted_attention
                )
                out = att_fn(
                    adj.fast_fn, u_t2s, u_s2t, central_mask,
                    torch_dense(1, use_bias=False, name="a_f_t2s"),
                    torch_dense(1, use_bias=False, name="a_f_s2t"),
                    negative_slope=self.negative_slope,
                )
            out = out.astype(x.dtype)
            if self.root_weight:
                out = out + torch_dense(
                    self.out_channels, use_bias=False, name="lin_r"
                )(x)
            return out

        # --- degree-tiered fused path (VERDICT r3 item 3): skew-heavy
        # graphs (real bridged graphs concentrate top-k proposals on
        # popular sources) get per-tier slot layouts instead of the
        # former XLA-gather fallback; Mosaic kernels engage per tier
        # where the tier's Et fits the measured VMEM envelope
        tiered_ok = (
            self.use_fused
            and self.axis_name is None
            and getattr(adj, "tiered_fn", None) is not None
            and not (self.aggregate_dense and adj.use_dense)
        )
        if tiered_ok:
            from bridged_gnn_tpu.ops import pallas_fused
            from bridged_gnn_tpu.ops.fused_attention import (
                adapted_attention_tiered,
            )

            kernel_fwd = (
                pallas_fused.auto_kernel()
                if self.fused_kernel_fwd is None
                else self.fused_kernel_fwd
            )
            kernel_bwd = (
                pallas_fused.auto_kernel()
                if self.fused_kernel_bwd is None
                else self.fused_kernel_bwd
            )
            if kernel_fwd or self.fused_recompute_bwd:
                from bridged_gnn_tpu.nn.common import ParamKernel

                a1 = ParamKernel(self.out_channels, name="a_f_t2s")()[:, 0]
                a2 = ParamKernel(self.out_channels, name="a_f_s2t")()[:, 0]
                out = adapted_attention_tiered(
                    adj.tiered_fn, u_t2s, u_s2t, central_mask,
                    negative_slope=self.negative_slope,
                    a1=a1, a2=a2,
                    kernel_fwd=kernel_fwd, kernel_bwd=kernel_bwd,
                    interpret=pallas_fused.default_interpret(),
                )
            else:
                out = adapted_attention_tiered(
                    adj.tiered_fn, u_t2s, u_s2t, central_mask,
                    torch_dense(1, use_bias=False, name="a_f_t2s"),
                    torch_dense(1, use_bias=False, name="a_f_s2t"),
                    negative_slope=self.negative_slope,
                )
            out = out.astype(x.dtype)
            if self.root_weight:
                out = out + torch_dense(
                    self.out_channels, use_bias=False, name="lin_r"
                )(x)
            return out

        # --- GATv2 attention per edge, branch chosen by destination domain
        s, r, em = adj.senders, adj.receivers, adj.edge_mask
        dst_central = central_mask[r]
        if adj.fast_fn is not None and self.axis_name is None:
            # scatter-free endpoint sums (custom VJP, VERDICT r1 item 7 —
            # its backward compiles on-chip again); padded edges come out
            # 0, which the masked segment softmax ignores
            pair1 = adj.fast_fn.pair_sum(u_t2s)
            pair2 = adj.fast_fn.pair_sum(u_s2t)
        else:
            pair1 = u_t2s[s] + u_t2s[r]
            pair2 = u_s2t[s] + u_s2t[r]
        e_t2s = nn.leaky_relu(pair1, negative_slope=self.negative_slope)
        e_s2t = nn.leaky_relu(pair2, negative_slope=self.negative_slope)
        logit_t2s = torch_dense(1, use_bias=False, name="a_f_t2s")(e_t2s)
        logit_s2t = torch_dense(1, use_bias=False, name="a_f_s2t")(e_s2t)
        logits = jnp.where(dst_central[:, None], logit_t2s, logit_s2t)[:, 0]
        alpha = segment_softmax(
            logits, r, adj.num_nodes_padded, mask=em,
            indices_are_sorted=True, axis_name=self.axis_name,
        )

        # --- aggregation (joint softmax already applied; split by dst domain)
        if self.aggregate_dense and adj.use_dense and self.axis_name is None:
            from bridged_gnn_tpu.ops.blocked_segment import (
                dense_from_edges,
                use_matmul_dense_build,
            )

            n_pad = adj.num_nodes_padded
            # On TPU the weighted adjacency is rebuilt scatter-free via
            # one-hot matmuls; the .at[r,s].add scatter was the stage-2
            # dense-path TPU compile pathology (results_a2d_tpu_timing.json)
            w1 = jnp.where(em & dst_central, alpha, 0.0).astype(x.dtype)
            w2 = jnp.where(em & ~dst_central, alpha, 0.0).astype(x.dtype)
            if use_matmul_dense_build():
                mats = [
                    dense_from_edges(
                        wi, s.astype(jnp.int32), r.astype(jnp.int32),
                        adj.block_start, n_pad, adj.block_node_block,
                        adj.block_max_edges, adj.block_num_blocks,
                    )
                    for wi in (w1, w2)
                ]
            else:
                mat2 = (
                    jnp.zeros((2, n_pad, n_pad), dtype=x.dtype)
                    .at[0, r, s].add(w1)
                    .at[1, r, s].add(w2)
                )
                mats = [mat2[0], mat2[1]]
            prec = (
                jax.lax.Precision.HIGHEST
                if x.dtype == jnp.float32
                else None
            )
            out = (
                jnp.dot(mats[0], u_t2s, preferred_element_type=jnp.float32,
                        precision=prec)
                + jnp.dot(mats[1], u_s2t, preferred_element_type=jnp.float32,
                          precision=prec)
            ).astype(x.dtype)
        elif adj.fast_fn is not None and self.axis_name is None:
            # scatter-free custom-VJP path: the joint softmax'd attention
            # splits into two weighted SpMMs by destination domain
            w1 = jnp.where(em & dst_central, alpha, 0.0).astype(x.dtype)
            w2 = jnp.where(em & ~dst_central, alpha, 0.0).astype(x.dtype)
            out = adj.fast_fn.spmm(u_t2s, w1) + adj.fast_fn.spmm(u_s2t, w2)
        else:
            msg = jnp.where(dst_central[:, None], u_t2s[s], u_s2t[s])
            out = segment_sum(
                msg * alpha[:, None].astype(msg.dtype), r,
                adj.num_nodes_padded, mask=em,
                indices_are_sorted=True, axis_name=self.axis_name,
            )

        out = out.astype(x.dtype)
        if self.root_weight:
            out = out + torch_dense(
                self.out_channels, use_bias=False, name="lin_r"
            )(x)
        return out

    def _halo_forward(self, x, central_mask, node_mask, halo):
        """Row-partitioned forward (SURVEY §2c-1): this device owns node
        rows [0, R); per layer the only node-array collective is the
        boundary-feature all_to_all inside ``halo.exchange`` — domain-mean
        and BN statistics ride [D]-sized psums. All destination-keyed
        segment ops are fully local because every edge into an owned row
        is stored on this device.

        Parameter structure is identical to the single-device path, so
        trained params transfer 1:1 between layouts."""
        R = halo.rows
        central_l = central_mask & node_mask          # [R] local flags
        target_l = (~central_mask) & node_mask

        # global domain difference via [D]-sized psums (KTGNN.py:275-281)
        mean_c = masked_mean(x, central_l, axis=0, keepdims=True,
                             axis_name=halo.axis)
        mean_t = masked_mean(x, target_l, axis=0, keepdims=True,
                             axis_name=halo.axis)
        dd_row = mean_c - mean_t                              # [1, D]

        # per-row domain shift + branch projections, shared (same param
        # modules, hence identical param tree + init streams) between the
        # plain x_ext path and the overlap path's two row sets
        lin_ag_s2t = torch_dense(1, use_bias=False, name="a_g_s2t")
        lin_ag_t2s = torch_dense(1, use_bias=False, name="a_g_t2s")
        lin_t = torch_dense(self.out_channels, name="lin_t")
        lin_s = torch_dense(self.out_channels, name="lin_s")

        def branch(xv, ce, te):
            dd = jnp.broadcast_to(dd_row, xv.shape)
            gcat = jnp.concatenate([xv, dd], axis=-1)
            x_s2t = xv - jnp.tanh(lin_ag_s2t(gcat)) * dd * (
                ce[:, None].astype(x.dtype)
            )
            x_t2s = xv + jnp.tanh(lin_ag_t2s(gcat)) * dd * (
                te[:, None].astype(x.dtype)
            )
            u_s2t = lin_t(x_s2t)
            u_t2s = lin_s(x_t2s)
            if self.msg_dtype is not None:
                u_s2t = u_s2t.astype(self.msg_dtype)
                u_t2s = u_t2s.astype(self.msg_dtype)
            return u_t2s, u_s2t

        if (self.use_fused and halo.pl2 is not None
                and not self.fused_recompute_bwd):
            # comm/compute overlap (SURVEY §2c-1 "halo-overlap with local
            # aggregation"): issue the boundary all_to_all first — the
            # whole local-sender pipeline (gather, GATv2 logits,
            # streaming-softmax partials) has no data dependence on it,
            # so XLA's latency-hiding scheduler overlaps the two; only
            # the halo partials + final rescale wait for the collective
            from bridged_gnn_tpu.ops.fused_attention import (
                adapted_attention_overlap,
            )

            recv = halo.exchange_recv(x)                      # [H, D]
            central_h = (halo.central_ext & halo.node_mask_ext)[R:]
            target_h = ((~halo.central_ext) & halo.node_mask_ext)[R:]
            u_t2s_l, u_s2t_l = branch(x, central_l, target_l)
            u_t2s_h, u_s2t_h = branch(recv, central_h, target_h)
            ops_l, ops_h = halo.fused_ops_split()
            u_cat_l = jnp.concatenate([u_t2s_l, u_s2t_l], axis=-1)
            out = adapted_attention_overlap(
                ops_l, ops_h, u_cat_l,
                jnp.concatenate([u_t2s_h, u_s2t_h], axis=-1),
                u_cat_l, central_mask,
                torch_dense(1, use_bias=False, name="a_f_t2s"),
                torch_dense(1, use_bias=False, name="a_f_s2t"),
                negative_slope=self.negative_slope,
            )
            out = out.astype(x.dtype)
            if self.root_weight:
                out = out + torch_dense(
                    self.out_channels, use_bias=False, name="lin_r"
                )(x)
            return out

        # boundary exchange: x_ext = [own rows ‖ halo rows]   [R+H, D]
        x_ext = halo.exchange(x)
        central_e = halo.central_ext & halo.node_mask_ext     # [R+H]
        target_e = (~halo.central_ext) & halo.node_mask_ext
        u_t2s, u_s2t = branch(x_ext, central_e, target_e)

        # destination-keyed ops are LOCAL (this device holds every edge
        # into its rows — no collective) and scatter-free (VERDICT r1
        # item 4: the sharded path must not fall back to the XLA scatter
        # lowering). Default: the fused attention conv over this shard's
        # padded slot layouts — senders index x_ext, destinations index
        # owned rows; fall back to the blocked segment ops otherwise.
        if self.use_fused and halo.pl is not None:
            if self.fused_recompute_bwd:
                # memory-lean hand-derived backward under shard_map: the
                # custom VJP is opaque to the replication (VMA) checker,
                # so the replicated a_f param vectors are pcast to
                # device-varying OUTSIDE the custom_vjp — every input is
                # then uniformly varying inside it, and the pcast's own
                # transpose (a psum of the da cotangents) is inserted by
                # JAX where the checker can verify it (STATUS r2 gap 4)
                from bridged_gnn_tpu.nn.common import ParamKernel
                from bridged_gnn_tpu.ops.fused_attention import (
                    make_adapted_attention,
                )

                a1 = ParamKernel(self.out_channels, name="a_f_t2s")()[:, 0]
                a2 = ParamKernel(self.out_channels, name="a_f_s2t")()[:, 0]
                a1 = jax.lax.pcast(a1, halo.axis, to="varying")
                a2 = jax.lax.pcast(a2, halo.axis, to="varying")
                out = make_adapted_attention(
                    halo.fused_ops(), self.negative_slope
                )(
                    u_t2s, u_s2t,
                    u_t2s[: halo.rows], u_s2t[: halo.rows],
                    central_mask.astype(jnp.float32), a1, a2,
                )
            else:
                # autodiff fused path (production default): its transposes
                # produce the psums the VMA checker verifies natively
                from bridged_gnn_tpu.ops.fused_attention import (
                    adapted_attention,
                )

                out = adapted_attention(
                    halo.fused_ops(), u_t2s, u_s2t, central_mask,
                    torch_dense(1, use_bias=False, name="a_f_t2s"),
                    torch_dense(1, use_bias=False, name="a_f_s2t"),
                    negative_slope=self.negative_slope,
                    u1_dst=u_t2s[: halo.rows], u2_dst=u_s2t[: halo.rows],
                )
        else:
            s, r = halo.senders_local, halo.receivers_local
            dst_central = central_mask[r]
            e_t2s = nn.leaky_relu(
                u_t2s[s] + u_t2s[r], negative_slope=self.negative_slope
            )
            e_s2t = nn.leaky_relu(
                u_s2t[s] + u_s2t[r], negative_slope=self.negative_slope
            )
            logit_t2s = torch_dense(1, use_bias=False, name="a_f_t2s")(
                e_t2s
            )
            logit_s2t = torch_dense(1, use_bias=False, name="a_f_s2t")(
                e_s2t
            )
            logits = jnp.where(
                dst_central[:, None], logit_t2s, logit_s2t
            )[:, 0]
            alpha = halo.segment_softmax_local(logits)
            msg = jnp.where(dst_central[:, None], u_t2s[s], u_s2t[s])
            out = halo.segment_sum_local(
                msg * alpha[:, None].astype(msg.dtype)
            )
        out = out.astype(x.dtype)
        if self.root_weight:
            out = out + torch_dense(
                self.out_channels, use_bias=False, name="lin_r"
            )(x)
        return out


class ClfTransformer(nn.Module):
    """Linear → BN → ReLU → Linear head adapter (KTGNN.py:363-368)."""

    hidden: int
    stats_axis: Optional[str] = None  # BN stats psum axis (row partition)

    @nn.compact
    def __call__(self, x, mask, train: bool):
        x = torch_dense(self.hidden, name="lin_0")(x)
        x = MaskedBatchNorm(name="bn_1", axis_name=self.stats_axis)(
            x, mask, use_running_average=not train
        )
        x = nn.relu(x)
        x = torch_dense(self.hidden, name="lin_3")(x)
        return x


class KTGNN(nn.Module):
    """KTGNN_no_complement (reference models/KTGNN.py:330-465).

    Returns (log_probs_base, log_probs_target, log_probs_target_hat,
    loss_dist). loss_dist is None without the complementor.
    """

    num_classes: int
    layer_num: int = 2
    hidden: int = 64
    root_weight: bool = False
    dropout: float = 0.5
    use_bn: bool = True
    axis_name: Optional[str] = None
    # rematerialize conv activations in backward (jax.checkpoint) — trades
    # FLOPs for memory on deep stacks / large graphs
    remat: bool = False
    # memory-lean fused-attention backward (recompute instead of storing
    # [B,Et,D] residuals) in every AdaptedConv — see AdaptedConv docs
    fused_recompute_bwd: bool = False
    # single-Mosaic-kernel attention forward; None = auto — ON on the TPU
    # backend outside fp32-parity precision mode (pallas_fused.auto_kernel)
    fused_kernel_fwd: Optional[bool] = None
    # + Mosaic backward kernel (fastest training path); None = same auto
    fused_kernel_bwd: Optional[bool] = None
    # bf16 conv messages (see AdaptedConv.msg_dtype); None = parity
    msg_dtype: Optional[str] = None
    # sow per-conv block-logit-spread diagnostics (check_numerics mode)
    debug_spread: bool = False
    # per-conv branch-selected gather policy (see AdaptedConv.
    # select_gather): None = measured default (selective on non-kernel
    # fused paths), True forces selective everywhere — the serving
    # predictor sets True because the SELECTIVE forward kernel wins
    # sustained fwd-only (10.66 vs 12.30 ms at bench scale,
    # results_fused_sustained_tpu.json) while training keeps the
    # concatenated kernels (fastest sustained fwd+bwd: 50.8 ms)
    select_gather: Optional[bool] = None
    # feature-complementor options (reference KTGNN.py:340-341; all run.sh
    # configs use need_complement=False)
    need_complement: bool = False
    dim_share: int = 0
    hidden_o: int = 128
    hidden_u: int = 128
    step: int = 1
    use_dist_loss: bool = False

    @nn.compact
    def __call__(
        self, g: Graph, adj: Adjacency, train: bool = False,
        frontiers=None, halo=None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array, Optional[jax.Array]]:
        cm, nm = g.central_mask, g.node_mask
        stats_axis = halo.axis if halo is not None else None
        loss_dist = None
        if self.need_complement:
            from bridged_gnn_tpu.nn.complementor import AdaptedComplementor

            x, loss_dist = AdaptedComplementor(
                dim_o=self.dim_share,
                dim_u=g.x.shape[1] - self.dim_share,
                hidden_o=self.hidden_o, hidden_u=self.hidden_u,
                step=self.step, use_dist_loss=self.use_dist_loss,
                name="complementor",
            )(g.x, frontiers, cm, nm, train)
        else:
            x = g.x
        conv_cls = nn.remat(AdaptedConv) if self.remat else AdaptedConv
        n_convs = max(self.layer_num - 1, 1)
        for i in range(n_convs):
            x = conv_cls(
                self.hidden, root_weight=self.root_weight,
                axis_name=self.axis_name, name=f"convs_{i}",
                fused_recompute_bwd=self.fused_recompute_bwd,
                fused_kernel_fwd=self.fused_kernel_fwd,
                fused_kernel_bwd=self.fused_kernel_bwd,
                msg_dtype=self.msg_dtype,
                debug_spread=self.debug_spread,
                select_gather=self.select_gather,
            )(x, adj, cm, nm, halo)
            if self.use_bn:
                x = MaskedBatchNorm(name=f"bns_{i}", axis_name=stats_axis)(
                    x, nm, use_running_average=not train
                )
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)

        # final node embeddings (reference get_emb, KTGNN.py:436-465),
        # retrievable via apply(..., mutable=['intermediates'])
        self.sow("intermediates", "node_embeddings", x)
        logits_base = AdaptedConv(
            self.num_classes, root_weight=self.root_weight,
            axis_name=self.axis_name, name="clf_base",
            fused_recompute_bwd=self.fused_recompute_bwd,
            fused_kernel_fwd=self.fused_kernel_fwd,
            fused_kernel_bwd=self.fused_kernel_bwd,
            msg_dtype=self.msg_dtype,
            debug_spread=self.debug_spread,
            select_gather=self.select_gather,
        )(x, adj, cm, nm, halo)
        clf_target = AdaptedConv(
            self.num_classes, root_weight=self.root_weight,
            axis_name=self.axis_name, name="clf_target",
            fused_recompute_bwd=self.fused_recompute_bwd,
            fused_kernel_fwd=self.fused_kernel_fwd,
            fused_kernel_bwd=self.fused_kernel_bwd,
            msg_dtype=self.msg_dtype,
            debug_spread=self.debug_spread,
            select_gather=self.select_gather,
        )
        x_trans = ClfTransformer(self.hidden, name="clf_transformer",
                                 stats_axis=stats_axis)(
            x, nm, train
        )
        logits_target_hat = clf_target(x_trans, adj, cm, nm, halo)
        logits_target = clf_target(x, adj, cm, nm, halo)
        return (
            nn.log_softmax(logits_base, axis=1),
            nn.log_softmax(logits_target, axis=1),
            nn.log_softmax(logits_target_hat, axis=1),
            loss_dist,
        )


class KTGNNNoDTC(nn.Module):
    """KTGNN_noDTC (reference models/KTGNN.py:467-597): plain AdaptedConv
    stack with a single classification output.

    ``halo``: runs each conv through the row-partitioned halo layout
    (parallel/halopart.HaloView) exactly like KTGNN — the sharded stage-2
    runtime drives this model with ``Stage2Config(no_dtc=True,
    n_shards>1)`` (VERDICT r4 #6)."""

    num_classes: int
    layer_num: int = 2
    hidden: int = 64
    root_weight: bool = False
    dropout: float = 0.5
    use_bn: bool = True
    axis_name: Optional[str] = None
    msg_dtype: Optional[str] = None
    debug_spread: bool = False

    @nn.compact
    def __call__(self, g: Graph, adj: Adjacency, train: bool = False,
                 halo=None):
        x = g.x
        cm, nm = g.central_mask, g.node_mask
        stats_axis = halo.axis if halo is not None else None
        for i in range(self.layer_num - 1):
            is_last = i == self.layer_num - 2
            out_dim = self.num_classes if is_last else self.hidden
            x = AdaptedConv(
                out_dim, root_weight=self.root_weight,
                axis_name=self.axis_name, name=f"convs_{i}",
                msg_dtype=self.msg_dtype,
                debug_spread=self.debug_spread,
            )(x, adj, cm, nm, halo)
            if not is_last:
                if self.use_bn:
                    x = MaskedBatchNorm(name=f"bns_{i}",
                                        axis_name=stats_axis)(
                        x, nm, use_running_average=not train
                    )
                x = nn.relu(x)
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.log_softmax(x, axis=1), None
