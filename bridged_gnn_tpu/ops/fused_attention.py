"""Fused domain-adapted attention message passing (TPU padded-tile form).

The reference computes KT-GNN attention as separate PyG ``propagate``
passes: per-edge endpoint gathers for the GATv2 logits, a scatter-softmax,
then scatter-add aggregation (models/KTGNN.py:263-315) — on TPU that costs
~6 issue-rate-bound row gathers per conv layer plus scatter lowerings.

This module evaluates the whole attention conv from TWO row gathers (one
per domain branch) using the padded dst-block slot layout
(ops/blocked_segment.py::PaddedLayout):

  * sender rows arrive via ``BlockedOps.gather_slots`` (custom VJP — its
    backward is a src-keyed one-hot reduce, not a scatter);
  * destination rows, per-destination softmax statistics, and the branch
    select are *expanded to slots via one-hot batched matmuls* on the MXU
    (``padded_block_expand``) — no per-element gathers, which matters
    because the gather engine (~474 Mrows/s on v5e, DESIGN.md §2), not
    HBM bandwidth, bounds every gather-based formulation;
  * the segment softmax max/denominator are per-block masked VPU
    reductions; aggregation is the same batched one-hot matmul as SpMM.

Everything except the two row gathers is a matmul or elementwise op, so
the *autodiff* backward is also scatter-free.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from bridged_gnn_tpu.ops.blocked_segment import (
    BlockedOps,
    _lay_arrays,
    _lay_from,
    float0_zeros,
    padded_block_expand,
    padded_dst_expand,
    padded_slot_reduce,
)

_NEG = -1e30


def make_adapted_attention(
    ops: BlockedOps,
    negative_slope: float = 0.1,
    kernel_fwd: bool = False,
    kernel_bwd: bool = False,
    interpret: bool = False,
):
    """Custom-VJP fused attention conv with a recompute backward.

    Same math as :func:`adapted_attention` but the backward pass is
    hand-derived: residuals are only the *inputs* plus the [B, Et] f32
    attention weights — the [B, Et, D]-sized gathered messages and
    pre-activations are re-gathered/recomputed in backward instead of
    being stored (and re-read from HBM) as autodiff residuals. One extra
    row gather buys the elimination of ~2 GB of residual traffic per
    layer at bench scale.

    Returned callable:
        fn(u1, u2, u1_dst, u2_dst, central_f32, a1, a2) -> [N_out, D]
    where ``a1``/``a2`` are the GATv2 logit projection vectors [D] and
    ``central_f32`` is the destination-domain flag as float (no grad).
    Gradients are defined for every other argument; pass ``u1 is u1_dst``
    on a single device and JAX sums the two cotangents.

    ``kernel_fwd=True`` runs the forward as ONE Mosaic kernel per dst
    block (ops/pallas_fused.py) — the gathered rows are read from HBM
    once and every intermediate stays in VMEM; the recompute backward is
    unchanged (XLA). ``interpret=True`` runs that kernel in interpreter
    mode (CPU tests).
    """
    lay = ops.lay_dst
    B, Et, nb = lay.num_blocks, lay.tile_e, lay.node_block
    slope = negative_slope
    # NOTE: no array computation at closure scope, and every layout/index
    # array rides through the custom_vjp as the explicit ``aux`` primal
    # (float0 cotangents). Two failure modes otherwise: (1)
    # make_adapted_attention runs inside module __call__, i.e. possibly
    # inside a jax.checkpoint (nn.remat) trace — an array staged HERE
    # becomes a tracer of that trace, and capturing it in the custom-VJP
    # backward (traced later, during transposition) raises
    # UnexpectedTracerError; (2) with rebind_blocked_ops the layout
    # arrays ARE tracers of the caller's trace, which a custom_vjp
    # closure may not capture at all. Only static dims stay closed over.
    meta_dst, meta_src = ops.lay_dst, ops.lay_src
    aux0 = dict(ld=_lay_arrays(ops.lay_dst), ls=_lay_arrays(ops.lay_src),
                sfd=ops.src_from_dst)

    def _expand_scalar(lay, v):       # [B, nb] -> [B, Et] via MXU
        return padded_block_expand(lay, v[:, :, None])[..., 0]

    def _pad_blocks(u):               # [N_out, D] -> [B, nb, D]
        n_full = B * nb
        u_pad = jnp.pad(u, ((0, n_full - u.shape[0]), (0, 0)))
        return u_pad.reshape(B, nb, -1)

    def _gather_rows(u_cat, aux):     # inlined gather (fwd form)
        return u_cat[aux["ld"]["other"]].reshape(B, Et, -1)

    def _gather_rows_vjp(dm, n_rows, aux):   # inlined gather transpose
        dm_flat = dm.reshape(-1, dm.shape[-1])
        du = padded_slot_reduce(
            _lay_from(aux["ls"], meta_src), dm_flat[aux["sfd"]]
        )
        return du[:n_rows].astype(dm.dtype)

    def _forward(u1, u2, u1_dst, u2_dst, central, a1, a2, aux):
        dch = u1.shape[-1]
        lay = _lay_from(aux["ld"], meta_dst)
        valid = lay.slot_mask.reshape(B, Et)
        m = _gather_rows(jnp.concatenate([u1, u2], axis=-1), aux)
        m1, m2 = m[..., :dch], m[..., dch:]
        d = padded_dst_expand(
            lay, jnp.concatenate([u1_dst, u2_dst], axis=-1)
        )
        d1, d2 = d[..., :dch], d[..., dch:]
        h1 = jax.nn.leaky_relu(m1 + d1, slope)
        h2 = jax.nn.leaky_relu(m2 + d2, slope)
        l1 = jnp.einsum("bed,d->be", h1, a1.astype(h1.dtype))
        l2 = jnp.einsum("bed,d->be", h2, a2.astype(h2.dtype))
        n_full = B * nb
        c_pad = jnp.pad(central, (0, n_full - central.shape[0]))
        c_slot = _expand_scalar(
            lay, c_pad.reshape(B, nb).astype(jnp.float32)
        )
        is_c = c_slot > 0.5
        lm = jnp.where(
            valid, jnp.where(is_c, l1, l2).astype(jnp.float32), _NEG
        )
        ohb = lay.rel_key[:, None, :] == jax.lax.broadcasted_iota(
            jnp.int32, (1, nb, 1), 1
        )
        mx = jnp.max(jnp.where(ohb, lm[:, None, :], _NEG), axis=2)
        mx_slot = _expand_scalar(lay, mx)
        ex = jnp.where(valid, jnp.exp(lm - mx_slot), 0.0)
        denom = jax.lax.dot_general(
            ohb.astype(jnp.float32), ex[:, :, None],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        den_slot = _expand_scalar(lay, denom[..., 0])
        alpha = ex / jnp.where(den_slot == 0, 1.0, den_slot)
        w1 = (alpha * c_slot).astype(u1.dtype)
        w2 = (alpha * (1.0 - c_slot)).astype(u1.dtype)
        out = padded_slot_reduce(lay, m1, w1) \
            + padded_slot_reduce(lay, m2, w2)
        return out.astype(u1.dtype), (alpha, c_slot)

    def _forward_kernel(u1, u2, u1_dst, u2_dst, central, a1, a2, aux):
        from bridged_gnn_tpu.ops.pallas_fused import (
            adapted_attention_fwd_pallas,
        )

        klay = _lay_from(aux["ld"], meta_dst)
        m = _gather_rows(jnp.concatenate([u1, u2], axis=-1), aux)
        out, alpha, _ = adapted_attention_fwd_pallas(
            klay, m, u1_dst, u2_dst, central, a1, a2,
            negative_slope=slope, interpret=interpret,
        )
        n_full = B * nb
        c_pad = jnp.pad(central, (0, n_full - central.shape[0]))
        c_slot = _expand_scalar(
            klay, c_pad.reshape(B, nb).astype(jnp.float32)
        )
        return out.astype(u1.dtype), (alpha, c_slot)

    _fwd_impl = _forward_kernel if kernel_fwd else _forward

    @jax.custom_vjp
    def fused_aux(u1, u2, u1_dst, u2_dst, central, a1, a2, aux):
        return _fwd_impl(u1, u2, u1_dst, u2_dst, central, a1, a2, aux)[0]

    def fwd(u1, u2, u1_dst, u2_dst, central, a1, a2, aux):
        out, (alpha, c_slot) = _fwd_impl(
            u1, u2, u1_dst, u2_dst, central, a1, a2, aux
        )
        return out, (u1, u2, u1_dst, u2_dst, central, a1, a2, alpha,
                     c_slot, aux)

    def bwd(res, dout):
        (u1, u2, u1_dst, u2_dst, central, a1, a2, alpha, c_slot,
         aux) = res
        lay = _lay_from(aux["ld"], meta_dst)
        dch = u1.shape[-1]
        dt = u1.dtype
        if kernel_bwd:
            # per-block backward as ONE Mosaic kernel (pallas_fused.py);
            # only the src-keyed sender reduce stays in XLA (the slot
            # cotangents change key order, which no dst-block-local
            # kernel can absorb)
            from bridged_gnn_tpu.ops.pallas_fused import (
                adapted_attention_bwd_pallas,
            )

            u_cat = jnp.concatenate([u1, u2], axis=-1)
            m = _gather_rows(u_cat, aux)
            dm, du1_dst, du2_dst, da1, da2 = adapted_attention_bwd_pallas(
                lay, m, u1_dst, u2_dst, central, a1, a2, alpha, dout,
                negative_slope=slope, interpret=interpret,
            )
            du_cat = _gather_rows_vjp(dm, u_cat.shape[0], aux)
            return (
                du_cat[:, :dch].astype(dt), du_cat[:, dch:].astype(dt),
                du1_dst.astype(dt), du2_dst.astype(dt),
                jnp.zeros_like(central),
                da1.astype(a1.dtype), da2.astype(a2.dtype),
                float0_zeros(aux),
            )
        # recompute the slot tensors (one gather + one expand matmul)
        u_cat = jnp.concatenate([u1, u2], axis=-1)
        m = _gather_rows(u_cat, aux)
        m1, m2 = m[..., :dch], m[..., dch:]
        d = padded_dst_expand(
            lay, jnp.concatenate([u1_dst, u2_dst], axis=-1)
        )
        z1 = m1 + d[..., :dch]
        z2 = m2 + d[..., dch:]
        is_c = c_slot > 0.5

        dout = dout.astype(jnp.float32)
        dout_slot = padded_block_expand(lay, _pad_blocks(dout))  # [B,Et,D]
        msel = jnp.where(is_c[..., None], m1, m2)
        # aggregation: out = Σ α·msel
        dalpha = jnp.einsum(
            "bed,bed->be", msel.astype(jnp.float32), dout_slot
        )
        dm1 = (alpha * c_slot)[..., None] * dout_slot
        dm2 = (alpha * (1.0 - c_slot))[..., None] * dout_slot
        # softmax jacobian: dl = α·dα − α·Σ_seg(α·dα)
        t = alpha * dalpha
        seg = padded_slot_reduce(lay, t.reshape(B, Et, 1))  # [N_out, 1]
        s_slot = _expand_scalar(lay, _pad_blocks(seg)[..., 0])
        dlm = t - alpha * s_slot
        dl1 = dlm * c_slot
        dl2 = dlm * (1.0 - c_slot)
        # logits: l = h·a, h = leaky_relu(z)
        h1 = jax.nn.leaky_relu(z1, slope).astype(jnp.float32)
        h2 = jax.nn.leaky_relu(z2, slope).astype(jnp.float32)
        da1 = jnp.einsum("bed,be->d", h1, dl1)
        da2 = jnp.einsum("bed,be->d", h2, dl2)
        lrelu_g1 = jnp.where(z1 > 0, 1.0, slope).astype(jnp.float32)
        lrelu_g2 = jnp.where(z2 > 0, 1.0, slope).astype(jnp.float32)
        dz1 = dl1[..., None] * a1.astype(jnp.float32) * lrelu_g1
        dz2 = dl2[..., None] * a2.astype(jnp.float32) * lrelu_g2
        dm1 = (dm1 + dz1).astype(dt)
        dm2 = (dm2 + dz2).astype(dt)
        # dst-side rows: d = one-hot expand of u_dst ⇒ transpose = reduce
        dd = jnp.concatenate([dz1, dz2], axis=-1).astype(dt)
        du_dst = padded_slot_reduce(lay, dd)
        du1_dst = du_dst[: u1_dst.shape[0], :dch].astype(dt)
        du2_dst = du_dst[: u2_dst.shape[0], dch:].astype(dt)
        # src-side rows via the gather's scatter-free transpose
        du_cat = _gather_rows_vjp(
            jnp.concatenate([dm1, dm2], axis=-1), u_cat.shape[0], aux
        )
        du1 = du_cat[:, :dch].astype(dt)
        du2 = du_cat[:, dch:].astype(dt)
        return (
            du1, du2, du1_dst, du2_dst,
            jnp.zeros_like(central), da1.astype(a1.dtype),
            da2.astype(a2.dtype), float0_zeros(aux),
        )

    fused_aux.defvjp(fwd, bwd)

    def fused(u1, u2, u1_dst, u2_dst, central, a1, a2):
        return fused_aux(u1, u2, u1_dst, u2_dst, central, a1, a2, aux0)

    return fused


def _attention_partials(
    lay,
    gather: Callable,
    u_cat: jax.Array,          # [N_src_space, 2D] rows the slots gather
    u_dst_cat: jax.Array,      # [N_out, 2D] destination-side rows
    central: jax.Array,        # [N_out] bool
    logit_fn1: Callable,
    logit_fn2: Callable,
    negative_slope: float,
):
    """Streaming-softmax partials over ONE slot layout (a subset of the
    edges into the same destination rows): per-destination local max
    ``mx`` [B, nb], exp-sum ``den`` [B, nb], and the exp-weighted partial
    aggregate ``part`` [N_out, D] — combinable with another subset's
    partials by the flash-attention rescale in
    :func:`adapted_attention_overlap`."""
    B, Et, nb = lay.num_blocks, lay.tile_e, lay.node_block
    valid = lay.slot_mask.reshape(B, Et)
    dch = u_cat.shape[-1] // 2
    m = gather(u_cat)                                    # [B, Et, 2D]
    d = padded_dst_expand(lay, u_dst_cat)
    m1, m2 = m[..., :dch], m[..., dch:]
    h1 = jax.nn.leaky_relu(m1 + d[..., :dch], negative_slope)
    h2 = jax.nn.leaky_relu(m2 + d[..., dch:], negative_slope)
    l1 = logit_fn1(h1)[..., 0].astype(jnp.float32)       # [B, Et]
    l2 = logit_fn2(h2)[..., 0].astype(jnp.float32)
    n_full = B * nb
    c_pad = jnp.pad(
        central.astype(jnp.float32), (0, n_full - central.shape[0])
    )
    c_slot = padded_block_expand(lay, c_pad.reshape(B, nb, 1))[..., 0]
    is_c = c_slot > 0.5
    lm = jnp.where(valid, jnp.where(is_c, l1, l2), _NEG)

    ohb = lay.rel_key[:, None, :] == jax.lax.broadcasted_iota(
        jnp.int32, (1, nb, 1), 1
    )                                                    # [B, nb, Et]
    mx = jnp.max(jnp.where(ohb, lm[:, None, :], _NEG), axis=2)  # [B, nb]
    mx = jax.lax.stop_gradient(mx)
    mx_slot = padded_block_expand(lay, mx[:, :, None])[..., 0]
    ex = jnp.where(valid, jnp.exp(lm - mx_slot), 0.0)
    den = jax.lax.dot_general(
        ohb.astype(jnp.float32), ex[:, :, None],
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[..., 0]                                            # [B, nb]
    w1 = jnp.where(is_c, ex, 0.0).astype(u_cat.dtype)
    w2 = jnp.where(is_c, 0.0, ex).astype(u_cat.dtype)
    part = (
        padded_slot_reduce(lay, m1, w1)
        + padded_slot_reduce(lay, m2, w2)
    )                                                    # [N_out, D] f32
    return part, mx, den


def adapted_attention_overlap(
    ops_local,
    ops_halo,
    u_cat_local: jax.Array,    # [R, 2D] own-row branch values [u1 ‖ u2]
    u_cat_halo: jax.Array,     # [H, 2D] halo-row branch values
    u_dst_cat: jax.Array,      # [R, 2D] destination-side rows
    central: jax.Array,        # [R] bool destination-domain flag
    logit_fn1: Callable,
    logit_fn2: Callable,
    negative_slope: float = 0.1,
) -> jax.Array:
    """Comm/compute-overlap form of :func:`adapted_attention` for the halo
    row partition (SURVEY §2c-1 "halo-overlap with local aggregation";
    VERDICT r2 item 2).

    The shard's edges are split into two slot layouts keyed by the same
    destination rows: ``ops_local`` gathers senders from the shard's OWN
    rows (``u_cat_local``), ``ops_halo`` from the (much smaller) halo
    receive buffer (``u_cat_halo``). The entire local pipeline — the big
    sender gather, GATv2 logits, per-destination max/exp-sum, and the
    exp-weighted partial aggregate — has NO data dependence on the
    boundary ``all_to_all``, so XLA's latency-hiding scheduler runs it
    while the collective is in flight; only the halo partials and the
    final per-destination rescale wait for it.

    The two partials combine with the flash-attention streaming-softmax
    rule (exact softmax values up to fp reordering):
        mx  = max(mx_l, mx_h);  s_k = exp(mx_k − mx)
        out = (part_l·s_l + part_h·s_h) / (den_l·s_l + den_h·s_h)

    Autodiff backward is scatter-free (gathers carry custom VJPs; the
    rest is matmuls/elementwise). Not bit-identical to the single-layout
    path (different reduction grouping) — an opt-in production knob; the
    default halo path stays the parity formulation.
    """
    lay_l = ops_local.lay_dst
    p_l, mx_l, den_l = _attention_partials(
        lay_l, ops_local.gather_slots, u_cat_local, u_dst_cat, central,
        logit_fn1, logit_fn2, negative_slope,
    )
    p_h, mx_h, den_h = _attention_partials(
        ops_halo.lay_dst, ops_halo.gather_slots, u_cat_halo, u_dst_cat,
        central, logit_fn1, logit_fn2, negative_slope,
    )
    mx = jnp.maximum(mx_l, mx_h)                         # [B, nb]
    s_l = jnp.exp(mx_l - mx)
    s_h = jnp.exp(mx_h - mx)
    den = den_l * s_l + den_h * s_h
    den = jnp.where(den == 0, 1.0, den)
    n_out = lay_l.num_nodes_padded

    def rows(a):                                          # [B, nb] -> [R]
        return a.reshape(-1)[:n_out]

    out = (
        p_l * rows(s_l)[:, None] + p_h * rows(s_h)[:, None]
    ) / rows(den)[:, None]
    return out.astype(u_cat_local.dtype)


def block_logit_spread(
    ops: BlockedOps,
    u1: jax.Array,
    u2: jax.Array,
    central: jax.Array,
    a1: jax.Array,            # [D] GATv2 logit projection (a_f_t2s)
    a2: jax.Array,            # [D] (a_f_s2t)
    negative_slope: float = 0.1,
    u1_dst: jax.Array = None,
    u2_dst: jax.Array = None,
) -> jax.Array:
    """Max over destination blocks of (max − min) valid-slot logit.

    This is the quantity the Mosaic kernel's block-max softmax shift
    (ops/pallas_fused.py) assumes stays well below ~80: the kernel
    shifts by the *block* max instead of the per-destination max, which
    is exact until exp underflows at a spread of ~88 (f32). The failure
    would be silent (wrong attention, not NaN), so ``check_numerics``
    mode recomputes the logits in XLA and asserts the spread
    (train/stage2.py). Debug-path cost: one extra row gather + the
    logit einsums.
    """
    lay = ops.lay_dst
    B, Et, nb = lay.num_blocks, lay.tile_e, lay.node_block
    valid = lay.slot_mask.reshape(B, Et)
    if u1_dst is None:
        u1_dst, u2_dst = u1, u2
    dch = u1.shape[-1]
    m = ops.gather_slots(jnp.concatenate([u1, u2], axis=-1))
    d = padded_dst_expand(
        lay, jnp.concatenate([u1_dst, u2_dst], axis=-1)
    )
    h1 = jax.nn.leaky_relu(m[..., :dch] + d[..., :dch], negative_slope)
    h2 = jax.nn.leaky_relu(m[..., dch:] + d[..., dch:], negative_slope)
    l1 = jnp.einsum("bed,d->be", h1, a1.astype(h1.dtype))
    l2 = jnp.einsum("bed,d->be", h2, a2.astype(h2.dtype))
    n_full = B * nb
    c_pad = jnp.pad(
        central.astype(jnp.float32), (0, n_full - central.shape[0])
    )
    c_slot = padded_block_expand(lay, c_pad.reshape(B, nb, 1))[..., 0]
    logit = jnp.where(c_slot > 0.5, l1, l2).astype(jnp.float32)
    blk_max = jnp.max(jnp.where(valid, logit, _NEG), axis=1)     # [B]
    blk_min = jnp.min(jnp.where(valid, logit, -_NEG), axis=1)
    has_valid = jnp.any(valid, axis=1)
    spread = jnp.where(has_valid, blk_max - blk_min, 0.0)
    return jnp.max(spread)


def adapted_attention(
    ops: BlockedOps,
    u1: jax.Array,            # [N_in, D] messages when dst is central (t2s)
    u2: jax.Array,            # [N_in, D] messages when dst is target (s2t)
    central: jax.Array,       # [N_out] bool destination-domain flag
    logit_fn1: Callable,      # [..., D] -> [..., 1] (a_f_t2s projection)
    logit_fn2: Callable,      # [..., D] -> [..., 1] (a_f_s2t projection)
    negative_slope: float = 0.1,
    u1_dst: jax.Array = None,  # destination-side rows, when the sender
    u2_dst: jax.Array = None,  # index space differs (halo: u*_ext[:rows])
) -> jax.Array:
    """out[v] = Σ_u softmax_v(logit) · (central[v] ? u1[u] : u2[u]).

    Matches AdaptedConv's attention + joint segment softmax + aggregation
    (reference models/KTGNN.py:263-315) with GATv2-style logits
    ``a·leaky_relu(u[src] + u[dst])``, branch chosen by destination
    domain. Returns [N_out, D_out]. In the halo row partition, senders
    index the extended local array while destinations index owned rows
    only — pass ``u?_dst`` for the destination side then.
    """
    lay = ops.lay_dst
    B, Et, nb = lay.num_blocks, lay.tile_e, lay.node_block
    valid = lay.slot_mask.reshape(B, Et)
    if u1_dst is None:
        u1_dst, u2_dst = u1, u2
    dch = u1.shape[-1]

    # ONE row gather of both branches — the only gather-engine traffic in
    # the layer. The engine is issue-rate-bound (~474 Mrows/s on v5e
    # regardless of row width, DESIGN.md §2), so gathering the
    # concatenated [N, 2D] rows costs half of two separate gathers.
    m = ops.gather_slots(jnp.concatenate([u1, u2], axis=-1))
    m1, m2 = m[..., :dch], m[..., dch:]             # [B, Et, D] each
    d = padded_dst_expand(
        lay, jnp.concatenate([u1_dst, u2_dst], axis=-1)
    )
    d1, d2 = d[..., :dch], d[..., dch:]

    h1 = jax.nn.leaky_relu(m1 + d1, negative_slope)
    h2 = jax.nn.leaky_relu(m2 + d2, negative_slope)
    l1 = logit_fn1(h1)[..., 0].astype(jnp.float32)  # [B, Et]
    l2 = logit_fn2(h2)[..., 0].astype(jnp.float32)

    # destination-domain branch select, expanded to slots without a gather
    n_full = B * nb
    c_pad = jnp.pad(central.astype(jnp.float32), (0, n_full - central.shape[0]))
    c_slot = padded_block_expand(lay, c_pad.reshape(B, nb, 1))[..., 0]
    is_c = c_slot > 0.5
    logit = jnp.where(is_c, l1, l2)
    lm = jnp.where(valid, logit, _NEG)

    # per-destination softmax: max + denominator as per-block masked
    # reductions (torch_geometric.utils.softmax semantics, KTGNN.py:299)
    ohb = lay.rel_key[:, None, :] == jax.lax.broadcasted_iota(
        jnp.int32, (1, nb, 1), 1
    )                                               # [B, nb, Et]
    mx = jnp.max(jnp.where(ohb, lm[:, None, :], _NEG), axis=2)  # [B, nb]
    mx = jax.lax.stop_gradient(mx)
    mx_slot = padded_block_expand(lay, mx[:, :, None])[..., 0]
    ex = jnp.where(valid, jnp.exp(lm - mx_slot), 0.0)           # [B, Et]
    denom = jax.lax.dot_general(
        ohb.astype(jnp.float32), ex[:, :, None],
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                               # [B, nb, 1]
    den_slot = padded_block_expand(lay, denom)[..., 0]
    alpha = ex / jnp.where(den_slot == 0, 1.0, den_slot)

    # aggregation reuses the already-gathered messages — no further gathers
    w1 = jnp.where(is_c, alpha, 0.0).astype(u1.dtype)
    w2 = jnp.where(is_c, 0.0, alpha).astype(u1.dtype)
    out = padded_slot_reduce(lay, m1, w1) + padded_slot_reduce(lay, m2, w2)
    return out.astype(u1.dtype)


def make_adapted_attention_sel(
    ops: BlockedOps,
    negative_slope: float = 0.1,
    kernel_fwd: bool = False,
    kernel_bwd: bool = False,
    interpret: bool = False,
):
    """Branch-selected twin of :func:`make_adapted_attention`
    (VERDICT r4 #4): the gather moves the SELECTED branch's rows only
    (stacked [2N, D] table, domain offset folded into the index —
    gather time unchanged, issue-rate-bound), and every downstream slot
    tensor is D wide instead of 2D. Same recompute backward discipline:
    residuals are the inputs + [B, Et] f32 attention weights only.

    Returned callable and gradient surface identical to
    make_adapted_attention: fn(u1, u2, u1_dst, u2_dst, central_f32,
    a1, a2) -> [N_out, D].
    """
    lay = ops.lay_dst
    B, Et, nb = lay.num_blocks, lay.tile_e, lay.node_block
    slope = negative_slope
    meta_dst, meta_src = ops.lay_dst, ops.lay_src
    aux0 = dict(ld=_lay_arrays(ops.lay_dst), ls=_lay_arrays(ops.lay_src),
                sfd=ops.src_from_dst)

    def _expand_scalar(lay, v):
        return padded_block_expand(lay, v[:, :, None])[..., 0]

    def _pad_blocks(u):
        n_full = B * nb
        u_pad = jnp.pad(u, ((0, n_full - u.shape[0]), (0, 0)))
        return u_pad.reshape(B, nb, -1)

    def _c_slot(lay, central):
        n_full = B * nb
        c_pad = jnp.pad(central, (0, n_full - central.shape[0]))
        return _expand_scalar(
            lay, c_pad.reshape(B, nb).astype(jnp.float32)
        )

    def _gather_sel_rows(u1, u2, c_slot, aux):
        n = u1.shape[0]
        table = jnp.concatenate([u1, u2], axis=0)
        idx = aux["ld"]["other"] + jnp.where(
            c_slot.reshape(-1) > 0.5, 0, n
        ).astype(jnp.int32)
        return table[idx].reshape(B, Et, -1)

    def _gather_sel_vjp(dm, c_slot, n_rows, aux):
        """du1, du2 — ONE 2D-wide src-keyed reduce of [dm·c ‖ dm·(1−c)]."""
        d = dm.shape[-1]
        c = c_slot.reshape(-1, 1).astype(jnp.float32)
        dm_flat = dm.reshape(-1, d).astype(jnp.float32)
        both = jnp.concatenate([dm_flat * c, dm_flat * (1.0 - c)], axis=1)
        du = padded_slot_reduce(
            _lay_from(aux["ls"], meta_src), both[aux["sfd"]].astype(dm.dtype)
        )[:n_rows]
        return du[:, :d], du[:, d:]

    def _ud_sel(u1_dst, u2_dst, central):
        cd = central.astype(u1_dst.dtype)[:, None]
        return u1_dst * cd + u2_dst * (1.0 - cd)

    def _forward(u1, u2, u1_dst, u2_dst, central, a1, a2, aux):
        lay = _lay_from(aux["ld"], meta_dst)
        valid = lay.slot_mask.reshape(B, Et)
        c_slot = _c_slot(lay, central)
        is_c = c_slot > 0.5
        m = _gather_sel_rows(u1, u2, c_slot, aux)        # [B, Et, D]
        d = padded_dst_expand(lay, _ud_sel(u1_dst, u2_dst, central))
        # msg-dtype h/logits: identical fp flow to the concatenated
        # _forward (bit-exact under bf16 messages)
        h = jax.nn.leaky_relu(m + d, slope)
        l1 = jnp.einsum("bed,d->be", h, a1.astype(h.dtype))
        l2 = jnp.einsum("bed,d->be", h, a2.astype(h.dtype))
        lm = jnp.where(
            valid, jnp.where(is_c, l1, l2).astype(jnp.float32), _NEG
        )
        ohb = lay.rel_key[:, None, :] == jax.lax.broadcasted_iota(
            jnp.int32, (1, nb, 1), 1
        )
        mx = jnp.max(jnp.where(ohb, lm[:, None, :], _NEG), axis=2)
        mx_slot = _expand_scalar(lay, mx)
        ex = jnp.where(valid, jnp.exp(lm - mx_slot), 0.0)
        denom = jax.lax.dot_general(
            ohb.astype(jnp.float32), ex[:, :, None],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        den_slot = _expand_scalar(lay, denom[..., 0])
        alpha = ex / jnp.where(den_slot == 0, 1.0, den_slot)
        out = padded_slot_reduce(lay, m, alpha.astype(u1.dtype))
        return out.astype(u1.dtype), (alpha, c_slot)

    def _pack_udc(u1_dst, u2_dst, central, dtype):
        """[B, nb, D+128] packed operand: [selected dst rows ‖ c ‖ 1 ‖ 0]
        — dst rows, domain flag and the hit column ride ONE one-hot MXU
        pass inside the kernel (see _attention_sel_kernel)."""
        dch = u1_dst.shape[-1]
        n_full = B * nb
        ud = _ud_sel(u1_dst, u2_dst, central)
        cols = jnp.concatenate([
            ud.astype(jnp.float32),
            central.astype(jnp.float32)[:, None],
            jnp.ones((ud.shape[0], 1), jnp.float32),
        ], axis=1)
        cols = jnp.pad(
            cols, ((0, n_full - ud.shape[0]), (0, 128 - 2))
        )
        return cols.reshape(B, nb, dch + 128).astype(dtype)

    def _forward_kernel(u1, u2, u1_dst, u2_dst, central, a1, a2, aux):
        from bridged_gnn_tpu.ops.pallas_fused import _attention_sel_call

        klay = _lay_from(aux["ld"], meta_dst)
        c_slot = _c_slot(klay, central)
        m = _gather_sel_rows(u1, u2, c_slot, aux)
        dch = u1.shape[-1]
        n_full = B * nb
        udc = _pack_udc(u1_dst, u2_dst, central, m.dtype)
        out, ex, den = _attention_sel_call(
            klay.rel_key, m, udc,
            a1.reshape(1, dch).astype(jnp.float32),
            a2.reshape(1, dch).astype(jnp.float32),
            nb, slope, interpret=interpret,
        )
        res = out.reshape(n_full, dch)[: central.shape[0]]
        # alpha residual reconstructed OUTSIDE the kernel (one [Et, 1]
        # expand) — dead-code-eliminated on the no-grad primal path
        deninv_slot = _expand_scalar(
            klay, (1.0 / den[..., 0]).reshape(B, nb)
        )
        alpha = ex.reshape(B, Et) * deninv_slot
        return res.astype(u1.dtype), (alpha, c_slot)

    _fwd_impl = _forward_kernel if kernel_fwd else _forward

    @jax.custom_vjp
    def fused_aux(u1, u2, u1_dst, u2_dst, central, a1, a2, aux):
        return _fwd_impl(u1, u2, u1_dst, u2_dst, central, a1, a2, aux)[0]

    def fwd(u1, u2, u1_dst, u2_dst, central, a1, a2, aux):
        out, (alpha, c_slot) = _fwd_impl(
            u1, u2, u1_dst, u2_dst, central, a1, a2, aux
        )
        return out, (u1, u2, u1_dst, u2_dst, central, a1, a2, alpha,
                     c_slot, aux)

    def bwd(res, dout):
        (u1, u2, u1_dst, u2_dst, central, a1, a2, alpha, c_slot,
         aux) = res
        lay = _lay_from(aux["ld"], meta_dst)
        dch = u1.shape[-1]
        dt = u1.dtype
        if kernel_bwd:
            from bridged_gnn_tpu.ops.pallas_fused import (
                _attention_sel_bwd_call,
            )

            m = _gather_sel_rows(u1, u2, c_slot, aux)
            n_full = B * nb
            udc = _pack_udc(u1_dst, u2_dst, central, m.dtype)
            dout_blk = jnp.pad(
                dout.astype(jnp.float32),
                ((0, n_full - dout.shape[0]), (0, 0)),
            ).reshape(B, nb, dch)
            dm, dud, da = _attention_sel_bwd_call(
                lay.rel_key, m, udc,
                a1.reshape(1, dch).astype(jnp.float32),
                a2.reshape(1, dch).astype(jnp.float32),
                alpha.reshape(B, Et, 1).astype(jnp.float32),
                dout_blk, nb, slope, interpret=interpret,
            )
            du1, du2 = _gather_sel_vjp(dm, c_slot, u1.shape[0], aux)
            dud_flat = dud.reshape(n_full, dch)[: u1_dst.shape[0]]
            cd = central[:, None]
            da_sum = jnp.sum(da[:, 0, :], axis=0)
            return (
                du1.astype(dt), du2.astype(dt),
                (dud_flat * cd).astype(dt),
                (dud_flat * (1.0 - cd)).astype(dt),
                jnp.zeros_like(central),
                da_sum[:dch].astype(a1.dtype),
                da_sum[dch:].astype(a2.dtype),
                float0_zeros(aux),
            )
        # recompute (XLA): one selected gather + one selected expand
        is_c = c_slot > 0.5
        m = _gather_sel_rows(u1, u2, c_slot, aux)
        d = padded_dst_expand(lay, _ud_sel(u1_dst, u2_dst, central))
        z = m + d                   # msg dtype, like the concat backward

        dout = dout.astype(jnp.float32)
        dout_slot = padded_block_expand(lay, _pad_blocks(dout))
        dalpha = jnp.einsum("bed,bed->be", m.astype(jnp.float32),
                            dout_slot)
        t = alpha * dalpha
        seg = padded_slot_reduce(lay, t.reshape(B, Et, 1))
        s_slot = _expand_scalar(lay, _pad_blocks(seg)[..., 0])
        dlm = t - alpha * s_slot
        dl1 = dlm * c_slot
        dl2 = dlm * (1.0 - c_slot)
        h = jax.nn.leaky_relu(z, slope).astype(jnp.float32)
        da1 = jnp.einsum("bed,be->d", h, dl1)
        da2 = jnp.einsum("bed,be->d", h, dl2)
        g = jnp.where(z > 0, 1.0, slope)
        dz = (dl1[..., None] * a1.astype(jnp.float32)
              + dl2[..., None] * a2.astype(jnp.float32)) * g
        dm = (alpha[..., None] * dout_slot + dz).astype(dt)
        du_dst = padded_slot_reduce(lay, dz.astype(dt))
        du_dst = du_dst[: u1_dst.shape[0]]
        cd = central[:, None]
        du1_dst = (du_dst * cd).astype(dt)
        du2_dst = (du_dst * (1.0 - cd)).astype(dt)
        du1, du2 = _gather_sel_vjp(dm, c_slot, u1.shape[0], aux)
        return (
            du1.astype(dt), du2.astype(dt), du1_dst, du2_dst,
            jnp.zeros_like(central), da1.astype(a1.dtype),
            da2.astype(a2.dtype), float0_zeros(aux),
        )

    fused_aux.defvjp(fwd, bwd)

    def fused(u1, u2, u1_dst, u2_dst, central, a1, a2):
        return fused_aux(u1, u2, u1_dst, u2_dst, central, a1, a2, aux0)

    return fused


def adapted_attention_sel(
    ops: BlockedOps,
    u1: jax.Array,            # [N_in, D] messages when dst is central (t2s)
    u2: jax.Array,            # [N_in, D] messages when dst is target (s2t)
    central: jax.Array,       # [N_out] bool destination-domain flag
    logit_fn1: Callable,
    logit_fn2: Callable,
    negative_slope: float = 0.1,
    u1_dst: jax.Array = None,
    u2_dst: jax.Array = None,
) -> jax.Array:
    """Branch-selected twin of :func:`adapted_attention`.

    Per edge slot only ONE message branch is ever consumed — the one
    matching the DESTINATION's domain (w1 = α·is_c, w2 = α·(1−is_c) in
    the concatenated form means every slot contributes exactly one
    branch). Folding that select into the gather INDEX over the stacked
    [2N, D] table (ops.gather_slots_sel) halves every downstream byte:
    the gathered slots, the dst-side expand, the leaky_relu/logit math
    and the weighted reduce are all D wide instead of 2D. The gather
    engine is issue-rate-bound (474 Mrows/s regardless of row width,
    DESIGN.md §2), so gather time is unchanged — the savings are pure.
    Mathematically identical to adapted_attention (same logits, same
    joint softmax semantics, same aggregation); parity pinned in
    tests/test_fused_attention.py."""
    lay = ops.lay_dst
    B, Et, nb = lay.num_blocks, lay.tile_e, lay.node_block
    valid = lay.slot_mask.reshape(B, Et)
    if u1_dst is None:
        u1_dst, u2_dst = u1, u2
    dch = u1.shape[-1]

    # per-slot destination-domain flag (block expand — no gather)
    n_full = B * nb
    c_pad = jnp.pad(
        central.astype(jnp.float32), (0, n_full - central.shape[0])
    )
    c_slot = padded_block_expand(lay, c_pad.reshape(B, nb, 1))[..., 0]
    is_c = c_slot > 0.5

    # ONE branch-selected row gather — the only gather-engine traffic
    m_sel = ops.gather_slots_sel(u1, u2, is_c)          # [B, Et, D]

    # destination-side rows: select per dst row BEFORE the expand
    cd = central.astype(u1_dst.dtype)[:, None]
    ud_sel = u1_dst * cd + u2_dst * (1.0 - cd)
    d_sel = padded_dst_expand(lay, ud_sel)              # [B, Et, D]

    # msg-dtype h and logits — the same fp flow as adapted_attention, so
    # the selective form is bit-exact vs the concatenated one under
    # bf16 messages too (pinned in tests)
    h = jax.nn.leaky_relu(m_sel + d_sel, negative_slope)
    l1 = logit_fn1(h)[..., 0].astype(jnp.float32)       # [B, Et]
    l2 = logit_fn2(h)[..., 0].astype(jnp.float32)
    logit = jnp.where(is_c, l1, l2)
    lm = jnp.where(valid, logit, _NEG)

    ohb = lay.rel_key[:, None, :] == jax.lax.broadcasted_iota(
        jnp.int32, (1, nb, 1), 1
    )
    mx = jnp.max(jnp.where(ohb, lm[:, None, :], _NEG), axis=2)
    mx = jax.lax.stop_gradient(mx)
    mx_slot = padded_block_expand(lay, mx[:, :, None])[..., 0]
    ex = jnp.where(valid, jnp.exp(lm - mx_slot), 0.0)
    denom = jax.lax.dot_general(
        ohb.astype(jnp.float32), ex[:, :, None],
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    den_slot = padded_block_expand(lay, denom)[..., 0]
    alpha = ex / jnp.where(den_slot == 0, 1.0, den_slot)

    out = padded_slot_reduce(lay, m_sel, alpha.astype(u1.dtype))
    return out.astype(u1.dtype)


def adapted_attention_tiered(
    tops,
    u1: jax.Array,            # [N_in, D] messages when dst is central
    u2: jax.Array,            # [N_in, D] messages when dst is target
    central: jax.Array,       # [N_out] bool destination-domain flag
    logit_fn1: Callable = None,
    logit_fn2: Callable = None,
    negative_slope: float = 0.1,
    a1: jax.Array = None,     # raw [D] projection vectors (kernel mode)
    a2: jax.Array = None,
    kernel_fwd: bool = False,
    kernel_bwd: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """:func:`adapted_attention` over degree-tiered dst-block layouts
    (ops/blocked_segment.py::TieredOps) — the skew answer for the fused
    conv. Each tier computes the full attention pass for ITS destination
    blocks with a tile_e sized to that tier (total slots ≲2× real edges
    instead of blocks×max-degree); every destination lives in exactly
    one tier, so the tier outputs are disjoint row ranges and ONE row
    permutation reassembles global order. Exact per-destination softmax
    — identical math to the single layout, different padding only.
    Autodiff stays scatter-free (tier gathers carry custom VJPs; the
    reassembly permutation has a permutation-aware VJP).

    Two parameter forms, mirroring AdaptedConv's branches:

    * ``logit_fn1``/``logit_fn2`` (flax modules) — the XLA autodiff path.
    * ``a1``/``a2`` raw vectors with ``kernel_fwd=True`` — the Mosaic
      single-kernel path, **VMEM-gated per tier**: a tier whose tile_e
      fits the measured kernel envelope (ops/pallas_fused.fits_vmem —
      typically the many light tiers) runs the kernel; a tier that
      doesn't (the heavy-skew head tier) runs the custom-VJP XLA form
      with the same a-vectors. This is exactly why tiers exist: one
      Et=9216 block no longer forces the WHOLE graph off the kernel
      (the r3 production crash pinned in tests/test_pallas_fused.py).
    """
    from bridged_gnn_tpu.ops.blocked_segment import permute_rows

    nb = tops.node_block
    n_full = tops.row_order.shape[0]
    c_pad = jnp.pad(central, (0, n_full - central.shape[0]))

    def fit_dst(u):
        # destination-side rows: pad up or slice down to the dst space
        # (slice when senders live in a larger space, e.g. halo x_ext;
        # both transposes stay scatter-free: pad ↔ slice)
        if u.shape[0] < n_full:
            return jnp.pad(u, ((0, n_full - u.shape[0]), (0, 0)))
        return u[:n_full]

    u1_full = fit_dst(u1)
    u2_full = fit_dst(u2)
    # ONE permutation into tier-concat order; per-tier dst rows are then
    # contiguous slices (their autodiff transpose is a pad, not a
    # scatter) and the output permutes back with the inverse
    u1_p = permute_rows(u1_full, tops.row_order, tops.inv_order)
    u2_p = permute_rows(u2_full, tops.row_order, tops.inv_order)
    c_p = c_pad[tops.row_order]
    outs = []
    for ops_t, (b0, b1) in zip(tops.tiers, tops.tier_spans):
        sl = slice(b0 * nb, b1 * nb)
        if a1 is not None:
            from bridged_gnn_tpu.ops import pallas_fused

            lay = ops_t.lay_dst
            isz = 2 if u1.dtype == jnp.bfloat16 else 4
            dch = u1.shape[-1]
            k_ok = kernel_fwd and pallas_fused.fits_vmem(
                lay.tile_e, nb, dch, itemsize=isz
            )
            fn = make_adapted_attention(
                ops_t, negative_slope,
                kernel_fwd=k_ok,
                kernel_bwd=k_ok and kernel_bwd and
                pallas_fused.fits_vmem_bwd(lay.tile_e, nb, dch,
                                           itemsize=isz),
                interpret=interpret,
            )
            out_t = fn(
                u1, u2, u1_p[sl], u2_p[sl],
                c_p[sl].astype(jnp.float32), a1, a2,
            )
        else:
            out_t = adapted_attention(
                ops_t, u1, u2, c_p[sl], logit_fn1, logit_fn2,
                negative_slope,
                u1_dst=u1_p[sl], u2_dst=u2_p[sl],
            )
        outs.append(out_t)
    cat = jnp.concatenate(outs, axis=0)              # tier-concat order
    out = permute_rows(cat, tops.inv_order, tops.row_order)
    return out[: central.shape[0]]
