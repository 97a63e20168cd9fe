"""Fused attention conv parity: ops/fused_attention.py vs the plain
segment-op formulation (and vs AdaptedConv's unfused path), forward AND
gradients. Covers reference models/KTGNN.py:263-315 semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bridged_gnn_tpu.ops.blocked_segment import make_blocked_ops
from bridged_gnn_tpu.ops.fused_attention import adapted_attention
from bridged_gnn_tpu.ops.segment import segment_softmax, segment_sum


def _random_graph(rng, n=50, n_pad=64, e=300, e_pad=384):
    r = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
    s = rng.integers(0, n, size=e).astype(np.int32)
    em = np.zeros(e_pad, dtype=bool)
    em[:e] = rng.random(e) < 0.9
    senders = np.zeros(e_pad, np.int32)
    receivers = np.full(e_pad, n_pad - 1, np.int32)
    senders[:e], receivers[:e] = s, r
    # keep dst-sorted including padding tail
    order = np.argsort(receivers, kind="stable")
    return senders[order], receivers[order], em[order]


def _oracle(u1, u2, central, a1, a2, s, r, em, n_pad, slope):
    """Plain segment-op formulation (the unfused AdaptedConv math)."""
    e1 = jax.nn.leaky_relu(u1[s] + u1[r], slope)
    e2 = jax.nn.leaky_relu(u2[s] + u2[r], slope)
    l1 = e1 @ a1
    l2 = e2 @ a2
    dst_c = central[r]
    logits = jnp.where(dst_c, l1, l2)
    alpha = segment_softmax(
        logits, r, n_pad, mask=em, indices_are_sorted=True
    )
    msg = jnp.where(dst_c[:, None], u1[s], u2[s])
    return segment_sum(
        msg * alpha[:, None], r, n_pad, mask=em, indices_are_sorted=True
    )


@pytest.mark.parametrize("node_block", [16, 64])
def test_fused_attention_forward_and_grads(rng, node_block):
    n, n_pad = 50, 64
    s, r, em = _random_graph(rng)
    u1 = jnp.asarray(rng.normal(size=(n_pad, 8)).astype(np.float32))
    u2 = jnp.asarray(rng.normal(size=(n_pad, 8)).astype(np.float32))
    a1 = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    a2 = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    central = np.zeros(n_pad, bool)
    central[: n // 2] = True
    central_j = jnp.asarray(central)
    cot = jnp.asarray(rng.normal(size=(n_pad, 8)).astype(np.float32))
    ops = make_blocked_ops(s, r, em, n_pad, node_block=node_block)

    def fused(u1, u2, a1, a2):
        return adapted_attention(
            ops, u1, u2, central_j,
            lambda h: (h @ a1)[..., None],
            lambda h: (h @ a2)[..., None],
            negative_slope=0.1,
        )

    def oracle(u1, u2, a1, a2):
        return _oracle(
            u1, u2, central_j, a1, a2,
            jnp.asarray(s), jnp.asarray(r), jnp.asarray(em), n_pad, 0.1,
        )

    got = fused(u1, u2, a1, a2)
    want = oracle(u1, u2, a1, a2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )

    def loss(fn):
        return lambda *args: jnp.sum(fn(*args) * cot)

    g_got = jax.grad(loss(fused), argnums=(0, 1, 2, 3))(u1, u2, a1, a2)
    g_want = jax.grad(loss(oracle), argnums=(0, 1, 2, 3))(u1, u2, a1, a2)
    for gg, gw, name in zip(g_got, g_want, ["u1", "u2", "a1", "a2"]):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(gw), rtol=5e-4, atol=5e-5,
            err_msg=f"grad mismatch: {name}",
        )


def test_adapted_conv_fused_matches_unfused(rng):
    """End-to-end module parity: same params, fused on/off."""
    from bridged_gnn_tpu.graph import build_graph
    from bridged_gnn_tpu.nn.ktgnn import AdaptedConv
    from bridged_gnn_tpu.ops.spmm import adjacency_from_graph

    n, e = 40, 200
    s = rng.integers(0, n, size=e).astype(np.int64)
    r = rng.integers(0, n, size=e).astype(np.int64)
    x = rng.normal(size=(n, 12)).astype(np.float32)
    central = np.zeros(n, bool)
    central[: n // 2] = True
    g = build_graph(
        x, np.stack([s, r]), central_mask=central, node_pad=64,
        edge_pad=256,
    )
    adj = adjacency_from_graph(g, method="blocked")
    assert adj.fast_fn is not None

    kw = dict(out_channels=8, aggregate_dense=False)
    conv_f = AdaptedConv(use_fused=True, **kw)
    conv_u = AdaptedConv(use_fused=False, **kw)
    params = conv_f.init(
        jax.random.PRNGKey(0), g.x, adj, g.central_mask, g.node_mask
    )
    out_f = conv_f.apply(params, g.x, adj, g.central_mask, g.node_mask)
    out_u = conv_u.apply(params, g.x, adj, g.central_mask, g.node_mask)
    nm = np.asarray(g.node_mask)
    np.testing.assert_allclose(
        np.asarray(out_f)[nm], np.asarray(out_u)[nm], rtol=2e-5, atol=2e-5
    )

    cot = jnp.asarray(rng.normal(size=out_f.shape).astype(np.float32))
    nm_j = g.node_mask[:, None]

    def loss(conv):
        def f(p):
            o = conv.apply(p, g.x, adj, g.central_mask, g.node_mask)
            return jnp.sum(jnp.where(nm_j, o, 0) * cot)
        return f

    gf = jax.grad(loss(conv_f))(params)
    gu = jax.grad(loss(conv_u))(params)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_u = jax.tree_util.tree_leaves(gu)
    for (path, lf), lu in zip(flat_f, flat_u):
        np.testing.assert_allclose(
            np.asarray(lf), np.asarray(lu), rtol=1e-3, atol=1e-5,
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(path)}",
        )


@pytest.mark.parametrize("node_block", [16, 64])
def test_fused_attention_custom_vjp_matches_autodiff(rng, node_block):
    """make_adapted_attention (hand-derived recompute backward) must match
    the autodiff fused path exactly: forward and every gradient."""
    from bridged_gnn_tpu.ops.fused_attention import make_adapted_attention

    n, n_pad = 50, 64
    s, r, em = _random_graph(rng)
    u1 = jnp.asarray(rng.normal(size=(n_pad, 8)).astype(np.float32))
    u2 = jnp.asarray(rng.normal(size=(n_pad, 8)).astype(np.float32))
    a1 = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    a2 = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    central = np.zeros(n_pad, bool)
    central[: n // 2] = True
    central_f = jnp.asarray(central.astype(np.float32))
    central_j = jnp.asarray(central)
    cot = jnp.asarray(rng.normal(size=(n_pad, 8)).astype(np.float32))
    ops = make_blocked_ops(s, r, em, n_pad, node_block=node_block)
    fused_cv = make_adapted_attention(ops, negative_slope=0.1)

    def cvjp(u1, u2, a1, a2):
        return fused_cv(u1, u2, u1, u2, central_f, a1, a2)

    def autodiff(u1, u2, a1, a2):
        return adapted_attention(
            ops, u1, u2, central_j,
            lambda h: (h @ a1)[..., None],
            lambda h: (h @ a2)[..., None],
            negative_slope=0.1,
        )

    got = cvjp(u1, u2, a1, a2)
    want = autodiff(u1, u2, a1, a2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )

    def loss(fn):
        return lambda *args: jnp.sum(fn(*args) * cot)

    g_got = jax.grad(loss(cvjp), argnums=(0, 1, 2, 3))(u1, u2, a1, a2)
    g_want = jax.grad(loss(autodiff), argnums=(0, 1, 2, 3))(u1, u2, a1, a2)
    for gg, gw, name in zip(g_got, g_want, ["u1", "u2", "a1", "a2"]):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(gw), rtol=1e-4, atol=1e-5,
            err_msg=f"cvjp grad mismatch: {name}",
        )


def test_fused_attention_custom_vjp_separate_dst(rng):
    """Halo shape: senders index an extended array, destinations index a
    prefix — grads must split correctly between the two."""
    from bridged_gnn_tpu.ops.fused_attention import make_adapted_attention

    n_out, ext = 32, 48          # 32 owned rows + 16 halo rows
    e, e_pad = 200, 256
    r = np.sort(rng.integers(0, n_out, size=e)).astype(np.int32)
    s = rng.integers(0, ext, size=e).astype(np.int32)
    em = np.zeros(e_pad, bool)
    em[:e] = True
    senders = np.zeros(e_pad, np.int32)
    receivers = np.full(e_pad, n_out - 1, np.int32)
    senders[:e], receivers[:e] = s, r
    order = np.argsort(receivers, kind="stable")
    senders, receivers, em = senders[order], receivers[order], em[order]

    from bridged_gnn_tpu.ops.blocked_segment import (
        _padded_layout_np,
        _layout_from_np,
        make_slot_gather,
    )

    eid = np.arange(e_pad)
    d_np = _padded_layout_np(receivers, senders, eid, em, n_out, 16)
    lay_dst = _layout_from_np(d_np, n_out, 16)
    perm = np.argsort(senders, kind="stable")
    s_np_l = _padded_layout_np(
        senders[perm], receivers[perm], eid[perm], em[perm], ext, 16
    )
    lay_src = _layout_from_np(s_np_l, ext, 16)
    pos_dst = np.zeros(e_pad, np.int32)
    d_edge, d_mask = d_np[2].reshape(-1), d_np[3].reshape(-1)
    pos_dst[d_edge[d_mask]] = np.nonzero(d_mask)[0].astype(np.int32)
    src_from_dst = jnp.asarray(pos_dst[s_np_l[2].reshape(-1)])

    class _Ops:
        gather_slots = staticmethod(
            make_slot_gather(lay_dst, lay_src, src_from_dst)
        )

    _Ops.lay_dst = lay_dst
    _Ops.lay_src = lay_src
    _Ops.src_from_dst = src_from_dst

    u1 = jnp.asarray(rng.normal(size=(ext, 8)).astype(np.float32))
    u2 = jnp.asarray(rng.normal(size=(ext, 8)).astype(np.float32))
    a1 = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    a2 = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    central = (rng.random(n_out) < 0.5).astype(np.float32)
    central_f = jnp.asarray(central)
    cot = jnp.asarray(rng.normal(size=(n_out, 8)).astype(np.float32))

    from bridged_gnn_tpu.ops.fused_attention import (
        adapted_attention,
        make_adapted_attention,
    )

    fused_cv = make_adapted_attention(_Ops, negative_slope=0.1)

    def cvjp(u1, u2, a1, a2):
        return fused_cv(
            u1, u2, u1[:n_out], u2[:n_out], central_f, a1, a2
        )

    def autodiff(u1, u2, a1, a2):
        return adapted_attention(
            _Ops, u1, u2, jnp.asarray(central.astype(bool)),
            lambda h: (h @ a1)[..., None],
            lambda h: (h @ a2)[..., None],
            negative_slope=0.1,
            u1_dst=u1[:n_out], u2_dst=u2[:n_out],
        )

    np.testing.assert_allclose(
        np.asarray(cvjp(u1, u2, a1, a2)),
        np.asarray(autodiff(u1, u2, a1, a2)),
        rtol=2e-5, atol=2e-5,
    )

    def loss(fn):
        return lambda *args: jnp.sum(fn(*args) * cot)

    g_got = jax.grad(loss(cvjp), argnums=(0, 1, 2, 3))(u1, u2, a1, a2)
    g_want = jax.grad(loss(autodiff), argnums=(0, 1, 2, 3))(u1, u2, a1, a2)
    for gg, gw, name in zip(g_got, g_want, ["u1", "u2", "a1", "a2"]):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(gw), rtol=1e-4, atol=1e-5,
            err_msg=f"separate-dst grad mismatch: {name}",
        )


def test_tiered_attention_matches_single_layout(rng):
    """Degree-tiered layouts (skew answer): same per-destination softmax
    math as the single layout — values and gradients — on a graph with a
    heavy-hub degree distribution, while using far fewer slots."""
    import jax
    import jax.numpy as jnp

    from bridged_gnn_tpu.ops.blocked_segment import (
        make_blocked_ops,
        make_tiered_blocked_ops,
    )
    from bridged_gnn_tpu.ops.fused_attention import (
        adapted_attention,
        adapted_attention_tiered,
    )

    n, d = 1024, 16
    # hub skew: a few destinations get most edges
    hubs = rng.integers(0, n, size=8)
    r = np.concatenate([
        rng.integers(0, n, size=2048),
        np.repeat(hubs, 400),
    ])
    s = rng.integers(0, n, size=len(r))
    order = np.argsort(r, kind="stable")
    s, r = s[order].astype(np.int64), r[order].astype(np.int64)
    em = np.ones(len(r), bool)

    ops = make_blocked_ops(s, r, em, n, node_block=128)
    tops = make_tiered_blocked_ops(s, r, em, n, node_block=128)
    assert len(tops.tiers) >= 2
    assert tops.slots_tiered < 0.6 * tops.slots_single

    u1 = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    u2 = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    a1 = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    a2 = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    central = jnp.asarray(np.arange(n) < n // 2)
    cot = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

    def f_single(u1, u2, a1, a2):
        return jnp.sum(adapted_attention(
            ops, u1, u2, central,
            lambda h: (h @ a1)[..., None],
            lambda h: (h @ a2)[..., None],
        ) * cot)

    def f_tiered(u1, u2, a1, a2):
        return jnp.sum(adapted_attention_tiered(
            tops, u1, u2, central,
            lambda h: (h @ a1)[..., None],
            lambda h: (h @ a2)[..., None],
        ) * cot)

    v_s = jax.jit(f_single)(u1, u2, a1, a2)
    v_t = jax.jit(f_tiered)(u1, u2, a1, a2)
    np.testing.assert_allclose(np.asarray(v_t), np.asarray(v_s),
                               rtol=1e-5)
    g_s = jax.grad(f_single, argnums=(0, 1, 2, 3))(u1, u2, a1, a2)
    g_t = jax.grad(f_tiered, argnums=(0, 1, 2, 3))(u1, u2, a1, a2)
    for a, b in zip(g_t, g_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def _sel_problem(rng, n=280, e=1400, d=16, npad=288, nb=64):
    from bridged_gnn_tpu.ops.blocked_segment import make_blocked_ops

    s = rng.integers(0, n, size=e).astype(np.int32)
    r = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
    em = np.ones(e, bool)
    em[-23:] = False
    ops = make_blocked_ops(s, r, em, npad, node_block=nb)
    u1 = jnp.asarray(rng.normal(size=(npad, d)).astype(np.float32))
    u2 = jnp.asarray(rng.normal(size=(npad, d)).astype(np.float32))
    central = jnp.asarray(rng.random(npad) < 0.5)
    a1 = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    a2 = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    return ops, u1, u2, central, a1, a2


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_selective_attention_bitexact_vs_concat(rng, dtype):
    """adapted_attention_sel (branch select folded into the gather
    index, VERDICT r4 #4) must be BIT-exact vs adapted_attention —
    forward and all autodiff gradients (same math, same fp order on the
    consumed branch) — under f32 AND bf16 messages (the production
    message_dtype; review r5 caught an f32 upcast that silently broke
    bf16 bit-exactness)."""
    from bridged_gnn_tpu.ops.fused_attention import adapted_attention_sel

    ops, u1, u2, central, a1, a2 = _sel_problem(rng)
    u1 = u1.astype(dtype)
    u2 = u2.astype(dtype)

    def run(fn, u1, u2, a1, a2):
        return fn(
            ops, u1, u2, central,
            lambda h: (h * a1).sum(-1, keepdims=True),
            lambda h: (h * a2).sum(-1, keepdims=True),
        )

    ref = run(adapted_attention, u1, u2, a1, a2)
    got = run(adapted_attention_sel, u1, u2, a1, a2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def loss(fn):
        def f(u1, u2, a1, a2):
            return (run(fn, u1, u2, a1, a2) ** 2).sum()
        return jax.grad(f, argnums=(0, 1, 2, 3))(u1, u2, a1, a2)

    for a, b in zip(loss(adapted_attention_sel), loss(adapted_attention)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("kernels", [False, True])
def test_selective_custom_vjp_matches_concat(rng, kernels):
    """make_adapted_attention_sel (recompute backward; optionally the
    pass-minimized Mosaic kernels in interpret mode) vs the concatenated
    custom-VJP form: forward and grads to fp tolerance."""
    from bridged_gnn_tpu.ops.fused_attention import (
        make_adapted_attention,
        make_adapted_attention_sel,
    )

    ops, u1, u2, central, a1, a2 = _sel_problem(rng)
    central_f = central.astype(jnp.float32)
    ref_fn = make_adapted_attention(ops)
    sel_fn = make_adapted_attention_sel(
        ops, kernel_fwd=kernels, kernel_bwd=kernels, interpret=kernels
    )
    args = (u1, u2, u1, u2, central_f, a1, a2)
    np.testing.assert_allclose(
        np.asarray(sel_fn(*args)), np.asarray(ref_fn(*args)),
        rtol=1e-5, atol=1e-5,
    )

    def loss(fn):
        def f(u1, u2, a1, a2):
            return (fn(u1, u2, u1, u2, central_f, a1, a2) ** 2).sum()
        return jax.grad(f, argnums=(0, 1, 2, 3))(u1, u2, a1, a2)

    for a, b in zip(loss(sel_fn), loss(ref_fn)):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4,
            atol=5e-4 * scale,
        )


def test_gather_slots_sel_vjp(rng):
    """The branch-selected gather's custom VJP vs autodiff of the
    explicit stacked-table gather."""
    from bridged_gnn_tpu.ops.blocked_segment import padded_block_expand

    ops, u1, u2, central, _, _ = _sel_problem(rng)
    lay = ops.lay_dst
    B, nb = lay.num_blocks, lay.node_block
    n_full = B * nb
    c_pad = jnp.pad(central.astype(jnp.float32),
                    (0, n_full - central.shape[0]))
    c_slot = padded_block_expand(
        lay, c_pad.reshape(B, nb, 1))[..., 0] > 0.5
    # cotangents masked to REAL slots: the custom VJP (like gather_slots')
    # drops padding-slot cotangents — in real use they are always zero
    # (padding slots carry alpha == 0 through every consumer)
    cot = jnp.asarray(
        rng.normal(size=(B, lay.tile_e, u1.shape[1])).astype(np.float32)
    ) * lay.slot_mask.reshape(B, lay.tile_e, 1)

    def f_sel(u1, u2):
        return (ops.gather_slots_sel(u1, u2, c_slot) * cot).sum()

    def f_ref(u1, u2):
        n = u1.shape[0]
        table = jnp.concatenate([u1, u2], axis=0)
        idx = lay.other_slot + jnp.where(
            c_slot.reshape(-1), 0, n).astype(jnp.int32)
        m = table[idx].reshape(B, lay.tile_e, -1)
        return (m * cot).sum()

    np.testing.assert_allclose(float(f_sel(u1, u2)), float(f_ref(u1, u2)),
                               rtol=1e-6)
    g_s = jax.grad(f_sel, argnums=(0, 1))(u1, u2)
    g_r = jax.grad(f_ref, argnums=(0, 1))(u1, u2)
    for a, b in zip(g_s, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
