"""Pallas kernel logic validated on CPU via interpreter mode (compiled-mode
performance is exercised by bench.py on real TPU hardware).

The first-generation chunked segment-sum kernel (ops/pallas_segment.py)
was retired in round 3 — superseded by the padded slot-layout kernels
below; its host meta builder lives on as ops/chunk_meta.py, covered by
test_native.py."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from bridged_gnn_tpu.ops.chunk_meta import build_chunk_meta


def test_chunk_meta_ranges(rng):
    """Chunk ranges cover exactly each block's dst-sorted edge range."""
    n, e = 512, 8192
    r = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
    meta = build_chunk_meta(r, e, n, node_block=128, edge_chunk=1024)
    assert meta.num_blocks == 4
    for b in range(meta.num_blocks):
        lo, hi = b * 128, (b + 1) * 128
        edges = np.flatnonzero((r >= lo) & (r < hi))
        if len(edges) == 0:
            assert meta.num_chunks[b] == 0
            continue
        first_chunk = edges[0] // 1024
        last_chunk = edges[-1] // 1024
        assert meta.chunk_base[b] == first_chunk
        assert meta.num_chunks[b] == last_chunk - first_chunk + 1


# --- padded slot-layout kernels (ops/pallas_padded.py) ---


def test_padded_slot_reduce_pallas_matches_xla(rng):
    from bridged_gnn_tpu.ops import blocked_segment as bs
    from bridged_gnn_tpu.ops import pallas_padded as pp

    n_pad, e = 256, 2048
    s = rng.integers(0, n_pad, size=e).astype(np.int32)
    r = np.sort(rng.integers(0, n_pad, size=e)).astype(np.int32)
    em = rng.random(e) < 0.85
    lay = bs.build_padded_layout(
        r, s, np.arange(e), em, n_pad, node_block=64
    )
    x = jnp.asarray(rng.normal(size=(n_pad, 64)).astype(np.float32))
    w = rng.normal(size=e).astype(np.float32)
    w_slot = jnp.asarray(w)[lay.slot_edge] * lay.slot_mask.astype(
        jnp.float32
    )
    want = np.asarray(bs.padded_gather_reduce(lay, x, w_slot))
    vals = x[lay.other_slot]
    got = np.asarray(
        pp.slot_reduce_pallas(lay, vals, w_slot, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_reduce_impl_dispatch(rng, monkeypatch):
    """BGNN_PALLAS switch routes padded reduces through the Mosaic twin
    (interpreter mode here); results must be identical."""
    from bridged_gnn_tpu.ops import blocked_segment as bs
    from bridged_gnn_tpu.ops import pallas_padded as pp

    orig = pl.pallas_call

    def force_interpret(*a, **k):
        k["interpret"] = True  # overrides the callee's explicit False
        return orig(*a, **k)

    monkeypatch.setattr(pp.pl, "pallas_call", force_interpret)
    n_pad, e = 128, 1024
    s = rng.integers(0, n_pad, size=e).astype(np.int32)
    r = np.sort(rng.integers(0, n_pad, size=e)).astype(np.int32)
    em = rng.random(e) < 0.9
    ops = bs.make_blocked_ops(s, r, em, n_pad, node_block=64)
    x = jnp.asarray(rng.normal(size=(n_pad, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=e).astype(np.float32))
    want = np.asarray(ops.spmm(x, w))
    bs.set_reduce_impl("pallas")
    try:
        got = np.asarray(ops.spmm(x, w))
        g_want = jax.grad(lambda x: jnp.sum(ops.spmm(x, w) ** 2))(x)
    finally:
        bs.set_reduce_impl("xla")
    g_xla = jax.grad(lambda x: jnp.sum(ops.spmm(x, w) ** 2))(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(g_want), np.asarray(g_xla), rtol=1e-4, atol=1e-4
    )


def test_rebind_blocked_ops_traced_matches(rng):
    """BlockedOps rebuilt from jit-ARGUMENT layout arrays
    (blocked_ops_leaves → rebind_blocked_ops inside the jitted fn) must
    match the host-bound ops exactly — values and gradients — including
    through the fused attention custom VJP. This is the mechanism that
    keeps graph-sized layout constants out of the compiled HLO at
    capacity scale (DESIGN.md §9)."""
    import jax
    import jax.numpy as jnp

    from bridged_gnn_tpu.ops.blocked_segment import (
        blocked_ops_leaves,
        make_blocked_ops,
        rebind_blocked_ops,
    )
    from bridged_gnn_tpu.ops.fused_attention import adapted_attention

    n, e, d = 512, 4096, 16
    s = rng.integers(0, n, size=e).astype(np.int64)
    r = np.sort(rng.integers(0, n, size=e)).astype(np.int64)
    em = np.ones(e, bool)
    ops = make_blocked_ops(s, r, em, n, node_block=128)
    leaves = blocked_ops_leaves(ops)
    u1 = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    u2 = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(e,)).astype(np.float32))
    a1 = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    a2 = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    central = np.arange(n) < n // 2
    cot = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

    from bridged_gnn_tpu.ops.fused_attention import (
        make_adapted_attention,
    )

    def run(ops_, u1, u2, w):
        att = adapted_attention(
            ops_, u1, u2, jnp.asarray(central),
            lambda h: (h @ a1.astype(h.dtype))[..., None],
            lambda h: (h @ a2.astype(h.dtype))[..., None],
        )
        # recompute custom-VJP path too (aux-threaded layout arrays)
        att2 = make_adapted_attention(ops_, 0.1)(
            u1, u2, u1, u2, jnp.asarray(central, jnp.float32), a1, a2
        )
        return (jnp.sum(att * cot) + jnp.sum(att2 * cot)
                + jnp.sum(ops_.spmm(u1, w)) + jnp.sum(ops_.pair_sum(u1)))

    want = jax.jit(lambda u1, u2, w: run(ops, u1, u2, w))(u1, u2, w)
    gw = jax.grad(lambda u1, u2, w: run(ops, u1, u2, w),
                  argnums=(0, 1, 2))(u1, u2, w)

    @jax.jit
    def traced(leaves, u1, u2, w):
        ops_t = rebind_blocked_ops(leaves, ops)
        return run(ops_t, u1, u2, w)

    got = traced(leaves, u1, u2, w)
    gt = jax.grad(traced, argnums=(1, 2, 3))(leaves, u1, u2, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6)
    for a, b in zip(gt, gw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
