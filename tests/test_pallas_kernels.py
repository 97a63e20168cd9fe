"""Pallas kernel logic validated on CPU via interpreter mode (compiled-mode
performance is exercised by bench.py on real TPU hardware)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from bridged_gnn_tpu.ops import pallas_segment as ps


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(ps.pl, "pallas_call", interp)
    yield


def _run(msg, r, n, node_block=128, edge_chunk=1024):
    meta = ps.build_chunk_meta(r, len(r), n, node_block, edge_chunk)
    return np.asarray(ps.segment_sum_sorted_pallas(
        jnp.asarray(msg), jnp.asarray(r),
        jnp.asarray(meta.chunk_base), jnp.asarray(meta.num_chunks),
        n, meta.node_block, meta.edge_chunk, meta.max_chunks,
        meta.num_blocks,
    ))


def test_uniform(rng):
    n, e, d = 512, 8192, 128
    r = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
    msg = rng.normal(size=(e, d)).astype(np.float32)
    expect = np.asarray(jax.ops.segment_sum(
        jnp.asarray(msg), jnp.asarray(r), num_segments=n,
        indices_are_sorted=True,
    ))
    np.testing.assert_allclose(_run(msg, r, n), expect, rtol=1e-4, atol=1e-4)


def test_skewed_and_empty(rng):
    n, e, d = 512, 8192, 128
    r = np.sort(np.concatenate([
        np.zeros(3000, np.int32),
        rng.integers(100, 200, size=e - 3000).astype(np.int32),
    ]))
    msg = rng.normal(size=(e, d)).astype(np.float32)
    expect = np.asarray(jax.ops.segment_sum(
        jnp.asarray(msg), jnp.asarray(r), num_segments=n,
        indices_are_sorted=True,
    ))
    np.testing.assert_allclose(_run(msg, r, n), expect, rtol=1e-4, atol=1e-4)


def test_spmm_pallas_with_mask_and_weights(rng):
    n, e, d = 256, 4096, 64
    senders = rng.integers(0, n, size=e).astype(np.int32)
    r = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
    mask = rng.random(e) < 0.8
    w = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(n, d)).astype(np.float32)
    meta = ps.build_chunk_meta(r, e, n, 128, 1024)
    got = np.asarray(ps.spmm_pallas(
        jnp.asarray(x), jnp.asarray(senders), jnp.asarray(r),
        jnp.asarray(mask), meta, n, edge_weights=jnp.asarray(w),
    ))
    expect = np.zeros((n, d), dtype=np.float64)
    for i in range(e):
        if mask[i]:
            expect[r[i]] += w[i] * x[senders[i]]
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-3)


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

    monkeypatch.setattr(
        pp.pl, "pallas_call",
        functools.partial(pl.pallas_call, interpret=True),
    )
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
