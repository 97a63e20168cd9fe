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
