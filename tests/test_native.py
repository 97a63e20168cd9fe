"""Native graph-core library vs numpy reference implementations."""

import numpy as np
import pytest

from bridged_gnn_tpu.graph import coalesce_np, sort_edges_by_dst
from bridged_gnn_tpu.io import native
from bridged_gnn_tpu.ops.chunk_meta import build_chunk_meta


def test_native_builds():
    assert native.native_available(), "libgraphcore.so failed to build"


def test_native_coalesce_matches(rng):
    ei = rng.integers(0, 100, size=(2, 5000))
    got = native.coalesce(ei, 100)
    expect = coalesce_np(ei, 100)
    np.testing.assert_array_equal(got, expect)


def test_native_sort_matches(rng):
    ei = rng.integers(0, 50, size=(2, 1000))
    got = native.sort_by_dst(ei)
    expect = sort_edges_by_dst(ei, 50)
    np.testing.assert_array_equal(got, expect)


def test_native_rowptr(rng):
    dst = np.sort(rng.integers(0, 40, size=500))
    ptr = native.csr_rowptr(dst, 40)
    assert ptr[0] == 0 and ptr[-1] == 500
    for v in range(40):
        assert ptr[v + 1] - ptr[v] == (dst == v).sum()


def test_native_chunk_meta_matches(rng):
    dst = np.sort(rng.integers(0, 2048, size=16384)).astype(np.int64)
    cb, nc, mx = native.chunk_meta(dst, 2048, 256, 1024)
    m = build_chunk_meta(dst, len(dst), 2048, 256, 1024)
    np.testing.assert_array_equal(cb, m.chunk_base)
    np.testing.assert_array_equal(nc, m.num_chunks)
    assert mx == m.max_chunks
