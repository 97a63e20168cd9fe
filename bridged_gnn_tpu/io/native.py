"""ctypes bindings to the native graph-core library (native/graphcore.cpp).

Auto-builds the shared library with `make` on first use; every entry point
has a numpy fallback so the framework works without a compiler. The native
path takes over for production-scale graphs where python-side sorting is
the build bottleneck.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgraphcore.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False

_I64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_I32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.gc_coalesce.restype = ctypes.c_int64
        lib.gc_coalesce.argtypes = [
            _I64, _I64, ctypes.c_int64, _I64, _I64
        ]
        lib.gc_sort_by_dst.restype = None
        lib.gc_sort_by_dst.argtypes = [
            _I64, _I64, ctypes.c_int64, _I64, _I64
        ]
        lib.gc_csr_rowptr.restype = None
        lib.gc_csr_rowptr.argtypes = [_I64, ctypes.c_int64, ctypes.c_int64,
                                      _I64]
        lib.gc_chunk_meta.restype = ctypes.c_int64
        lib.gc_chunk_meta.argtypes = [
            _I64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, _I32, _I32,
        ]
        lib.gc_degrees.restype = None
        lib.gc_degrees.argtypes = [
            _I64, _I64, ctypes.c_int64, ctypes.c_int64, _I64, _I64
        ]
        lib.gc_edge_partition.restype = None
        lib.gc_edge_partition.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, _I64
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def coalesce(edge_index: np.ndarray, num_nodes: int) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(edge_index[0], dtype=np.int64)
    dst = np.ascontiguousarray(edge_index[1], dtype=np.int64)
    e = src.shape[0]
    if lib is None or e == 0:
        from bridged_gnn_tpu.graph import coalesce_np

        return coalesce_np(edge_index, num_nodes)
    out_src = np.empty(e, dtype=np.int64)
    out_dst = np.empty(e, dtype=np.int64)
    n = lib.gc_coalesce(src, dst, e, out_src, out_dst)
    return np.stack([out_src[:n], out_dst[:n]])


def sort_by_dst(edge_index: np.ndarray) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(edge_index[0], dtype=np.int64)
    dst = np.ascontiguousarray(edge_index[1], dtype=np.int64)
    e = src.shape[0]
    if lib is None or e == 0:
        order = np.argsort(dst * (dst.max() + 1 if e else 1) + src,
                           kind="stable")
        return np.stack([src[order], dst[order]])
    out_src = np.empty(e, dtype=np.int64)
    out_dst = np.empty(e, dtype=np.int64)
    lib.gc_sort_by_dst(src, dst, e, out_src, out_dst)
    return np.stack([out_src, out_dst])


def csr_rowptr(dst_sorted: np.ndarray, num_nodes: int) -> np.ndarray:
    lib = _load()
    dst = np.ascontiguousarray(dst_sorted, dtype=np.int64)
    if lib is None:
        return np.concatenate(
            [[0], np.cumsum(np.bincount(dst, minlength=num_nodes))]
        ).astype(np.int64)
    out = np.empty(num_nodes + 1, dtype=np.int64)
    lib.gc_csr_rowptr(dst, len(dst), num_nodes, out)
    return out


def degrees(
    edge_index: np.ndarray, num_nodes: int
) -> Tuple[np.ndarray, np.ndarray]:
    """(in_degree, out_degree) of each node; native above numpy speed."""
    lib = _load()
    src = np.ascontiguousarray(edge_index[0], dtype=np.int64)
    dst = np.ascontiguousarray(edge_index[1], dtype=np.int64)
    if lib is None:
        return (
            np.bincount(dst, minlength=num_nodes).astype(np.int64),
            np.bincount(src, minlength=num_nodes).astype(np.int64),
        )
    in_deg = np.empty(num_nodes, dtype=np.int64)
    out_deg = np.empty(num_nodes, dtype=np.int64)
    lib.gc_degrees(src, dst, src.shape[0], num_nodes, in_deg, out_deg)
    return in_deg, out_deg


def edge_partition(
    num_edges: int, num_shards: int, align: int = 128
) -> np.ndarray:
    """Contiguous near-equal edge shard offsets, aligned; [p+1] int64."""
    lib = _load()
    if lib is None:
        pos = (num_edges * np.arange(num_shards + 1)) // num_shards
        out = (pos // align) * align
        out[-1] = num_edges
        return out.astype(np.int64)
    out = np.empty(num_shards + 1, dtype=np.int64)
    lib.gc_edge_partition(num_edges, num_shards, align, out)
    return out


def chunk_meta(
    dst_sorted: np.ndarray, num_nodes_padded: int,
    node_block: int, edge_chunk: int,
) -> Tuple[np.ndarray, np.ndarray, int]:
    lib = _load()
    dst = np.ascontiguousarray(dst_sorted, dtype=np.int64)
    n_blocks = -(-num_nodes_padded // node_block)
    if lib is None:
        from bridged_gnn_tpu.ops.chunk_meta import build_chunk_meta

        m = build_chunk_meta(dst, len(dst), num_nodes_padded, node_block,
                             edge_chunk)
        return m.chunk_base, m.num_chunks, m.max_chunks
    chunk_base = np.empty(n_blocks, dtype=np.int32)
    num_chunks = np.empty(n_blocks, dtype=np.int32)
    mx = lib.gc_chunk_meta(dst, len(dst), num_nodes_padded, node_block,
                           edge_chunk, chunk_base, num_chunks)
    return chunk_base, num_chunks, int(mx)
