"""Static-shape graph container for TPU execution.

Replaces the reference's PyG ``Data`` object (reference:
``Bridged-GNN/datasets.py``, ``utils.py:41-99``) with an immutable JAX pytree
that obeys XLA's static-shape discipline:

  * node and edge arrays are padded to block multiples;
  * validity is tracked with boolean masks instead of dynamic shapes;
  * edges are kept sorted by destination (receiver) so that segment
    reductions run over contiguous runs — the TPU-friendly layout for
    scatter-softmax / scatter-add aggregation.

Build-time (host, numpy) utilities live here too: coalesce, self-loop
handling, destination-domain partition (reference ``models/KTGNN.py:385-398``)
and graph merge (reference ``main_bridged_graph.py:163-222``).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

NODE_BLOCK = 8     # float32 sublane multiple
EDGE_BLOCK = 128   # lane multiple


# Above this edge count, host-side sort/coalesce dispatch to the native
# C++ library (native/graphcore.cpp) — numpy argsort becomes the graph
# build bottleneck at production scale.
NATIVE_EDGE_THRESHOLD = 1_000_000


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Graph pytree
# ---------------------------------------------------------------------------


@struct.dataclass
class Graph:
    """Immutable padded graph.

    Edge arrays are sorted by ``receivers`` (ties broken by ``senders``).
    Padded edge slots have ``edge_mask == False`` and point at node
    ``num_nodes_padded - 1``; every aggregation masks them out.
    """

    x: jax.Array          # [N_pad, D] float
    y: jax.Array          # [N_pad] int32, -1 = missing / padding
    senders: jax.Array    # [E_pad] int32
    receivers: jax.Array  # [E_pad] int32
    edge_mask: jax.Array  # [E_pad] bool
    node_mask: jax.Array  # [N_pad] bool
    train_mask: jax.Array
    val_mask: jax.Array
    test_mask: jax.Array
    central_mask: jax.Array
    num_nodes: int = struct.field(pytree_node=False)
    num_edges: int = struct.field(pytree_node=False)

    @property
    def num_nodes_padded(self) -> int:
        return self.x.shape[0]

    @property
    def num_edges_padded(self) -> int:
        return self.senders.shape[0]

    @property
    def num_features(self) -> int:
        return self.x.shape[1]

    @property
    def num_classes(self) -> int:
        # mirrors reference `data.y.max().item() + 1`; host-side only
        return int(np.asarray(self.y).max()) + 1

    def edge_index_np(self) -> np.ndarray:
        """Dense [2, E] int64 edge index of real edges (host-side)."""
        m = np.asarray(self.edge_mask)
        return np.stack(
            [np.asarray(self.senders)[m], np.asarray(self.receivers)[m]]
        ).astype(np.int64)


# ---------------------------------------------------------------------------
# Host-side edge utilities (numpy, build time)
# ---------------------------------------------------------------------------


def coalesce_np(edge_index: np.ndarray, num_nodes: int) -> np.ndarray:
    """Sort edges lexicographically by (dst, src) and drop duplicates.

    Equivalent in effect to `torch_geometric.utils.coalesce` as used by the
    reference (main_bridged_graph.py:75,113,193); we sort by destination
    first because that is the layout segment reductions want.
    """
    if edge_index.size == 0:
        return edge_index.reshape(2, 0)
    if edge_index.shape[1] >= NATIVE_EDGE_THRESHOLD:
        from bridged_gnn_tpu.io import native

        if native.native_available():
            return native.coalesce(edge_index, num_nodes)
    src, dst = edge_index[0].astype(np.int64), edge_index[1].astype(np.int64)
    key = dst * num_nodes + src
    order = np.argsort(key, kind="stable")
    key_sorted = key[order]
    keep = np.ones(len(key_sorted), dtype=bool)
    keep[1:] = key_sorted[1:] != key_sorted[:-1]
    sel = order[keep]
    return np.stack([src[sel], dst[sel]])


def sort_edges_by_dst(edge_index: np.ndarray, num_nodes: int) -> np.ndarray:
    if edge_index.shape[1] >= NATIVE_EDGE_THRESHOLD:
        from bridged_gnn_tpu.io import native

        if native.native_available():
            return native.sort_by_dst(edge_index)
    src, dst = edge_index[0].astype(np.int64), edge_index[1].astype(np.int64)
    order = np.argsort(dst * num_nodes + src, kind="stable")
    return np.stack([src[order], dst[order]])


def remove_self_loops_np(edge_index: np.ndarray) -> np.ndarray:
    keep = edge_index[0] != edge_index[1]
    return edge_index[:, keep]


def add_self_loops_np(edge_index: np.ndarray, num_nodes: int) -> np.ndarray:
    """Append one self loop per node (reference KTGNN.py:390-394 semantics:
    remove existing self loops first, then add all)."""
    loops = np.arange(num_nodes, dtype=np.int64)
    return np.concatenate(
        [edge_index, np.stack([loops, loops])], axis=1
    )


# ---------------------------------------------------------------------------
# Graph construction
# ---------------------------------------------------------------------------


def build_graph(
    x: np.ndarray,
    edge_index: np.ndarray,
    y: Optional[np.ndarray] = None,
    train_mask: Optional[np.ndarray] = None,
    val_mask: Optional[np.ndarray] = None,
    test_mask: Optional[np.ndarray] = None,
    central_mask: Optional[np.ndarray] = None,
    *,
    node_pad: int = NODE_BLOCK,
    edge_pad: int = EDGE_BLOCK,
    edge_capacity: Optional[int] = None,
    sort_edges: bool = True,
    dtype=jnp.float32,
) -> Graph:
    """Build a padded :class:`Graph` from host arrays.

    ``edge_capacity`` reserves extra padded edge slots (capacity planning for
    bridge construction, where the edge set grows by at most
    ``k_cross·N_tar + k_within·(N_src+N_tar)`` edges).
    """
    x = np.asarray(x, dtype=np.float32)
    n, d = x.shape
    e = edge_index.shape[1]
    n_pad = round_up(max(n, 1), node_pad)
    e_cap = edge_capacity if edge_capacity is not None else e
    e_pad = round_up(max(e_cap, 1), edge_pad)

    if sort_edges and e > 0:
        edge_index = sort_edges_by_dst(np.asarray(edge_index), n)

    def pad_nodes(a, fill, dt):
        out = np.full((n_pad,) + a.shape[1:], fill, dtype=dt)
        out[:n] = a
        return out

    x_p = np.zeros((n_pad, d), dtype=np.float32)
    x_p[:n] = x

    y = np.full(n, -1, dtype=np.int32) if y is None else np.asarray(y)
    y_p = pad_nodes(y.astype(np.int32), -1, np.int32)

    def mask_or_false(mask):
        if mask is None:
            mask = np.zeros(n, dtype=bool)
        return pad_nodes(np.asarray(mask, dtype=bool), False, bool)

    senders = np.full(e_pad, n_pad - 1, dtype=np.int32)
    receivers = np.full(e_pad, n_pad - 1, dtype=np.int32)
    senders[:e] = edge_index[0]
    receivers[:e] = edge_index[1]
    edge_mask = np.zeros(e_pad, dtype=bool)
    edge_mask[:e] = True
    node_mask = np.zeros(n_pad, dtype=bool)
    node_mask[:n] = True

    return Graph(
        x=jnp.asarray(x_p, dtype=dtype),
        y=jnp.asarray(y_p),
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(receivers),
        edge_mask=jnp.asarray(edge_mask),
        node_mask=jnp.asarray(node_mask),
        train_mask=jnp.asarray(mask_or_false(train_mask)),
        val_mask=jnp.asarray(mask_or_false(val_mask)),
        test_mask=jnp.asarray(mask_or_false(test_mask)),
        central_mask=jnp.asarray(mask_or_false(central_mask)),
        num_nodes=n,
        num_edges=e,
    )


def with_self_loops(g: Graph) -> Graph:
    """Return a new Graph whose edges are (edges minus self loops) plus one
    self loop per real node, re-sorted by destination.

    Mirrors the reference KT-GNN `graph_partition` preprocessing
    (models/KTGNN.py:385-394).
    """
    ei = remove_self_loops_np(g.edge_index_np())
    ei = add_self_loops_np(ei, g.num_nodes)
    return build_graph(
        np.asarray(g.x)[: g.num_nodes],
        ei,
        y=np.asarray(g.y)[: g.num_nodes],
        train_mask=np.asarray(g.train_mask)[: g.num_nodes],
        val_mask=np.asarray(g.val_mask)[: g.num_nodes],
        test_mask=np.asarray(g.test_mask)[: g.num_nodes],
        central_mask=np.asarray(g.central_mask)[: g.num_nodes],
    )


# ---------------------------------------------------------------------------
# Merge / reorder (bridge construction back end)
# ---------------------------------------------------------------------------


def merge_graphs_np(
    src: Dict[str, np.ndarray],
    tar: Dict[str, np.ndarray],
    edge_index_cross: np.ndarray,
    edge_index_within_src: Optional[np.ndarray] = None,
    edge_index_within_tar: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """Union of source graph, target graph and proposed bridge edges.

    Host-side mirror of reference `merge_graphs` (main_bridged_graph.py:163-193):
    target node ids are offset by N_src; cross edges are directed src→tar;
    the merged graph gets train/val/test/central masks (all labeled source
    nodes → train, central=source) and is coalesced.
    """
    n_src = src["x"].shape[0]
    n_tar = tar["x"].shape[0]
    n = n_src + n_tar
    x = np.concatenate([src["x"], tar["x"]], axis=0)
    y = np.concatenate([src["y"], tar["y"]], axis=0)

    parts = [src["edge_index"], tar["edge_index"] + n_src]
    cross = edge_index_cross.copy()
    cross[1, :] += n_src
    parts.append(cross)
    if edge_index_within_src is not None:
        parts.append(edge_index_within_src)
    if edge_index_within_tar is not None:
        parts.append(edge_index_within_tar + n_src)
    edge_index = np.concatenate(parts, axis=1)

    central_mask = np.zeros(n, dtype=bool)
    central_mask[:n_src] = True
    train_mask = np.zeros(n, dtype=bool)
    val_mask = np.zeros(n, dtype=bool)
    test_mask = np.zeros(n, dtype=bool)
    train_mask[:n_src] = True
    train_mask[: n_src][src["y"] == -1] = False
    train_mask[n_src:][tar["train_mask"]] = True
    val_mask[n_src:][tar["val_mask"]] = True
    test_mask[n_src:][tar["test_mask"]] = True

    edge_index = coalesce_np(edge_index, n)
    return dict(
        x=x, y=y, edge_index=edge_index, train_mask=train_mask,
        val_mask=val_mask, test_mask=test_mask, central_mask=central_mask,
    )


def reorder_np(
    merged: Dict[str, np.ndarray],
    n_src: int,
    mapper_idx_src: Dict[int, int],
    mapper_idx_tar: Dict[int, int],
) -> Dict[str, np.ndarray]:
    """Permute the merged graph back to the original VS-graph node order.

    Mirror of reference `reorder` (main_bridged_graph.py:195-222): the
    mappers are original-id → per-domain-id dicts produced by the domain
    split; target ids are offset by N_src in the merged order.
    """
    n = merged["x"].shape[0]
    # merged-order index for each original id
    perm = np.empty(n, dtype=np.int64)          # original id -> merged id
    for orig, new in mapper_idx_src.items():
        perm[orig] = new
    for orig, new in mapper_idx_tar.items():
        perm[orig] = new + n_src
    inv = np.empty(n, dtype=np.int64)           # merged id -> original id
    inv[perm] = np.arange(n)

    out = {}
    for key in ("x", "y", "train_mask", "val_mask", "test_mask", "central_mask"):
        out[key] = merged[key][perm]
    out["edge_index"] = inv[merged["edge_index"]]
    return out


def domain_split_np(
    data: Dict[str, np.ndarray],
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray], Dict[int, int], Dict[int, int]]:
    """Split a merged VS-graph into per-domain graphs with contiguous ids.

    Mirror of reference `dataset_conversion` core (utils.py:41-79): edges that
    cross the domain boundary are dropped; node ids are remapped contiguously
    per domain; mappers are original-id → new-id dicts.
    """
    central = data["central_mask"].astype(bool)
    idxs_src = np.where(central)[0]
    idxs_tar = np.where(~central)[0]
    mapper_src = {int(o): i for i, o in enumerate(idxs_src)}
    mapper_tar = {int(o): i for i, o in enumerate(idxs_tar)}

    ei = data["edge_index"]
    lut = np.full(len(central), -1, dtype=np.int64)
    lut[idxs_src] = np.arange(len(idxs_src))
    lut_t = np.full(len(central), -1, dtype=np.int64)
    lut_t[idxs_tar] = np.arange(len(idxs_tar))

    m_src = central[ei[0]] & central[ei[1]]
    m_tar = (~central[ei[0]]) & (~central[ei[1]])
    ei_src = lut[ei[:, m_src]]
    ei_tar = lut_t[ei[:, m_tar]]

    def sub(idxs, ei_new):
        return dict(
            x=data["x"][idxs],
            y=data["y"][idxs],
            edge_index=ei_new,
            train_mask=np.zeros(len(idxs), dtype=bool),
            val_mask=np.zeros(len(idxs), dtype=bool),
            test_mask=np.zeros(len(idxs), dtype=bool),
        )

    return sub(idxs_src, ei_src), sub(idxs_tar, ei_tar), mapper_src, mapper_tar


def graph_from_dict(data: Dict[str, np.ndarray], **kwargs) -> Graph:
    return build_graph(
        data["x"],
        data["edge_index"],
        y=data.get("y"),
        train_mask=data.get("train_mask"),
        val_mask=data.get("val_mask"),
        test_mask=data.get("test_mask"),
        central_mask=data.get("central_mask"),
        **kwargs,
    )
