"""Row-partitioned KT-GNN training with boundary (halo) feature exchange.

This is SURVEY §2c-1 / §5.8 as written: the bridged graph's nodes are
split into contiguous row blocks, one per device; destination-sorted edges
make each device's incoming edge set a contiguous range, so every
destination-keyed reduction (attention softmax, aggregation) is fully
local. The only node-array collective per conv layer is an **all_to_all
that carries exactly the boundary sender features each device needs**
(host-precomputed per-pair index plans) — wire bytes scale with the edge
cut, not with N·D·layers like the edge-shard layout's full psums
(parallel/edgeshard.py). Global statistics (domain-difference means, BN,
loss) ride [D]-sized psums.

The flax model code is reused unmodified (nn/ktgnn.py `halo=` hook);
parameters transfer 1:1 between the single-device, edge-shard, and
row-partition layouts.

Wire-byte accounting per layer of width D (fp32), n devices:
  edge shard:  psum [N_pad, D] partials for softmax max + denom + aggregate
               ≈ 3 · 2(n-1)/n · N_pad · D · 4 bytes          (per device)
  halo (this): all_to_all ≈ (n-1)/n · H · D · 4 bytes + 3 psums of D
               where H = Σ halo rows ≤ N_pad (graph-cut dependent)
`wire_bytes_per_layer` computes both for a built partition.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from bridged_gnn_tpu.graph import Graph, round_up
from bridged_gnn_tpu.train.optim import torch_adam


class HaloPartition(NamedTuple):
    """Host-built row partition + halo exchange plan (static per graph)."""

    # per-shard edge arrays, flattened [n_dev * e_shard]
    senders_local: np.ndarray    # int32, ids into x_ext = [own ‖ halo]
    receivers_local: np.ndarray  # int32 in [0, rows)
    edge_mask: np.ndarray        # bool
    # halo send plan, flattened [n_dev(src) * n_dev(dst) * h_pair]
    send_idx: np.ndarray         # int32 local row ids on the SENDING device
    send_mask: np.ndarray        # bool
    # per-shard extended masks, flattened [n_dev * (rows + n_dev*h_pair)]
    central_ext: np.ndarray      # bool
    node_mask_ext: np.ndarray    # bool
    # per-shard blocked-reduce metadata (VERDICT r1 item 4: the sharded
    # path must not regress to the scatter lowering): receivers_local is
    # dst-sorted within each shard, so each shard gets its own contiguous
    # block offsets; max_edges/num_blocks are the static max over shards
    block_start: np.ndarray      # int32, flattened [n_dev * num_blocks]
    block_node_block: int
    block_max_edges: int
    block_num_blocks: int
    # per-shard node arrays are g node arrays padded to n_dev*rows
    rows: int
    e_shard: int
    h_pair: int
    num_shards: int
    num_nodes_padded_total: int  # n_dev * rows
    halo_rows_real: int          # Σ real halo entries (wire accounting)
    # per-shard padded slot layouts (uniform static dims across shards)
    # for the fused attention conv; dict of [n_dev, ...] int arrays
    pl: dict
    pd_tile: int                 # dst layout tile_e
    pd_blocks: int               # dst layout num_blocks (rows/node_block)
    ps_tile: int                 # src layout tile_e
    ps_blocks: int               # src layout num_blocks (ext_len/node_block)
    ext_len: int                 # rows + n_dev*h_pair
    # comm/compute-overlap split (built with overlap=True): per-shard
    # edges split into local-sender and halo-sender slot layouts so the
    # local attention pipeline has no data dependence on the boundary
    # all_to_all (SURVEY §2c-1 halo-overlap; ops/fused_attention.
    # adapted_attention_overlap). None when not built.
    pl2: dict | None = None
    t_ld: int = 0                # local-set dst tile_e
    t_ls: int = 0                # local-set src tile_e
    b_ls: int = 0                # local-set src num_blocks (rows space)
    t_hd: int = 0                # halo-set dst tile_e
    t_hs: int = 0                # halo-set src tile_e
    b_hs: int = 0                # halo-set src num_blocks (halo space)
    halo_len: int = 0            # n_dev * h_pair (halo buffer rows)


def _split_slot_layouts(out_s, out_r, out_m, rows, halo_len, node_block,
                        n_shards):
    """Per-shard local-sender vs halo-sender slot layouts with uniform
    static dims across shards, for the overlap attention path.

    ``out_s`` holds x_ext-local sender ids (< rows ⇒ own row, else halo
    slot ``id − rows``); ``out_r`` is dst-sorted per shard, so each
    subset selection stays dst-sorted. Only valid edges enter the
    layouts (padding slots are re-added per block by the layout builder).
    """
    from bridged_gnn_tpu.ops.blocked_segment import _padded_layout_np

    def one_pass(mins):
        t = {k: 0 for k in ("ld", "ls", "hd", "hs")}
        per_shard = []
        for q in range(n_shards):
            m_q = out_m[q]
            is_local = out_s[q] < rows
            entry = {}
            for key, sel, src, src_space in (
                ("l", m_q & is_local, out_s[q], rows),
                ("h", m_q & ~is_local, out_s[q] - rows, halo_len),
            ):
                idx = np.nonzero(sel)[0]
                r_sub = out_r[q][idx]
                s_sub = src[idx].astype(np.int32)
                eid = np.arange(len(idx))
                valid = np.ones(len(idx), bool)
                d = _padded_layout_np(
                    r_sub, s_sub, eid, valid, rows, node_block,
                    min_tile_e=mins[key + "d"],
                )
                perm = np.argsort(s_sub, kind="stable")
                sr = _padded_layout_np(
                    s_sub[perm], r_sub[perm], eid[perm], valid[perm],
                    src_space, node_block, min_tile_e=mins[key + "s"],
                )
                pos_dst = np.zeros(max(len(idx), 1), dtype=np.int32)
                d_edge = d[2].reshape(-1)
                d_mask = d[3].reshape(-1)
                pos_dst[d_edge[d_mask]] = np.nonzero(d_mask)[0].astype(
                    np.int32
                )
                entry[key] = (d, sr, pos_dst[sr[2].reshape(-1)])
                t[key + "d"] = max(t[key + "d"], d[4])
                t[key + "s"] = max(t[key + "s"], sr[4])
            per_shard.append(entry)
        return per_shard, t

    zero = {"ld": 0, "ls": 0, "hd": 0, "hs": 0}
    _, tiles = one_pass(zero)
    per_shard, tiles = one_pass(tiles)

    def stack(key, part, comp):
        return np.stack(
            [e[key][part][comp].reshape(-1) for e in per_shard]
        ).reshape(-1)

    pl2 = {}
    for key, dst_name, src_name in (("l", "ld", "ls"), ("h", "hd", "hs")):
        for comp, name in ((0, "other"), (1, "rel"), (2, "edge"),
                           (3, "mask")):
            pl2[f"{dst_name}_{name}"] = stack(key, 0, comp)
            pl2[f"{src_name}_{name}"] = stack(key, 1, comp)
        pl2[f"{src_name}_from_dst"] = np.stack(
            [e[key][2] for e in per_shard]
        ).reshape(-1)
    b_ls = per_shard[0]["l"][1][5]
    b_hs = per_shard[0]["h"][1][5]
    return pl2, tiles, b_ls, b_hs


def build_halo_partition(
    g: Graph, n_shards: int, overlap: bool = False,
    node_block: int = None,
) -> HaloPartition:
    """Build the row partition + per-pair halo plans (host, once/graph).

    ``overlap=True`` additionally builds the local/halo split slot
    layouts consumed by the comm/compute-overlap attention path.

    ``node_block`` overrides the slot-layout block size (default 128).
    On the XLA-CPU simulation mesh the materialized one-hot tensors of
    every blocked reduce scale ∝ node_block per edge slot — the
    dominant per-shard temp-arena term (measured 16.4 GiB/shard at 600k
    nodes, tools notes r5) — so capacity simulations pass 32/64 to fit
    n_shards arenas in one host's RAM; on real TPU the default stays
    (VMEM/MXU-tuned, the one-hots are fused and never materialized)."""
    n_pad = g.num_nodes_padded
    rows = round_up(-(-n_pad // n_shards), 8)
    n_total = rows * n_shards
    s = np.asarray(g.senders).astype(np.int64)
    r = np.asarray(g.receivers).astype(np.int64)
    em = np.asarray(g.edge_mask)
    central = np.zeros(n_total, dtype=bool)
    central[:n_pad] = np.asarray(g.central_mask)
    valid = np.zeros(n_total, dtype=bool)
    valid[:n_pad] = np.asarray(g.node_mask)

    shard_of = lambda node: node // rows  # noqa: E731

    # bucket edges by destination shard
    dst_shard = shard_of(r)
    e_counts = np.bincount(dst_shard[em], minlength=n_shards)
    e_shard = round_up(max(int(e_counts.max()), 1), 128)

    # per (q, p): rows owned by p that q's edges reference (p != q)
    halo_sets = [[None] * n_shards for _ in range(n_shards)]
    h_pair = 8
    for q in range(n_shards):
        sel = em & (dst_shard == q)
        sq = s[sel]
        ext = sq[shard_of(sq) != q]
        for p in range(n_shards):
            rows_p = np.unique(ext[shard_of(ext) == p])
            halo_sets[q][p] = rows_p
            h_pair = max(h_pair, len(rows_p))
    h_pair = round_up(h_pair, 8)

    ext_len = rows + n_shards * h_pair
    out_s = np.zeros((n_shards, e_shard), dtype=np.int32)
    out_r = np.full((n_shards, e_shard), rows - 1, dtype=np.int32)
    out_m = np.zeros((n_shards, e_shard), dtype=bool)
    send_idx = np.zeros((n_shards, n_shards, h_pair), dtype=np.int32)
    send_mask = np.zeros((n_shards, n_shards, h_pair), dtype=bool)
    central_ext = np.zeros((n_shards, ext_len), dtype=bool)
    nodemask_ext = np.zeros((n_shards, ext_len), dtype=bool)
    halo_real = 0

    for q in range(n_shards):
        # local-id lookup for x_ext rows: own rows then halo slots
        lut = np.full(n_total, -1, dtype=np.int64)
        own = np.arange(q * rows, (q + 1) * rows)
        lut[own] = np.arange(rows)
        central_ext[q, :rows] = central[own]
        nodemask_ext[q, :rows] = valid[own]
        for p in range(n_shards):
            hs = halo_sets[q][p]
            base = rows + p * h_pair
            lut[hs] = base + np.arange(len(hs))
            central_ext[q, base:base + len(hs)] = central[hs]
            nodemask_ext[q, base:base + len(hs)] = valid[hs]
            # device p sends these rows (p-local ids) to device q
            send_idx[p, q, : len(hs)] = (hs - p * rows).astype(np.int32)
            send_mask[p, q, : len(hs)] = True
            if p != q:
                halo_real += len(hs)
        sel = em & (dst_shard == q)
        k = int(sel.sum())
        out_s[q, :k] = lut[s[sel]].astype(np.int32)
        out_r[q, :k] = (r[sel] - q * rows).astype(np.int32)
        out_m[q, :k] = True
        assert (out_s[q, :k] >= 0).all()

    # per-shard blocked-reduce offsets (receivers_local sorted per shard;
    # padded edges carry receiver rows-1 and land in the last block —
    # masked to zero before any blocked reduce, they only pad its bound)
    from bridged_gnn_tpu.ops.blocked_segment import build_block_meta

    if node_block is None:
        node_block = 128 if rows >= 128 else max(8, rows)
    node_block = min(node_block, rows)
    metas = [build_block_meta(out_r[q], rows, node_block)
             for q in range(n_shards)]
    block_max_edges = max(m.max_edges for m in metas)
    block_num_blocks = metas[0].num_blocks
    block_start = np.stack([m.block_start for m in metas])

    # per-shard padded slot layouts (dst- and src-keyed) with uniform
    # static dims across shards, for the fused attention conv
    # (ops/fused_attention.py) inside the partition: the per-shard edge
    # set is dst-local, so the whole fused layer needs no collectives
    from bridged_gnn_tpu.ops.blocked_segment import _padded_layout_np

    eid = np.arange(e_shard)

    def shard_layouts(min_td, min_ts):
        d_raw, s_raw, s2d = [], [], []
        for q in range(n_shards):
            d = _padded_layout_np(
                out_r[q], out_s[q], eid, out_m[q], rows, node_block,
                min_tile_e=min_td,
            )
            perm = np.argsort(out_s[q], kind="stable")
            sr = _padded_layout_np(
                out_s[q][perm], out_r[q][perm], eid[perm], out_m[q][perm],
                ext_len, node_block, min_tile_e=min_ts,
            )
            pos_dst = np.zeros(e_shard, dtype=np.int32)
            d_edge, d_mask = d[2].reshape(-1), d[3].reshape(-1)
            pos_dst[d_edge[d_mask]] = np.nonzero(d_mask)[0].astype(np.int32)
            s2d.append(pos_dst[sr[2].reshape(-1)])
            d_raw.append(d)
            s_raw.append(sr)
        return d_raw, s_raw, s2d

    d_raw, s_raw, _ = shard_layouts(0, 0)
    pd_tile = max(a[4] for a in d_raw)
    ps_tile = max(a[4] for a in s_raw)
    d_raw, s_raw, s2d = shard_layouts(pd_tile, ps_tile)
    pl = dict(
        pd_other=np.stack([a[0].reshape(-1) for a in d_raw]),
        pd_rel=np.stack([a[1].reshape(-1) for a in d_raw]),
        pd_edge=np.stack([a[2].reshape(-1) for a in d_raw]),
        pd_mask=np.stack([a[3].reshape(-1) for a in d_raw]),
        ps_other=np.stack([a[0].reshape(-1) for a in s_raw]),
        ps_rel=np.stack([a[1].reshape(-1) for a in s_raw]),
        ps_edge=np.stack([a[2].reshape(-1) for a in s_raw]),
        ps_mask=np.stack([a[3].reshape(-1) for a in s_raw]),
        ps_from_dst=np.stack(s2d),
    )
    # flattened for leading-dim sharding (shard_map slices [n_dev*X] → [X])
    pl = {k: v.reshape(-1) for k, v in pl.items()}
    pd_blocks = d_raw[0][5]
    ps_blocks = s_raw[0][5]

    ov = dict(pl2=None, t_ld=0, t_ls=0, b_ls=0, t_hd=0, t_hs=0, b_hs=0,
              halo_len=n_shards * h_pair)
    if overlap:
        pl2, tiles, b_ls, b_hs = _split_slot_layouts(
            out_s, out_r, out_m, rows, n_shards * h_pair, node_block,
            n_shards,
        )
        ov.update(pl2=pl2, t_ld=tiles["ld"], t_ls=tiles["ls"], b_ls=b_ls,
                  t_hd=tiles["hd"], t_hs=tiles["hs"], b_hs=b_hs)

    return HaloPartition(
        **ov,
        senders_local=out_s.reshape(-1),
        receivers_local=out_r.reshape(-1),
        edge_mask=out_m.reshape(-1),
        block_start=block_start.reshape(-1),
        block_node_block=node_block,
        block_max_edges=block_max_edges,
        block_num_blocks=block_num_blocks,
        send_idx=send_idx.reshape(-1),
        send_mask=send_mask.reshape(-1),
        central_ext=central_ext.reshape(-1),
        node_mask_ext=nodemask_ext.reshape(-1),
        rows=rows,
        e_shard=e_shard,
        h_pair=h_pair,
        num_shards=n_shards,
        num_nodes_padded_total=n_total,
        halo_rows_real=halo_real,
        pl=pl,
        pd_tile=pd_tile,
        pd_blocks=pd_blocks,
        ps_tile=ps_tile,
        ps_blocks=ps_blocks,
        ext_len=ext_len,
    )


def wire_bytes_per_layer(
    part: HaloPartition, d: int, dtype_bytes: int = 4
) -> dict:
    """Per-device wire bytes for one AdaptedConv layer, halo vs edge-shard
    (see module docstring for the formulas)."""
    n = part.num_shards
    n_pad = part.num_nodes_padded_total
    halo = (part.halo_rows_real / max(n, 1)) * d * dtype_bytes \
        + 3 * d * dtype_bytes * 2 * (n - 1) / max(n, 1)
    edgeshard = 3 * (2 * (n - 1) / n) * n_pad * d * dtype_bytes
    return dict(
        halo_bytes=int(halo),
        edgeshard_bytes=int(edgeshard),
        ratio=float(edgeshard / max(halo, 1)),
        halo_rows=part.halo_rows_real,
    )


class HaloView(NamedTuple):
    """Device-local view passed into the model's ``halo=`` hook."""

    senders_local: jax.Array
    receivers_local: jax.Array
    edge_mask: jax.Array
    send_idx: jax.Array
    send_mask: jax.Array
    central_ext: jax.Array
    node_mask_ext: jax.Array
    block_start: jax.Array   # [num_blocks] this shard's blocked offsets
    rows: int
    h_pair: int
    num_shards: int
    axis: str
    block_node_block: int = 0
    block_max_edges: int = 0
    block_num_blocks: int = 0
    # this shard's padded slot layouts (device slices of HaloPartition.pl)
    pl: dict = None
    pd_tile: int = 0
    pd_blocks: int = 0
    ps_tile: int = 0
    ps_blocks: int = 0
    ext_len: int = 0
    # overlap split layouts (device slices of HaloPartition.pl2), None
    # when the partition was built without overlap=True
    pl2: dict = None
    t_ld: int = 0
    t_ls: int = 0
    b_ls: int = 0
    t_hd: int = 0
    t_hs: int = 0
    b_hs: int = 0
    halo_len: int = 0

    def fused_ops(self):
        """Local BlockedOps-alike (gather_slots + lay_dst) over this
        shard's padded layouts — feeds ops/fused_attention.py; every
        reduction is shard-local (destinations are owned rows)."""
        from bridged_gnn_tpu.ops.blocked_segment import (
            PaddedLayout,
            make_slot_gather,
        )

        nb = self.block_node_block
        lay_dst = PaddedLayout(
            other_slot=self.pl["pd_other"],
            rel_key=self.pl["pd_rel"].reshape(self.pd_blocks, self.pd_tile),
            slot_edge=self.pl["pd_edge"],
            slot_mask=self.pl["pd_mask"].astype(bool),
            node_block=nb, tile_e=self.pd_tile,
            num_blocks=self.pd_blocks, num_nodes_padded=self.rows,
        )
        lay_src = PaddedLayout(
            other_slot=self.pl["ps_other"],
            rel_key=self.pl["ps_rel"].reshape(self.ps_blocks, self.ps_tile),
            slot_edge=self.pl["ps_edge"],
            slot_mask=self.pl["ps_mask"].astype(bool),
            node_block=nb, tile_e=self.ps_tile,
            num_blocks=self.ps_blocks, num_nodes_padded=self.ext_len,
        )
        gather = make_slot_gather(lay_dst, lay_src, self.pl["ps_from_dst"])

        class _LocalOps:
            gather_slots = staticmethod(gather)

        _LocalOps.lay_dst = lay_dst
        _LocalOps.lay_src = lay_src
        _LocalOps.src_from_dst = self.pl["ps_from_dst"]
        return _LocalOps

    def fused_ops_split(self):
        """(ops_local, ops_halo) over the split slot layouts for the
        comm/compute-overlap attention path
        (ops/fused_attention.py::adapted_attention_overlap): ops_local
        gathers senders from this shard's OWN rows ([rows] space, no
        dependence on the boundary all_to_all), ops_halo from the halo
        receive buffer ([halo_len] space). Both keep destinations in the
        owned-row space so their streaming-softmax partials combine
        per destination."""
        from bridged_gnn_tpu.ops.blocked_segment import (
            PaddedLayout,
            make_slot_gather,
        )

        nb = self.block_node_block
        b_d = self.pd_blocks  # dst blocks = rows/nb for both subsets

        def mk(p_d, t_d, p_s, t_s, b_s, src_space):
            lay_dst = PaddedLayout(
                other_slot=self.pl2[f"{p_d}_other"],
                rel_key=self.pl2[f"{p_d}_rel"].reshape(b_d, t_d),
                slot_edge=self.pl2[f"{p_d}_edge"],
                slot_mask=self.pl2[f"{p_d}_mask"].astype(bool),
                node_block=nb, tile_e=t_d, num_blocks=b_d,
                num_nodes_padded=self.rows,
            )
            lay_src = PaddedLayout(
                other_slot=self.pl2[f"{p_s}_other"],
                rel_key=self.pl2[f"{p_s}_rel"].reshape(b_s, t_s),
                slot_edge=self.pl2[f"{p_s}_edge"],
                slot_mask=self.pl2[f"{p_s}_mask"].astype(bool),
                node_block=nb, tile_e=t_s, num_blocks=b_s,
                num_nodes_padded=src_space,
            )
            gather = make_slot_gather(
                lay_dst, lay_src, self.pl2[f"{p_s}_from_dst"]
            )

            class _Ops:
                gather_slots = staticmethod(gather)

            _Ops.lay_dst = lay_dst
            _Ops.lay_src = lay_src
            _Ops.src_from_dst = self.pl2[f"{p_s}_from_dst"]
            return _Ops

        ops_l = mk("ld", self.t_ld, "ls", self.t_ls, self.b_ls, self.rows)
        ops_h = mk("hd", self.t_hd, "hs", self.t_hs, self.b_hs,
                   self.halo_len)
        return ops_l, ops_h

    def segment_sum_local(self, msg: jax.Array) -> jax.Array:
        """[E_loc, D] → [rows, D] dst reduce, scatter-free (blocked)."""
        from bridged_gnn_tpu.ops.blocked_segment import segment_sum_blocked

        msg = jnp.where(self.edge_mask[:, None], msg, 0)
        return segment_sum_blocked(
            msg, self.receivers_local, self.block_start, self.rows,
            self.block_node_block, self.block_max_edges,
            self.block_num_blocks,
        )

    def segment_softmax_local(self, logits: jax.Array) -> jax.Array:
        """[E_loc] → [E_loc] dst-keyed softmax, scatter-free (blocked)."""
        from bridged_gnn_tpu.ops.blocked_segment import (
            segment_softmax_blocked,
        )

        return segment_softmax_blocked(
            logits, self.receivers_local, self.edge_mask,
            self.block_start, self.rows, self.block_node_block,
            self.block_max_edges, self.block_num_blocks,
        )

    def exchange_recv(self, x_local: jax.Array) -> jax.Array:
        """The halo receive buffer alone [H, D]: gather the rows each peer
        needs, one tiled all_to_all. Used by the overlap path so the
        local attention pipeline has no data dependence on the collective
        (wire bytes identical to :meth:`exchange` — the split changes the
        schedule, not the traffic). Linear → autodiff transposes it to
        the reverse scatter-add exchange for gradients."""
        send = jnp.where(
            self.send_mask[:, None], x_local[self.send_idx], 0
        )
        return jax.lax.all_to_all(
            send.reshape(self.num_shards * self.h_pair, -1),
            self.axis, split_axis=0, concat_axis=0, tiled=True,
        )

    def exchange(self, x_local: jax.Array) -> jax.Array:
        """x_ext = [own rows ‖ halo rows]: one tiled all_to_all +
        concatenate (see :meth:`exchange_recv`)."""
        return jnp.concatenate(
            [x_local, self.exchange_recv(x_local)], axis=0
        )


def _shard_node(a: np.ndarray, part: HaloPartition, fill=0):
    """Pad a node-indexed array to n_dev*rows (concat-able into shards)."""
    n_total = part.num_nodes_padded_total
    pad = n_total - a.shape[0]
    if pad == 0:
        return a
    fill_arr = np.full((pad,) + a.shape[1:], fill, dtype=a.dtype)
    return np.concatenate([a, fill_arr], axis=0)


def make_halo_ktgnn_train_step(
    mesh: Mesh,
    model,
    g: Graph,
    cfg,
    axis: str | None = None,
    overlap: bool = False,
) -> tuple[Callable, HaloPartition]:
    """Jitted KT-GNN train step on the halo row partition.

    Node arrays (features, labels, masks) and all activations live sharded
    by row block; parameters and optimizer state are replicated and receive
    identical (psum'd) gradients on every device. Returns
    ``(train_step, partition)`` where
    ``train_step(params, batch_stats, opt_state, rng) → (params, bs,
    opt_state, loss)``.

    ``overlap=True`` builds the split local/halo slot layouts and the
    model's conv layers run the comm/compute-overlap attention path
    (ops/fused_attention.py::adapted_attention_overlap): per layer, the
    local-sender pipeline is scheduled while the boundary all_to_all is
    in flight. Numerically equal up to fp reduction order (not
    bit-identical) to the default path.
    """
    from bridged_gnn_tpu.train.stage2 import kl_batchmean, masked_nll

    if axis is None:
        axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    part = build_halo_partition(g, n_dev, overlap=overlap)
    tx = torch_adam(cfg.lr, weight_decay=cfg.weight_decay)

    x_sh = _shard_node(np.asarray(g.x), part)
    y_sh = _shard_node(np.asarray(g.y), part, fill=-1)
    nm_sh = _shard_node(np.asarray(g.node_mask), part, fill=False)
    cm_sh = _shard_node(np.asarray(g.central_mask), part, fill=False)
    tm_sh = _shard_node(np.asarray(g.train_mask), part, fill=False)
    tt_sh = tm_sh & ~cm_sh

    def device_loss(params, batch_stats, dropout_rng,
                    sl, rl, em, sidx, smask, ce, nme, bstart, pl, pl2,
                    x, y, nm, cm, tm, tt):
        halo = HaloView(
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
        gl = g.replace(
            x=x, y=y, node_mask=nm, central_mask=cm, train_mask=tm,
        )
        # per-shard-independent dropout streams
        drop = jax.random.fold_in(dropout_rng, jax.lax.axis_index(axis))
        outs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            gl, None, True, halo=halo,
            rngs={"dropout": drop},
            mutable=["batch_stats"],
        )
        lp_s, lp_t, lp_that, _ = outs
        loss_s = masked_nll(lp_s, y, tm, axis_name=axis)
        loss_t1 = masked_nll(lp_t, y, tt, axis_name=axis)
        loss_t2 = masked_nll(lp_that, y, tt, axis_name=axis)
        loss_kl = kl_batchmean(lp_that, lp_t, nm, axis_name=axis)
        loss = (2.0 * loss_s + loss_t1 + loss_t2) / 4.0 \
            + cfg.Lambda * loss_kl
        return loss, mutated["batch_stats"]

    def step(params, batch_stats, opt_state, dropout_rng,
             sl, rl, em, sidx, smask, ce, nme, bstart, pl, pl2,
             x, y, nm, cm, tm, tt):
        (loss, new_bs), grads = jax.value_and_grad(
            device_loss, has_aux=True
        )(params, batch_stats, dropout_rng, sl, rl, em, sidx, smask,
          ce, nme, bstart, pl, pl2, x, y, nm, cm, tm, tt)
        # loss/stats are already psum'd inside device_loss, so grads of the
        # replicated params come out identical across shards — but each
        # shard only saw its own rows' contributions via the local segment
        # ops; those flowed through psums/all_to_alls whose transposes
        # redistribute them, making grads replicated-exact.
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss

    rowp, rep = P(axis), P()
    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(rep, rep, rep, rep,
                  rowp, rowp, rowp, rowp, rowp, rowp, rowp, rowp, rowp,
                  rowp, rowp, rowp, rowp, rowp, rowp, rowp),
        out_specs=(rep, rep, rep, rep),
        # check_vma stays ON (as in edgeshard): replicated-param gradients
        # need shard_map's automatic psum-of-cotangents transpose
    )

    sl = jnp.asarray(part.senders_local)
    rl = jnp.asarray(part.receivers_local)
    em = jnp.asarray(part.edge_mask)
    sidx = jnp.asarray(part.send_idx)
    smask = jnp.asarray(part.send_mask)
    ce = jnp.asarray(part.central_ext)
    nme = jnp.asarray(part.node_mask_ext)
    bstart = jnp.asarray(part.block_start)
    pl_j = {k: jnp.asarray(v) for k, v in part.pl.items()}
    pl2_j = ({k: jnp.asarray(v) for k, v in part.pl2.items()}
             if part.pl2 is not None else {})
    arrays = tuple(jnp.asarray(a) for a in
                   (x_sh, y_sh, nm_sh, cm_sh, tm_sh, tt_sh))

    @jax.jit
    def train_step(params, batch_stats, opt_state, dropout_rng):
        return sharded(
            params, batch_stats, opt_state, dropout_rng,
            sl, rl, em, sidx, smask, ce, nme, bstart, pl_j, pl2_j,
            *arrays,
        )

    return train_step, part
