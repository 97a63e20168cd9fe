"""Prototype: cell-transpose SpMM — breaking the gather-engine ceiling.

The padded-tile SpMM (ops/blocked_segment.py) is bound by the v5e gather
engine: one gathered row per edge, ~474 Mrows/s regardless of row width
(DESIGN.md §2), i.e. ~4.4 ms for 2M edges — 443 Medges/s sustained.

This formulation replaces the per-edge random gather with:

  1. EXPAND (MXU): edges grouped by (src_block, dst_block) into cells of
     8 slots; within each src block the expand `slot = x[src]` is a
     one-hot matmul [Et_s, nb] @ x_blk[nb, D] — flops = slots*nb*D,
     ~1 ms at bench scale, no gather engine.
  2. TRANSPOSE (gather engine, 8x fewer issues): the (src,dst) cell grid
     is permuted to dst-major order by gathering CELLS (8 rows = 2 KB)
     instead of rows — ~E/8*pad issues ≈ 0.7 ms.
  3. REDUCE (MXU): the existing padded one-hot dst reduce over the
     dst-major slots.

Poisson cell padding at bench scale (2M edges / 512x512 blocks of 256,
k~Poisson(7.6), cells per pair = ceil(k/8)) costs ~37% extra slots; the
gather engine issue count drops 8x/1.37 ≈ 5.8x.

Usage: python tools/bench_spmm_cells.py [out.json]
"""
import functools
import json
import sys
import time

import numpy as np

repo = __file__.rsplit("/", 2)[0]
sys.path.insert(0, repo)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bridged_gnn_tpu.ops import blocked_segment as bs  # noqa: E402

N, E, D = 131_072, 2_097_152, 128
NB = 256
CELL = 8


def build_cell_layout(s, r, n_pad, nb=NB, cell=CELL):
    """Host-side (src_blk, dst_blk)-cell layout. Returns numpy arrays."""
    s = np.asarray(s, np.int64)
    r = np.asarray(r, np.int64)
    e = len(s)
    b_src = -(-n_pad // nb)
    b_dst = -(-n_pad // nb)
    sp, dp = s // nb, r // nb
    # order edges by (src_blk, dst_blk); within a pair any order works
    order = np.lexsort((dp, sp))
    s_o, r_o, sp_o, dp_o = s[order], r[order], sp[order], dp[order]
    eid_o = np.arange(e)[order]

    # run-length encode (src_blk, dst_blk) pairs
    pair_key = sp_o * b_dst + dp_o
    boundaries = np.flatnonzero(np.diff(pair_key)) + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [e]])
    counts = ends - starts
    ncells = -(-counts // cell)          # cells per (p,b) pair
    pair_sp = sp_o[starts]
    pair_dp = dp_o[starts]

    # slot budget per src block (cells are stored src-block-major)
    cells_per_src = np.bincount(pair_sp, weights=ncells, minlength=b_src)
    cells_per_src = cells_per_src.astype(np.int64)
    c_s = int(cells_per_src.max())
    et_s = c_s * cell
    # slot budget per dst block
    cells_per_dst = np.bincount(pair_dp, weights=ncells, minlength=b_dst)
    cells_per_dst = cells_per_dst.astype(np.int64)
    c_d = int(cells_per_dst.max())
    et_d = c_d * cell

    src_rel = np.full((b_src, et_s), nb, np.int32)   # nb => expand to 0
    dst_rel = np.full((b_dst, et_d), nb, np.int32)   # nb => no reduce hit
    dst_edge = np.zeros((b_dst, et_d), np.int32)
    dst_mask = np.zeros((b_dst, et_d), bool)
    cell_perm = np.zeros((b_dst, c_d), np.int64)     # into src cell view

    src_cell_cursor = np.zeros(b_src, np.int64)
    dst_cell_cursor = np.zeros(b_dst, np.int64)
    for i in range(len(starts)):
        p, b = int(pair_sp[i]), int(pair_dp[i])
        k = int(counts[i])
        nc = int(ncells[i])
        sl = slice(starts[i], ends[i])
        sc0 = src_cell_cursor[p]
        dc0 = dst_cell_cursor[b]
        # src side: slots [sc0*cell, sc0*cell+k) in block p
        a = sc0 * cell
        src_rel[p, a:a + k] = (s_o[sl] - p * nb).astype(np.int32)
        # dst side: same cells land at dst cursor
        a2 = dc0 * cell
        dst_rel[b, a2:a2 + k] = (r_o[sl] - b * nb).astype(np.int32)
        dst_edge[b, a2:a2 + k] = eid_o[sl].astype(np.int32)
        dst_mask[b, a2:a2 + k] = True
        cell_perm[b, dc0:dc0 + nc] = p * c_s + sc0 + np.arange(nc)
        src_cell_cursor[p] += nc
        dst_cell_cursor[b] += nc
    # unreferenced (padding) cells of the dst side point at cell 0 with
    # rel=nb so they reduce to nothing
    return dict(
        src_rel=src_rel, dst_rel=dst_rel, dst_edge=dst_edge,
        dst_mask=dst_mask, cell_perm=cell_perm.reshape(-1),
        b_src=b_src, b_dst=b_dst, et_s=et_s, et_d=et_d,
        nb=nb, cell=cell, n_pad=n_pad,
        pad_frac=float((b_src * et_s) / max(e, 1) - 1.0),
    )


@functools.partial(jax.jit, static_argnames=("nb", "et_s", "et_d", "cell",
                                             "n_pad"))
def spmm_cells(x, src_rel, dst_rel, cell_perm, w_slot,
               nb, et_s, et_d, cell, n_pad):
    b_src = src_rel.shape[0]
    b_dst = dst_rel.shape[0]
    d = x.shape[1]
    n_full = b_src * nb
    xb = jnp.pad(x, ((0, n_full - x.shape[0]), (0, 0))).reshape(
        b_src, nb, d
    )
    # 1. expand: slot = x[src]  (one-hot matmul per src block, MXU)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nb), 2)
    oh = (src_rel[:, :, None] == cols).astype(x.dtype)
    vals = jax.lax.dot_general(
        oh, xb, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)                                  # [b_src, et_s, D]
    # 2. transpose: gather cells (8 rows / 2 KB per issue)
    cells_flat = vals.reshape(b_src * (et_s // cell), cell * d)
    g = cells_flat[cell_perm]                          # [b_dst*c_d, 8D]
    slots = g.reshape(b_dst, et_d, d)
    # 3. reduce: existing padded one-hot dst reduce
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)
    ohr = (rows == dst_rel[:, None, :]).astype(x.dtype)
    if w_slot is not None:
        ohr = ohr * w_slot.reshape(b_dst, 1, et_d).astype(x.dtype)
    out = jax.lax.dot_general(
        ohr, slots, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b_dst * nb, d)[:n_pad]


def timed_chain(step, init, n_lo=2, n_hi=22, reps=3):
    @functools.partial(jax.jit, static_argnums=1)
    def chain(c, n):
        def body(c, _):
            return step(c), None
        c, _ = jax.lax.scan(body, c, None, length=n)
        return jnp.sum(c[:8].astype(jnp.float32))

    float(chain(init, n_lo))
    float(chain(init, n_hi))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); float(chain(init, n_lo))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); float(chain(init, n_hi))
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
    return best


def main():
    out = {"backend": jax.default_backend(), "N": N, "E": E, "D": D}
    print(json.dumps(out), flush=True)
    rng = np.random.default_rng(0)
    s = rng.integers(0, N, size=E).astype(np.int64)
    r = np.sort(rng.integers(0, N, size=E)).astype(np.int64)

    t0 = time.perf_counter()
    cl = build_cell_layout(s, r, N)
    out["cell_build_s"] = round(time.perf_counter() - t0, 2)
    out["pad_frac"] = round(cl["pad_frac"], 4)
    out["et_s"], out["et_d"] = cl["et_s"], cl["et_d"]
    print(json.dumps(out), flush=True)

    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32), jnp.bfloat16)
    src_rel = jnp.asarray(cl["src_rel"])
    dst_rel = jnp.asarray(cl["dst_rel"])
    cell_perm = jnp.asarray(cl["cell_perm"].astype(np.int32))
    w_slot = jnp.asarray(cl["dst_mask"].astype(np.float32))

    f = lambda xx: spmm_cells(  # noqa: E731
        xx, src_rel, dst_rel, cell_perm, None,
        cl["nb"], cl["et_s"], cl["et_d"], cl["cell"], cl["n_pad"],
    )
    got = np.asarray(f(x), np.float32)

    # reference: padded gather-reduce
    lay = bs.build_padded_layout(
        np.sort(r), s[np.argsort(r, kind="stable")], np.arange(E),
        np.ones(E, bool), N, NB,
    )
    want = np.asarray(bs.padded_gather_reduce(lay, x), np.float32)
    err = float(np.abs(got - want).max())
    rel = err / max(float(np.abs(want).max()), 1e-9)
    out["max_abs_err"] = err
    out["max_rel_err"] = rel
    print(json.dumps({"max_abs_err": err, "max_rel": rel}), flush=True)

    # sustained timing, scan-chained like the production bench
    ms_cells = timed_chain(
        lambda xx: f(xx)[:N].astype(jnp.bfloat16), x
    ) * 1e3
    out["cells_ms"] = round(ms_cells, 3)
    out["cells_medges_per_s"] = round(E / ms_cells / 1e3, 1)
    print(json.dumps(out), flush=True)

    ms_pad = timed_chain(
        lambda xx: bs.padded_gather_reduce(lay, xx)[:N].astype(jnp.bfloat16),
        x,
    ) * 1e3
    out["padded_ms"] = round(ms_pad, 3)
    out["padded_medges_per_s"] = round(E / ms_pad / 1e3, 1)
    print(json.dumps(out), flush=True)

    path = sys.argv[1] if len(sys.argv) > 1 else "tools/bench_spmm_cells.json"
    with open(path, "w") as fo:
        json.dump(out, fo, indent=1)


if __name__ == "__main__":
    main()
