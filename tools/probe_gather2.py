"""Probe 2: clean gather/reduce timings to compose the fused SpMM.

[Historical probe — step 4 imports ops/pallas_segment.py, retired in
round 3 (superseded by ops/pallas_padded.py; meta builder extracted to
ops/chunk_meta.py). Kept as the measurement record; no longer runnable
end to end.]

Measures on the 2M-edge bench shapes (N=131072, E=2097152, D=128 bf16):
  1. jit'd pure row gather x[idx] — idx random / block-sorted (512 dst
     blocks, src ascending inside) / fully sorted;
  2. fp32 vs bf16 gather (row-rate vs byte-rate limited?);
  3. take_along_axis gather inside a Pallas kernel (R==K square form —
     probe 1's jnp.take failed with a shape-mismatch, suggesting the
     dynamic_gather lowering wants matching shapes);
  4. compiled Pallas segment-sum (ops/pallas_segment.py) vs the lax.map
     blocked twin on pre-gathered messages.

Run detached; writes tools/probe_gather2.out.
"""
import json
import sys
import time

out = {}


def timeit(f, iters=20):
    import jax
    f()
    f()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    out["platform"] = jax.devices()[0].platform
    N, E, D = 131_072, 2_097_152, 128
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32),
                     dtype=jnp.bfloat16)
    xf = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    send = rng.integers(0, N, size=E).astype(np.int32)
    send_bsort = np.sort(send.reshape(512, -1), axis=1).reshape(-1)
    send_sort = np.sort(send)

    gath = jax.jit(lambda x, i: x[i])
    for name, idx in (("random", send), ("blocksorted", send_bsort),
                      ("sorted", send_sort)):
        j = jnp.asarray(idx)
        dt = timeit(lambda: gath(xb, j), iters=10)
        out[f"gather_bf16_{name}_ms"] = round(dt * 1e3, 2)
        out[f"gather_bf16_{name}_GBps"] = round(E * D * 2 / dt / 1e9, 1)
    dt = timeit(lambda: gath(xf, jnp.asarray(send_bsort)), iters=10)
    out["gather_f32_blocksorted_ms"] = round(dt * 1e3, 2)
    out["gather_f32_blocksorted_GBps"] = round(E * D * 4 / dt / 1e9, 1)

    # --- take_along_axis in Pallas, square form ------------------------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = 512
    xw = xb[:K]
    idx_sq = jnp.asarray(rng.integers(0, K, size=K).astype(np.int32))

    def k_taa(idx_ref, x_ref, o_ref):
        idx2d = jax.lax.broadcasted_iota(jnp.int32, (K, D), 1) * 0 \
            + idx_ref[:][:, None]
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx2d, axis=0)

    try:
        r = pl.pallas_call(
            k_taa,
            out_shape=jax.ShapeDtypeStruct((K, D), xw.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx_sq, xw)
        out["taa_square_ok"] = bool(jnp.array_equal(r, xw[idx_sq]))
    except Exception as e:  # noqa: BLE001
        out["taa_square_ok"] = False
        out["taa_square_err"] = repr(e)[:500]

    # rectangular form: window R=2048, K=512 outputs
    R2 = 2048
    xw2 = xb[:R2]
    idx_r = jnp.asarray(rng.integers(0, R2, size=K).astype(np.int32))

    def k_taa2(idx_ref, x_ref, o_ref):
        idx2d = jnp.broadcast_to(idx_ref[:][:, None], (K, D))
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx2d, axis=0)

    try:
        r = pl.pallas_call(
            k_taa2,
            out_shape=jax.ShapeDtypeStruct((K, D), xw2.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx_r, xw2)
        out["taa_rect_ok"] = bool(jnp.array_equal(r, xw2[idx_r]))
    except Exception as e:  # noqa: BLE001
        out["taa_rect_ok"] = False
        out["taa_rect_err"] = repr(e)[:500]

    # throughput of whichever take_along_axis form works
    form = ("rect" if out.get("taa_rect_ok")
            else "square" if out.get("taa_square_ok") else None)
    if form:
        REPS = 64
        kern = k_taa2 if form == "rect" else k_taa
        xin = xw2 if form == "rect" else xw
        iin = idx_r if form == "rect" else idx_sq

        def k_bench(idx_ref, x_ref, o_ref):
            def body(_, acc):
                idx2d = jnp.broadcast_to(idx_ref[:][:, None], (K, D))
                return acc + jnp.take_along_axis(
                    x_ref[:], idx2d, axis=0).astype(jnp.float32)
            o_ref[:] = jax.lax.fori_loop(
                0, REPS, body, jnp.zeros((K, D), jnp.float32))

        f = jax.jit(lambda i_, x_: pl.pallas_call(
            k_bench,
            out_shape=jax.ShapeDtypeStruct((K, D), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(i_, x_))
        try:
            dt = timeit(lambda: f(iin, xin), iters=20)
            out["taa_gather_Mrows_per_s"] = round(REPS * K / dt / 1e6)
        except Exception as e:  # noqa: BLE001
            out["taa_bench_err"] = repr(e)[:500]

    # --- compiled Pallas segment reduce vs lax.map twin -----------------
    sys.path.insert(0, "/root/repo")
    from bridged_gnn_tpu.ops.pallas_segment import (
        build_chunk_meta, segment_sum_sorted_pallas,
    )
    from bridged_gnn_tpu.ops.blocked_segment import (
        build_block_meta, segment_sum_blocked,
    )

    recv = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    msg = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32),
                      dtype=jnp.bfloat16)
    recv_j = jnp.asarray(recv)

    meta_p = build_chunk_meta(recv, E, N, node_block=512, edge_chunk=2048)
    fp = jax.jit(lambda m: segment_sum_sorted_pallas(
        m, recv_j, jnp.asarray(meta_p.chunk_base),
        jnp.asarray(meta_p.num_chunks), N, meta_p.node_block,
        meta_p.edge_chunk, meta_p.max_chunks, meta_p.num_blocks))
    try:
        r1 = fp(msg)
        dt = timeit(lambda: fp(msg), iters=10)
        out["pallas_segsum_ms"] = round(dt * 1e3, 2)
    except Exception as e:  # noqa: BLE001
        out["pallas_segsum_err"] = repr(e)[:800]
        r1 = None

    meta_b = build_block_meta(recv, N, 512)
    fb = jax.jit(lambda m: segment_sum_blocked(
        m, recv_j, jnp.asarray(meta_b.block_start), N, meta_b.node_block,
        meta_b.max_edges, meta_b.num_blocks))
    r2 = fb(msg)
    dt = timeit(lambda: fb(msg), iters=10)
    out["laxmap_segsum_ms"] = round(dt * 1e3, 2)
    if r1 is not None:
        out["pallas_vs_laxmap_allclose"] = bool(
            jnp.allclose(r1, r2, atol=1e-1, rtol=1e-2))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        out["fatal"] = repr(e)[:2000]
    with open("/root/repo/tools/probe_gather2.out", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    sys.exit(0)
