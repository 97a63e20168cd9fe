"""Probe: Mosaic native gather/scatter support + XLA gather locality.

Decides the design of the fused SpMM kernel (VERDICT r1 item 1):
  * if Pallas can gather rows from a VMEM window with vector indices
    (tpu.dynamic_gather), the fused kernel gathers natively instead of
    one-hot matmuls — per-edge cost drops ~2500x on the gather side;
  * if scatter-add works too, the reduce side is free as well;
  * XLA gather with block-sorted indices tells us whether re-sorting
    edges by (dst_block, src) alone speeds up the existing XLA path.

Run detached (nohup); writes JSON findings to tools/probe_gather.out.
"""
import json
import sys
import time

out = {}


def timeit(f, iters=50):
    f()  # compile+warm
    f()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main():
    global jax
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out["platform"] = jax.devices()[0].platform

    R, K, D = 4096, 2048, 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(R, D)).astype(np.float32),
                    dtype=jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, R, size=K).astype(np.int32))

    # --- 1. fancy-index row gather inside a kernel ---------------------
    def k_fancy(idx_ref, x_ref, o_ref):
        o_ref[:] = x_ref[idx_ref[:]]

    try:
        r = pl.pallas_call(
            k_fancy,
            out_shape=jax.ShapeDtypeStruct((K, D), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, x)
        ok = bool(jnp.array_equal(r, x[idx]))
        out["fancy_gather_ok"] = ok
    except Exception as e:  # noqa: BLE001
        out["fancy_gather_ok"] = False
        out["fancy_gather_err"] = repr(e)[:800]

    # --- 2. jnp.take row gather inside a kernel ------------------------
    def k_take(idx_ref, x_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], idx_ref[:], axis=0)

    try:
        r = pl.pallas_call(
            k_take,
            out_shape=jax.ShapeDtypeStruct((K, D), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, x)
        out["take_gather_ok"] = bool(jnp.array_equal(r, x[idx]))
    except Exception as e:  # noqa: BLE001
        out["take_gather_ok"] = False
        out["take_gather_err"] = repr(e)[:800]

    # --- 3. scatter-add on a VMEM value inside a kernel ----------------
    sidx = jnp.asarray(rng.integers(0, 256, size=K).astype(np.int32))
    v = jnp.asarray(rng.normal(size=(K, D)).astype(np.float32))

    def k_scat(idx_ref, v_ref, o_ref):
        acc = jnp.zeros((256, D), jnp.float32)
        o_ref[:] = acc.at[idx_ref[:]].add(v_ref[:])

    try:
        r = pl.pallas_call(
            k_scat,
            out_shape=jax.ShapeDtypeStruct((256, D), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(sidx, v)
        want = jnp.zeros((256, D), jnp.float32).at[sidx].add(v)
        out["scatter_add_ok"] = bool(jnp.allclose(r, want, atol=1e-4))
    except Exception as e:  # noqa: BLE001
        out["scatter_add_ok"] = False
        out["scatter_add_err"] = repr(e)[:800]

    # --- 4. gather throughput: repeat gather in-kernel ------------------
    gather_kind = ("fancy" if out.get("fancy_gather_ok")
                   else "take" if out.get("take_gather_ok") else None)
    if gather_kind and out["platform"] == "tpu":
        REPS = 64

        def k_bench(idx_ref, x_ref, o_ref):
            def body(i, acc):
                g = (x_ref[idx_ref[:]] if gather_kind == "fancy"
                     else jnp.take(x_ref[:], idx_ref[:], axis=0))
                return acc + g.astype(jnp.float32)
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
            dt = timeit(lambda: f(idx, x))
            rows_per_s = REPS * K / dt
            out["vmem_gather_rows_per_s"] = round(rows_per_s)
        except Exception as e:  # noqa: BLE001
            out["vmem_gather_bench_err"] = repr(e)[:800]

    # --- 5. XLA gather: random vs block-sorted indices ------------------
    N, E = 131_072, 2_097_152
    xb = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32),
                     dtype=jnp.bfloat16)
    send_rand = rng.integers(0, N, size=E).astype(np.int32)
    # block-sorted: edges grouped in 512 dst-blocks, src ascending inside
    send_bsort = send_rand.reshape(512, -1)
    send_bsort = np.sort(send_bsort, axis=1).reshape(-1)
    j_rand = jnp.asarray(send_rand)
    j_bsort = jnp.asarray(send_bsort)
    g = jax.jit(lambda i_: xb[i_].astype(jnp.float32).sum(axis=0))
    try:
        dt_r = timeit(lambda: g(j_rand), iters=10)
        dt_s = timeit(lambda: g(j_bsort), iters=10)
        out["xla_gather_random_GBps"] = round(E * D * 2 / dt_r / 1e9, 1)
        out["xla_gather_blocksorted_GBps"] = round(E * D * 2 / dt_s / 1e9, 1)
    except Exception as e:  # noqa: BLE001
        out["xla_gather_err"] = repr(e)[:800]


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        out["fatal"] = repr(e)[:2000]
    with open("/root/repo/tools/probe_gather.out", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    sys.exit(0)
