"""On-device SpMM variant sweep for the roofline push (round 2).

Measures, on the real chip, with a tunnel-proof timing harness
(scan-chained data dependencies + host readback, delta between two scan
lengths so dispatch/readback overhead cancels):

  * pure gather floor  x[senders]           (bf16 and f32)
  * blocked one-hot reduce alone            node_block in {128, 256, 512}
  * full spmm (gather + blocked reduce)     same sweep
  * gather + sorted-scatter segment_sum     (XLA scatter path, for contrast)

Benchmark shape matches bench.py: N=131072, E=2097152, D=128, uniform
random senders, sorted receivers (the bench.py spec, reference hot path
models/KTGNN.py:303-324).

Usage: python tools/bench_spmm_variants.py [out.json]
"""

import functools
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bridged_gnn_tpu.ops.blocked_segment import (  # noqa: E402
    build_block_meta,
    segment_sum_blocked,
)

N, E, D = 131_072, 2_097_152, 128


def timed_chain(step, init, n_lo=2, n_hi=82, reps=4):
    """Per-iteration seconds of `carry = step(carry)` with forced sync."""

    @functools.partial(jax.jit, static_argnums=1)
    def chain(c, n):
        def body(c, _):
            return step(c), None
        c, _ = jax.lax.scan(body, c, None, length=n)
        leaf = jax.tree_util.tree_leaves(c)[0]
        return jnp.sum(leaf.reshape(-1)[:8].astype(jnp.float32))

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
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/dev/stdout"
    rng = np.random.default_rng(0)
    senders = jnp.asarray(rng.integers(0, N, size=E).astype(np.int32))
    rnp = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    receivers = jnp.asarray(rnp)
    res = {"platform": jax.devices()[0].platform,
           "N": N, "E": E, "D": D}

    # --- pure gather + column-sum (consumes every gathered row)
    for dt_name, dt in [("bf16", jnp.bfloat16), ("f32", jnp.float32)]:
        x0 = jnp.asarray(rng.normal(size=(N, D)), dtype=dt)

        def g_step(c):
            msg = c[senders]
            return c + (jnp.sum(msg, axis=0) * 1e-6).astype(c.dtype)

        t = timed_chain(g_step, x0)
        res[f"gather_colsum_{dt_name}_ms"] = round(t * 1e3, 3)
        res[f"gather_{dt_name}_Mrows_s"] = round(E / t / 1e6, 1)

        # column-sum alone on a resident [E, D] array (to subtract)
        m0 = jnp.asarray(rng.normal(size=(E // 8, D)), dtype=dt)

        def s_step(c):
            return c + (jnp.sum(c, axis=0, keepdims=True) * 1e-6).astype(
                c.dtype
            )

        ts = timed_chain(s_step, m0) * 8  # scaled to E rows
        res[f"colsum_only_{dt_name}_ms"] = round(ts * 1e3, 3)

    # --- blocked reduce alone + full spmm, node_block sweep (bf16)
    x0 = jnp.asarray(rng.normal(size=(N, D)), dtype=jnp.bfloat16)
    for nb in (128, 256, 512):
        meta = build_block_meta(rnp, N, nb)
        bs = jnp.asarray(meta.block_start)

        def reduce_step(c, bs=bs, meta=meta):
            out = segment_sum_blocked(
                c, receivers, bs, N, meta.node_block, meta.max_edges,
                meta.num_blocks,
            )
            return c + (jnp.sum(out, axis=0) * 1e-9).astype(c.dtype)

        m0 = jnp.asarray(rng.normal(size=(E, D)), dtype=jnp.bfloat16)
        t_r = timed_chain(reduce_step, m0, n_lo=2, n_hi=42)
        res[f"blocked_reduce_nb{nb}_ms"] = round(t_r * 1e3, 3)
        res[f"blocked_reduce_nb{nb}_max_edges"] = meta.max_edges

        def spmm_step(c, bs=bs, meta=meta):
            msg = c[senders]
            out = segment_sum_blocked(
                msg, receivers, bs, N, meta.node_block, meta.max_edges,
                meta.num_blocks,
            ).astype(c.dtype)
            return c + out * 1e-6

        t_f = timed_chain(spmm_step, x0, n_lo=2, n_hi=42)
        res[f"spmm_blocked_nb{nb}_ms"] = round(t_f * 1e3, 3)
        res[f"spmm_blocked_nb{nb}_Medges_s"] = round(E / t_f / 1e6, 1)

    # --- gather + sorted scatter-add (XLA segment_sum) for contrast
    def scatter_step(c):
        msg = c[senders]
        out = jax.ops.segment_sum(
            msg, receivers, num_segments=N, indices_are_sorted=True
        ).astype(c.dtype)
        return c + out * 1e-6

    t_s = timed_chain(scatter_step, x0, n_lo=2, n_hi=22)
    res["spmm_scatter_ms"] = round(t_s * 1e3, 3)
    res["spmm_scatter_Medges_s"] = round(E / t_s / 1e6, 1)

    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
