"""Benchmark: SpMM aggregate throughput (edges/s/chip) on TPU vs torch-CPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": R}

The measured op is the framework's hot aggregation primitive (gather +
destination-sorted segment-sum — the reference's torch_sparse SpMM
equivalent, SURVEY §2b) on a synthetic power-of-two graph, bf16 features.
The baseline is the same op in torch on CPU (index_add), standing in for
the PyG-CPU scatter-add path (PyG itself is not installed here).
"""

import json
import sys
import time

import numpy as np

N = 131_072
E = 2_097_152
D = 128
WARMUP = 3
ITERS = 20
CPU_ITERS = 3


def bench_tpu():
    import jax
    import jax.numpy as jnp

    from bridged_gnn_tpu.ops.spmm import spmm_edges

    rng = np.random.default_rng(0)
    senders = rng.integers(0, N, size=E).astype(np.int32)
    receivers = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    x = rng.normal(size=(N, D)).astype(np.float32)

    s = jnp.asarray(senders)
    r = jnp.asarray(receivers)
    em = jnp.ones(E, dtype=bool)
    xb = jnp.asarray(x, dtype=jnp.bfloat16)

    f = jax.jit(
        lambda x: spmm_edges(s, r, em, x, N, reduce="sum")
    )
    out = f(xb)
    out.block_until_ready()
    for _ in range(WARMUP):
        f(xb).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(xb)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS
    return E / dt, dt


def bench_torch_cpu():
    import torch

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    senders = torch.from_numpy(rng.integers(0, N, size=E)).long()
    receivers = torch.from_numpy(np.sort(rng.integers(0, N, size=E))).long()
    x = torch.randn(N, D)

    def run():
        out = torch.zeros(N, D)
        out.index_add_(0, receivers, x[senders])
        return out

    run()
    t0 = time.perf_counter()
    for _ in range(CPU_ITERS):
        run()
    dt = (time.perf_counter() - t0) / CPU_ITERS
    return E / dt, dt


def main():
    tpu_eps, tpu_dt = bench_tpu()
    cpu_eps, cpu_dt = bench_torch_cpu()
    print(
        f"# tpu spmm: {tpu_dt*1e3:.3f} ms/iter ({tpu_eps/1e9:.2f} Gedges/s)"
        f" | torch-cpu: {cpu_dt*1e3:.1f} ms/iter ({cpu_eps/1e6:.1f} Medges/s)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "spmm_edges_per_sec_chip",
                "value": round(tpu_eps),
                "unit": "edges/s",
                "vs_baseline": round(tpu_eps / cpu_eps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
