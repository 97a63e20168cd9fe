"""Scaling-efficiency sweep: edges/s of the sharded SpMM at 1..N devices.

On real multi-chip hardware this measures ICI-scaled throughput; under
``--cpu`` it runs on virtual CPU devices, which validates the scaling
*structure* (the driver environment exposes one real chip).

Usage:
    python bench_scaling.py [--cpu] [--devices 1 2 4 8]

Prints one JSON line:
    {"metric": "spmm_scaling_efficiency", "value": eff_at_max,
     "unit": "fraction", "per_device": {...}}
"""

import argparse
import json
import sys
import time

import numpy as np

N = 65_536
AVG_DEG = 16
D = 128
ITERS = 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--devices", type=int, nargs="*", default=None)
    args = ap.parse_args()

    if args.cpu:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bridged_gnn_tpu.graph import build_graph
    from bridged_gnn_tpu.parallel import make_mesh, sharded_spmm

    n_avail = len(jax.devices())
    device_counts = args.devices or [
        d for d in (1, 2, 4, 8) if d <= n_avail
    ]

    rng = np.random.default_rng(0)
    e = N * AVG_DEG
    ei = np.stack([
        rng.integers(0, N, size=e), rng.integers(0, N, size=e)
    ])
    x = rng.normal(size=(N, D)).astype(np.float32)
    g = build_graph(x, ei, edge_capacity=((e + 1023) // 1024) * 1024)
    xb = jnp.asarray(x, dtype=jnp.bfloat16)

    results = {}
    for nd in device_counts:
        mesh = make_mesh(nd)
        f = jax.jit(lambda x: sharded_spmm(mesh, g, x))
        out = f(xb)
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = f(xb)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / ITERS
        results[nd] = e / dt
        print(f"# {nd} devices: {dt*1e3:.2f} ms ({e/dt/1e6:.1f} Medges/s)",
              file=sys.stderr)

    base = results[device_counts[0]]
    nmax = device_counts[-1]
    eff = results[nmax] / (base * nmax / device_counts[0])
    print(json.dumps({
        "metric": "spmm_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "fraction",
        "per_device": {str(k): round(v) for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
