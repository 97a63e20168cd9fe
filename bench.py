"""Benchmark: SpMM aggregate throughput (edges/s/chip) vs torch-CPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": R}

The measured op is the framework's hot aggregation primitive (gather +
destination-sorted segment reduce — the reference's torch_sparse SpMM
equivalent, SURVEY §2b) on a synthetic 131k-node / 2M-edge graph with
bf16 features. Baseline: the same op in torch on CPU (index_add), standing
in for the PyG-CPU scatter-add path (PyG is not installed here).

The device measurement runs in a child process with a watchdog: if the TPU
tunnel is unreachable (it can wedge), the benchmark falls back to the JAX
CPU backend and flags it in the metric name rather than hanging the driver.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

N = 131_072
E = 2_097_152
D = 128
WARMUP = 3
ITERS = 20
CPU_ITERS = 3
DEVICE_TIMEOUT_S = int(os.environ.get("BENCH_DEVICE_TIMEOUT_S", "1500"))

_CHILD_CODE = r"""
import json, sys, time
import numpy as np
import jax
import jax.numpy as jnp

platform = sys.argv[1]
if platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, {repo!r})
from bridged_gnn_tpu.ops.blocked_segment import make_blocked_ops

N, E, D, WARMUP, ITERS = {n}, {e}, {d}, {warmup}, {iters}
rng = np.random.default_rng(0)
snp = rng.integers(0, N, size=E).astype(np.int32)
rnp = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
em = np.ones(E, dtype=bool)
x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32),
                dtype=jnp.bfloat16)
# production aggregation path: padded-tile gather+one-hot-matmul segment
# reduce (the custom-VJP SpMM the GNN convs run); unweighted sum, matching
# the torch index_add baseline — the slot mask is a layout constant
ops = make_blocked_ops(snp, rnp, em, N, node_block=256)

# sustained throughput: ITERS back-to-back SpMMs on device via lax.scan,
# as they run inside a training epoch (XLA overlaps the next iteration's
# gather with the current reduce); per-call latency is ~25% higher
# (tools/probe_spmm_gap.json: 4.7 ms chained vs 5.9 ms single-dispatch)
import functools
@functools.partial(jax.jit, static_argnums=1)
def chain(c, n):
    def body(c, _):
        return c.at[:8].add(ops.spmm(c)[:8] * 1e-6), None
    c, _ = jax.lax.scan(body, c, None, length=n)
    return jnp.sum(c[:8].astype(jnp.float32))

float(chain(x, 2)); float(chain(x, 2 + ITERS))  # compile both lengths
best = float("inf")
for _ in range(max(WARMUP, 3)):
    t0 = time.perf_counter(); float(chain(x, 2))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); float(chain(x, 2 + ITERS))
    t_hi = time.perf_counter() - t0
    best = min(best, (t_hi - t_lo) / ITERS)
print(json.dumps({{"dt": best, "platform": jax.devices()[0].platform}}))
"""


def bench_device(platform: str):
    code = _CHILD_CODE.format(
        repo=os.path.dirname(os.path.abspath(__file__)),
        n=N, e=E, d=D, warmup=WARMUP, iters=ITERS,
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code, platform],
            capture_output=True, text=True,
            timeout=DEVICE_TIMEOUT_S if platform != "cpu" else 1800,
        )
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
        print(f"# bench child failed: {proc.stderr[-500:]}", file=sys.stderr)
    except subprocess.TimeoutExpired:
        print(f"# bench child timed out on platform={platform}",
              file=sys.stderr)
    return None


def bench_torch_cpu():
    import torch

    rng = np.random.default_rng(0)
    senders = torch.from_numpy(rng.integers(0, N, size=E)).long()
    receivers = torch.from_numpy(np.sort(rng.integers(0, N, size=E))).long()
    x = torch.randn(N, D)

    def run():
        out = torch.zeros(N, D)
        out.index_add_(0, receivers, x[senders])
        return out

    run()
    # best-of-N: the mean is load-sensitive (concurrent work on this
    # host inflated it up to 3x in observed runs) — the min is the
    # honest single-threaded capability of the baseline op
    dt = float("inf")
    for _ in range(CPU_ITERS):
        t0 = time.perf_counter()
        run()
        dt = min(dt, time.perf_counter() - t0)
    return E / dt, dt


def tunnel_alive(timeout_s: int = 180) -> bool:
    """Cheap aliveness probe in a child process: one tiny matmul. The
    tunnel wedges for ~1-1.5 h after any client is killed mid-flight;
    probing first avoids burning the full device timeout on a dead link."""
    code = (
        "import jax, jax.numpy as jnp;"
        "print('ALIVE', float((jnp.ones((64,64))@jnp.ones((64,64))).sum()))"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s,
        )
        return "ALIVE" in proc.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    # Retry through transient tunnel wedges (up to ~25 min) before
    # conceding to the CPU fallback: one wedge window costs less than a
    # round's headline metric silently becoming a CPU number.
    #
    # Reproducibility (VERDICT r3 item 5): single-child runs wobble ±9%
    # across process restarts (measured 4.53-4.98 ms for the identical
    # program — tunnel/host state, bimodal, r2's 456 vs r3's 420 Medges/s
    # was exactly this). The op's capability is the BEST over a few
    # independent child processes; we take up to SAMPLES successful
    # children and report the fastest, logging every sample.
    attempts = int(os.environ.get("BENCH_TUNNEL_RETRIES", "10"))
    samples_target = int(os.environ.get("BENCH_SAMPLES", "3"))
    res = None
    samples = []
    bench_failures = 0
    probe_failures = 0
    for i in range(attempts):
        if tunnel_alive():
            probe_failures = 0
            got = bench_device("default")  # TPU when the tunnel is alive
            if got is not None:
                samples.append(got)
                if res is None or got["dt"] < res["dt"]:
                    res = got
                if len(samples) >= samples_target:
                    break
                continue
            # bench failed though the tunnel probed alive: re-probe — a
            # still-alive tunnel means a deterministic bench failure
            # (not a wedge); don't burn the retry budget on it
            if tunnel_alive():
                bench_failures += 1
                if bench_failures >= 2:
                    if res is not None:
                        break
                    print("# bench failed twice with the tunnel alive; "
                          "conceding to CPU fallback", file=sys.stderr)
                    break
        else:
            probe_failures += 1
        if res is not None and probe_failures >= 2:
            break  # have a sample; tunnel repeatedly unresponsive — stop
        print(f"# device attempt {i + 1}/{attempts} failed; retrying",
              file=sys.stderr)
        time.sleep(45 if res is not None else 90)
    if samples:
        print(
            "# samples (ms/iter): "
            + ", ".join(f"{s['dt'] * 1e3:.3f}" for s in samples)
            + " -> median reported",
            file=sys.stderr,
        )
    metric = "spmm_edges_per_sec_chip"
    if res is None:
        res = bench_device("cpu")
        # distinct labels: a deterministic bench failure with the tunnel
        # alive is not a tunnel outage (ADVICE r2)
        metric = (
            "spmm_edges_per_sec_chip_CPU_FALLBACK_BENCH_FAILED"
            if bench_failures >= 2
            else "spmm_edges_per_sec_chip_CPU_FALLBACK_TUNNEL_DOWN"
        )
    if res is None:
        print(json.dumps({"metric": metric, "value": 0, "unit": "edges/s",
                          "vs_baseline": 0.0}))
        return
    # Headline = MEDIAN over the independent child samples (VERDICT r4
    # item 7): "best" is the easiest number to fool yourself with on a
    # noisy tunneled host. Best + raw samples stay as secondary fields.
    dts = sorted(s["dt"] for s in samples) or [res["dt"]]
    dt_median = dts[len(dts) // 2] if len(dts) % 2 else (
        0.5 * (dts[len(dts) // 2 - 1] + dts[len(dts) // 2]))
    dev_eps = E / dt_median
    best_eps = E / dts[0]
    cpu_eps, cpu_dt = bench_torch_cpu()
    print(
        f"# {res['platform']} spmm: median {dt_median*1e3:.3f} ms/iter "
        f"({dev_eps/1e6:.1f} Medges/s), best {dts[0]*1e3:.3f} ms | "
        f"torch-cpu: {cpu_dt*1e3:.1f} ms ({cpu_eps/1e6:.1f} Medges/s)",
        file=sys.stderr,
    )
    # measured single-chip roofline for any one-row-per-edge
    # formulation: the gather engine moves 474 Mrows/s on v5e
    # (DESIGN.md §2, results_spmm_padded_tpu.json)
    GATHER_CEILING_EDGES_PER_S = 474e6
    out = {
        "metric": metric,
        "value": round(dev_eps),
        "unit": "edges/s",
        "vs_baseline": round(dev_eps / cpu_eps, 2),
        "best": round(best_eps),
        "samples_ms": [round(d * 1e3, 3) for d in dts],
    }
    if "CPU_FALLBACK" not in metric:
        # only meaningful against the TPU gather roofline
        out["pct_of_ceiling"] = round(
            100.0 * dev_eps / GATHER_CEILING_EDGES_PER_S, 1)
    if "CPU_FALLBACK" in metric:
        # context for the round record: the same op's last measured
        # on-chip sustained throughput (results_spmm_padded_tpu.json /
        # BENCH_r01 follow-ups) — the fallback reflects tunnel state,
        # not a regression of the kernel
        out["last_recorded_tpu_value"] = 443_000_000
    print(json.dumps(out))


if __name__ == "__main__":
    main()
