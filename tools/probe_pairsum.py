"""Retry BlockedOps.pair_sum on the real chip (VERDICT r1 item 7).

Round 1: its backward program crashed the remote TPU compiler. This
probe (a) checks it compiles today, (b) times grad of a pair_sum-based
attention-logit reduction vs the autodiff gather version at bench scale.

Usage: python tools/probe_pairsum.py [out.json]
"""

import functools
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bridged_gnn_tpu.ops.blocked_segment import make_blocked_ops  # noqa

N, E, D = 131_072, 2_097_152, 128


def timed_chain(step, init, n_lo=2, n_hi=8, reps=3):
    @functools.partial(jax.jit, static_argnums=1)
    def chain(c, n):
        def body(c, _):
            return step(c), None
        c, _ = jax.lax.scan(body, c, None, length=n)
        return jnp.sum(c.reshape(-1)[:8].astype(jnp.float32))

    float(chain(init, n_lo)); float(chain(init, n_hi))
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
    s = rng.integers(0, N, size=E).astype(np.int32)
    r = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    em = np.ones(E, dtype=bool)
    res = {"platform": jax.devices()[0].platform}
    u0 = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))

    ops = make_blocked_ops(s, r, em, N)
    sj, rj = jnp.asarray(s), jnp.asarray(r)

    def loss_pair(u):
        e = jax.nn.leaky_relu(ops.pair_sum(u), 0.2)
        return jnp.sum(e * 1e-9)

    def loss_gather(u):
        e = jax.nn.leaky_relu(u[sj] + u[rj], 0.2)
        return jnp.sum(e * 1e-9)

    for name, loss in [("pair_sum", loss_pair), ("gather", loss_gather)]:
        try:
            def step(c, loss=loss):
                g = jax.grad(loss)(c)
                return c + g.astype(c.dtype) * 1e-6

            t = timed_chain(step, u0)
            res[f"{name}_grad_ms"] = round(t * 1e3, 3)
            res[f"{name}_ok"] = True
        except Exception as exc:  # noqa: BLE001
            res[f"{name}_ok"] = False
            res[f"{name}_err"] = repr(exc)[:300]

    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
