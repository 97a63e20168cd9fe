"""Why is production spmm ~6.5 ms when the isolated probe measured 5.0?

A/B on the real chip, all with python-loop timing at bench scale:
  A: production ops.spmm (layout arrays closed over as jaxpr constants)
  B: same math, layout arrays passed as jit ARGUMENTS
  C: B timed inside a lax.scan chain (the round-2 probe's method)
Writes JSON to argv[1] (default tools/probe_spmm_gap.json).
"""

import functools
import json
import sys
import time

import numpy as np

out_path = sys.argv[1] if len(sys.argv) > 1 else "tools/probe_spmm_gap.json"
repo = __file__.rsplit("/", 2)[0]
sys.path.insert(0, repo)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bridged_gnn_tpu.ops import blocked_segment as bs  # noqa: E402

N, E, D = 131_072, 2_097_152, 128
res = {"platform": jax.devices()[0].platform}
rng = np.random.default_rng(0)
s_np = rng.integers(0, N, size=E).astype(np.int32)
r_np = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
em = np.ones(E, dtype=bool)
ops = bs.make_blocked_ops(s_np, r_np, em, N, node_block=256)
lay = ops.lay_dst
x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32), jnp.bfloat16)


def timeit(f, *args, iters=30, warmup=5):
    jax.block_until_ready(f(*args))
    for _ in range(warmup):
        jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3


fa = jax.jit(lambda x: ops.spmm(x))
res["A_closure_ms"] = round(timeit(fa, x), 3)

B, Et, nb = lay.num_blocks, lay.tile_e, lay.node_block


@jax.jit
def fb(x, other, rel):
    msg = x[other].reshape(B, Et, D)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)
    oh = (rows == rel[:, None, :]).astype(x.dtype)
    out = jax.lax.dot_general(
        oh, msg, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B * nb, D)[:N].astype(x.dtype)


res["B_args_ms"] = round(timeit(fb, x, lay.other_slot, lay.rel_key), 3)


@functools.partial(jax.jit, static_argnums=1)
def chain(c, n, other, rel):
    def body(c, _):
        return c.at[:8].add(fb(c, other, rel)[:8] * 1e-6), None
    c, _ = jax.lax.scan(body, c, None, length=n)
    return jnp.sum(c[:8].astype(jnp.float32))


def chain_time(n_lo=2, n_hi=32, reps=3):
    float(chain(x, n_lo, lay.other_slot, lay.rel_key))
    float(chain(x, n_hi, lay.other_slot, lay.rel_key))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chain(x, n_lo, lay.other_slot, lay.rel_key))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chain(x, n_hi, lay.other_slot, lay.rel_key))
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
    return best * 1e3


res["C_chain_ms"] = round(chain_time(), 3)

# D: closure variant but no trailing astype (f32 out)
fd = jax.jit(lambda x: bs.padded_gather_reduce(lay, x))
res["D_closure_f32out_ms"] = round(timeit(fd, x), 3)

with open(out_path, "w") as f:
    json.dump(res, f, indent=1)
print(json.dumps(res))
