"""Scan-chained (data-dependent) timing of the selective kernel vs its
gather stage — the bench.py-style sustained measurement."""
import functools, json, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from bridged_gnn_tpu.ops.blocked_segment import make_blocked_ops
from bridged_gnn_tpu.ops.pallas_fused import _attention_sel_call, _attention_call

N, E, D = 131_072, 2_097_152, 128

def sustained(make_step, x0, iters=10):
    @functools.partial(jax.jit, static_argnums=1)
    def chain(c, n):
        def bodyf(c, _):
            return make_step(c), None
        c, _ = jax.lax.scan(bodyf, c, None, length=n)
        return jnp.sum(c[:4].astype(jnp.float32))
    float(chain(x0, 2)); float(chain(x0, 2 + iters))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(chain(x0, 2))
        lo = time.perf_counter() - t0
        t0 = time.perf_counter(); float(chain(x0, 2 + iters))
        hi = time.perf_counter() - t0
        best = min(best, (hi - lo) / iters)
    return best * 1e3

def main():
    rng = np.random.default_rng(0)
    s = rng.integers(0, N, size=E).astype(np.int32)
    r = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    em = np.ones(E, bool)
    ops = make_blocked_ops(s, r, em, N, node_block=128)
    lay = ops.lay_dst
    B, Et, nb = lay.num_blocks, lay.tile_e, 128
    other = jnp.asarray(np.asarray(lay.other_slot))
    u = jnp.asarray(rng.normal(size=(2 * N, D)), jnp.bfloat16)
    udc = jnp.asarray(rng.normal(size=(B, nb, D + 128)), jnp.bfloat16)
    a1 = jnp.asarray(rng.normal(size=(1, D)).astype(np.float32))
    a2 = jnp.asarray(rng.normal(size=(1, D)).astype(np.float32))
    rel = lay.rel_key
    out = {}

    # gather only: u[other] -> [B, Et, D], feed back a tiny slice
    def gather_step(c):
        m = (c)[other].reshape(B, Et, D)
        return c.at[:4].add(m[0, :4].astype(c.dtype) * 1e-6)
    out["gather_only_ms"] = round(sustained(gather_step, u), 3)
    print(json.dumps(out), flush=True)

    # kernel only (msg pre-materialized, fed back via tiny slice)
    msg0 = u[other].reshape(B, Et, D)
    def kernel_step(c):
        o, ex, den = _attention_sel_call(rel, c, udc, a1, a2, nb, 0.1)
        return c.at[0, :4, :].add(o[0, :4].astype(c.dtype) * 1e-6)
    out["sel_kernel_only_ms"] = round(sustained(kernel_step, msg0), 3)
    print(json.dumps(out), flush=True)

    # gather + kernel (the full production fwd)
    def full_step(c):
        m = c[other].reshape(B, Et, D)
        o, ex, den = _attention_sel_call(rel, m, udc, a1, a2, nb, 0.1)
        return c.at[:4].add(o[0, :4].astype(c.dtype) * 1e-6)
    out["gather_plus_kernel_ms"] = round(sustained(full_step, u), 3)
    print(json.dumps(out), flush=True)

main()
