"""Sustained (chained) fwd+bwd: selective vs concat custom-VJP kernels."""
import functools, json, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from bridged_gnn_tpu.ops.blocked_segment import make_blocked_ops
from bridged_gnn_tpu.ops.fused_attention import (
    make_adapted_attention, make_adapted_attention_sel)

N, E, D = 131_072, 2_097_152, 128

def sustained(step, x0, iters=8):
    @functools.partial(jax.jit, static_argnums=1)
    def chain(c, n):
        def bodyf(c, _):
            return step(c), None
        c, _ = jax.lax.scan(bodyf, c, None, length=n)
        return jnp.sum(c[:4].astype(jnp.float32))
    float(chain(x0, 1)); float(chain(x0, 1 + iters))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(chain(x0, 1))
        lo = time.perf_counter() - t0
        t0 = time.perf_counter(); float(chain(x0, 1 + iters))
        hi = time.perf_counter() - t0
        best = min(best, (hi - lo) / iters)
    return best * 1e3

def main():
    rng = np.random.default_rng(0)
    s = rng.integers(0, N, size=E).astype(np.int32)
    r = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    em = np.ones(E, bool)
    ops = make_blocked_ops(s, r, em, N, node_block=128)
    central = jnp.asarray((rng.random(N) < 0.5).astype(np.float32))
    a1 = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
    a2 = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(N, D)), jnp.bfloat16)
    u0 = jnp.asarray(rng.normal(size=(N, D)), jnp.bfloat16)
    out = {}
    for name, fn in (
        ("concat_kernel", make_adapted_attention(
            ops, 0.1, kernel_fwd=True, kernel_bwd=True)),
        ("sel_kernel", make_adapted_attention_sel(
            ops, 0.1, kernel_fwd=True, kernel_bwd=True)),
        ("concat_autodiff_xla", None),
    ):
        if fn is not None:
            def loss(u, fn=fn):
                return jnp.sum(fn(u, u, u, u, central, a1, a2
                                  ).astype(jnp.float32) * cot.astype(jnp.float32))
        else:
            from bridged_gnn_tpu.ops.fused_attention import adapted_attention
            central_b = central > 0.5
            def loss(u):
                return jnp.sum(adapted_attention(
                    ops, u, u, central_b,
                    lambda h: (h @ a1.astype(h.dtype))[..., None],
                    lambda h: (h @ a2.astype(h.dtype))[..., None],
                    negative_slope=0.1).astype(jnp.float32) * cot.astype(jnp.float32))
        g = jax.grad(loss)
        def step(c, g=g):
            return (c - 1e-6 * g(c).astype(c.dtype))
        out[f"{name}_fwdbwd_ms"] = round(sustained(step, u0), 3)
        print(json.dumps(out), flush=True)

main()
