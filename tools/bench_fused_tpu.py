"""On-chip bench: padded Pallas reduce vs XLA twin, and fused attention
conv (ops/fused_attention.py) vs the unfused segment-op path, fwd + bwd.

Also re-times the production custom-VJP SpMM so all numbers share one
process/compile session. Writes JSON to argv[1]
(default results_fused_tpu.json). Run detached per STATUS.md:
    nohup python tools/bench_fused_tpu.py results_fused_tpu.json \
        > tools/bench_fused.log 2>&1 &
"""

import json
import sys
import time

import numpy as np

out_path = sys.argv[1] if len(sys.argv) > 1 else "results_fused_tpu.json"
repo = __file__.rsplit("/", 2)[0]
sys.path.insert(0, repo)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

res = {"platform": jax.devices()[0].platform}
N, E, D = 131_072, 2_097_152, 128
res.update(N=N, E=E, D=D)

rng = np.random.default_rng(0)
s_np = rng.integers(0, N, size=E).astype(np.int32)
r_np = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
em_np = np.ones(E, dtype=bool)

from bridged_gnn_tpu.ops import blocked_segment as bs  # noqa: E402

t0 = time.perf_counter()
ops = bs.make_blocked_ops(s_np, r_np, em_np, N, node_block=256)
res["layout_build_s"] = round(time.perf_counter() - t0, 2)

x = jnp.asarray(
    rng.normal(size=(N, D)).astype(np.float32), dtype=jnp.bfloat16
)
w = jnp.ones((E,), jnp.bfloat16)
central_np = np.zeros(N, dtype=bool)
central_np[: N // 2] = True
central = jnp.asarray(central_np)
a1 = jnp.asarray(rng.normal(size=(D,)).astype(np.float32), jnp.bfloat16)
a2 = jnp.asarray(rng.normal(size=(D,)).astype(np.float32), jnp.bfloat16)


def timeit(f, *args, iters=20, warmup=3):
    o = f(*args)
    jax.block_until_ready(o)
    for _ in range(warmup):
        jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


# --- 1. production SpMM fwd: XLA vs Pallas reduce
spmm_u = jax.jit(lambda x: ops.spmm(x))
res["spmm_xla_unweighted_fwd_ms"] = round(timeit(spmm_u, x), 3)
spmm_j = jax.jit(lambda x: ops.spmm(x, w))
res["spmm_xla_fwd_ms"] = round(timeit(spmm_j, x), 3)

bs.set_reduce_impl("pallas")
spmm_p = jax.jit(lambda x: ops.spmm(x, w))
try:
    res["spmm_pallas_fwd_ms"] = round(timeit(spmm_p, x), 3)
    ok = np.allclose(
        np.asarray(spmm_p(x), np.float32),
        np.asarray(spmm_j(x), np.float32),
        rtol=2e-2, atol=1e-2,
    )
    res["spmm_pallas_matches"] = bool(ok)
except Exception as exc:  # noqa: BLE001
    res["spmm_pallas_error"] = repr(exc)[:300]
finally:
    bs.set_reduce_impl("xla")

# --- 2. SpMM fwd+bwd (training step shape)
def spmm_loss(x, w):
    return jnp.sum(ops.spmm(x, w).astype(jnp.float32) ** 2)


spmm_grad = jax.jit(jax.grad(spmm_loss, argnums=(0, 1)))
res["spmm_xla_fwdbwd_ms"] = round(timeit(spmm_grad, x, w), 3)
bs.set_reduce_impl("pallas")
spmm_grad_p = jax.jit(jax.grad(spmm_loss, argnums=(0, 1)))
try:
    res["spmm_pallas_fwdbwd_ms"] = round(timeit(spmm_grad_p, x, w), 3)
except Exception as exc:  # noqa: BLE001
    res["spmm_pallas_bwd_error"] = repr(exc)[:300]
finally:
    bs.set_reduce_impl("xla")

# --- 3. fused attention conv vs unfused (fwd and fwd+bwd)
from bridged_gnn_tpu.ops.fused_attention import adapted_attention  # noqa: E402
from bridged_gnn_tpu.ops.segment import segment_softmax, segment_sum  # noqa: E402

s_j = jnp.asarray(s_np)
r_j = jnp.asarray(r_np)
em_j = jnp.asarray(em_np)


def fused(u1, u2):
    return adapted_attention(
        ops, u1, u2, central,
        lambda h: (h @ a1)[..., None],
        lambda h: (h @ a2)[..., None],
    )


def unfused(u1, u2):
    e1 = jax.nn.leaky_relu(u1[s_j] + u1[r_j], 0.1)
    e2 = jax.nn.leaky_relu(u2[s_j] + u2[r_j], 0.1)
    logits = jnp.where(
        central[r_j], (e1 @ a1).astype(jnp.float32),
        (e2 @ a2).astype(jnp.float32),
    )
    alpha = segment_softmax(
        logits, r_j, N, mask=em_j, indices_are_sorted=True
    )
    w1 = jnp.where(central[r_j], alpha, 0.0).astype(u1.dtype)
    w2 = jnp.where(central[r_j], 0.0, alpha).astype(u1.dtype)
    return ops.spmm(u1, w1) + ops.spmm(u2, w2)


u1 = x
u2 = x * 0.5
fused_j = jax.jit(fused)
unfused_j = jax.jit(unfused)
res["attn_fused_fwd_ms"] = round(timeit(fused_j, u1, u2, iters=10), 3)
res["attn_unfused_fwd_ms"] = round(timeit(unfused_j, u1, u2, iters=10), 3)
ok = np.allclose(
    np.asarray(fused_j(u1, u2), np.float32),
    np.asarray(unfused_j(u1, u2), np.float32),
    rtol=5e-2, atol=5e-2,
)
res["attn_fused_matches"] = bool(ok)


def loss_of(f):
    return lambda u1, u2: jnp.sum(f(u1, u2).astype(jnp.float32) ** 2)


fgrad = jax.jit(jax.grad(loss_of(fused), argnums=(0, 1)))
ugrad = jax.jit(jax.grad(loss_of(unfused), argnums=(0, 1)))
res["attn_fused_fwdbwd_ms"] = round(timeit(fgrad, u1, u2, iters=10), 3)
res["attn_unfused_fwdbwd_ms"] = round(timeit(ugrad, u1, u2, iters=10), 3)

# --- 3b. hand-derived custom-VJP fused attention (recompute backward)
from bridged_gnn_tpu.ops.fused_attention import make_adapted_attention  # noqa: E402

central_f = central.astype(jnp.float32)
fused_cv = make_adapted_attention(ops)


def fused_cvjp(u1, u2):
    return fused_cv(u1, u2, u1, u2, central_f, a1, a2)


cv_j = jax.jit(fused_cvjp)
res["attn_cvjp_fwd_ms"] = round(timeit(cv_j, u1, u2, iters=10), 3)
ok = np.allclose(
    np.asarray(cv_j(u1, u2), np.float32),
    np.asarray(fused_j(u1, u2), np.float32),
    rtol=5e-2, atol=5e-2,
)
res["attn_cvjp_matches"] = bool(ok)
cvgrad = jax.jit(jax.grad(loss_of(fused_cvjp), argnums=(0, 1)))
res["attn_cvjp_fwdbwd_ms"] = round(timeit(cvgrad, u1, u2, iters=10), 3)

# --- 4. pair_sum custom VJP compile check (VERDICT r1 item 7)
try:
    ps_grad = jax.jit(
        jax.grad(lambda u: jnp.sum(ops.pair_sum(u).astype(jnp.float32) ** 2))
    )
    res["pair_sum_fwdbwd_ms"] = round(timeit(ps_grad, x, iters=10), 3)
    res["pair_sum_compiles"] = True
except Exception as exc:  # noqa: BLE001
    res["pair_sum_compiles"] = False
    res["pair_sum_error"] = repr(exc)[:300]

with open(out_path, "w") as f:
    json.dump(res, f, indent=1)
print(json.dumps(res))
