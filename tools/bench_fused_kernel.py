"""Measure the single-kernel fused attention forward (ops/pallas_fused.py)
against the XLA fused formulation at production scale (131k nodes / 2M
edges / 128 bf16), fwd and fwd+bwd.

Usage: python tools/bench_fused_kernel.py [out.json]
"""
import json
import sys
import time

import numpy as np

repo = __file__.rsplit("/", 2)[0]
sys.path.insert(0, repo)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bridged_gnn_tpu.ops.blocked_segment import make_blocked_ops  # noqa: E402
from bridged_gnn_tpu.ops.fused_attention import (  # noqa: E402
    adapted_attention,
    make_adapted_attention,
)

N, E, D = 131_072, 2_097_152, 128


def timeit(f, *args, iters=10):
    jax.block_until_ready(f(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f(*args)
        jax.block_until_ready(o)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    out = {"backend": jax.default_backend(), "N": N, "E": E, "D": D}
    print(json.dumps(out), flush=True)
    rng = np.random.default_rng(0)
    s = rng.integers(0, N, size=E).astype(np.int32)
    r = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    em = np.ones(E, bool)
    t0 = time.perf_counter()
    ops = make_blocked_ops(s, r, em, N, node_block=256)
    out["build_s"] = round(time.perf_counter() - t0, 2)
    # smaller node blocks halve the kernel's VMEM working set (the full
    # Et=4352 block at nb=256 overflows and kills the compile helper)
    # AND halve the one-hot expand/reduce flops (∝ nb·Et·D)
    nb_k = int(__import__("os").environ.get("BGNN_KERNEL_NB", "128"))
    ops_k = make_blocked_ops(s, r, em, N, node_block=nb_k)
    out["kernel_nb"] = nb_k
    out["kernel_tile_e"] = ops_k.lay_dst.tile_e

    u1 = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32), jnp.bfloat16)
    u2 = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32), jnp.bfloat16)
    a1 = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
    a2 = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
    central = jnp.asarray(
        (rng.random(N) < 0.5).astype(np.float32)
    )
    central_b = central > 0.5
    cot = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32),
                      jnp.bfloat16)

    fused_x = jax.jit(lambda u1, u2: adapted_attention(
        ops, u1, u2, central_b,
        lambda h: (h @ a1.astype(h.dtype))[..., None],
        lambda h: (h @ a2.astype(h.dtype))[..., None],
        negative_slope=0.1,
    ))
    kfn = make_adapted_attention(ops_k, 0.1, kernel_fwd=True)
    fused_k = jax.jit(lambda u1, u2: kfn(u1, u2, u1, u2, central, a1, a2))

    try:
        ok = np.asarray(fused_k(u1, u2), np.float32)
        ox = np.asarray(fused_x(u1, u2), np.float32)
        err = float(np.abs(ok - ox).max())
        rel = err / max(float(np.abs(ox).max()), 1e-9)
        out["fwd_max_abs_err"] = err
        out["fwd_max_rel"] = rel
        print(json.dumps({"err": err, "rel": rel}), flush=True)
        out["fwd_xla_ms"] = round(timeit(fused_x, u1, u2), 3)
        out["fwd_kernel_ms"] = round(timeit(fused_k, u1, u2), 3)
        print(json.dumps(out), flush=True)
    except Exception as exc:  # noqa: BLE001
        out["fwd_kernel_error"] = repr(exc)[:300]
        print(json.dumps(out), flush=True)
        with open(_path(), "w") as fo:
            json.dump(out, fo, indent=1)
        return

    # fwd + bwd
    def loss_k(u1, u2, a1_, a2_):
        return jnp.sum(
            kfn(u1, u2, u1, u2, central, a1_, a2_).astype(jnp.float32)
            * cot.astype(jnp.float32)
        )

    def loss_x(u1, u2, a1_, a2_):
        return jnp.sum(
            adapted_attention(
                ops, u1, u2, central_b,
                lambda h: (h @ a1_.astype(h.dtype))[..., None],
                lambda h: (h @ a2_.astype(h.dtype))[..., None],
                negative_slope=0.1,
            ).astype(jnp.float32) * cot.astype(jnp.float32)
        )

    kkfn = make_adapted_attention(
        ops_k, 0.1, kernel_fwd=True, kernel_bwd=True
    )

    def loss_kk(u1, u2, a1_, a2_):
        return jnp.sum(
            kkfn(u1, u2, u1, u2, central, a1_, a2_).astype(jnp.float32)
            * cot.astype(jnp.float32)
        )

    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2, 3)))
    gx = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2, 3)))
    gkk = jax.jit(jax.grad(loss_kk, argnums=(0, 1, 2, 3)))
    try:
        g1 = gk(u1, u2, a1, a2)
        g2 = gx(u1, u2, a1, a2)
        errs = [float(np.abs(np.asarray(a, np.float32)
                             - np.asarray(b, np.float32)).max())
                for a, b in zip(g1, g2)]
        out["bwd_max_abs_errs"] = errs
        out["fwdbwd_xla_ms"] = round(timeit(gx, u1, u2, a1, a2), 3)
        out["fwdbwd_kernel_ms"] = round(timeit(gk, u1, u2, a1, a2), 3)
    except Exception as exc:  # noqa: BLE001
        out["bwd_kernel_error"] = repr(exc)[:300]
    try:
        g3 = gkk(u1, u2, a1, a2)
        errs = [float(np.abs(np.asarray(a, np.float32)
                             - np.asarray(b, np.float32)).max())
                for a, b in zip(g3, g2)]
        rel = [e / max(float(np.abs(np.asarray(b, np.float32)).max()), 1e-9)
               for e, b in zip(errs, g2)]
        out["kk_bwd_max_rel_errs"] = [round(x, 5) for x in rel]
        out["fwdbwd_kernelboth_ms"] = round(timeit(gkk, u1, u2, a1, a2), 3)
    except Exception as exc:  # noqa: BLE001
        out["kk_bwd_error"] = repr(exc)[:300]
    print(json.dumps(out), flush=True)
    with open(_path(), "w") as fo:
        json.dump(out, fo, indent=1)


def _path():
    return sys.argv[1] if len(sys.argv) > 1 else "tools/bench_fused_kernel.json"


if __name__ == "__main__":
    main()
