"""Branch-selected fused attention vs the concatenated form, on-chip at
bench scale (131k / 2M / 128 bf16) — VERDICT r4 #4.

Rows: fwd + fwd+bwd for (a) concatenated Mosaic kernel (the round-4
production path: 16.1 ms fwd / 54.0 ms fwd+bwd), (b) selective Mosaic
kernel, (c) selective XLA custom-VJP, plus parity errors.

Usage: python tools/bench_fused_sel.py [out.json]
"""
import json
import os
import sys
import time

import numpy as np

repo = __file__.rsplit("/", 2)[0]
sys.path.insert(0, repo)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bridged_gnn_tpu.ops.blocked_segment import make_blocked_ops  # noqa: E402
from bridged_gnn_tpu.ops.fused_attention import (  # noqa: E402
    make_adapted_attention,
    make_adapted_attention_sel,
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


def _path():
    return (sys.argv[1] if len(sys.argv) > 1
            else os.path.join(repo, "results_fused_sel_tpu.json"))


def main():
    out = {"backend": jax.default_backend(), "N": N, "E": E, "D": D}
    print(json.dumps(out), flush=True)
    rng = np.random.default_rng(0)
    s = rng.integers(0, N, size=E).astype(np.int32)
    r = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    em = np.ones(E, bool)
    nb_k = int(os.environ.get("BGNN_KERNEL_NB", "128"))
    t0 = time.perf_counter()
    ops_k = make_blocked_ops(s, r, em, N, node_block=nb_k)
    out["build_s"] = round(time.perf_counter() - t0, 2)
    out["kernel_nb"] = nb_k
    out["kernel_tile_e"] = ops_k.lay_dst.tile_e

    u1 = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32),
                     jnp.bfloat16)
    u2 = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32),
                     jnp.bfloat16)
    a1 = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
    a2 = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
    central = jnp.asarray((rng.random(N) < 0.5).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32),
                      jnp.bfloat16)

    variants = {}
    if nb_k <= 128:
        # the concatenated kernel at nb=256/Et~4352/2D overflows the
        # remote Mosaic compile helper and WEDGES it (probe_bwd_vmem
        # envelope) — never submit it above nb=128
        variants["concat_kernel"] = make_adapted_attention(
            ops_k, 0.1, kernel_fwd=True, kernel_bwd=True)
    variants.update({
        "sel_kernel": make_adapted_attention_sel(
            ops_k, 0.1, kernel_fwd=True, kernel_bwd=True),
        "sel_xla": make_adapted_attention_sel(ops_k, 0.1),
    })
    fns = {
        name: jax.jit(lambda u1, u2, fn=fn: fn(
            u1, u2, u1, u2, central, a1, a2))
        for name, fn in variants.items()
    }
    ref = None
    for name, f in fns.items():
        try:
            o = np.asarray(f(u1, u2), np.float32)
            if name == "concat_kernel":
                ref = o
            elif ref is not None:
                out[f"{name}_fwd_max_abs_err_vs_concat"] = float(
                    np.abs(o - ref).max())
            out[f"{name}_fwd_ms"] = round(timeit(f, u1, u2), 3)
        except Exception as exc:  # noqa: BLE001
            out[f"{name}_fwd_error"] = repr(exc)[:300]
        print(json.dumps(out), flush=True)
        with open(_path(), "w") as fo:
            json.dump(out, fo, indent=1)
            fo.write("\n")

    grads = {}
    for name, fn in variants.items():
        def loss(u1, u2, a1_, a2_, fn=fn):
            return jnp.sum(
                fn(u1, u2, u1, u2, central, a1_, a2_).astype(jnp.float32)
                * cot.astype(jnp.float32))

        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
        try:
            got = g(u1, u2, a1, a2)
            jax.block_until_ready(got)
            grads[name] = [np.asarray(x, np.float32) for x in got]
            if "concat_kernel" in grads and name != "concat_kernel":
                out[f"{name}_bwd_max_rel_errs"] = [
                    round(float(np.abs(a - b).max()
                                / max(np.abs(b).max(), 1e-9)), 5)
                    for a, b in zip(grads[name], grads["concat_kernel"])
                ]
            out[f"{name}_fwdbwd_ms"] = round(
                timeit(lambda *a: g(*a), u1, u2, a1, a2), 3)
        except Exception as exc:  # noqa: BLE001
            out[f"{name}_fwdbwd_error"] = repr(exc)[:300]
        print(json.dumps(out), flush=True)
        with open(_path(), "w") as fo:
            json.dump(out, fo, indent=1)
            fo.write("\n")
    print("wrote", _path())


if __name__ == "__main__":
    main()
