"""Map the Mosaic fused-attention kernel envelope: backward failure
point + D != 128 and f32 coverage (VERDICT r2 item 3).

Round 2 probed the FORWARD kernel's VMEM envelope (nb=256/Et=4352/D=128
bf16 fails, nb=128/Et=2176 compiles) but gated the backward at a guessed
75% of the forward budget. This probe compiles+runs the fwd kernel, the
full fwd+bwd custom VJP (kernel_bwd=True), and an XLA-path parity check
over a grid of (nb, D, dtype, Et), walking Et up until each path fails.
Failures surface as catchable MosaicError HTTP-500s from the remote
compile helper (probe_pallas_size.json precedent).

Each block gets exactly `et` valid edges so tile_e is controlled.

Usage: nohup python tools/probe_bwd_vmem.py > tools/probe_bwd_vmem.log 2>&1 &
Writes tools/probe_bwd_vmem.json incrementally.
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

OUT = repo + "/tools/probe_bwd_vmem.json"
res = {"platform": jax.devices()[0].platform, "cases": []}
rng = np.random.default_rng(0)

B = 8  # number of dst blocks — VMEM envelope is per grid step, B is HBM


def build(nb, et):
    """Layout with exactly `et` valid edges per dst block."""
    n = B * nb
    r = np.repeat(np.arange(B) * nb, et) + np.tile(
        np.arange(et) % nb, B
    )
    r = np.sort(r).astype(np.int32)
    s = rng.integers(0, n, size=B * et).astype(np.int32)
    em = np.ones(B * et, bool)
    return make_blocked_ops(s, r, em, n, node_block=nb), n


def run_case(nb, d, dtype, et):
    case = {"nb": nb, "d": d, "dtype": dtype, "et_req": et}
    ops, n = build(nb, et)
    lay = ops.lay_dst
    case["tile_e"] = lay.tile_e
    jdt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
    u1 = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32), jdt)
    u2 = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32), jdt)
    a1 = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    a2 = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    central_f = jnp.asarray((rng.random(n) < 0.5).astype(np.float32))
    central_b = central_f > 0.5
    cot = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32), jdt)

    # XLA oracle (forward + grads) for parity
    def xla_fn(u1, u2):
        return adapted_attention(
            ops, u1, u2, central_b,
            lambda h: (h @ a1.astype(h.dtype))[..., None],
            lambda h: (h @ a2.astype(h.dtype))[..., None],
            negative_slope=0.1,
        )

    want = np.asarray(jax.jit(xla_fn)(u1, u2), np.float32)
    scale = np.abs(want).max() + 1e-6

    # fwd kernel
    t0 = time.perf_counter()
    try:
        kf = make_adapted_attention(ops, 0.1, kernel_fwd=True)
        got = np.asarray(
            jax.jit(lambda a, b: kf(a, b, a, b, central_f, a1, a2))(u1, u2),
            np.float32,
        )
        case["fwd_ok"] = True
        case["fwd_rel_err"] = float(np.abs(got - want).max() / scale)
    except Exception as exc:  # noqa: BLE001
        case["fwd_ok"] = False
        case["fwd_error"] = repr(exc)[:140]
    case["fwd_s"] = round(time.perf_counter() - t0, 1)
    if not case["fwd_ok"]:
        return case

    # fwd+bwd kernels (full custom VJP)
    def loss_k(fn):
        def f(u1, u2, a1, a2):
            o = fn(u1, u2, u1, u2, central_f, a1, a2)
            return jnp.sum(o.astype(jnp.float32) * cot.astype(jnp.float32))
        return f

    gw = jax.jit(jax.grad(loss_k(
        make_adapted_attention(ops, 0.1)), argnums=(0, 1, 2, 3)))(
        u1, u2, a1, a2)
    t0 = time.perf_counter()
    try:
        kb = make_adapted_attention(ops, 0.1, kernel_fwd=True,
                                    kernel_bwd=True)
        gk = jax.jit(jax.grad(loss_k(kb), argnums=(0, 1, 2, 3)))(
            u1, u2, a1, a2)
        errs = [
            float(np.abs(np.asarray(a, np.float32)
                         - np.asarray(b, np.float32)).max()
                  / (np.abs(np.asarray(b, np.float32)).max() + 1e-6))
            for a, b in zip(gk, gw)
        ]
        case["bwd_ok"] = True
        case["bwd_rel_err"] = max(errs)
    except Exception as exc:  # noqa: BLE001
        case["bwd_ok"] = False
        case["bwd_error"] = repr(exc)[:140]
    case["bwd_s"] = round(time.perf_counter() - t0, 1)
    return case


ET_LADDER = [512, 1024, 1536, 2176, 2560, 3072, 3584, 4352, 5120]

GRID = [
    # production layout first: nb=128 bf16 across feature widths
    (128, 64, "bf16"), (128, 128, "bf16"), (128, 256, "bf16"),
    # f32 halves admissible Et per the fwd model — measure it
    (128, 64, "f32"), (128, 128, "f32"), (128, 256, "f32"),
    # nb=256 reference points (fwd envelope known at D=128 bf16)
    (256, 128, "bf16"), (256, 128, "f32"),
]

for nb, d, dtype in GRID:
    fwd_dead = False
    for et in ET_LADDER:
        if fwd_dead:
            break
        case = run_case(nb, d, dtype, et)
        res["cases"].append(case)
        print(json.dumps(case), flush=True)
        with open(OUT, "w") as f:
            json.dump(res, f, indent=1)
        if not case.get("fwd_ok"):
            fwd_dead = True
        elif case.get("bwd_ok") is False:
            # keep walking fwd-only two more steps to find its edge
            nxt = [e for e in ET_LADDER if e > et][:2]
            for e2 in nxt:
                c2 = run_case(nb, d, dtype, e2)
                res["cases"].append(c2)
                print(json.dumps(c2), flush=True)
                with open(OUT, "w") as f:
                    json.dump(res, f, indent=1)
                if not c2.get("fwd_ok"):
                    break
            fwd_dead = True

print("done")
