"""Probe restructurings of the eval-mode pair-MLP score sweep
(VERDICT r2 weak-8: sim_mode=mlp is the default stage-1 head and its
bridge sweep runs at 3.0 Gpairs/s vs 12.3 cosine / 161 matmul ceiling).

score(i,j) = sigmoid(w2 · relu(a[i] + b[j] + bias) + b2)   H=128

The per-pair relu makes the H-contraction non-factorable, so O(P·H)
elementwise work is irreducible; the variants differ in WHERE the
reduce runs (VPU loop fusion vs MXU dot) and the elementwise dtype:

  A einsum      current form: relu[B,C,H] -> einsum('bch,h->bc')
  B dot2d       relu reshaped [B*C, H] @ w2[:,None] (explicit MXU dot)
  C bf16        A with bf16 elementwise + f32-accum dot
  D chunked     H processed in chunks with running [B, C] accumulator
                (smaller live intermediate; XLA may fuse tighter)
  E relu-decomp w2·relu(x) = w2·x - w2·min(x, 0):
                the linear term is rank-1 (w2·a_i + w2·b_j, O(P)); only
                the min() term needs per-pair-H work, same elementwise
                count (no win expected; recorded to close the idea)

Each scores a [512, 49152] block against H=128, k irrelevant (no topk —
this isolates scoring; the production sweep adds approx_max_k).

Usage: python tools/probe_mlp_score.py [out.json]
"""
import json
import sys
import time

import numpy as np

repo = __file__.rsplit("/", 2)[0]
sys.path.insert(0, repo)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B = 512
C = 49152
H = 128
ITERS = 30

rng = np.random.default_rng(0)
a = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
b = jnp.asarray(rng.normal(size=(C, H)).astype(np.float32))
bias = jnp.asarray(rng.normal(size=(H,)).astype(np.float32))
w2 = jnp.asarray(rng.normal(size=(H,)).astype(np.float32))
b2 = jnp.float32(0.3)

DOT = dict(preferred_element_type=jnp.float32)


def v_einsum(a, b):
    h = jax.nn.relu(a[:, None, :] + b[None, :, :] + bias)
    return jax.nn.sigmoid(jnp.einsum("bch,h->bc", h, w2) + b2)


def v_dot2d(a, b):
    h = jax.nn.relu(a[:, None, :] + b[None, :, :] + bias)
    lg = jax.lax.dot_general(
        h.reshape(B * C, H), w2[:, None], (((1,), (0,)), ((), ())), **DOT
    )
    return jax.nn.sigmoid(lg.reshape(B, C) + b2)


def v_bf16(a, b):
    ab = (a + bias).astype(jnp.bfloat16)
    bb = b.astype(jnp.bfloat16)
    h = jax.nn.relu(ab[:, None, :] + bb[None, :, :])
    lg = jax.lax.dot_general(
        h.reshape(B * C, H), w2.astype(jnp.bfloat16)[:, None],
        (((1,), (0,)), ((), ())), **DOT,
    )
    return jax.nn.sigmoid(lg.reshape(B, C) + b2)


def v_chunked(a, b, hc=32):
    acc = jnp.zeros((B, C), jnp.float32)
    for s in range(0, H, hc):
        h = jax.nn.relu(
            a[:, None, s:s + hc] + b[None, :, s:s + hc] + bias[s:s + hc]
        )
        acc = acc + jnp.einsum("bch,h->bc", h, w2[s:s + hc])
    return jax.nn.sigmoid(acc + b2)


def v_reludecomp(a, b):
    lin = ((a + bias) @ w2)[:, None] + (b @ w2)[None, :]
    neg = jnp.minimum(a[:, None, :] + b[None, :, :] + bias, 0.0)
    lg = lin - jnp.einsum("bch,h->bc", neg, w2)
    return jax.nn.sigmoid(lg + b2)


def bench(fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    return dt, out


def main():
    out_path = (sys.argv[1] if len(sys.argv) > 1
                else repo + "/tools/probe_mlp_score.json")
    res = {"B": B, "C": C, "H": H,
           "platform": jax.devices()[0].platform, "variants": {}}
    t_ref, want = bench(v_einsum, a, b)
    want = np.asarray(want, np.float32)
    res["variants"]["einsum"] = {
        "ms": round(t_ref * 1e3, 2),
        "gpairs_s": round(B * C / t_ref / 1e9, 2),
    }
    for name, fn in (("dot2d", v_dot2d), ("bf16", v_bf16),
                     ("chunked", v_chunked), ("reludecomp", v_reludecomp)):
        try:
            t, got = bench(fn, a, b)
            err = float(np.abs(np.asarray(got, np.float32) - want).max())
            res["variants"][name] = {
                "ms": round(t * 1e3, 2),
                "gpairs_s": round(B * C / t / 1e9, 2),
                "max_abs_err": err,
                "speedup": round(t_ref / t, 2),
            }
        except Exception as exc:  # noqa: BLE001
            res["variants"][name] = {"error": repr(exc)[:140]}
        print(name, res["variants"][name], flush=True)

    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
        f.write("\n")
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
