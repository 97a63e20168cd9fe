"""Probe: replace the fori_loop-of-[nb,128]x[128,D]-dots reduce kernel
(9.6 ms at bench scale — pipeline-drain-bound) with ONE [nb,Et]x[Et,D]
MXU dot per block. Two one-hot build strategies:

  A. flat: rel block [1, Et]; oh = (iota(nb,Et) == rel) in one compare.
  B. chunked scratch: static-unrolled 128-wide compares stored into a
     VMEM (nb, Et) scratch, then the single big dot.

Run each for correctness at toy scale, then time the winner(s) at bench
scale (131k nodes / 2M edges / D=128 bf16) against the XLA batched
dot_general reduce and the existing chunked Pallas kernel.

Usage: python tools/probe_pallas_bigdot.py [out.json]
"""
import functools
import json
import sys
import time

import numpy as np

repo = __file__.rsplit("/", 2)[0]
sys.path.insert(0, repo)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from bridged_gnn_tpu.ops import blocked_segment as bs  # noqa: E402
from bridged_gnn_tpu.ops import pallas_padded as pp  # noqa: E402

results = []


def case(name, fn):
    entry = {"case": name}
    try:
        out = fn()
        jax.block_until_ready(out)
        entry["ok"] = True
        entry["out"] = out
    except Exception as exc:  # noqa: BLE001
        entry["ok"] = False
        entry["error"] = repr(exc)[:200]
    rec = {k: v for k, v in entry.items() if k != "out"}
    results.append(rec)
    print(json.dumps(rec), flush=True)
    return entry


# ---- kernel A: flat one-hot, one dot -------------------------------------

def _kernel_flat(rel_ref, msg_ref, out_ref, *, node_block):
    nb = node_block
    et = msg_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, et), 0)
    oh = (rows == rel_ref[...]).astype(msg_ref.dtype)  # [1,Et] bcast
    out_ref[0] = jax.lax.dot(
        oh, msg_ref[0], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


@functools.partial(jax.jit, static_argnames=("node_block", "n_keep"))
def reduce_flat(rel, vals, node_block, n_keep):
    B, Et, d = vals.shape
    out = pl.pallas_call(
        functools.partial(_kernel_flat, node_block=node_block),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Et), lambda b: (b, 0)),
            pl.BlockSpec((1, Et, d), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, node_block, d), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, node_block, d), jnp.float32),
    )(rel, vals)
    return out.reshape(B * node_block, d)[:n_keep]


# ---- kernel B: chunked one-hot into scratch, one dot ---------------------

def _kernel_chunk(rel_ref, msg_ref, out_ref, oh, *, node_block):
    nb = node_block
    et128 = rel_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, 128), 0)
    for ci in range(et128):  # static unroll
        oh[:, ci * 128:(ci + 1) * 128] = (
            rows == rel_ref[0, ci:ci + 1]
        ).astype(oh.dtype)
    out_ref[0] = jax.lax.dot(
        oh[...], msg_ref[0], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


@functools.partial(jax.jit, static_argnames=("node_block", "n_keep"))
def reduce_chunk(rel, vals, node_block, n_keep):
    B, Et, d = vals.shape
    et128 = Et // 128
    out = pl.pallas_call(
        functools.partial(_kernel_chunk, node_block=node_block),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, et128, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Et, d), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, node_block, d), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, node_block, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((node_block, Et), vals.dtype)],
    )(rel.reshape(B, et128, 128), vals)
    return out.reshape(B * node_block, d)[:n_keep]


def timeit(f, *args, iters=10):
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    # toy correctness
    NB, D, B, ET = 256, 128, 8, 1024
    rel = rng.integers(0, NB + 1, size=(B, ET)).astype(np.int32)
    vals = rng.normal(size=(B, ET, D)).astype(np.float32)
    valsb = jnp.asarray(vals, jnp.bfloat16)
    relj = jnp.asarray(rel)
    # reference: manual one-hot reduce in numpy (f32)
    want = np.zeros((B * NB, D), np.float32)
    vb = np.asarray(valsb, np.float32)
    for b in range(B):
        for e in range(ET):
            k = rel[b, e]
            if k < NB:
                want[b * NB + k] += vb[b, e]

    ca = case("A_flat_toy", lambda: reduce_flat(relj, valsb, NB, B * NB))
    if ca["ok"]:
        err = float(np.abs(np.asarray(ca["out"]) - want).max())
        print("A err", err, flush=True)
        results[-1]["max_err"] = err
    cb = case("B_chunk_toy", lambda: reduce_chunk(relj, valsb, NB, B * NB))
    if cb["ok"]:
        err = float(np.abs(np.asarray(cb["out"]) - want).max())
        print("B err", err, flush=True)
        results[-1]["max_err"] = err

    # bench scale
    N, E, D = 131_072, 2_097_152, 128
    s = rng.integers(0, N, size=E).astype(np.int32)
    r = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    lay = bs.build_padded_layout(
        r, s, np.arange(E), np.ones(E, bool), N, 256
    )
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32), jnp.bfloat16)
    vals_full = x[lay.other_slot].reshape(lay.num_blocks, lay.tile_e, D)
    relb = lay.rel_key
    print(
        json.dumps({"tile_e": lay.tile_e, "num_blocks": lay.num_blocks}),
        flush=True,
    )
    want = np.asarray(bs.padded_gather_reduce(lay, x), np.float32)

    for name, fn in (("A_flat", reduce_flat), ("B_chunk", reduce_chunk)):
        c = case(
            f"{name}_bench",
            lambda fn=fn: fn(relb, vals_full, 256, N),
        )
        if c["ok"]:
            err = float(np.abs(np.asarray(c["out"], np.float32) - want).max())
            ms = timeit(lambda fn=fn: fn(relb, vals_full, 256, N))
            results[-1].update(max_err=err, ms=round(ms, 3))
            print(json.dumps(results[-1]), flush=True)

    # baselines at the same scale
    ms_xla = timeit(
        jax.jit(lambda v: bs.padded_slot_reduce(lay, v)), vals_full
    )
    results.append({"case": "xla_reduce", "ms": round(ms_xla, 3)})
    print(json.dumps(results[-1]), flush=True)
    try:
        ms_old = timeit(
            jax.jit(lambda v: pp.slot_reduce_pallas(lay, v)), vals_full
        )
        results.append({"case": "pallas_chunked_old", "ms": round(ms_old, 3)})
    except Exception as exc:  # noqa: BLE001
        results.append({"case": "pallas_chunked_old", "error": repr(exc)[:200]})
    print(json.dumps(results[-1]), flush=True)

    out_path = sys.argv[1] if len(sys.argv) > 1 else "tools/probe_pallas_bigdot.json"
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
