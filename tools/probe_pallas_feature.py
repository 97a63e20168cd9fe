"""Bisect which Pallas kernel feature crashes the remote Mosaic compiler.

probe_pallas.py's trivial kernels compile; the padded-reduce kernel gets
HTTP 500 from the compile helper at every size. Try one feature at a
time on tiny shapes. Each case is independent and wrapped; order goes
simplest -> closest to the production kernel.

Usage: nohup python tools/probe_pallas_feature.py > tools/probe_pallas_feature.log 2>&1 &
"""

import json
import sys

import numpy as np

repo = __file__.rsplit("/", 2)[0]
sys.path.insert(0, repo)

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

NB, ET128, D, B = 256, 8, 128, 4
results = []


def case(name):
    def deco(fn):
        entry = {"case": name}
        try:
            out = fn()
            jax.block_until_ready(out)
            entry["ok"] = True
        except Exception as exc:  # noqa: BLE001
            entry["ok"] = False
            entry["error"] = repr(exc)[:160]
        results.append(entry)
        print(json.dumps(entry), flush=True)
        return fn
    return deco


rng = np.random.default_rng(0)
msg = jnp.asarray(
    rng.normal(size=(B, ET128, 128, D)).astype(np.float32), jnp.bfloat16
)
rel = jnp.asarray(
    rng.integers(0, NB, size=(B, ET128, 128)).astype(np.int32)
)
w = jnp.ones((B, ET128, 128), jnp.bfloat16)


@case("1_grid_dot_no_loop")
def _():
    # one [NB, 128] x [128, D] dot per grid step, no scratch, no loop
    def k(rel_ref, msg_ref, out_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (NB, 128), 0)
        oh = (rows == rel_ref[0, 0:1]).astype(msg_ref.dtype)
        out_ref[0] = jax.lax.dot(
            oh, msg_ref[0, 0], preferred_element_type=jnp.float32
        )

    return pl.pallas_call(
        k,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, ET128, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, ET128, 128, D), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, NB, D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, NB, D), jnp.float32),
    )(rel, msg)


@case("2_plus_scratch")
def _():
    def k(rel_ref, msg_ref, out_ref, acc):
        rows = jax.lax.broadcasted_iota(jnp.int32, (NB, 128), 0)
        acc[...] = jnp.zeros_like(acc)
        oh = (rows == rel_ref[0, 0:1]).astype(msg_ref.dtype)
        acc[...] += jax.lax.dot(
            oh, msg_ref[0, 0], preferred_element_type=jnp.float32
        )
        out_ref[0] = acc[...]

    return pl.pallas_call(
        k,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, ET128, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, ET128, 128, D), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, NB, D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, NB, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((NB, D), jnp.float32)],
    )(rel, msg)


@case("3_plus_static_loop")
def _():
    # python loop (unrolled), static ref indices
    def k(rel_ref, msg_ref, out_ref, acc):
        rows = jax.lax.broadcasted_iota(jnp.int32, (NB, 128), 0)
        acc[...] = jnp.zeros_like(acc)
        for ci in range(ET128):
            oh = (rows == rel_ref[0, ci:ci + 1]).astype(msg_ref.dtype)
            acc[...] += jax.lax.dot(
                oh, msg_ref[0, ci], preferred_element_type=jnp.float32
            )
        out_ref[0] = acc[...]

    return pl.pallas_call(
        k,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, ET128, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, ET128, 128, D), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, NB, D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, NB, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((NB, D), jnp.float32)],
    )(rel, msg)


@case("4_plus_fori_dynamic_ds")
def _():
    # the production kernel shape: fori_loop + pl.ds dynamic slices
    def k(rel_ref, msg_ref, out_ref, acc):
        rows = jax.lax.broadcasted_iota(jnp.int32, (NB, 128), 0)
        acc[...] = jnp.zeros_like(acc)

        def body(ci, _):
            oh = (rows == rel_ref[0, pl.ds(ci, 1)]).astype(msg_ref.dtype)
            acc[...] += jax.lax.dot(
                oh, msg_ref[0, pl.ds(ci, 1)][0],
                preferred_element_type=jnp.float32,
            )
            return 0

        jax.lax.fori_loop(0, ET128, body, 0)
        out_ref[0] = acc[...]

    return pl.pallas_call(
        k,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, ET128, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, ET128, 128, D), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, NB, D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, NB, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((NB, D), jnp.float32)],
    )(rel, msg)


def _case5_delayed():
    pass


@case("5_production_wrapper")
def _():
    from bridged_gnn_tpu.ops import blocked_segment as bs
    from bridged_gnn_tpu.ops import pallas_padded as pp

    n_pad, e = 1024, 8192
    s = rng.integers(0, n_pad, size=e).astype(np.int32)
    r = np.sort(rng.integers(0, n_pad, size=e)).astype(np.int32)
    em = np.ones(e, dtype=bool)
    lay = bs.build_padded_layout(r, s, np.arange(e), em, n_pad, 256)
    x = jnp.asarray(
        rng.normal(size=(n_pad, 128)).astype(np.float32), jnp.bfloat16
    )
    return pp.slot_reduce_pallas(lay, x[lay.other_slot])


with open("tools/probe_pallas_feature.json", "w") as f:
    json.dump(results, f, indent=1)


@case("6_with_w_multiply")
def _():
    def k(rel_ref, w_ref, msg_ref, out_ref, acc):
        rows = jax.lax.broadcasted_iota(jnp.int32, (NB, 128), 0)
        acc[...] = jnp.zeros_like(acc)

        def body(ci, _):
            oh = (rows == rel_ref[0, pl.ds(ci, 1)]).astype(msg_ref.dtype)
            oh = oh * w_ref[0, pl.ds(ci, 1)].astype(msg_ref.dtype)
            acc[...] += jax.lax.dot(
                oh, msg_ref[0, pl.ds(ci, 1)][0],
                preferred_element_type=jnp.float32,
            )
            return 0

        jax.lax.fori_loop(0, ET128, body, 0)
        out_ref[0] = acc[...]

    return pl.pallas_call(
        k,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, ET128, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, ET128, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, ET128, 128, D), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, NB, D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, NB, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((NB, D), jnp.float32)],
    )(rel, w, msg)


@case("7_et128_24")
def _():
    ET = 24
    msg24 = jnp.asarray(
        rng.normal(size=(B, ET, 128, D)).astype(np.float32), jnp.bfloat16
    )
    rel24 = jnp.asarray(
        rng.integers(0, NB, size=(B, ET, 128)).astype(np.int32)
    )

    def k(rel_ref, msg_ref, out_ref, acc):
        rows = jax.lax.broadcasted_iota(jnp.int32, (NB, 128), 0)
        acc[...] = jnp.zeros_like(acc)

        def body(ci, _):
            oh = (rows == rel_ref[0, pl.ds(ci, 1)]).astype(msg_ref.dtype)
            acc[...] += jax.lax.dot(
                oh, msg_ref[0, pl.ds(ci, 1)][0],
                preferred_element_type=jnp.float32,
            )
            return 0

        jax.lax.fori_loop(0, ET, body, 0)
        out_ref[0] = acc[...]

    return pl.pallas_call(
        k,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, ET, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, ET, 128, D), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, NB, D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, NB, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((NB, D), jnp.float32)],
    )(rel24, msg24)


@case("8_inside_jit_with_pads")
def _():
    @jax.jit
    def f(rel, w, msg):
        rel = jnp.pad(rel, ((0, 0), (0, 2), (0, 0)), constant_values=NB)
        w = jnp.pad(w, ((0, 0), (0, 2), (0, 0)))
        msg = jnp.pad(msg, ((0, 0), (0, 2), (0, 0), (0, 0)))
        ET = ET128 + 2

        def k(rel_ref, w_ref, msg_ref, out_ref, acc):
            rows = jax.lax.broadcasted_iota(jnp.int32, (NB, 128), 0)
            acc[...] = jnp.zeros_like(acc)

            def body(ci, _):
                oh = (rows == rel_ref[0, pl.ds(ci, 1)]).astype(
                    msg_ref.dtype
                )
                oh = oh * w_ref[0, pl.ds(ci, 1)].astype(msg_ref.dtype)
                acc[...] += jax.lax.dot(
                    oh, msg_ref[0, pl.ds(ci, 1)][0],
                    preferred_element_type=jnp.float32,
                )
                return 0

            jax.lax.fori_loop(0, ET, body, 0)
            out_ref[0] = acc[...]

        return pl.pallas_call(
            k,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, ET, 128), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, ET, 128), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, ET, 128, D), lambda b: (b, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, NB, D), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, NB, D), jnp.float32),
            scratch_shapes=[pltpu.VMEM((NB, D), jnp.float32)],
        )(rel, w, msg)

    return f(rel, w, msg)
