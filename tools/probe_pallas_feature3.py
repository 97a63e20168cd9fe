"""Round 3 bisect: is it the jit wrapper, the pads, or the XLA-side
weight multiply feeding the kernel?"""
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

NB, D, B = 256, 128, 4
results = []
rng = np.random.default_rng(0)


def case(name):
    def deco(fn):
        entry = {"case": name}
        try:
            jax.block_until_ready(fn())
            entry["ok"] = True
        except Exception as exc:  # noqa: BLE001
            entry["ok"] = False
            entry["error"] = repr(exc)[:160]
        results.append(entry)
        print(json.dumps(entry), flush=True)
        return fn
    return deco


def make_kernel(ET):
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
    return k


def call_kernel(rel3, msg4, ET):
    return pl.pallas_call(
        make_kernel(ET),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, ET, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, ET, 128, D), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, NB, D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, NB, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((NB, D), jnp.float32)],
    )(rel3, msg4)


ET = 24
msg = jnp.asarray(
    rng.normal(size=(B, ET, 128, D)).astype(np.float32), jnp.bfloat16
)
rel = jnp.asarray(rng.integers(0, NB, size=(B, ET, 128)).astype(np.int32))


@case("9_eager_baseline")
def _():
    return call_kernel(rel, msg, ET)


@case("10_under_jit")
def _():
    return jax.jit(lambda r, m: call_kernel(r, m, ET))(rel, msg)


@case("11_jit_with_pad")
def _():
    ET2 = ET + 8
    @jax.jit
    def f(r, m):
        r = jnp.pad(r, ((0, 0), (0, 8), (0, 0)), constant_values=NB)
        m = jnp.pad(m, ((0, 0), (0, 8), (0, 0), (0, 0)))
        return call_kernel(r, m, ET2)
    return f(rel, msg)


@case("12_jit_with_xla_weight_mult")
def _():
    w = jnp.ones((B, ET, 128), jnp.bfloat16)
    @jax.jit
    def f(r, m, w):
        m = m * w[..., None]
        return call_kernel(r, m, ET)
    return f(rel, msg, w)


@case("13_jit_static_args_partial")
def _():
    @functools.partial(jax.jit, static_argnames=("ET",))
    def f(r, m, ET):
        return call_kernel(r, m, ET)
    return f(rel, msg, ET=ET)


@case("14_production_slot_reduce_pre1024")
def _():
    # production wrapper but tile_e already a multiple of 1024 (no pads)
    from bridged_gnn_tpu.ops import blocked_segment as bs
    from bridged_gnn_tpu.ops import pallas_padded as pp

    n_pad, e = 1024, 8192
    s = rng.integers(0, n_pad, size=e).astype(np.int32)
    r = np.sort(rng.integers(0, n_pad, size=e)).astype(np.int32)
    em = np.ones(e, dtype=bool)
    lay = bs.build_padded_layout(r, s, np.arange(e), em, n_pad, 256)
    # rebuild with tile forced to 1024 multiple
    arrs = bs._padded_layout_np(
        r, s, np.arange(e), em, n_pad, 256,
        min_tile_e=((lay.tile_e + 1023) // 1024) * 1024,
    )
    lay = bs._layout_from_np(arrs, n_pad, 256)
    x = jnp.asarray(
        rng.normal(size=(n_pad, 128)).astype(np.float32), jnp.bfloat16
    )
    return pp.slot_reduce_pallas(lay, x[lay.other_slot])


with open("tools/probe_pallas_feature3.json", "w") as f:
    json.dump(results, f, indent=1)
