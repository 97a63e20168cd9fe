"""Round 5 bisect: input reshapes / output slice / sentinel rel values."""
import functools
import json
import sys

import numpy as np

repo = __file__.rsplit("/", 2)[0]
sys.path.insert(0, repo)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

NB, D, B, ET = 256, 128, 4, 24
Et = ET * 128
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


def kernel(rel_ref, msg_ref, out_ref, acc):
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


def call_kernel(rel3, msg4):
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, ET, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, ET, 128, D), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, NB, D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, NB, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((NB, D), jnp.float32)],
    )(rel3, msg4)


rel_ok = jnp.asarray(rng.integers(0, NB, size=(B, Et)).astype(np.int32))
rel_sent = jnp.asarray(
    rng.integers(0, NB + 1, size=(B, Et)).astype(np.int32)
)
vals = jnp.asarray(
    rng.normal(size=(B, Et, D)).astype(np.float32), jnp.bfloat16
)


@case("17_input_reshapes_in_jit")
def _():
    @jax.jit
    def f(r, m):
        return call_kernel(
            r.reshape(B, ET, 128), m.reshape(B, ET, 128, D)
        )
    return f(rel_ok, vals)


@case("18_output_reshape_slice")
def _():
    @jax.jit
    def f(r, m):
        out = call_kernel(
            r.reshape(B, ET, 128), m.reshape(B, ET, 128, D)
        )
        return out.reshape(B * NB, D)[: B * NB - 8]
    return f(rel_ok, vals)


@case("19_sentinel_rel_values")
def _():
    @jax.jit
    def f(r, m):
        return call_kernel(
            r.reshape(B, ET, 128), m.reshape(B, ET, 128, D)
        )
    return f(rel_sent, vals)


@case("20_static_argnames_jit")
def _():
    @functools.partial(
        jax.jit, static_argnames=("node_block", "num_nodes_padded",
                                  "interpret")
    )
    def f(r, m, node_block, num_nodes_padded, interpret=False):
        out = call_kernel(
            r.reshape(B, ET, 128), m.reshape(B, ET, 128, D)
        )
        return out.reshape(B * NB, D)[:num_nodes_padded]
    return f(rel_sent, vals, NB, B * NB, interpret=False)


with open("tools/probe_pallas_feature5.json", "w") as f:
    json.dump(results, f, indent=1)
