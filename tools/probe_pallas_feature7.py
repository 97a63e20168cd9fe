"""Round 7: is functools.partial-wrapped kernel the remote-crash trigger?"""
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


rel = jnp.asarray(rng.integers(0, NB, size=(B, ET, 128)).astype(np.int32))
vals = jnp.asarray(
    rng.normal(size=(B, ET, 128, D)).astype(np.float32), jnp.bfloat16
)


def kernel_kw(rel_ref, msg_ref, out_ref, acc, *, node_block):
    et128 = rel_ref.shape[1]
    acc[...] = jnp.zeros_like(acc)
    rows = jax.lax.broadcasted_iota(jnp.int32, (node_block, 128), 0)

    def body(ci, _):
        rel_c = rel_ref[0, pl.ds(ci, 1)]
        oh = (rows == rel_c).astype(msg_ref.dtype)
        msg_c = msg_ref[0, pl.ds(ci, 1)][0]
        acc[...] += jax.lax.dot(
            oh, msg_c, preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, et128, body, 0)
    out_ref[0] = acc[...]


def run(kern):
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, ET, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, ET, 128, D), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, NB, D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, NB, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((NB, D), jnp.float32)],
    )(rel, vals)


@case("23_partial_wrapped")
def _():
    return run(functools.partial(kernel_kw, node_block=NB))


@case("24_same_kernel_closure")
def _():
    def k(rel_ref, msg_ref, out_ref, acc):
        return kernel_kw(rel_ref, msg_ref, out_ref, acc, node_block=NB)
    return run(k)


@case("25_et128_from_ref_shape")
def _():
    # identical to 24 but confirms reading shape inside body is fine
    def k(rel_ref, msg_ref, out_ref, acc):
        kernel_kw(rel_ref, msg_ref, out_ref, acc, node_block=NB)
    return run(k)


with open("tools/probe_pallas_feature7.json", "w") as f:
    json.dump(results, f, indent=1)
