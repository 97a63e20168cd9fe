"""Round 6: call the REAL _reduce_kernel/_slot_reduce_call with
increasing fidelity to find the remaining delta."""
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

from bridged_gnn_tpu.ops import pallas_padded as pp  # noqa: E402

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
            entry["error"] = repr(exc)[:200]
        results.append(entry)
        print(json.dumps(entry), flush=True)
        return fn
    return deco


rel = jnp.asarray(rng.integers(0, NB, size=(B, Et)).astype(np.int32))
vals = jnp.asarray(
    rng.normal(size=(B, Et, D)).astype(np.float32), jnp.bfloat16
)


@case("21_real_kernel_partial_interp_kwarg")
def _():
    out = pl.pallas_call(
        functools.partial(pp._reduce_kernel, node_block=NB),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, ET, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, ET, 128, D), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, NB, D), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, NB, D), jnp.float32),
        scratch_shapes=[pltpu.VMEM((NB, D), jnp.float32)],
        interpret=False,
    )(rel.reshape(B, ET, 128), vals.reshape(B, ET, 128, D))
    return out


@case("22_real_slot_reduce_call")
def _():
    return pp._slot_reduce_call(rel, vals, NB, B * NB)


with open("tools/probe_pallas_feature6.json", "w") as f:
    json.dump(results, f, indent=1)
