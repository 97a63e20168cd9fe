"""Round 4 bisect: direct _slot_reduce_call vs gather-fed operands."""
import json
import sys

import numpy as np

repo = __file__.rsplit("/", 2)[0]
sys.path.insert(0, repo)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

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
            entry["error"] = repr(exc)[:160]
        results.append(entry)
        print(json.dumps(entry), flush=True)
        return fn
    return deco


rel2 = jnp.asarray(
    rng.integers(0, NB + 1, size=(B, Et)).astype(np.int32)
)
vals3 = jnp.asarray(
    rng.normal(size=(B, Et, D)).astype(np.float32), jnp.bfloat16
)


@case("15_direct_slot_reduce_call")
def _():
    return pp._slot_reduce_call(rel2, vals3, NB, B * NB)


@case("16_gather_fed")
def _():
    x = jnp.asarray(
        rng.normal(size=(1024, D)).astype(np.float32), jnp.bfloat16
    )
    idx = jnp.asarray(
        rng.integers(0, 1024, size=(B * Et,)).astype(np.int32)
    )
    vals = x[idx].reshape(B, Et, D)
    return pp._slot_reduce_call(rel2, vals, NB, B * NB)


with open("tools/probe_pallas_feature4.json", "w") as f:
    json.dump(results, f, indent=1)
