"""Round 3: bisect the production-scale crash of the full attention
kernel (probe rounds 1-2 validated the primitives at Et=512 but the real
call at Et=4352 kills the compile helper).

Runs the actual ops/pallas_fused.py entry at increasing Et, then a
feature-bisect at the first failing size by disabling kernel pieces.
"""
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

from bridged_gnn_tpu.ops import pallas_fused as pf  # noqa: E402

NB, D = 256, 128
results = []
rng = np.random.default_rng(0)


def case(name, fn):
    entry = {"case": name}
    try:
        jax.block_until_ready(fn())
        entry["ok"] = True
    except Exception as exc:  # noqa: BLE001
        entry["ok"] = False
        entry["error"] = repr(exc)[:140]
    results.append(entry)
    print(json.dumps(entry), flush=True)
    return entry


def inputs(et, b=4):
    rel = jnp.asarray(
        rng.integers(0, NB + 1, size=(b, et)).astype(np.int32)
    )
    msg = jnp.asarray(
        rng.normal(size=(b, et, 2 * D)).astype(np.float32), jnp.bfloat16
    )
    ud = jnp.asarray(
        rng.normal(size=(b, NB, 2 * D)).astype(np.float32), jnp.bfloat16
    )
    c = jnp.asarray(
        (rng.random((b, NB, 1)) < 0.5).astype(np.float32)
    )
    a1 = jnp.asarray(rng.normal(size=(1, D)).astype(np.float32))
    a2 = jnp.asarray(rng.normal(size=(1, D)).astype(np.float32))
    return rel, msg, ud, c, a1, a2


for et in (512, 1024, 2048, 4352):
    ins = inputs(et)
    case(f"full_et{et}", lambda ins=ins: pf._attention_call(
        *ins, NB, 0.1))

with open("tools/probe_fusedconv_ops3.json", "w") as f:
    json.dump(results, f, indent=1)
print("done")
