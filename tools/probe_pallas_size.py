"""Find the size threshold where remote Mosaic compilation breaks.

The trivial kernels in probe_pallas.py compile on this terminal, but the
production-scale padded reduce (B=512, Et=4352, nb=256, D=128) fails with
HTTP 500 from the remote compile helper. Compile+run the SAME kernel at
increasing sizes to find what triggers it. Each case is independent; a
failure is caught and recorded.

Usage: nohup python tools/probe_pallas_size.py > tools/probe_pallas_size.log 2>&1 &
"""

import json
import sys

import numpy as np

repo = __file__.rsplit("/", 2)[0]
sys.path.insert(0, repo)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bridged_gnn_tpu.ops import blocked_segment as bs  # noqa: E402
from bridged_gnn_tpu.ops import pallas_padded as pp  # noqa: E402

res = {"platform": jax.devices()[0].platform, "cases": []}
rng = np.random.default_rng(0)

CASES = [
    # (n_pad, e, nb)
    (1024, 8192, 256),
    (8192, 65536, 256),
    (32768, 524288, 256),
    (131072, 2097152, 256),
    (131072, 2097152, 512),
]

for n_pad, e, nb in CASES:
    case = {"n_pad": n_pad, "e": e, "nb": nb}
    try:
        s = rng.integers(0, n_pad, size=e).astype(np.int32)
        r = np.sort(rng.integers(0, n_pad, size=e)).astype(np.int32)
        em = np.ones(e, dtype=bool)
        lay = bs.build_padded_layout(
            r, s, np.arange(e), em, n_pad, node_block=nb
        )
        case["tile_e"] = lay.tile_e
        case["num_blocks"] = lay.num_blocks
        x = jnp.asarray(
            rng.normal(size=(n_pad, 128)).astype(np.float32), jnp.bfloat16
        )
        vals = x[lay.other_slot]
        out = pp.slot_reduce_pallas(lay, vals)
        jax.block_until_ready(out)
        want = bs.padded_gather_reduce(lay, x)
        ok = np.allclose(
            np.asarray(out, np.float32), np.asarray(want, np.float32),
            rtol=2e-2, atol=1e-2,
        )
        case["compiles"] = True
        case["matches"] = bool(ok)
    except Exception as exc:  # noqa: BLE001
        case["compiles"] = False
        case["error"] = repr(exc)[:200]
    res["cases"].append(case)
    print(json.dumps(case), flush=True)

with open("tools/probe_pallas_size.json", "w") as f:
    json.dump(res, f, indent=1)
