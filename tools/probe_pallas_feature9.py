"""Round 9: confirm jax_default_matmul_precision='highest' is the
package-import side effect that crashes remote Mosaic, and that pinning
precision=DEFAULT inside the kernel fixes it."""
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


def make_kernel(precision):
    def k(rel_ref, msg_ref, out_ref, acc):
        et128 = rel_ref.shape[1]
        acc[...] = jnp.zeros_like(acc)
        rows = jax.lax.broadcasted_iota(jnp.int32, (NB, 128), 0)

        def body(ci, _):
            oh = (rows == rel_ref[0, pl.ds(ci, 1)]).astype(msg_ref.dtype)
            acc[...] += jax.lax.dot(
                oh, msg_ref[0, pl.ds(ci, 1)][0],
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            return 0

        jax.lax.fori_loop(0, et128, body, 0)
        out_ref[0] = acc[...]
    return k


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


@case("28_highest_global_config")
def _():
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        return run(make_kernel(None))
    finally:
        jax.config.update("jax_default_matmul_precision", None)


@case("29_highest_global_pinned_default")
def _():
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        return run(make_kernel(jax.lax.Precision.DEFAULT))
    finally:
        jax.config.update("jax_default_matmul_precision", None)


@case("30_production_after_fix")
def _():
    # re-test the real wrapper once blocked_segment pins precision —
    # run AFTER the package import flips the global config
    from bridged_gnn_tpu.ops import blocked_segment as bs
    from bridged_gnn_tpu.ops import pallas_padded as pp

    n_pad, e = 131072, 2097152
    s = rng.integers(0, n_pad, size=e).astype(np.int32)
    r = np.sort(rng.integers(0, n_pad, size=e)).astype(np.int32)
    em = np.ones(e, dtype=bool)
    lay = bs.build_padded_layout(r, s, np.arange(e), em, n_pad, 256)
    x = jnp.asarray(
        rng.normal(size=(n_pad, 128)).astype(np.float32), jnp.bfloat16
    )
    vals_full = x[lay.other_slot]
    out = pp.slot_reduce_pallas(lay, vals_full)
    want = bs.padded_gather_reduce(lay, x)
    assert np.allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=1e-2,
    ), "mismatch"
    # time it
    import time
    f = jax.jit(lambda v: pp.slot_reduce_pallas(lay, v))
    jax.block_until_ready(f(vals_full))
    t0 = time.perf_counter()
    for _ in range(10):
        o = f(vals_full)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / 10
    print(json.dumps({"pallas_reduce_ms": round(dt * 1e3, 3)}), flush=True)
    return o


with open("tools/probe_pallas_feature9.json", "w") as f:
    json.dump(results, f, indent=1)
