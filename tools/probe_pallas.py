"""Probe: is the TPU tunnel alive, and does Mosaic (Pallas) compile now?

Round-1 blocker: remote Mosaic compilation crashed the terminal (libtpu
version mismatch).  Run detached; writes findings to tools/probe_pallas.out.
"""
import json
import sys

out = {}


def main():
    import jax
    import jax.numpy as jnp

    out["jax_version"] = jax.__version__
    devs = jax.devices()
    out["devices"] = [str(d) for d in devs]
    out["platform"] = devs[0].platform

    # 1. trivial XLA op on device
    x = jnp.ones((128, 128), jnp.float32)
    y = (x @ x).block_until_ready()
    out["xla_matmul_ok"] = bool(y[0, 0] == 128.0)

    # 2. trivial Pallas kernel, compiled (not interpret)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(i_ref, o_ref):
        o_ref[:] = i_ref[:] * 2.0

    try:
        r = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        r.block_until_ready()
        out["pallas_compile_ok"] = bool(float(r[0, 0]) == 2.0)
    except Exception as e:  # noqa: BLE001
        out["pallas_compile_ok"] = False
        out["pallas_error"] = repr(e)[:2000]

    # 3. a pallas kernel with a dynamic-slice + dot (closer to our SpMM shape)
    if out.get("pallas_compile_ok"):
        def k2(ids_ref, x_ref, o_ref):
            blk = jax.nn.one_hot(ids_ref[:, 0], 8, dtype=jnp.float32)
            o_ref[:] = jnp.dot(blk.T, x_ref[:], preferred_element_type=jnp.float32)

        ids = jnp.zeros((128, 1), jnp.int32)
        try:
            r2 = pl.pallas_call(
                k2,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(ids, x)
            r2.block_until_ready()
            out["pallas_onehot_dot_ok"] = bool(float(r2[0, 0]) == 128.0)
        except Exception as e:  # noqa: BLE001
            out["pallas_onehot_dot_ok"] = False
            out["pallas_onehot_dot_error"] = repr(e)[:2000]


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        out["fatal"] = repr(e)[:2000]
    with open("/root/repo/tools/probe_pallas.out", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    sys.exit(0)
