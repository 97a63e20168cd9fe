"""Round 2: isolate the crashers from probe_fusedconv_ops and test
workarounds.

From round 1: (1) ohT dot OK; (2) full-width reshape (et128,128)->(1,ET)
crashes, chunked select OK; (3) [Et,2D]*[Et,1] lane-broadcast mul
crashes; (4) plain-looking [Et,2D]@[2D,128] logits dot crashes (isolate
why); (5) composite crashed (contains 3).
"""
import json
import sys

import numpy as np

repo = __file__.rsplit("/", 2)[0]
sys.path.insert(0, repo)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

NB, ET, D = 256, 512, 128
results = []
rng = np.random.default_rng(0)
DOT = dict(preferred_element_type=jnp.float32,
           precision=jax.lax.Precision.DEFAULT)


def case(name, fn, want=None, tol=2e-2):
    entry = {"case": name}
    try:
        out = fn()
        jax.block_until_ready(out)
        entry["ok"] = True
        if want is not None:
            err = float(np.abs(np.asarray(out, np.float32) - want).max())
            entry["max_err"] = err
    except Exception as exc:  # noqa: BLE001
        entry["ok"] = False
        entry["error"] = repr(exc)[:150]
    results.append(entry)
    print(json.dumps(entry), flush=True)
    return entry


m_np = rng.normal(size=(ET, 2 * D)).astype(np.float32)
m = jnp.asarray(m_np, jnp.bfloat16)
mf = jnp.asarray(m_np)
a_np = rng.random((ET, 1)).astype(np.float32)
a_col = jnp.asarray(a_np)
amat_np = rng.normal(size=(2 * D, 128)).astype(np.float32)
amat = jnp.asarray(amat_np, jnp.bfloat16)


def run(kernel, ins, out_shape):
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(ins),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=out_shape,
    )(*ins)


# 3a. broadcast_to then multiply
def k3a(m_ref, a_ref, o_ref):
    ab = jnp.broadcast_to(a_ref[...], (ET, 2 * D))
    o_ref[...] = m_ref[...].astype(jnp.float32) * ab


want3 = m_np * a_np
case("3a_broadcast_to_mul", lambda: run(
    k3a, [m, a_col], jax.ShapeDtypeStruct((ET, 2 * D), jnp.float32)), want3)


# 3b. outer-product dot to widen alpha, then multiply
def k3b(m_ref, a_ref, o_ref):
    ones = jnp.ones((1, 2 * D), jnp.float32)
    ab = jax.lax.dot(a_ref[...], ones, **DOT)
    o_ref[...] = m_ref[...].astype(jnp.float32) * ab


case("3b_outer_dot_mul", lambda: run(
    k3b, [m, a_col], jax.ShapeDtypeStruct((ET, 2 * D), jnp.float32)), want3)


# 3c. add-broadcast (is it only MUL that crashes?)
def k3c(m_ref, a_ref, o_ref):
    o_ref[...] = m_ref[...].astype(jnp.float32) + a_ref[...]


case("3c_bcast_add", lambda: run(
    k3c, [m, a_col], jax.ShapeDtypeStruct((ET, 2 * D), jnp.float32)),
    m_np + a_np)


# 3d. f32 x f32 broadcast mul (was bf16 m the trigger?)
def k3d(m_ref, a_ref, o_ref):
    o_ref[...] = m_ref[...] * a_ref[...]


case("3d_f32_bcast_mul", lambda: run(
    k3d, [mf, a_col], jax.ShapeDtypeStruct((ET, 2 * D), jnp.float32)), want3)


# 4a. plain dot [Et,2D] @ [2D,128], no activation
def k4a(m_ref, a_ref, o_ref):
    o_ref[...] = jax.lax.dot(m_ref[...], a_ref[...], **DOT)


want4 = np.asarray(m, np.float32) @ np.asarray(amat, np.float32)
case("4a_plain_dot", lambda: run(
    k4a, [m, amat], jax.ShapeDtypeStruct((ET, 128), jnp.float32)), want4,
    tol=5e-2)


# 4b. leaky_relu then dot
def k4b(m_ref, a_ref, o_ref):
    h = jax.nn.leaky_relu(m_ref[...], 0.1)
    o_ref[...] = jax.lax.dot(h, a_ref[...], **DOT)


want4b = np.asarray(
    jax.nn.leaky_relu(m, 0.1).astype(jnp.float32)) @ np.asarray(
        amat, np.float32)
case("4b_lrelu_dot", lambda: run(
    k4b, [m, amat], jax.ShapeDtypeStruct((ET, 128), jnp.float32)), want4b,
    tol=5e-2)


# 4c. bf16 add then dot (m + m)
def k4c(m_ref, a_ref, o_ref):
    h = m_ref[...] + m_ref[...]
    o_ref[...] = jax.lax.dot(h, a_ref[...], **DOT)


case("4c_add_dot", lambda: run(
    k4c, [m, amat], jax.ShapeDtypeStruct((ET, 128), jnp.float32)),
    2 * want4, tol=5e-2)


# 4d. f32 cast of the round-1 case-4: dot of f32 h
def k4d(m_ref, a_ref, o_ref):
    h = jax.nn.leaky_relu(m_ref[...].astype(jnp.float32), 0.1)
    o_ref[...] = jax.lax.dot(h, a_ref[...].astype(jnp.float32), **DOT)


case("4d_f32_lrelu_dot", lambda: run(
    k4d, [m, amat], jax.ShapeDtypeStruct((ET, 128), jnp.float32)), want4b,
    tol=5e-2)

with open("tools/probe_fusedconv_ops2.json", "w") as f:
    json.dump(results, f, indent=1)
print("done")
