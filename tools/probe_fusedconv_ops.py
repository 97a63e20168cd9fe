"""Probe Mosaic support for every primitive of a fully-fused attention
forward kernel (expand + GATv2 logits + segment softmax + weighted
reduce in one pallas_call per dst block), before building it.

Known remote-compiler crashers to steer around (probe_pallas_feature*):
[nb,128]x[1,128] broadcast MULTIPLY, HIGHEST-precision dots.

Usage: python tools/probe_fusedconv_ops.py
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
            entry["match"] = bool(err <= tol * max(1.0, float(np.abs(want).max())))
    except Exception as exc:  # noqa: BLE001
        entry["ok"] = False
        entry["error"] = repr(exc)[:180]
    results.append(entry)
    print(json.dumps(entry), flush=True)
    return entry


rel_np = rng.integers(0, NB + 1, size=(ET,)).astype(np.int32)
rel = jnp.asarray(rel_np.reshape(ET // 128, 128))
m_np = rng.normal(size=(ET, 2 * D)).astype(np.float32)
m = jnp.asarray(m_np, jnp.bfloat16)
dblk_np = rng.normal(size=(NB, 2 * D)).astype(np.float32)
dblk = jnp.asarray(dblk_np, jnp.bfloat16)
w_np = rng.random(ET).astype(np.float32)
w = jnp.asarray(w_np.reshape(ET // 128, 128))
lm_np = rng.normal(size=(ET,)).astype(np.float32)
lm = jnp.asarray(lm_np.reshape(ET // 128, 128))
amat_np = rng.normal(size=(2 * D, 128)).astype(np.float32)
amat = jnp.asarray(amat_np, jnp.bfloat16)

oh_np = (rel_np[None, :] == np.arange(NB)[:, None])


def run1(kernel, out_shape, extra_in=(), scratch=()):
    ins = [rel, m, dblk, w, lm, amat] + list(extra_in)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(ins),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((NB, ET), jnp.bfloat16)] + list(scratch),
    )(*ins)


def build_oh(rel_ref, oh):
    rows = jax.lax.broadcasted_iota(jnp.int32, (NB, 128), 0)
    for ci in range(ET // 128):
        oh[:, ci * 128:(ci + 1) * 128] = (
            rows == rel_ref[ci:ci + 1]
        ).astype(oh.dtype)


# 1. transposed-contraction expand: d_slots [Et, 2D] = oh^T @ dblk
def k_expand(rel_ref, m_ref, d_ref, w_ref, lm_ref, a_ref, o_ref, oh):
    build_oh(rel_ref, oh)
    o_ref[...] = jax.lax.dot_general(
        oh[...], d_ref[...], (((0,), (0,)), ((), ())), **DOT
    )


want = oh_np.T.astype(np.float32) @ np.asarray(dblk, np.float32)
case("1_expand_ohT_dot", lambda: run1(
    k_expand, jax.ShapeDtypeStruct((ET, 2 * D), jnp.float32)), want)


# 2. masked per-dst max: mx[n] = max over slots with rel==n of lm
def k_max(rel_ref, m_ref, d_ref, w_ref, lm_ref, a_ref, o_ref, oh):
    build_oh(rel_ref, oh)
    lm_flat = lm_ref[...].reshape(1, ET)
    big = jnp.where(oh[...] > 0, lm_flat, -1e30)   # [NB, Et] select bcast
    o_ref[...] = jnp.max(big, axis=1, keepdims=True)


want = np.where(oh_np, lm_np[None, :], -1e30).max(axis=1, keepdims=True)
case("2_masked_rowmax", lambda: run1(
    k_max, jax.ShapeDtypeStruct((NB, 1), jnp.float32)), want)


# 2b. same but via reshape of [et128,128] lm — checks the (1, ET) reshape
def k_max2(rel_ref, m_ref, d_ref, w_ref, lm_ref, a_ref, o_ref, oh):
    build_oh(rel_ref, oh)
    rows = jax.lax.broadcasted_iota(jnp.int32, (NB, 128), 0)
    acc = jnp.full((NB, 1), -1e30, jnp.float32)
    for ci in range(ET // 128):
        ohc = rows == rel_ref[ci:ci + 1]
        big = jnp.where(ohc, lm_ref[ci:ci + 1].astype(jnp.float32), -1e30)
        acc = jnp.maximum(acc, jnp.max(big, axis=1, keepdims=True))
    o_ref[...] = acc


case("2b_masked_rowmax_chunked", lambda: run1(
    k_max2, jax.ShapeDtypeStruct((NB, 1), jnp.float32)), want)


# 3. lane-broadcast multiply m * w[:, None]  ([Et,2D] * [Et,1])
def k_wmul(rel_ref, m_ref, d_ref, w_ref, lm_ref, a_ref, o_ref, oh):
    wcol = w_ref[...].reshape(ET, 1)
    o_ref[...] = (m_ref[...].astype(jnp.float32) * wcol)


want = np.asarray(m, np.float32) * w_np[:, None]
case("3_lane_bcast_mul", lambda: run1(
    k_wmul, jax.ShapeDtypeStruct((ET, 2 * D), jnp.float32)), want)


# 4. logits: leaky_relu(m + expand) @ amat  [Et,2D]x[2D,128]
def k_logits(rel_ref, m_ref, d_ref, w_ref, lm_ref, a_ref, o_ref, oh):
    build_oh(rel_ref, oh)
    dsl = jax.lax.dot_general(
        oh[...], d_ref[...], (((0,), (0,)), ((), ())), **DOT
    ).astype(jnp.bfloat16)
    h = jax.nn.leaky_relu(m_ref[...] + dsl, 0.1)
    o_ref[...] = jax.lax.dot(h, a_ref[...], **DOT)


h_np = np.asarray(
    jax.nn.leaky_relu(jnp.asarray(m_np, jnp.bfloat16)
                      + jnp.asarray((oh_np.T @ dblk_np), jnp.bfloat16), 0.1),
    np.float32)
want = h_np @ np.asarray(amat, np.float32)
case("4_logits_dot", lambda: run1(
    k_logits, jax.ShapeDtypeStruct((ET, 128), jnp.float32)), want, tol=5e-2)


# 5. exp + per-dst denom via oh dot + full softmax-weighted reduce
def k_soft(rel_ref, m_ref, d_ref, w_ref, lm_ref, a_ref, o_ref, oh):
    build_oh(rel_ref, oh)
    lm_flat = lm_ref[...].reshape(1, ET)
    big = jnp.where(oh[...] > 0, lm_flat, -1e30)
    mx = jnp.max(big, axis=1, keepdims=True)          # [NB,1]
    mx_slot = jax.lax.dot_general(
        oh[...], mx, (((0,), (0,)), ((), ())), **DOT
    )                                                  # [Et,1]
    ex = jnp.exp(lm_flat.reshape(ET, 1) - mx_slot)
    ex = ex * jax.lax.dot_general(                     # zero pad slots
        oh[...], jnp.ones((NB, 1), jnp.float32),
        (((0,), (0,)), ((), ())), **DOT)
    den = jax.lax.dot_general(
        oh[...], ex, (((1,), (0,)), ((), ())), **DOT)  # [NB,1]
    den_slot = jax.lax.dot_general(
        oh[...], jnp.where(den == 0, 1.0, den),
        (((0,), (0,)), ((), ())), **DOT)
    alpha = ex / den_slot                              # [Et,1]
    mw = m_ref[...].astype(jnp.float32) * alpha        # lane bcast mul
    o_ref[...] = jax.lax.dot(oh[...].astype(jnp.float32), mw, **DOT)


ex_np = np.exp(lm_np - (oh_np.T.astype(np.float32)
                        @ np.where(oh_np, lm_np[None, :], -1e30)
                        .max(axis=1, keepdims=True))[:, 0])
ex_np = ex_np * oh_np.any(axis=0)
den_np = oh_np.astype(np.float32) @ ex_np
den_np = np.where(den_np == 0, 1.0, den_np)
alpha_np = ex_np / (oh_np.T.astype(np.float32) @ den_np)
want = oh_np.astype(np.float32) @ (np.asarray(m, np.float32)
                                   * alpha_np[:, None])
case("5_softmax_reduce", lambda: run1(
    k_soft, jax.ShapeDtypeStruct((NB, 2 * D), jnp.float32)), want, tol=5e-2)


with open("tools/probe_fusedconv_ops.json", "w") as f:
    json.dump(results, f, indent=1)
print("done")
