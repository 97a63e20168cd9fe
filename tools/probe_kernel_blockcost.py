"""Quantify the fused-attention kernel's per-block fixed cost (r5).

results_fused_sel_tpu.json showed the Mosaic attention kernels are
neither byte- nor MXU-pass-bound: halving every slot tensor (selective
gather) and cutting 6 one-hot passes to 4 left the ~15.5 ms forward
unchanged. This probe isolates the remaining suspect — per-block fixed
cost (DMA descriptor issue on the scalar core × operand streams,
grid-step latency) — by timing pallas_calls with the SAME grid/BlockSpec
structure but degenerate bodies:

  * ``copy``: read msg block, write one row — pure stream setup + DMA;
  * ``ohbuild``: the one-hot scratch build only (the [nb, Et] VPU
    compare/store loop) + copy;
  * ``full``: the real selective kernel, for reference.

Each at B = N/nb blocks for nb in {128}, msg width D and 2D. If ``copy``
accounts for most of the full kernel's time, the kernel is block-
overhead-bound and the honest floor at this (N, E, nb) is ``copy`` —
not the byte/FLOP roofline. Writes tools/probe_kernel_blockcost.json.
"""
import functools
import json
import os
import sys
import time

import numpy as np

repo = __file__.rsplit("/", 2)[0]
sys.path.insert(0, repo)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from bridged_gnn_tpu.ops.blocked_segment import make_blocked_ops  # noqa: E402

N, E, D = 131_072, 2_097_152, 128


def timeit(f, *args, iters=10):
    jax.block_until_ready(f(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f(*args)
        jax.block_until_ready(o)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def copy_kernel(rel_ref, m_ref, out_ref, *, node_block):
    out_ref[0] = m_ref[0, :node_block] * 1  # touch input, tiny write


def ohbuild_kernel(rel_ref, m_ref, out_ref, oh, *, node_block):
    nb = node_block
    et = m_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, 128), 0)
    for ci in range(et // 128):
        oh[:, ci * 128:(ci + 1) * 128] = (
            rows == rel_ref[0, ci:ci + 1]
        ).astype(oh.dtype)
    out_ref[0] = jax.lax.dot_general(
        oh[...], m_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mode", "nb"))
def run(rel_key, msg, mode: str, nb: int):
    B, Et, d = msg.shape
    et128 = Et // 128
    if mode == "copy":
        return pl.pallas_call(
            functools.partial(copy_kernel, node_block=nb),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, et128, 128), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, Et, d), lambda b: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, nb, d), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, nb, d), msg.dtype),
        )(rel_key.reshape(B, et128, 128), msg)
    if mode == "ohbuild":
        return pl.pallas_call(
            functools.partial(ohbuild_kernel, node_block=nb),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, et128, 128), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, Et, d), lambda b: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, nb, d), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, nb, d), jnp.float32),
            scratch_shapes=[pltpu.VMEM((nb, Et), msg.dtype)],
        )(rel_key.reshape(B, et128, 128), msg)
    raise ValueError(mode)


def main():
    out = {"backend": jax.default_backend(), "N": N, "E": E, "D": D}
    rng = np.random.default_rng(0)
    s = rng.integers(0, N, size=E).astype(np.int32)
    r = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    em = np.ones(E, bool)
    nb = 128
    ops = make_blocked_ops(s, r, em, N, node_block=nb)
    lay = ops.lay_dst
    out["nb"] = nb
    out["tile_e"] = lay.tile_e
    out["num_blocks"] = lay.num_blocks
    for width, label in ((D, "selD"), (2 * D, "concat2D")):
        msg = jnp.asarray(
            rng.normal(size=(lay.num_blocks, lay.tile_e, width)),
            jnp.bfloat16)
        for mode in ("copy", "ohbuild"):
            try:
                ms = timeit(lambda rk, m: run(rk, m, mode, nb),
                            lay.rel_key, msg)
                out[f"{mode}_{label}_ms"] = round(ms, 3)
            except Exception as exc:  # noqa: BLE001
                out[f"{mode}_{label}_error"] = repr(exc)[:200]
            print(json.dumps(out), flush=True)
    with open(os.path.join(repo, "tools/probe_kernel_blockcost.json"),
              "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
