"""Padded-tile SpMM: one batched matmul instead of lax.map (round 2).

Host re-lays edges into [num_blocks, tile_e] padded per-dst-block slots;
the gather runs over the padded sender ids (few % overhead) and the
segment reduce becomes a single batched one-hot matmul — no lax.map, no
dynamic_slice, full XLA pipelining. Also measures sorted-sender gather
(locality ceiling for the gather engine).

Large index/one-hot arrays are passed as jit ARGUMENTS (closures would
bake them into the program text and blow the remote-compile size cap).

Usage: python tools/bench_spmm_padded.py [out.json]
"""

import functools
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

N, E, D = 131_072, 2_097_152, 128


def timed_chain(step, init, consts=(), n_lo=2, n_hi=42, reps=4):
    """Per-iteration seconds of `carry = step(carry, *consts)`."""

    @functools.partial(jax.jit, static_argnums=1)
    def chain(c, n, *consts):
        def body(c, _):
            return step(c, *consts), None
        c, _ = jax.lax.scan(body, c, None, length=n)
        return jnp.sum(c.reshape(-1)[:8].astype(jnp.float32))

    float(chain(init, n_lo, *consts))
    float(chain(init, n_hi, *consts))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); float(chain(init, n_lo, *consts))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); float(chain(init, n_hi, *consts))
        t_hi = time.perf_counter() - t0
        best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
    return best


def build_padded_layout(senders, receivers, n, nb):
    """[num_blocks, tile_e] padded slots per dst block (host, once)."""
    num_blocks = -(-n // nb)
    bounds = np.searchsorted(
        receivers, np.arange(num_blocks + 1) * nb, side="left"
    )
    per_block = np.diff(bounds)
    tile_e = ((int(per_block.max()) + 127) // 128) * 128
    s_pad = np.zeros((num_blocks, tile_e), dtype=np.int32)
    rel_pad = np.full((num_blocks, tile_e), nb, dtype=np.int32)  # no-hit
    for b in range(num_blocks):
        k = per_block[b]
        sl = slice(bounds[b], bounds[b + 1])
        s_pad[b, :k] = senders[sl]
        rel_pad[b, :k] = receivers[sl] - b * nb
    pad_frac = (num_blocks * tile_e - E) / E
    return s_pad, rel_pad, tile_e, num_blocks, pad_frac


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/dev/stdout"
    rng = np.random.default_rng(0)
    s_np = rng.integers(0, N, size=E).astype(np.int32)
    r_np = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    res = {"platform": jax.devices()[0].platform, "N": N, "E": E, "D": D}

    x0 = jnp.asarray(rng.normal(size=(N, D)), dtype=jnp.bfloat16)

    # sorted-sender gather: locality ceiling for the gather engine
    s_sorted = jnp.asarray(np.sort(s_np))

    def g_sorted(c, idx):
        msg = c[idx]
        return c + (jnp.sum(msg, axis=0) * 1e-6).astype(c.dtype)

    t = timed_chain(g_sorted, x0, (s_sorted,))
    res["gather_sorted_bf16_ms"] = round(t * 1e3, 3)
    res["gather_sorted_bf16_Mrows_s"] = round(E / t / 1e6, 1)

    for nb in (256, 512):
        s_pad, rel_pad, tile_e, num_blocks, pad_frac = build_padded_layout(
            s_np, r_np, N, nb
        )
        res[f"padded_nb{nb}_tile_e"] = tile_e
        res[f"padded_nb{nb}_pad_frac"] = round(pad_frac, 4)
        sp = jnp.asarray(s_pad.reshape(-1))   # [B*Et]
        onehot = jnp.asarray(
            (np.arange(nb)[None, :, None] == rel_pad[:, None, :]),
            dtype=jnp.bfloat16,
        )                                      # [B, nb, Et] device array
        rel = jnp.asarray(rel_pad)             # [B, Et]

        def spmm_pad(c, sp, onehot, num_blocks=num_blocks,
                     tile_e=tile_e, nb=nb):
            msg = c[sp].reshape(num_blocks, tile_e, D)
            out = jax.lax.dot_general(
                onehot, msg, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                  # [B, nb, D]
            out = out.reshape(num_blocks * nb, D)[:N].astype(c.dtype)
            return c + out * 1e-6

        t_f = timed_chain(spmm_pad, x0, (sp, onehot))
        res[f"spmm_padded_static_nb{nb}_ms"] = round(t_f * 1e3, 3)
        res[f"spmm_padded_static_nb{nb}_Medges_s"] = round(
            E / t_f / 1e6, 1
        )

        # weighted variant: one-hot built on the fly from rel ids (the
        # production case — attention weights change every step)
        def spmm_pad_dyn(c, sp, rel, num_blocks=num_blocks,
                         tile_e=tile_e, nb=nb):
            msg = c[sp].reshape(num_blocks, tile_e, D)
            rows = jax.lax.broadcasted_iota(jnp.int32, (1, nb, 1), 1)
            oh = (rows == rel[:, None, :]).astype(c.dtype)
            out = jax.lax.dot_general(
                oh, msg, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            out = out.reshape(num_blocks * nb, D)[:N].astype(c.dtype)
            return c + out * 1e-6

        t_d = timed_chain(spmm_pad_dyn, x0, (sp, rel))
        res[f"spmm_padded_dyn_nb{nb}_ms"] = round(t_d * 1e3, 3)
        res[f"spmm_padded_dyn_nb{nb}_Medges_s"] = round(E / t_d / 1e6, 1)

        with open(out_path, "w") as f:
            json.dump(res, f, indent=1)
            f.write("\n")

    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
