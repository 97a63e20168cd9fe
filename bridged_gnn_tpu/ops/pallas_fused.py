"""Single-kernel fused attention forward (Mosaic/Pallas TPU).

The whole AdaptedConv attention pass — destination-row expansion, GATv2
logits, per-destination segment softmax, and weighted aggregation
(reference models/KTGNN.py:263-315) — runs as ONE pallas_call per
destination node block. The gathered sender rows are read from HBM
exactly once; every intermediate ([Et, 2D] pre-activations, one-hots,
softmax statistics) lives only in VMEM, where the XLA formulation
(ops/fused_attention.py) spills them to HBM between fusions.

Remote-Mosaic-compiler constraints honored (probed in
tools/probe_fusedconv_ops*.py against this environment's compile
helper):
  * bf16 ``leaky_relu`` and bf16 lane-broadcast multiplies crash the
    helper — all elementwise math runs in f32, broadcasts are explicit
    ``jnp.broadcast_to``;
  * cross-lane reshapes crash — per-slot scalars stay in [Et, 1] column
    layout end to end, one-hots are built by chunked 128-wide iota
    compares into VMEM scratch (the probe-validated pattern of
    ops/pallas_padded.py);
  * dots pin ``precision=DEFAULT`` (the package's global HIGHEST matmul
    precision makes Mosaic's lowering crash).

Numerics: the softmax is shifted by the *block* max (a scalar) instead
of the per-destination max. The softmax values are mathematically
identical; only the floating-point shift differs, and it stays exact
unless logits within one 256-row destination block span more than ~80
(f32 exp range) — far beyond trained GATv2 logit spreads. Parity with
the XLA path is asserted in tests to 1e-2 relative.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DOT = dict(
    preferred_element_type=jnp.float32,
    precision=jax.lax.Precision.DEFAULT,
)
_NEG = -1e30

# measured VMEM envelope: nb=256/Et=4352/D=128 bf16 overflows the compile
# helper, nb=128/Et=2176 bf16 and nb=256/Et=2048 compile (probe round 3);
# nb=256/Et=6912/D=16 f32 OOMs at 23.4M scoped (16M hard limit) — the
# one-hot scratch plus Mosaic's two contraction copies of it dominate
_VMEM_BUDGET = 12 * 1024 * 1024

# Guarded envelope for the block-max softmax shift (module docstring):
# exp underflows at a spread of ~88 in f32; 60 leaves margin for the
# accumulated shift error. check_numerics mode (train/stage2.py) asserts
# the measured per-dst-block logit spread stays below this.
SOFTMAX_SPREAD_LIMIT = 60.0


# Measured FORWARD-kernel envelope (tools/probe_bwd_vmem.json +
# probe_bwd_vmem3.json, on-chip): last tile_e whose fwd kernel compiles
# AND matches, keyed (node_block, is_bf16, dch). The next ladder rung up
# crashes the compile helper with a scoped-VMEM OOM. Small dch is bounded
# by the f32 one-hot scratch — dch 8/16/32/64 all break at the SAME
# Et=5120 (slot-count limit), which the round-2 msg-space formula missed
# (a 35k bridged graph with Et=9216 / dch=8 clf convs crashed in
# production before this table existed).
_FWD_MAX_ET = {
    (128, True, 8): 4352, (128, True, 16): 4352, (128, True, 32): 4352,
    (128, True, 64): 4352, (128, True, 128): 5120, (128, True, 256): 3584,
    (128, False, 64): 4352, (128, False, 128): 5120,
    (128, False, 256): 4352,
    (256, True, 128): 3584, (256, False, 128): 3584,
}

# measured max slot count (nb*Et) per node_block — the one-hot bound
_FWD_SLOT_CAP = {128: 128 * 4352, 256: 256 * 3584}


def _fwd_et_limit(node_block: int, dch: int, itemsize: int) -> int:
    key = (node_block, itemsize == 2, dch)
    if key in _FWD_MAX_ET:
        return _FWD_MAX_ET[key]
    # unprobed combos: the measured per-nb slot cap (derated 15%)
    # combined with the round-2 msg-space working-set estimate
    cap = _FWD_SLOT_CAP.get(node_block, _FWD_SLOT_CAP[128])
    slot_lim = int(0.85 * cap / node_block)
    per_et = 3.5 * node_block * itemsize + 4 * dch * itemsize + 16 * dch
    return min(slot_lim, int(_VMEM_BUDGET / per_et))


def fits_vmem(
    tile_e: int, node_block: int, dch: int, itemsize: int = 4,
) -> bool:
    """Forward-kernel gate from the MEASURED envelope (probed boundaries
    above; the next rung past each admitted tile_e crashes the remote
    compile helper). ``itemsize`` is the msg dtype's (2 bf16 / 4 f32).
    Over-envelope layouts run the XLA fused path."""
    return tile_e <= _fwd_et_limit(node_block, dch, itemsize)


# Measured backward-kernel envelope (tools/probe_bwd_vmem.json +
# probe_bwd_vmem2.json, on-chip, VERDICT r2 item 3): last tile_e that
# compiles AND matches XLA grads, keyed (node_block, is_bf16, dch). The
# next ladder rung up fails with the remote-compile-helper MosaicError
# in every probed case.
_BWD_MAX_ET = {
    (128, True, 64): 4352, (128, True, 128): 3584, (128, True, 256): 2176,
    (128, False, 64): 4352, (128, False, 128): 4352,
    (128, False, 256): 2176,
    (256, True, 128): 2560, (256, False, 128): 3072,
}


def _bwd_et_limit(node_block: int, dch: int, itemsize: int) -> int:
    """Max admissible tile_e for the backward kernel.

    Probed combos come straight from the measured table. Unprobed combos
    use the envelope fitted to the f32 failure boundaries —
    ``et · (0.25·nb + 0.75·d)/128 ≤ B`` with B=4352 (f32) / 3584 (bf16,
    measured one rung tighter at d≤128) — derated 15% because an
    over-admit aborts training with a remote-compile crash while an
    under-admit only falls back to the (1.2× slower) XLA backward."""
    key = (node_block, itemsize == 2, dch)
    if key in _BWD_MAX_ET:
        return _BWD_MAX_ET[key]
    budget = 3584.0 if itemsize == 2 else 4352.0
    denom = 0.25 * node_block / 128 + 0.75 * dch / 128
    return int(0.85 * budget / max(denom, 1e-9))


def fits_vmem_bwd(
    tile_e: int, node_block: int, dch: int, itemsize: int = 4,
) -> bool:
    """Backward-kernel gate from the MEASURED envelope (replaces round
    2's 75%-of-forward-budget guess). Near/over-envelope layouts run the
    Mosaic forward with the XLA backward."""
    return tile_e <= _bwd_et_limit(node_block, dch, itemsize)


def default_interpret() -> bool:
    """Interpreter mode off-TPU so the kernel path works in CPU tests."""
    return jax.default_backend() != "tpu"


# fp32-parity precisions: the package pins 'highest' at import for
# reference-parity runs; the kernels pin DEFAULT-precision dots in-VMEM
# (HIGHEST lowering crashes Mosaic here), so they would break fp32
# reproducibility and stay off in parity mode.
_PARITY_PRECISIONS = ("highest", "float32")


def auto_kernel() -> bool:
    """Resolve the ``None`` (auto) value of the fused-kernel flags.

    The Mosaic attention kernels are the fastest measured training path
    (fwd 1.61x, fwd+bwd 1.20x vs the fused-XLA autodiff formulation at
    131k nodes / 2M edges — tools/bench_fused_kernel2.json), so they are
    the production default whenever they can run natively: on the TPU
    backend and outside fp32-parity precision mode.  ``fits_vmem`` still
    gates per-layout at the call site.
    """
    if jax.default_backend() != "tpu":
        return False
    return jax.config.jax_default_matmul_precision not in _PARITY_PRECISIONS


def _attention_kernel(
    rel_ref,    # [1, Et/128, 128] int32 — rel dst key per slot
    m_ref,      # [1, Et, 2D] bf16 — gathered sender rows [m1 ‖ m2]
    ud_ref,     # [1, nb, 2D]      — destination-side rows [u1 ‖ u2]
    c_ref,      # [1, nb, 1]  f32  — destination-domain flag per row
    a1_ref,     # [1, D] f32 — GATv2 logit vector, t2s branch
    a2_ref,     # [1, D] f32 — GATv2 logit vector, s2t branch
    out_ref,    # [1, nb, 2D] f32 — [r1 ‖ r2] (branch select happens outside)
    alpha_ref,  # [1, Et, 1] f32 — attention weights (bwd residual)
    oh,         # VMEM scratch [nb, Et] bf16
    *,
    node_block: int,
    negative_slope: float,
):
    nb = node_block
    et = m_ref.shape[1]
    dch = a1_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, 128), 0)
    for ci in range(et // 128):  # static unroll (probe: dynamic stores ok
        oh[:, ci * 128:(ci + 1) * 128] = (  # only on 128-aligned slices)
            rows == rel_ref[0, ci:ci + 1]
        ).astype(oh.dtype)

    ohv = oh[...]
    ones_nb = jnp.ones((nb, 1), jnp.float32)
    # column expansions: slot scalar = ohᵀ @ per-row scalar  (all MXU)
    hit = jax.lax.dot_general(ohv, ones_nb, (((0,), (0,)), ((), ())), **_DOT)
    c_slot = jax.lax.dot_general(
        ohv, c_ref[0], (((0,), (0,)), ((), ())), **_DOT
    )                                                   # [Et, 1]
    d_slots = jax.lax.dot_general(
        ohv, ud_ref[0], (((0,), (0,)), ((), ())), **_DOT
    )                                                   # [Et, 2D] f32

    z = m_ref[0].astype(jnp.float32) + d_slots
    h = jnp.where(z >= 0, z, negative_slope * z)        # f32 leaky_relu
    a1b = jnp.broadcast_to(a1_ref[...], (et, dch))
    a2b = jnp.broadcast_to(a2_ref[...], (et, dch))
    l1 = jnp.sum(h[:, :dch] * a1b, axis=1, keepdims=True)   # [Et, 1]
    l2 = jnp.sum(h[:, dch:] * a2b, axis=1, keepdims=True)
    lm = c_slot * l1 + (1.0 - c_slot) * l2
    lm = jnp.where(hit > 0, lm, _NEG)

    # block-max shift (scalar): exact softmax values, see module docstring
    mx = jnp.maximum(jnp.max(lm), _NEG)
    ex = jnp.exp(lm - mx) * hit                          # [Et, 1]
    den = jax.lax.dot_general(ohv, ex, (((1,), (0,)), ((), ())), **_DOT)
    den = jnp.where(den == 0, 1.0, den)                  # [nb, 1]
    den_slot = jax.lax.dot_general(
        ohv, den, (((0,), (0,)), ((), ())), **_DOT
    )
    # pad slots (rel == nb) miss every one-hot row -> den_slot 0 there;
    # guard again or 0/0 NaNs poison the final reduce (0 * NaN = NaN)
    alpha = ex / jnp.where(den_slot == 0, 1.0, den_slot)  # [Et, 1]
    alpha_ref[0] = alpha

    mw = (
        m_ref[0].astype(jnp.float32)
        * jnp.broadcast_to(alpha, (et, 2 * dch))
    ).astype(m_ref.dtype)
    out_ref[0] = jax.lax.dot_general(
        ohv, mw, (((1,), (0,)), ((), ())), **_DOT
    )


@functools.partial(
    jax.jit,
    static_argnames=("node_block", "negative_slope", "interpret"),
)
def _attention_call(
    rel_key,   # [B, Et] int32
    msg,       # [B, Et, 2D] bf16/f32
    u_dst_blk,  # [B, nb, 2D]
    c_blk,     # [B, nb, 1] f32
    a1,        # [1, D] f32
    a2,        # [1, D] f32
    node_block: int,
    negative_slope: float = 0.1,
    interpret: bool = False,
):
    B, Et, d2 = msg.shape
    nb = node_block
    et128 = Et // 128
    out, alpha = pl.pallas_call(
        functools.partial(
            _attention_kernel, node_block=nb,
            negative_slope=negative_slope,
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, et128, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Et, d2), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, nb, d2), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, nb, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, d2 // 2), lambda b: (0, 0)),
            pl.BlockSpec((1, d2 // 2), lambda b: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, nb, d2), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Et, 1), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, nb, d2), jnp.float32),
            jax.ShapeDtypeStruct((B, Et, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((nb, Et), msg.dtype)],
        interpret=interpret,
    )(
        rel_key.reshape(B, et128, 128), msg, u_dst_blk, c_blk, a1, a2,
    )
    return out, alpha


def _attention_bwd_kernel(
    rel_ref,    # [1, Et/128, 128] int32
    m_ref,      # [1, Et, 2D] bf16 — re-gathered sender rows
    ud_ref,     # [1, nb, 2D]      — destination-side rows
    c_ref,      # [1, nb, 1]  f32
    a1_ref,     # [1, D] f32
    a2_ref,     # [1, D] f32
    alpha_ref,  # [1, Et, 1] f32 — fwd attention weights (residual)
    dout_ref,   # [1, nb, D] f32 — output cotangent rows
    dm_ref,     # out [1, Et, 2D] bf16 — per-slot message cotangents
    dud_ref,    # out [1, nb, 2D] f32  — destination-row cotangents
    da_ref,     # out [1, 1, 2D] f32   — per-block [da1 ‖ da2] partials
    oh,         # VMEM scratch [nb, Et] bf16
    *,
    node_block: int,
    negative_slope: float,
):
    nb = node_block
    et = m_ref.shape[1]
    dch = a1_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, 128), 0)
    for ci in range(et // 128):
        oh[:, ci * 128:(ci + 1) * 128] = (
            rows == rel_ref[0, ci:ci + 1]
        ).astype(oh.dtype)
    ohv = oh[...]

    c_slot = jax.lax.dot_general(
        ohv, c_ref[0], (((0,), (0,)), ((), ())), **_DOT
    )                                                   # [Et, 1]
    d_slots = jax.lax.dot_general(
        ohv, ud_ref[0], (((0,), (0,)), ((), ())), **_DOT
    )
    z = m_ref[0].astype(jnp.float32) + d_slots          # [Et, 2D]
    alpha = alpha_ref[0]                                # [Et, 1]
    dout_slot = jax.lax.dot_general(
        ohv, dout_ref[0], (((0,), (0,)), ((), ())), **_DOT
    )                                                   # [Et, D]

    cb = jnp.broadcast_to(c_slot, (et, dch))
    m_f = m_ref[0].astype(jnp.float32)
    msel = cb * m_f[:, :dch] + (1.0 - cb) * m_f[:, dch:]
    dalpha = jnp.sum(msel * dout_slot, axis=1, keepdims=True)   # [Et,1]
    t = alpha * dalpha
    seg = jax.lax.dot_general(ohv, t, (((1,), (0,)), ((), ())), **_DOT)
    s_slot = jax.lax.dot_general(
        ohv, seg, (((0,), (0,)), ((), ())), **_DOT
    )
    dlm = t - alpha * s_slot                            # [Et, 1]
    dl1 = dlm * c_slot
    dl2 = dlm * (1.0 - c_slot)

    h = jnp.where(z >= 0, z, negative_slope * z)
    da1 = jnp.sum(h[:, :dch] * jnp.broadcast_to(dl1, (et, dch)),
                  axis=0, keepdims=True)                # [1, D]
    da2 = jnp.sum(h[:, dch:] * jnp.broadcast_to(dl2, (et, dch)),
                  axis=0, keepdims=True)
    g1 = jnp.where(z[:, :dch] > 0, 1.0, negative_slope)
    g2 = jnp.where(z[:, dch:] > 0, 1.0, negative_slope)
    a1b = jnp.broadcast_to(a1_ref[...], (et, dch))
    a2b = jnp.broadcast_to(a2_ref[...], (et, dch))
    dz1 = jnp.broadcast_to(dl1, (et, dch)) * a1b * g1
    dz2 = jnp.broadcast_to(dl2, (et, dch)) * a2b * g2

    w1 = alpha * c_slot
    w2 = alpha * (1.0 - c_slot)
    dm1 = jnp.broadcast_to(w1, (et, dch)) * dout_slot + dz1
    dm2 = jnp.broadcast_to(w2, (et, dch)) * dout_slot + dz2
    dm_ref[0, :, :dch] = dm1.astype(dm_ref.dtype)
    dm_ref[0, :, dch:] = dm2.astype(dm_ref.dtype)

    # destination-row cotangents: d = ohᵀ-expand ⇒ transpose = oh-reduce
    dud_ref[0, :, :dch] = jax.lax.dot_general(
        ohv, dz1.astype(m_ref.dtype), (((1,), (0,)), ((), ())), **_DOT
    )
    dud_ref[0, :, dch:] = jax.lax.dot_general(
        ohv, dz2.astype(m_ref.dtype), (((1,), (0,)), ((), ())), **_DOT
    )
    da_ref[0, 0:1, :dch] = da1
    da_ref[0, 0:1, dch:] = da2


@functools.partial(
    jax.jit,
    static_argnames=("node_block", "negative_slope", "interpret"),
)
def _attention_bwd_call(
    rel_key, msg, u_dst_blk, c_blk, a1, a2, alpha, dout_blk,
    node_block: int,
    negative_slope: float = 0.1,
    interpret: bool = False,
):
    B, Et, d2 = msg.shape
    nb = node_block
    et128 = Et // 128
    dm, dud, da = pl.pallas_call(
        functools.partial(
            _attention_bwd_kernel, node_block=nb,
            negative_slope=negative_slope,
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, et128, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Et, d2), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, nb, d2), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, nb, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, d2 // 2), lambda b: (0, 0)),
            pl.BlockSpec((1, d2 // 2), lambda b: (0, 0)),
            pl.BlockSpec((1, Et, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, nb, d2 // 2), lambda b: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Et, d2), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, nb, d2), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, d2), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Et, d2), msg.dtype),
            jax.ShapeDtypeStruct((B, nb, d2), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, d2), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((nb, Et), msg.dtype)],
        interpret=interpret,
    )(rel_key.reshape(B, et128, 128), msg, u_dst_blk, c_blk, a1, a2,
      alpha, dout_blk)
    return dm, dud, da


def adapted_attention_bwd_pallas(
    lay,
    gathered_msg: jax.Array,   # [B, Et, 2D] (slot order of `lay`)
    u1_dst: jax.Array,
    u2_dst: jax.Array,
    central_f32: jax.Array,    # [N_out] f32
    a1: jax.Array,
    a2: jax.Array,
    alpha: jax.Array,          # [B, Et] f32 (fwd residual)
    dout: jax.Array,           # [N_out, D] cotangent
    negative_slope: float = 0.1,
    interpret: bool = False,
):
    """Per-block backward of the fused attention (everything except the
    src-keyed sender reduce, which the caller runs on the dm output).

    Returns (dm [B, Et, 2D], du1_dst, du2_dst, da1, da2)."""
    B, Et, nb = lay.num_blocks, lay.tile_e, lay.node_block
    dch = u1_dst.shape[-1]
    n_full = B * nb
    ud = jnp.concatenate([u1_dst, u2_dst], axis=-1)
    ud = jnp.pad(ud, ((0, n_full - ud.shape[0]), (0, 0)))
    ud_blk = ud.reshape(B, nb, 2 * dch).astype(gathered_msg.dtype)
    c_pad = jnp.pad(central_f32, (0, n_full - central_f32.shape[0]))
    c_blk = c_pad.reshape(B, nb, 1).astype(jnp.float32)
    dout_pad = jnp.pad(
        dout.astype(jnp.float32), ((0, n_full - dout.shape[0]), (0, 0))
    )
    dout_blk = dout_pad.reshape(B, nb, dch)
    dm, dud, da = _attention_bwd_call(
        lay.rel_key, gathered_msg, ud_blk, c_blk,
        a1.reshape(1, dch).astype(jnp.float32),
        a2.reshape(1, dch).astype(jnp.float32),
        alpha.reshape(B, Et, 1).astype(jnp.float32),
        dout_blk, nb, negative_slope, interpret=interpret,
    )
    dud_flat = dud.reshape(n_full, 2 * dch)
    du1_dst = dud_flat[: u1_dst.shape[0], :dch]
    du2_dst = dud_flat[: u2_dst.shape[0], dch:]
    da_sum = jnp.sum(da[:, 0, :], axis=0)
    return dm, du1_dst, du2_dst, da_sum[:dch], da_sum[dch:]


def adapted_attention_fwd_pallas(
    lay,
    gathered_msg: jax.Array,   # [B, Et, 2D] (slot order of `lay`)
    u1_dst: jax.Array,         # [N_out, D]
    u2_dst: jax.Array,         # [N_out, D]
    central_f32: jax.Array,    # [N_out] f32
    a1: jax.Array,             # [D]
    a2: jax.Array,             # [D]
    negative_slope: float = 0.1,
    interpret: bool = False,
):
    """Returns (out [N_out, D] f32, alpha [B, Et] f32, c_slot [B, Et]).

    ``gathered_msg`` is the [u1 ‖ u2] sender-row gather in ``lay``'s slot
    order (the caller owns the gather so its custom VJP can reuse it)."""
    B, Et, nb = lay.num_blocks, lay.tile_e, lay.node_block
    dch = u1_dst.shape[-1]
    n_full = B * nb
    ud = jnp.concatenate([u1_dst, u2_dst], axis=-1)
    ud = jnp.pad(ud, ((0, n_full - ud.shape[0]), (0, 0)))
    ud_blk = ud.reshape(B, nb, 2 * dch).astype(gathered_msg.dtype)
    c_pad = jnp.pad(central_f32, (0, n_full - central_f32.shape[0]))
    c_blk = c_pad.reshape(B, nb, 1).astype(jnp.float32)
    out, alpha = _attention_call(
        lay.rel_key, gathered_msg, ud_blk, c_blk,
        a1.reshape(1, dch).astype(jnp.float32),
        a2.reshape(1, dch).astype(jnp.float32),
        nb, negative_slope, interpret=interpret,
    )
    r = out.reshape(n_full, 2 * dch)[: central_f32.shape[0]]
    is_c = central_f32[:, None] > 0.5
    res = jnp.where(is_c, r[:, :dch], r[:, dch:])
    alpha = alpha.reshape(B, Et)
    c_slot = None  # derivable; the bwd recomputes it via block expand
    return res, alpha, c_slot


# ------------------------------------------------------- selective variant
#
# Branch-selected twins (VERDICT r4 #4): per edge slot only the branch
# matching the DESTINATION's domain is consumed, so the caller gathers
# the selected rows only (ops.gather_slots_sel — the select rides the
# gather index over the stacked [2N, D] table). Every kernel tensor is D
# wide instead of 2D: HBM reads of the gathered slots, the dst-row
# expands, the leaky_relu/logit math, and the out/dm writes all halve.
# The gather engine is issue-rate-bound (DESIGN.md §2), so gather time
# is unchanged — the savings are pure. Same block-max softmax semantics
# and VMEM discipline as the concatenated kernels above.

def _attention_sel_kernel(
    rel_ref,    # [1, Et/128, 128] int32
    m_ref,      # [1, Et, D] bf16 — branch-SELECTED gathered sender rows
    udc_ref,    # [1, nb, D+128]  — [selected dst rows ‖ c ‖ 1 ‖ 0-pad]
    a1_ref,     # [1, D] f32
    a2_ref,     # [1, D] f32
    out_ref,    # [1, nb, D] f32
    ex_ref,     # [1, Et, 1] f32 — shifted softmax numerators (residual)
    den_ref,    # [1, nb, 1] f32 — per-destination denominators (residual)
    oh,         # VMEM scratch [nb, Et]
    *,
    node_block: int,
    negative_slope: float,
):
    """Pass-minimized selective forward: 4 MXU passes per block.

    The concatenated kernel spends 6 one-hot passes per block, 4 of them
    [*, 1] vector dots the MXU pads to 128 lanes — D-independent cost
    that dominated the kernel (measured: halving D via the selective
    gather moved fwd only 15.4->14.9 ms, results_fused_sel_tpu.json).
    Here (a) the dst rows, the domain flag and the hit column share ONE
    packed [nb, D+128] operand, and (b) the softmax denominator is
    divided AT THE DESTINATION after the reduce (out = (Σ ex·m)/den)
    instead of being expanded back to slots — den_slot and the slot
    division disappear. Residuals are (ex, den); alpha = ex·(1/den)
    expanded — the caller reconstructs it outside when the backward
    needs it."""
    nb = node_block
    et = m_ref.shape[1]
    dch = a1_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, 128), 0)
    for ci in range(et // 128):
        oh[:, ci * 128:(ci + 1) * 128] = (
            rows == rel_ref[0, ci:ci + 1]
        ).astype(oh.dtype)
    ohv = oh[...]
    big = jax.lax.dot_general(
        ohv, udc_ref[0], (((0,), (0,)), ((), ())), **_DOT
    )                                                   # [Et, D+128]
    d_slots = big[:, :dch]
    c_slot = big[:, dch:dch + 1]
    hit = big[:, dch + 1:dch + 2]
    z = m_ref[0].astype(jnp.float32) + d_slots
    h = jnp.where(z >= 0, z, negative_slope * z)
    a1b = jnp.broadcast_to(a1_ref[...], (et, dch))
    a2b = jnp.broadcast_to(a2_ref[...], (et, dch))
    l1 = jnp.sum(h * a1b, axis=1, keepdims=True)
    l2 = jnp.sum(h * a2b, axis=1, keepdims=True)
    lm = c_slot * l1 + (1.0 - c_slot) * l2
    lm = jnp.where(hit > 0, lm, _NEG)

    mx = jnp.maximum(jnp.max(lm), _NEG)
    ex = jnp.exp(lm - mx) * hit
    ex_ref[0] = ex
    den = jax.lax.dot_general(ohv, ex, (((1,), (0,)), ((), ())), **_DOT)
    den = jnp.where(den == 0, 1.0, den)
    den_ref[0] = den
    mw = (
        m_ref[0].astype(jnp.float32) * jnp.broadcast_to(ex, (et, dch))
    ).astype(m_ref.dtype)
    acc = jax.lax.dot_general(
        ohv, mw, (((1,), (0,)), ((), ())), **_DOT
    )                                                   # [nb, D]
    out_ref[0] = acc / jnp.broadcast_to(den, (nb, dch))


@functools.partial(
    jax.jit,
    static_argnames=("node_block", "negative_slope", "interpret"),
)
def _attention_sel_call(
    rel_key, msg, udc_blk, a1, a2,
    node_block: int,
    negative_slope: float = 0.1,
    interpret: bool = False,
):
    """Returns (out [B, nb, D] f32, ex [B, Et, 1] f32, den [B, nb, 1]).

    ``udc_blk`` is the packed [B, nb, D+128] operand ([u_dst_selected ‖
    central ‖ 1 ‖ 0-pad], see _attention_sel_kernel)."""
    B, Et, d = msg.shape
    nb = node_block
    et128 = Et // 128
    dp = udc_blk.shape[-1]
    out, ex, den = pl.pallas_call(
        functools.partial(
            _attention_sel_kernel, node_block=nb,
            negative_slope=negative_slope,
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, et128, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Et, d), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, nb, dp), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, d), lambda b: (0, 0)),
            pl.BlockSpec((1, d), lambda b: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, nb, d), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Et, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, nb, 1), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, nb, d), jnp.float32),
            jax.ShapeDtypeStruct((B, Et, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, nb, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((nb, Et), msg.dtype)],
        interpret=interpret,
    )(rel_key.reshape(B, et128, 128), msg, udc_blk, a1, a2)
    return out, ex, den


def _attention_sel_bwd_kernel(
    rel_ref,    # [1, Et/128, 128] int32
    m_ref,      # [1, Et, D] bf16 — re-gathered SELECTED sender rows
    udc_ref,    # [1, nb, D+128]  — packed [selected dst rows ‖ c ‖ 1]
    a1_ref,     # [1, D] f32
    a2_ref,     # [1, D] f32
    alpha_ref,  # [1, Et, 1] f32
    dout_ref,   # [1, nb, D] f32
    dm_ref,     # out [1, Et, D] bf16
    dud_ref,    # out [1, nb, D] f32
    da_ref,     # out [1, 1, 2D] f32 — [da1 ‖ da2] per-block partials
    oh,         # VMEM scratch [nb, Et]
    *,
    node_block: int,
    negative_slope: float,
):
    nb = node_block
    et = m_ref.shape[1]
    dch = a1_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, 128), 0)
    for ci in range(et // 128):
        oh[:, ci * 128:(ci + 1) * 128] = (
            rows == rel_ref[0, ci:ci + 1]
        ).astype(oh.dtype)
    ohv = oh[...]

    big = jax.lax.dot_general(
        ohv, udc_ref[0], (((0,), (0,)), ((), ())), **_DOT
    )                                                   # [Et, D+128]
    d_slots = big[:, :dch]
    c_slot = big[:, dch:dch + 1]
    m_f = m_ref[0].astype(jnp.float32)
    z = m_f + d_slots                                   # [Et, D]
    alpha = alpha_ref[0]                                # [Et, 1]
    dout_slot = jax.lax.dot_general(
        ohv, dout_ref[0], (((0,), (0,)), ((), ())), **_DOT
    )                                                   # [Et, D]

    dalpha = jnp.sum(m_f * dout_slot, axis=1, keepdims=True)
    t = alpha * dalpha
    seg = jax.lax.dot_general(ohv, t, (((1,), (0,)), ((), ())), **_DOT)
    s_slot = jax.lax.dot_general(
        ohv, seg, (((0,), (0,)), ((), ())), **_DOT
    )
    dlm = t - alpha * s_slot
    dl1 = dlm * c_slot
    dl2 = dlm * (1.0 - c_slot)

    h = jnp.where(z >= 0, z, negative_slope * z)
    da1 = jnp.sum(h * jnp.broadcast_to(dl1, (et, dch)), axis=0,
                  keepdims=True)
    da2 = jnp.sum(h * jnp.broadcast_to(dl2, (et, dch)), axis=0,
                  keepdims=True)
    g = jnp.where(z > 0, 1.0, negative_slope)
    a1b = jnp.broadcast_to(a1_ref[...], (et, dch))
    a2b = jnp.broadcast_to(a2_ref[...], (et, dch))
    dz = (jnp.broadcast_to(dl1, (et, dch)) * a1b
          + jnp.broadcast_to(dl2, (et, dch)) * a2b) * g
    dm = jnp.broadcast_to(alpha, (et, dch)) * dout_slot + dz
    dm_ref[0] = dm.astype(dm_ref.dtype)
    dud_ref[0] = jax.lax.dot_general(
        ohv, dz.astype(m_ref.dtype), (((1,), (0,)), ((), ())), **_DOT
    )
    da_ref[0, 0:1, :dch] = da1
    da_ref[0, 0:1, dch:] = da2


@functools.partial(
    jax.jit,
    static_argnames=("node_block", "negative_slope", "interpret"),
)
def _attention_sel_bwd_call(
    rel_key, msg, udc_blk, a1, a2, alpha, dout_blk,
    node_block: int,
    negative_slope: float = 0.1,
    interpret: bool = False,
):
    B, Et, d = msg.shape
    nb = node_block
    et128 = Et // 128
    dp = udc_blk.shape[-1]
    dm, dud, da = pl.pallas_call(
        functools.partial(
            _attention_sel_bwd_kernel, node_block=nb,
            negative_slope=negative_slope,
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, et128, 128), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, Et, d), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, nb, dp), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, d), lambda b: (0, 0)),
            pl.BlockSpec((1, d), lambda b: (0, 0)),
            pl.BlockSpec((1, Et, 1), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, nb, d), lambda b: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, Et, d), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, nb, d), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, 2 * d), lambda b: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Et, d), msg.dtype),
            jax.ShapeDtypeStruct((B, nb, d), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, 2 * d), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((nb, Et), msg.dtype)],
        interpret=interpret,
    )(rel_key.reshape(B, et128, 128), msg, udc_blk, a1, a2,
      alpha, dout_blk)
    return dm, dud, da
