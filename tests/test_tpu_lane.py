"""Real-chip test lane (VERDICT r1 item 6).

These tests exercise compiled-mode kernels and the flagship model on the
actual TPU. They auto-skip in the default CPU suite (conftest pins the
cpu platform unless BGNN_TPU_TESTS=1). Run detached per STATUS.md:

    BGNN_TPU_TESTS=1 timeout 1200 python -m pytest tests/ -m tpu -q

Oracles are numpy recomputations on the host, so parity here is
CPU-vs-TPU compiled-mode agreement for the production kernels.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.devices()[0].platform != "tpu",
        reason="needs the real chip (BGNN_TPU_TESTS=1)",
    ),
]


def _rand_graph(rng, n=4096, e=32768):
    s = rng.integers(0, n, size=e).astype(np.int32)
    r = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
    return s, r


def test_blocked_spmm_compiled_parity(rng):
    """segment_sum_blocked on-chip == numpy segment sum (bf16 tolerance)."""
    from bridged_gnn_tpu.ops.blocked_segment import (
        build_block_meta,
        spmm_blocked,
    )

    n, e, d = 4096, 32768, 64
    s, r = _rand_graph(rng, n, e)
    x = rng.normal(size=(n, d)).astype(np.float32)
    em = np.ones(e, dtype=bool)
    meta = build_block_meta(r, n, 256)
    out = np.asarray(
        spmm_blocked(
            jnp.asarray(x, dtype=jnp.bfloat16), jnp.asarray(s),
            jnp.asarray(r), jnp.asarray(em), meta, n,
        )
    ).astype(np.float32)
    ref = np.zeros((n, d), dtype=np.float64)
    np.add.at(ref, r, x[s])
    # bf16 inputs, f32 accumulate: row-relative error bounded by bf16 eps
    denom = np.maximum(np.abs(ref), 1.0)
    assert (np.abs(out - ref) / denom).max() < 0.05


def test_dense_from_edges_compiled_parity(rng):
    from bridged_gnn_tpu.ops.blocked_segment import (
        build_block_meta,
        dense_from_edges,
    )

    n, e = 512, 4096
    s, r = _rand_graph(rng, n, e)
    w = rng.normal(size=e).astype(np.float32)
    meta = build_block_meta(r, n, 128)
    mat = np.asarray(
        dense_from_edges(
            jnp.asarray(w), jnp.asarray(s), jnp.asarray(r),
            jnp.asarray(meta.block_start), n, meta.node_block,
            meta.max_edges, meta.num_blocks,
        )
    )
    ref = np.zeros((n, n), dtype=np.float64)
    np.add.at(ref, (r, s), w)
    np.testing.assert_allclose(mat, ref, rtol=1e-4, atol=1e-4)


def test_segment_softmax_blocked_compiled_parity(rng):
    from bridged_gnn_tpu.ops.blocked_segment import (
        build_block_meta,
        segment_softmax_blocked,
    )

    n, e = 1024, 8192
    s, r = _rand_graph(rng, n, e)
    logits = rng.normal(size=e).astype(np.float32) * 3
    em = np.ones(e, dtype=bool)
    meta = build_block_meta(r, n, 128)
    alpha = np.asarray(
        segment_softmax_blocked(
            jnp.asarray(logits), jnp.asarray(r), jnp.asarray(em),
            jnp.asarray(meta.block_start), n, meta.node_block,
            meta.max_edges, meta.num_blocks,
        )
    )
    # per-segment sums are 1 wherever a segment has edges
    sums = np.zeros(n)
    np.add.at(sums, r, alpha)
    has = np.zeros(n, dtype=bool)
    has[r] = True
    np.testing.assert_allclose(sums[has], 1.0, rtol=1e-4)
    # matches direct per-segment softmax
    ref = np.zeros_like(alpha)
    for v in np.unique(r[:200]):
        sel = r == v
        z = logits[sel] - logits[sel].max()
        ref_sel = np.exp(z) / np.exp(z).sum()
        np.testing.assert_allclose(alpha[sel], ref_sel, rtol=1e-3,
                                   atol=1e-5)
        ref[sel] = ref_sel


def test_flagship_training_on_chip(a2d_dict):
    """KTGNN training on the shipped a2d graph runs compiled on the chip:
    finite losses, learning, warm epochs under a loose bound (round-1
    measured 0.25 s/epoch eager, 0.076 s scan — results_a2d_tpu_timing)."""
    from bridged_gnn_tpu.train.stage2 import Stage2Config, train_ktgnn

    res = train_ktgnn(
        dict(a2d_dict),
        Stage2Config(num_epoch=12, to_undirected=True, log_every=0),
    )
    assert np.isfinite(res["best"]["loss"])
    assert res["history"][-1]["loss"] < res["history"][0]["loss"]
    assert res["mean_epoch_time"] < 2.0, res["mean_epoch_time"]


def test_pallas_reduce_compiled_parity(rng):
    """Compiled Mosaic padded reduce (ops/pallas_padded.py, big-dot
    kernel) is bit-exact vs the XLA batched dot_general twin."""
    from bridged_gnn_tpu.ops import blocked_segment as bs
    from bridged_gnn_tpu.ops import pallas_padded as pp

    n, e = 4096, 32768
    s = rng.integers(0, n, size=e).astype(np.int32)
    r = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
    lay = bs.build_padded_layout(
        r, s, np.arange(e), np.ones(e, bool), n, 256
    )
    x = jnp.asarray(
        rng.normal(size=(n, 128)).astype(np.float32), jnp.bfloat16
    )
    vals = x[lay.other_slot].reshape(lay.num_blocks, lay.tile_e, 128)
    got = np.asarray(pp.slot_reduce_pallas(lay, vals), np.float32)
    want = np.asarray(bs.padded_slot_reduce(lay, vals), np.float32)
    np.testing.assert_array_equal(got, want)


def test_fused_attention_kernel_compiled(rng):
    """Compiled single-kernel attention forward (ops/pallas_fused.py)
    matches the XLA fused path on-chip (bf16 rounding-order tolerance)."""
    from bridged_gnn_tpu.ops.blocked_segment import make_blocked_ops
    from bridged_gnn_tpu.ops.fused_attention import (
        adapted_attention,
        make_adapted_attention,
    )

    n, e, d = 4096, 32768, 64
    s = rng.integers(0, n, size=e).astype(np.int32)
    r = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
    em = np.ones(e, bool)
    ops = make_blocked_ops(s, r, em, n, node_block=128)
    u1 = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32),
                     jnp.bfloat16)
    u2 = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32),
                     jnp.bfloat16)
    a1 = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    a2 = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    central = np.arange(n) < n // 2
    cf = jnp.asarray(central.astype(np.float32))

    kfn = make_adapted_attention(ops, 0.1, kernel_fwd=True,
                                 kernel_bwd=True)
    got = np.asarray(kfn(u1, u2, u1, u2, cf, a1, a2), np.float32)
    want = np.asarray(
        adapted_attention(
            ops, u1, u2, jnp.asarray(central),
            lambda h: (h @ a1.astype(h.dtype))[..., None],
            lambda h: (h @ a2.astype(h.dtype))[..., None],
            negative_slope=0.1,
        ),
        np.float32,
    )
    scale = max(np.abs(want).max(), 1e-6)
    assert np.abs(got - want).max() / scale < 0.08

    # compiled Mosaic backward kernel: grads finite and close to the
    # autodiff XLA fused path (bf16 rounding-order tolerance)
    cot = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

    def loss_k(u1, u2):
        return jnp.sum(
            kfn(u1, u2, u1, u2, cf, a1, a2).astype(jnp.float32)
            * cot
        )

    def loss_x(u1, u2):
        return jnp.sum(
            adapted_attention(
                ops, u1, u2, jnp.asarray(central),
                lambda h: (h @ a1.astype(h.dtype))[..., None],
                lambda h: (h @ a2.astype(h.dtype))[..., None],
                negative_slope=0.1,
            ).astype(jnp.float32) * cot
        )

    gk = jax.grad(loss_k, argnums=(0, 1))(u1, u2)
    gx = jax.grad(loss_x, argnums=(0, 1))(u1, u2)
    for a, b in zip(gk, gx):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert np.isfinite(a).all()
        sc = max(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() / sc < 0.35  # bf16 jacobian rounding


def test_auto_kernel_engages_on_chip(rng):
    """The None (auto) fused-kernel flags must switch KTGNN onto the
    Mosaic attention kernel on the TPU backend once the caller leaves
    fp32-parity precision mode — the production default policy."""
    from bridged_gnn_tpu.graph import build_graph
    from bridged_gnn_tpu.nn.ktgnn import KTGNN
    from bridged_gnn_tpu.ops import pallas_fused
    from bridged_gnn_tpu.ops.spmm import adjacency_from_graph

    assert pallas_fused.auto_kernel() is False  # package parity default
    with jax.default_matmul_precision("default"):
        assert pallas_fused.auto_kernel() is True

        n, e = 20000, 120000
        x = rng.normal(size=(n, 32)).astype(np.float32)
        ei = rng.integers(0, n, size=(2, e))
        y = rng.integers(0, 4, size=n)
        central = np.zeros(n, bool)
        central[: n // 2] = True
        g = build_graph(x, ei, y=y, central_mask=central)
        adj = adjacency_from_graph(g, method="blocked", node_block=128)
        assert adj.fast_fn is not None

        # count kernel-path entries via fits_vmem (only consulted when
        # the kernel forward is selected)
        calls = {"n": 0}
        orig = pallas_fused.fits_vmem

        def counting(te, nb, d, itemsize=4, **kw):
            calls["n"] += 1
            return orig(te, nb, d, itemsize, **kw)

        pallas_fused.fits_vmem = counting
        try:
            m = KTGNN(num_classes=4, layer_num=2, hidden=32)
            v = m.init(jax.random.PRNGKey(0), g, adj, False)
            (logs, _, _, _), _ = m.apply(
                v, g, adj, False, mutable=["batch_stats"]
            )
            assert np.isfinite(np.asarray(logs)).all()
        finally:
            pallas_fused.fits_vmem = orig
        assert calls["n"] > 0


def test_approx_topk_recall_on_chip(rng):
    """lax.approx_max_k selection in the SDDMM harness: observed recall
    on cosine scores must meet the recall target (production knob,
    11x faster than the exact sort at 49k scale —
    tools/probe_topk_cosine.json)."""
    from bridged_gnn_tpu.ops.sddmm import (
        blockwise_pair_scores_topk,
        cosine_score_block,
    )

    nt, ns, d, k = 2048, 8192, 64, 20
    zt = rng.normal(size=(nt, d)).astype(np.float32)
    zs = rng.normal(size=(ns, d)).astype(np.float32)
    fn = cosine_score_block(jnp.asarray(zt), jnp.asarray(zs))
    ve, ie = blockwise_pair_scores_topk(fn, nt, ns, k, row_block=512)
    va, ia = blockwise_pair_scores_topk(fn, nt, ns, k, row_block=512,
                                        approx_recall=0.95)
    ie, ia = np.asarray(ie)[:nt], np.asarray(ia)[:nt]
    recall = np.mean(
        [len(set(ie[r]) & set(ia[r])) / k for r in range(nt)]
    )
    assert recall >= 0.93, recall


def test_train_ktgnn_production_mode_uses_kernel(rng):
    """train_ktgnn with matmul_precision='default' on the chip must build
    the nb=128 layout and enter the Mosaic kernel path (auto policy end
    to end through the stage-2 driver)."""
    from bridged_gnn_tpu.ops import pallas_fused
    from bridged_gnn_tpu.train.stage2 import Stage2Config, train_ktgnn

    n, e, c = 20000, 120000, 4
    y = rng.integers(0, c, size=n)
    x = rng.normal(size=(n, 32)).astype(np.float32)
    central = np.zeros(n, bool)
    central[: n // 2] = True
    r = rng.random(n)
    data = dict(
        x=x, edge_index=rng.integers(0, n, size=(2, e)), y=y,
        train_mask=r < 0.6, val_mask=(r >= 0.6) & (r < 0.8),
        test_mask=r >= 0.8, central_mask=central,
    )
    calls = {"n": 0, "ok": 0}
    orig = pallas_fused.fits_vmem

    def counting(te, nb, d, itemsize=4, **kw):
        res = orig(te, nb, d, itemsize, **kw)
        calls["n"] += 1
        calls["ok"] += int(res)
        return res

    pallas_fused.fits_vmem = counting
    try:
        cfg = Stage2Config(
            num_epoch=3, hidden=32, use_scheduler=False,
            to_undirected=False, matmul_precision="default",
            adjacency_method="blocked", log_every=10,
        )
        res = train_ktgnn(data, cfg)
        assert np.isfinite(res["history"][-1]["loss"])
    finally:
        pallas_fused.fits_vmem = orig
    assert calls["n"] > 0 and calls["ok"] > 0, calls


def test_stage1_device_sampling_on_chip():
    """Device-resident sampling + eval compile and train on the real
    chip: a short scan-mode stage-1 run with device_sampling ends with a
    finite loss and a populated best dict."""
    from bridged_gnn_tpu.data import dataset_conversion
    from bridged_gnn_tpu.data.synthetic import make_sync_dataset
    from bridged_gnn_tpu.train.stage1 import Stage1Config, train_adversarial

    data = make_sync_dataset(
        "relational-intra", n_src=2000, n_tar=1500, dim=32,
        num_classes=4, avg_degree=6, seed=0,
    )
    src_d, tar_d, _, _ = dataset_conversion(dict(data), seed=0)
    # enough epochs that cross-val pair F1 rises above zero: best only
    # updates on val[4] > 0 (the reference's strictly-greater selection,
    # scripts.py:524), and an 8-epoch run's all-negative cross
    # predictions are fp-ordering-sensitive — the old 8-epoch form
    # flipped between backends/compilers
    cfg = Stage1Config(
        hidden_dim=32, num_epoch=24, start_eval_epoch=8, eval_per_epoch=4,
        sample_size=4096, max_class_num=4, sim_mode="mlp", backbone="mlp",
        eval_sample_size=4096, scan_epochs=4, device_sampling=True,
        repeat=1, seed=0,
    )
    res = train_adversarial(src_d, tar_d, cfg)
    assert res["best"]["epoch"] > 0
    assert all(0.0 <= v <= 1.0 for v in res["best"]["val"])


@pytest.mark.parametrize("d,msg_dtype", [(256, jnp.bfloat16),
                                         (128, jnp.float32)])
def test_fused_attention_kernel_wide_shapes_on_chip(rng, d, msg_dtype):
    """Widened kernel coverage (VERDICT r2 item 3): compiled fwd+bwd
    Mosaic kernels at D=256 (bf16) and f32 message dtype, at tile sizes
    inside the MEASURED backward envelope (tools/probe_bwd_vmem*.json).
    Inputs are scaled so per-block logit spreads stay inside the
    block-max-shift envelope (pallas_fused.SOFTMAX_SPREAD_LIMIT), as
    trained models do."""
    from bridged_gnn_tpu.ops.blocked_segment import make_blocked_ops
    from bridged_gnn_tpu.ops.fused_attention import (
        adapted_attention,
        make_adapted_attention,
    )
    from bridged_gnn_tpu.ops.pallas_fused import fits_vmem_bwd

    n, e = 4096, 32768
    s = rng.integers(0, n, size=e).astype(np.int32)
    r = np.sort(rng.integers(0, n, size=e)).astype(np.int32)
    em = np.ones(e, bool)
    ops = make_blocked_ops(s, r, em, n, node_block=128)
    item = 2 if msg_dtype == jnp.bfloat16 else 4
    assert fits_vmem_bwd(ops.lay_dst.tile_e, 128, d, itemsize=item), (
        f"layout Et={ops.lay_dst.tile_e} outside measured bwd envelope"
    )
    sc = 0.25 / np.sqrt(d / 64.0)
    u1 = jnp.asarray(sc * rng.normal(size=(n, d)).astype(np.float32),
                     msg_dtype)
    u2 = jnp.asarray(sc * rng.normal(size=(n, d)).astype(np.float32),
                     msg_dtype)
    a1 = jnp.asarray(sc * rng.normal(size=(d,)).astype(np.float32))
    a2 = jnp.asarray(sc * rng.normal(size=(d,)).astype(np.float32))
    central = np.arange(n) < n // 2
    cf = jnp.asarray(central.astype(np.float32))

    kfn = make_adapted_attention(ops, 0.1, kernel_fwd=True,
                                 kernel_bwd=True)
    got = np.asarray(kfn(u1, u2, u1, u2, cf, a1, a2), np.float32)
    want = np.asarray(
        adapted_attention(
            ops, u1, u2, jnp.asarray(central),
            lambda h: (h @ a1.astype(h.dtype))[..., None],
            lambda h: (h @ a2.astype(h.dtype))[..., None],
            negative_slope=0.1,
        ),
        np.float32,
    )
    scale = max(np.abs(want).max(), 1e-6)
    # f32 messages still run DEFAULT-precision (bf16-pass) dots in-VMEM
    # (HIGHEST lowering crashes Mosaic here — module docstring), so f32
    # parity is bf16-rounding-bounded too, just tighter than bf16 inputs
    tol_f = 0.08 if item == 2 else 0.01
    assert np.abs(got - want).max() / scale < tol_f

    cot = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

    def loss_k(u1, u2):
        return jnp.sum(
            kfn(u1, u2, u1, u2, cf, a1, a2).astype(jnp.float32) * cot
        )

    def loss_x(u1, u2):
        return jnp.sum(
            adapted_attention(
                ops, u1, u2, jnp.asarray(central),
                lambda h: (h @ a1.astype(h.dtype))[..., None],
                lambda h: (h @ a2.astype(h.dtype))[..., None],
                negative_slope=0.1,
            ).astype(jnp.float32) * cot
        )

    gk = jax.grad(loss_k, argnums=(0, 1))(u1, u2)
    gx = jax.grad(loss_x, argnums=(0, 1))(u1, u2)
    tol_b = 0.35 if item == 2 else 0.1
    for a, b in zip(gk, gx):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        assert np.isfinite(a).all()
        sc2 = max(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() / sc2 < tol_b


@pytest.mark.tpu
def test_auto_memory_policy_never_ooms_where_plain_chosen():
    """VERDICT r3 item 7 done-criterion: near the tier threshold, when
    the auto policy keeps a stored-residual tier (plain/xla_plain), one
    real train step must execute without OOM on the chip. 393k nodes /
    6.7M edges sits in the band the old 2-tier policy sent to lean; the
    recalibrated policy keeps xla_plain there (measured assignment peak
    9.50 G of 15.75 G HBM)."""
    import numpy as np

    from bridged_gnn_tpu.train.stage2 import (
        Stage2Config,
        prepare_stage2_graph,
        resolve_memory_mode,
        train_ktgnn,
    )

    rng = np.random.default_rng(0)
    n = 393216
    e = 17 * n
    data = dict(
        x=rng.normal(size=(n, 128)).astype(np.float32),
        edge_index=np.stack([rng.integers(0, n, size=e),
                             rng.integers(0, n, size=e)]),
        y=rng.integers(0, 8, size=n).astype(np.int64),
        train_mask=rng.random(n) < 0.6,
        val_mask=rng.random(n) < 0.1,
        test_mask=rng.random(n) < 0.1,
        central_mask=np.arange(n) % 2 == 0,
    )
    cfg = Stage2Config(hidden=64, num_epoch=1, message_dtype="bfloat16",
                       matmul_precision="default", log_every=1)
    g, adj = prepare_stage2_graph(data, cfg)
    mode = resolve_memory_mode(g, adj, cfg)
    assert mode in ("plain", "xla_plain", "lean")
    # the recalibration's point: this size must NOT need lean
    assert mode != "lean", mode
    res = train_ktgnn(data, cfg)
    assert np.isfinite([h["loss"] for h in res["history"]]).all()
