"""Single-kernel fused attention forward (ops/pallas_fused.py) parity —
interpreter mode on CPU; the compiled twin runs in the TPU lane
(tests/test_tpu_lane.py). Covers reference models/KTGNN.py:263-315."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bridged_gnn_tpu.ops.blocked_segment import make_blocked_ops
from bridged_gnn_tpu.ops.fused_attention import make_adapted_attention

from tests.test_fused_attention import _oracle, _random_graph


@pytest.mark.parametrize("node_block", [16, 64])
def test_kernel_fwd_matches_oracle_and_grads(rng, node_block):
    n, n_pad = 50, 64
    s, r, em = _random_graph(rng)
    d = 8
    u1 = jnp.asarray(rng.normal(size=(n_pad, d)).astype(np.float32))
    u2 = jnp.asarray(rng.normal(size=(n_pad, d)).astype(np.float32))
    a1 = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    a2 = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    central = np.zeros(n_pad, bool)
    central[: n // 2] = True
    central_f = jnp.asarray(central.astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(n_pad, d)).astype(np.float32))
    ops = make_blocked_ops(s, r, em, n_pad, node_block=node_block)

    fused_k = make_adapted_attention(
        ops, 0.1, kernel_fwd=True, interpret=True
    )
    fused_x = make_adapted_attention(ops, 0.1)

    def fk(u1, u2, a1, a2):
        return fused_k(u1, u2, u1, u2, central_f, a1, a2)

    def fx(u1, u2, a1, a2):
        return fused_x(u1, u2, u1, u2, central_f, a1, a2)

    out_k = fk(u1, u2, a1, a2)
    out_x = fx(u1, u2, a1, a2)
    want = _oracle(
        u1, u2, jnp.asarray(central), a1, a2,
        jnp.asarray(s), jnp.asarray(r), jnp.asarray(em), n_pad, 0.1,
    )
    mask = np.zeros(n_pad, bool)
    mask[:n] = True
    np.testing.assert_allclose(
        np.asarray(out_k)[mask], np.asarray(want)[mask],
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_k)[mask], np.asarray(out_x)[mask],
        rtol=1e-4, atol=1e-5,
    )

    # gradients: kernel-forward custom VJP vs the XLA recompute VJP
    def loss_k(*args):
        return jnp.sum(fk(*args)[mask.nonzero()[0]] * cot[mask])

    def loss_x(*args):
        return jnp.sum(fx(*args)[mask.nonzero()[0]] * cot[mask])

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(u1, u2, a1, a2)
    gx = jax.grad(loss_x, argnums=(0, 1, 2, 3))(u1, u2, a1, a2)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_ktgnn_kernel_fwd_matches(rng):
    """Model-level: KTGNN with the single-kernel attention forward
    (interpret mode on CPU) matches the production fused path."""
    import jax

    from bridged_gnn_tpu.graph import graph_from_dict, with_self_loops
    from bridged_gnn_tpu.nn.ktgnn import KTGNN
    from bridged_gnn_tpu.ops.spmm import adjacency_from_graph

    n, e, d, c = 60, 300, 16, 4
    ei = rng.integers(0, n, size=(2, e))
    central = np.zeros(n, dtype=bool)
    central[: n // 2] = True
    data = dict(
        x=rng.normal(size=(n, d)).astype(np.float32),
        edge_index=ei,
        y=rng.integers(0, c, size=n),
        train_mask=np.ones(n, dtype=bool),
        val_mask=np.zeros(n, dtype=bool),
        test_mask=np.zeros(n, dtype=bool),
        central_mask=central,
    )
    g = with_self_loops(graph_from_dict(data))
    adj = adjacency_from_graph(g, method="blocked", node_block=16)
    m0 = KTGNN(num_classes=c, layer_num=2, hidden=16, dropout=0.0)
    mk = KTGNN(num_classes=c, layer_num=2, hidden=16, dropout=0.0,
               fused_kernel_fwd=True)
    variables = m0.init(jax.random.PRNGKey(0), g, adj, False)
    out0 = m0.apply(variables, g, adj, False)
    outk = mk.apply(variables, g, adj, False)
    for a, b in zip(out0[:3], outk[:3]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_predictor_kernel_fwd(rng):
    """Serving: KTGNNPredictor(kernel_fwd=True) produces the same labels
    as the default path (CPU interpret mode)."""
    import jax

    from bridged_gnn_tpu.nn.ktgnn import KTGNN
    from bridged_gnn_tpu.ops.spmm import adjacency_from_graph
    from bridged_gnn_tpu.graph import graph_from_dict, with_self_loops
    from bridged_gnn_tpu.serve import KTGNNPredictor

    n, e, d, c = 48, 200, 12, 3
    data = dict(
        x=rng.normal(size=(n, d)).astype(np.float32),
        edge_index=rng.integers(0, n, size=(2, e)),
        y=rng.integers(0, c, size=n),
        train_mask=np.ones(n, dtype=bool),
        val_mask=np.zeros(n, dtype=bool),
        test_mask=np.zeros(n, dtype=bool),
        central_mask=np.arange(n) < n // 2,
    )
    model = KTGNN(num_classes=c, layer_num=2, hidden=8, dropout=0.0)
    g = with_self_loops(graph_from_dict(dict(data)))
    adj = adjacency_from_graph(g)
    variables = model.init(jax.random.PRNGKey(0), g, adj, False)

    p0 = KTGNNPredictor(model, variables, dict(data), to_undirected=False,
                        adjacency_method="blocked")
    pk = KTGNNPredictor(model, variables, dict(data), to_undirected=False,
                        adjacency_method="blocked", kernel_fwd=True)
    r0 = p0.predict()
    rk = pk.predict()
    for k in r0:
        np.testing.assert_allclose(r0[k], rk[k], rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("node_block", [16, 64])
def test_kernel_bwd_matches_xla_vjp(rng, node_block):
    """Full kernel custom-VJP (fwd AND bwd as Mosaic kernels, interpret
    mode) gradients match the XLA recompute VJP."""
    n, n_pad, d = 50, 64, 8
    s, r, em = _random_graph(rng)
    u1 = jnp.asarray(rng.normal(size=(n_pad, d)).astype(np.float32))
    u2 = jnp.asarray(rng.normal(size=(n_pad, d)).astype(np.float32))
    a1 = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    a2 = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    central = np.zeros(n_pad, bool)
    central[: n // 2] = True
    central_f = jnp.asarray(central.astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(n_pad, d)).astype(np.float32))
    mask = np.zeros(n_pad, bool)
    mask[:n] = True
    ops = make_blocked_ops(s, r, em, n_pad, node_block=node_block)

    fused_kk = make_adapted_attention(
        ops, 0.1, kernel_fwd=True, kernel_bwd=True, interpret=True
    )
    fused_x = make_adapted_attention(ops, 0.1)

    def loss(fn):
        def go(u1, u2, a1, a2):
            out = fn(u1, u2, u1, u2, central_f, a1, a2)
            return jnp.sum(out[mask.nonzero()[0]] * cot[mask])
        return go

    gk = jax.grad(loss(fused_kk), argnums=(0, 1, 2, 3))(u1, u2, a1, a2)
    gx = jax.grad(loss(fused_x), argnums=(0, 1, 2, 3))(u1, u2, a1, a2)
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )


def test_ktgnn_kernel_both_grads_match(rng):
    """Model-level: KTGNN(fused_kernel_fwd+bwd) gradients match the
    production autodiff path at f32 (interpret mode on CPU)."""
    import jax

    from bridged_gnn_tpu.graph import graph_from_dict, with_self_loops
    from bridged_gnn_tpu.nn.ktgnn import KTGNN
    from bridged_gnn_tpu.ops.spmm import adjacency_from_graph

    n, e, d, c = 60, 300, 16, 4
    data = dict(
        x=rng.normal(size=(n, d)).astype(np.float32),
        edge_index=rng.integers(0, n, size=(2, e)),
        y=rng.integers(0, c, size=n),
        train_mask=np.ones(n, dtype=bool),
        val_mask=np.zeros(n, dtype=bool),
        test_mask=np.zeros(n, dtype=bool),
        central_mask=np.arange(n) < n // 2,
    )
    g = with_self_loops(graph_from_dict(data))
    adj = adjacency_from_graph(g, method="blocked", node_block=16)
    m0 = KTGNN(num_classes=c, layer_num=2, hidden=16, dropout=0.0)
    mk = KTGNN(num_classes=c, layer_num=2, hidden=16, dropout=0.0,
               fused_kernel_fwd=True, fused_kernel_bwd=True)
    variables = m0.init(jax.random.PRNGKey(0), g, adj, False)

    def loss(model):
        def go(p):
            outs, _ = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                g, adj, True, rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"],
            )
            lp_s, lp_t, lp_that, _ = outs
            sel = np.asarray(g.train_mask)
            return -(lp_s[sel, 0].mean() + lp_t[sel, 1].mean()
                     + lp_that[sel, 2].mean())
        return go

    g0 = jax.grad(loss(m0))(variables["params"])
    gk = jax.grad(loss(mk))(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(gk)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


def test_auto_kernel_policy():
    """None-valued kernel flags resolve via pallas_fused.auto_kernel:
    off on the CPU backend and in fp32-parity precision mode; on only
    when both the TPU backend and a non-parity precision are active."""
    import jax

    from bridged_gnn_tpu.ops import pallas_fused

    # CPU test process: backend gate keeps auto off in any precision.
    assert pallas_fused.auto_kernel() is False
    with jax.default_matmul_precision("default"):
        assert pallas_fused.auto_kernel() is False

    # precision gate, independent of backend
    for p in pallas_fused._PARITY_PRECISIONS:
        with jax.default_matmul_precision(p):
            assert (jax.config.jax_default_matmul_precision
                    in pallas_fused._PARITY_PRECISIONS)


def test_explicit_false_overrides_auto(rng):
    """fused_kernel_fwd=False must never enter the kernel path even if
    auto would say yes (monkeypatched)."""
    import jax
    import numpy as np

    from bridged_gnn_tpu.graph import build_graph
    from bridged_gnn_tpu.nn.ktgnn import KTGNN
    from bridged_gnn_tpu.ops import pallas_fused
    from bridged_gnn_tpu.ops.spmm import adjacency_from_graph

    n, e = 700, 2100
    x = rng.normal(size=(n, 12)).astype(np.float32)
    ei = rng.integers(0, n, size=(2, e))
    y = rng.integers(0, 3, size=n)
    central = np.zeros(n, bool)
    central[: n // 2] = True
    g = build_graph(x, ei, y=y, central_mask=central)
    adj = adjacency_from_graph(g, method="blocked", node_block=128)

    orig = pallas_fused.auto_kernel
    calls = {"n": 0}

    def fake_auto():
        calls["n"] += 1
        return True

    pallas_fused.auto_kernel = fake_auto
    try:
        # explicit False: auto is never consulted for that flag and the
        # XLA path runs (interpret-mode Mosaic would still work on CPU,
        # but kernel selection must honor the override)
        m = KTGNN(num_classes=3, layer_num=2, hidden=8,
                  fused_kernel_fwd=False, fused_kernel_bwd=False)
        v = m.init(jax.random.PRNGKey(0), g, adj, False)
        out, _ = m.apply(v, g, adj, False,
                         mutable=["batch_stats"])[0][:2]
        assert np.isfinite(np.asarray(out)).all()
        assert calls["n"] == 0
    finally:
        pallas_fused.auto_kernel = orig


def test_auto_kernel_matches_explicit_on_cpu(rng):
    """With auto resolving False on CPU, default-flag KTGNN must equal
    the explicit fused_kernel_fwd=False model bit-for-bit."""
    import jax
    import numpy as np

    from bridged_gnn_tpu.graph import build_graph
    from bridged_gnn_tpu.nn.ktgnn import KTGNN
    from bridged_gnn_tpu.ops.spmm import adjacency_from_graph

    n, e = 600, 1800
    x = rng.normal(size=(n, 10)).astype(np.float32)
    ei = rng.integers(0, n, size=(2, e))
    y = rng.integers(0, 3, size=n)
    central = np.zeros(n, bool)
    central[: n // 2] = True
    g = build_graph(x, ei, y=y, central_mask=central)
    adj = adjacency_from_graph(g, method="blocked", node_block=128)

    m_auto = KTGNN(num_classes=3, layer_num=2, hidden=8)
    m_off = KTGNN(num_classes=3, layer_num=2, hidden=8,
                  fused_kernel_fwd=False, fused_kernel_bwd=False)
    v = m_auto.init(jax.random.PRNGKey(1), g, adj, False)
    oa = m_auto.apply(v, g, adj, False, mutable=["batch_stats"])[0][0]
    ob = m_off.apply(v, g, adj, False, mutable=["batch_stats"])[0][0]
    np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))


def test_fits_vmem_measured_envelope():
    """Pin the VMEM gate to the measured envelope: configurations proven
    to compile stay admitted; configurations that OOM'd the 16M scoped
    limit stay rejected (nb=256/Et=6912/D=16 f32 hit 23.4M —
    large-pipeline smoke; nb=256/Et=4352/D=128 bf16 overflowed the
    compile helper — probe round 3)."""
    from bridged_gnn_tpu.ops.pallas_fused import fits_vmem

    # proven good
    assert fits_vmem(2176, 128, 128, itemsize=2)   # bench config (bf16)
    assert fits_vmem(2176, 128, 64, itemsize=4)    # scale bench (f32)
    assert fits_vmem(2048, 256, 64, itemsize=2)
    # proven bad
    assert not fits_vmem(6912, 256, 16, itemsize=4)
    assert not fits_vmem(4352, 256, 128, itemsize=2)


def test_fits_vmem_bwd_measured_envelope():
    """Pin the backward gate to the on-chip probe (tools/
    probe_bwd_vmem*.json, VERDICT r2 item 3): every probed (nb, dtype, d)
    combo admits its last-good tile_e and rejects the next ladder rung
    (which crashed the remote compile helper); unprobed combos fall back
    to the fitted envelope, which must interpolate monotonically."""
    from bridged_gnn_tpu.ops.pallas_fused import (
        _BWD_MAX_ET,
        _bwd_et_limit,
        fits_vmem_bwd,
    )

    ladder = [512, 1024, 1536, 2176, 2560, 3072, 3584, 4352, 5120]
    for (nb, is_bf16, d), lim in _BWD_MAX_ET.items():
        item = 2 if is_bf16 else 4
        assert fits_vmem_bwd(lim, nb, d, itemsize=item)
        nxt = next(e for e in ladder if e > lim)
        assert not fits_vmem_bwd(nxt, nb, d, itemsize=item)

    # the proven production configs stay admitted
    assert fits_vmem_bwd(2176, 128, 128, itemsize=2)  # bench config
    assert fits_vmem_bwd(2176, 128, 64, itemsize=4)   # scale bench

    # fitted fallback: monotone non-increasing in d and nb, and bounded
    # by the bracketing probed limits at an unprobed d
    for item in (2, 4):
        lims = [_bwd_et_limit(128, d, item) for d in (64, 128, 192, 256)]
        assert all(a >= b for a, b in zip(lims, lims[1:]))
        assert _bwd_et_limit(256, 192, item) <= _bwd_et_limit(
            128, 192, item
        )
        key128 = _BWD_MAX_ET[(128, item == 2, 128)]
        key256 = _BWD_MAX_ET[(128, item == 2, 256)]
        assert key256 <= _bwd_et_limit(128, 192, item) <= key128


def test_fits_vmem_fwd_small_dch_boundary():
    """Small-dch forward boundary (tools/probe_bwd_vmem3.json): dch 8-64
    all admit Et=4352 and reject 5120 (f32 one-hot slot-count bound).
    Pins the production crash case: nb=128 / Et=9216 / dch=8 (the clf
    convs of a skew-heavy 35k bridged graph) must be REJECTED — the
    round-2 formula admitted it and the run died with a 36.75M scoped
    VMEM OOM."""
    from bridged_gnn_tpu.ops.pallas_fused import fits_vmem

    for d in (8, 16, 32, 64):
        assert fits_vmem(4352, 128, d, itemsize=2)
        assert not fits_vmem(5120, 128, d, itemsize=2)
    assert not fits_vmem(9216, 128, 8, itemsize=2)   # the crash case
    assert fits_vmem(5120, 128, 128, itemsize=2)     # measured good
