"""PairNorm and MaskedBatchNorm vs reference formulas (numpy oracles)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from bridged_gnn_tpu.nn.common import MaskedBatchNorm, pair_norm


def np_pairnorm(x, mode, scale):
    """Direct transcription of reference PairNorm math (models.py:49-64)."""
    col_mean = x.mean(0)
    if mode == "PN":
        xc = x - col_mean
        rown = np.sqrt(1e-6 + (xc ** 2).sum(1).mean())
        return scale * xc / rown
    if mode == "PN-SI":
        xc = x - col_mean
        rown = np.sqrt(1e-6 + (xc ** 2).sum(1, keepdims=True))
        return scale * xc / rown
    if mode == "PN-SCS":
        rown = np.sqrt(1e-6 + (x ** 2).sum(1, keepdims=True))
        return scale * x / rown - col_mean
    return x


@pytest.mark.parametrize("mode", ["None", "PN", "PN-SI", "PN-SCS"])
@pytest.mark.parametrize("scale", [1.0, 10.0])
def test_pair_norm_matches_reference(rng, mode, scale):
    x = rng.normal(size=(30, 8)).astype(np.float32)
    got = np.asarray(pair_norm(jnp.asarray(x), mode=mode, scale=scale))
    expect = np_pairnorm(x, mode, scale)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_pair_norm_mask_ignores_padding(rng):
    x = rng.normal(size=(20, 6)).astype(np.float32)
    x_pad = np.concatenate([x, np.full((12, 6), 100.0, np.float32)])
    mask = np.arange(32) < 20
    got = np.asarray(
        pair_norm(jnp.asarray(x_pad), jnp.asarray(mask), mode="PN")
    )[:20]
    expect = np_pairnorm(x, "PN", 1.0)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_masked_batchnorm_matches_torch(rng):
    """Train-mode stats, running-stat updates, and eval normalization must
    match torch.nn.BatchNorm1d exactly (over real rows)."""
    x1 = rng.normal(size=(40, 8)).astype(np.float32)
    x2 = rng.normal(size=(40, 8)).astype(np.float32) * 2 + 1

    tbn = torch.nn.BatchNorm1d(8)
    tbn.train()
    t_out1 = tbn(torch.from_numpy(x1)).detach().numpy()
    t_out2 = tbn(torch.from_numpy(x2)).detach().numpy()
    tbn.eval()
    t_eval = tbn(torch.from_numpy(x1)).detach().numpy()

    bn = MaskedBatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x1))
    out1, mut = bn.apply(variables, jnp.asarray(x1),
                         mutable=["batch_stats"])
    variables = {"params": variables["params"], **mut}
    out2, mut = bn.apply(variables, jnp.asarray(x2),
                         mutable=["batch_stats"])
    variables = {"params": variables["params"], **mut}
    ev = bn.apply(variables, jnp.asarray(x1), use_running_average=True)

    np.testing.assert_allclose(np.asarray(out1), t_out1, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out2), t_out2, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ev), t_eval, rtol=1e-4, atol=1e-5)


def test_masked_batchnorm_padding_invariance(rng):
    x = rng.normal(size=(24, 4)).astype(np.float32)
    x_pad = np.concatenate([x, np.full((8, 4), 50.0, np.float32)])
    mask = np.arange(32) < 24
    bn = MaskedBatchNorm()
    v = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref, mut_ref = bn.apply(v, jnp.asarray(x), mutable=["batch_stats"])
    got, mut_got = bn.apply(
        v, jnp.asarray(x_pad), jnp.asarray(mask), mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(got)[:24], np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(mut_ref), jax.tree_util.tree_leaves(mut_got)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4)
