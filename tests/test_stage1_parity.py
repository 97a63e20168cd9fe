"""Activation-level parity of the JAX stage-1 model vs the shipped
office_amazon2dslr AdvLearner checkpoint, checked against a pure-torch
eval-mode oracle on random inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import torch_oracle as oracle
from bridged_gnn_tpu.io.ckpt_import import (
    merge_into_variables,
    torch_state_dict_to_flax,
)
from bridged_gnn_tpu.nn.stage1 import AdversarialLearnerV2


@pytest.fixture(scope="module")
def model_and_vars(a2d_ckpt):
    model = AdversarialLearnerV2(
        dim_in_src=256,
        dim_in_tar=256,
        num_classes_src=31,
        num_classes_tar=31,
        dim_hidden=128,
        source_clf=True,
        use_norm=True,
        norm_mode="None",
        backbone="mlp",
        sim_mode="mlp",
    )
    x_src = jnp.zeros((8, 256))
    x_tar = jnp.zeros((8, 256))
    idx = jnp.zeros(4, dtype=jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(0), x_src, None, x_tar, None, idx, idx,
        method=AdversarialLearnerV2.init_all,
    )
    params, batch_stats = torch_state_dict_to_flax(a2d_ckpt)
    variables = merge_into_variables(variables, params, batch_stats)
    return model, variables


def test_ckpt_covers_all_params(a2d_ckpt, model_and_vars):
    """Every checkpoint tensor must land in the model (no silent drops)."""
    # merge_into_variables raises on unknown/mismatched leaves; reaching
    # here means every ckpt tensor was placed.
    model, variables = model_and_vars
    assert "params" in variables and "batch_stats" in variables


def test_cross_domain_parity(a2d_ckpt, model_and_vars, rng):
    model, variables = model_and_vars
    n_src, n_tar = 100, 80
    x_src = rng.normal(size=(n_src, 256)).astype(np.float32)
    x_tar = rng.normal(size=(n_tar, 256)).astype(np.float32)
    idx1 = rng.integers(0, n_src, size=200)
    idx2 = rng.integers(0, n_tar, size=200)

    probs_t, clf_s_t, clf_t_t, zs_t, zt_t = oracle.get_probs_cross_domain(
        oracle.t(x_src), oracle.t(x_tar),
        torch.from_numpy(idx1), torch.from_numpy(idx2), a2d_ckpt,
    )

    probs_j, clf_s_j, clf_t_j, zs_j, zt_j = model.apply(
        variables,
        jnp.asarray(x_src), None, jnp.asarray(x_tar), None,
        jnp.asarray(idx1), jnp.asarray(idx2),
        method=AdversarialLearnerV2.get_probs_cross_domain,
    )

    np.testing.assert_allclose(
        np.asarray(zs_j), zs_t.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(zt_j), zt_t.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(probs_j)[:, 0], probs_t.numpy(), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(clf_s_j), clf_s_t.numpy(), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(clf_t_j), clf_t_t.numpy(), rtol=1e-4, atol=1e-6
    )


def test_within_domain_target_parity(a2d_ckpt, model_and_vars, rng):
    model, variables = model_and_vars
    n_tar = 60
    x_tar = rng.normal(size=(n_tar, 256)).astype(np.float32)
    idx1 = rng.integers(0, n_tar, size=50)
    idx2 = rng.integers(0, n_tar, size=50)

    zt_t, _ = oracle.target_encode(oracle.t(x_tar), a2d_ckpt)
    probs_t = oracle.pair_mlp_score(
        zt_t, zt_t, torch.from_numpy(idx1), torch.from_numpy(idx2), a2d_ckpt
    )
    probs_j, clf_j = model.apply(
        variables, jnp.asarray(x_tar), None,
        jnp.asarray(idx1), jnp.asarray(idx2),
        method=AdversarialLearnerV2.get_probs_within_domain,
        domain="target",
    )
    np.testing.assert_allclose(
        np.asarray(probs_j)[:, 0], probs_t.numpy(), rtol=1e-4, atol=1e-6
    )


def test_ae_and_discriminator_parity(a2d_ckpt, model_and_vars, rng):
    model, variables = model_and_vars
    x_tar = rng.normal(size=(40, 256)).astype(np.float32)
    zt_t, h0_t = oracle.target_encode(oracle.t(x_tar), a2d_ckpt)
    recons_t = oracle.target_decode(zt_t, a2d_ckpt)
    d_t = oracle.discriminator(zt_t, a2d_ckpt)

    h0_j, z_j, recons_j = model.apply(
        variables, jnp.asarray(x_tar), None,
        method=lambda m, x, adj: m.target_learner(x, adj),
    )
    d_j = model.apply(
        variables, z_j, method=AdversarialLearnerV2.discriminate
    )
    np.testing.assert_allclose(
        np.asarray(h0_j), h0_t.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(recons_j), recons_t.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(d_j)[:, 0], d_t.numpy()[:, 0], rtol=1e-4, atol=1e-6
    )
