"""Round-trip interop: framework variables → reference torch state_dict.

``flax_variables_to_torch_state_dict`` must be the exact inverse of
``torch_state_dict_to_flax`` so a framework-trained stage-1 model can be
handed back to the reference codebase (its bridge builder loads this
layout — reference main_bridged_graph.py:274, layout in SURVEY §3.5).
"""

import numpy as np
import pytest

from bridged_gnn_tpu.io.ckpt_import import (
    flax_variables_to_torch_state_dict,
    merge_into_variables,
    save_torch_state_dict,
    torch_state_dict_to_flax,
)


def _a2d_variables(a2d_ckpt):
    import jax
    import jax.numpy as jnp

    from bridged_gnn_tpu.nn.stage1 import AdversarialLearnerV2

    model = AdversarialLearnerV2(
        dim_in_src=256, dim_in_tar=256,
        num_classes_src=31, num_classes_tar=31,
        dim_hidden=128, source_clf=True, use_norm=True,
        norm_mode="None", backbone="mlp", sim_mode="mlp",
    )
    x = jnp.zeros((8, 256))
    idx = jnp.zeros(4, dtype=jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(0), x, None, x, None, idx, idx,
        method=AdversarialLearnerV2.init_all,
    )
    params, bs = torch_state_dict_to_flax(a2d_ckpt)
    return merge_into_variables(variables, params, bs)


def test_shipped_ckpt_roundtrips_bit_exact(a2d_ckpt):
    """torch sd → flax variables → torch sd reproduces every tensor."""
    variables = _a2d_variables(a2d_ckpt)
    out = flax_variables_to_torch_state_dict(variables)
    ref_keys = set(a2d_ckpt)
    out_keys = set(out)
    assert out_keys == ref_keys, (
        f"missing={sorted(ref_keys - out_keys)} "
        f"extra={sorted(out_keys - ref_keys)}"
    )
    for k in ref_keys:
        if k.endswith("num_batches_tracked"):
            continue  # not tracked framework-side; exported as 0
        np.testing.assert_array_equal(
            out[k], np.asarray(a2d_ckpt[k]), err_msg=k
        )


def test_exported_pickle_loads_in_torch(a2d_ckpt, tmp_path):
    torch = pytest.importorskip("torch")
    variables = _a2d_variables(a2d_ckpt)
    path = str(tmp_path / "exported.ckpt")
    save_torch_state_dict(flax_variables_to_torch_state_dict(variables), path)
    sd = torch.load(path, map_location="cpu", weights_only=False)
    w = sd["source_learner.sim_net.lin_self.0.weight"]
    assert isinstance(w, torch.Tensor) and w.dtype == torch.float32
    # torch layout: Linear weight is [out, in]
    assert tuple(w.shape) == tuple(
        np.asarray(
            a2d_ckpt["source_learner.sim_net.lin_self.0.weight"]
        ).shape
    )
    tracked = [k for k in sd if k.endswith("num_batches_tracked")]
    assert tracked and all(sd[k].dtype == torch.int64 for k in tracked)


def test_freshly_initialized_model_exports_reference_layout(a2d_ckpt):
    """A model the framework initialized itself (not imported) exports the
    same key set as the shipped reference checkpoint."""
    import jax
    import jax.numpy as jnp

    from bridged_gnn_tpu.nn.stage1 import AdversarialLearnerV2

    model = AdversarialLearnerV2(
        dim_in_src=256, dim_in_tar=256,
        num_classes_src=31, num_classes_tar=31,
        dim_hidden=128, source_clf=True, use_norm=True,
        norm_mode="None", backbone="mlp", sim_mode="mlp",
    )
    x = jnp.zeros((8, 256))
    idx = jnp.zeros(4, dtype=jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(0), x, None, x, None, idx, idx,
        method=AdversarialLearnerV2.init_all,
    )
    out = flax_variables_to_torch_state_dict(variables)
    assert set(out) == set(a2d_ckpt)
