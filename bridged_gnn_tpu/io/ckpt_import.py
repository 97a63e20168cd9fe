"""Import reference torch ``state_dict`` checkpoints into flax variables.

Supports the shipped AdvLearner checkpoints (reference
``ckpt/model_AdvLearner_{ds}_best.ckpt``; layout verified in SURVEY §3.5).
The mapping is mechanical: sequential indices become suffixed module names,
Linear weights are transposed ([out,in] → [in,out]), BatchNorm affine params
map to scale/bias and running stats to the ``batch_stats`` collection.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np
from flax.core import freeze, unfreeze
from flax.traverse_util import flatten_dict, unflatten_dict

_SEQ_MODULES = (
    "layers", "lin_self", "biasatt", "equavilent_trans_layer", "convs", "bns",
    "clf_transformer",
)


def _translate_path(parts) -> Tuple[str, ...]:
    """torch module path → flax module path (without the leaf)."""
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "backbone":
            out.append("backbone_net")
        elif p in _SEQ_MODULES and i + 1 < len(parts) and parts[i + 1].isdigit():
            if p == "clf_transformer":
                idx = parts[i + 1]
                # torch Sequential: 0=Linear,1=BN,2=ReLU,3=Linear
                name = {"0": "lin_0", "1": "bn_1", "3": "lin_3"}[idx]
                out.append("clf_transformer")
                out.append(name)
            else:
                out.append(f"{p}_{parts[i + 1]}")
            i += 1
        else:
            out.append(p)
        i += 1
    return tuple(out)


def torch_state_dict_to_flax(
    sd: Dict[str, np.ndarray],
) -> Tuple[Dict, Dict]:
    """Returns (params, batch_stats) nested dicts (flax layout)."""
    # identify batch-norm prefixes by presence of running stats
    bn_prefixes = {
        k.rsplit(".", 1)[0] for k in sd if k.endswith("running_mean")
    }
    params: Dict[Tuple[str, ...], np.ndarray] = {}
    batch_stats: Dict[Tuple[str, ...], np.ndarray] = {}
    for key, val in sd.items():
        prefix, leaf = key.rsplit(".", 1)
        if leaf == "num_batches_tracked":
            continue
        path = _translate_path(prefix.split("."))
        is_bn = prefix in bn_prefixes
        if is_bn:
            if leaf == "weight":
                params[path + ("scale",)] = val
            elif leaf == "bias":
                params[path + ("bias",)] = val
            elif leaf == "running_mean":
                batch_stats[path + ("mean",)] = val
            elif leaf == "running_var":
                batch_stats[path + ("var",)] = val
        else:
            if leaf == "weight":
                arr = val.T if val.ndim == 2 else val
                params[path + ("kernel",)] = arr
            elif leaf == "bias":
                params[path + ("bias",)] = val
    return (
        unflatten_dict({k: jnp.asarray(v) for k, v in params.items()}),
        unflatten_dict({k: jnp.asarray(v) for k, v in batch_stats.items()}),
    )


def load_adv_learner_variables(model, sd: Dict[str, np.ndarray]):
    """Build flax variables for an ``AdversarialLearnerV2`` from a reference
    AdvLearner torch ``state_dict``: init a shape skeleton with zeros of the
    model's declared input dims (source AND target — they may differ), then
    merge the imported tensors shape-verified."""
    import jax

    from bridged_gnn_tpu.nn.stage1 import AdversarialLearnerV2

    x_src = jnp.zeros((8, model.dim_in_src))
    x_tar = jnp.zeros((8, model.dim_in_tar))
    idx = jnp.zeros(4, dtype=jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(0), x_src, None, x_tar, None, idx, idx,
        method=AdversarialLearnerV2.init_all,
    )
    params, bs = torch_state_dict_to_flax(sd)
    return merge_into_variables(variables, params, bs)


def merge_into_variables(variables, params, batch_stats):
    """Overwrite a flax variables template with imported tensors, verifying
    that every imported leaf matches an existing leaf's shape."""
    var = unfreeze(variables)
    flat_var = flatten_dict(var)
    for coll, tree in (("params", params), ("batch_stats", batch_stats)):
        for path, val in flatten_dict(tree).items():
            full = (coll,) + path
            if full not in flat_var:
                raise KeyError(f"imported leaf not in model: {full}")
            if flat_var[full].shape != val.shape:
                raise ValueError(
                    f"shape mismatch at {full}: model "
                    f"{flat_var[full].shape} vs ckpt {val.shape}"
                )
            flat_var[full] = val
    return freeze(unflatten_dict(flat_var))
