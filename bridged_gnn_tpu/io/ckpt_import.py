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


def _untranslate_path(parts: Tuple[str, ...]) -> Tuple[str, ...]:
    """flax module path → torch module path (inverse of ``_translate_path``)."""
    out = []
    for p in parts:
        if p == "backbone_net":
            out.append("backbone")
        elif out and out[-1] == "clf_transformer" and p in (
            "lin_0", "bn_1", "lin_3"
        ):
            out.append(p.rsplit("_", 1)[1])
        else:
            for seq in _SEQ_MODULES:
                stem, sep, idx = p.rpartition("_")
                if sep and stem == seq and idx.isdigit():
                    out.append(seq)
                    out.append(idx)
                    break
            else:
                out.append(p)
    return tuple(out)


def flax_variables_to_torch_state_dict(variables) -> Dict[str, np.ndarray]:
    """Export flax variables to the reference AdvLearner ``state_dict``
    layout (inverse of ``torch_state_dict_to_flax``): Linear kernels are
    transposed back to [out, in], BatchNorm scale/bias become weight/bias
    with running stats from the ``batch_stats`` collection, and a zero
    ``num_batches_tracked`` is emitted per BatchNorm (its value is not
    tracked framework-side; the reference never reads it).

    Reference consumer: ``main_bridged_graph.py:274`` loads exactly this
    layout (verified in SURVEY §3.5)."""
    var = unfreeze(variables)
    sd: Dict[str, np.ndarray] = {}
    # modules holding a 'scale' leaf are BatchNorms
    bn_paths = {
        path[:-1]
        for path in flatten_dict(var.get("params", {}))
        if path[-1] == "scale"
    }
    for path, val in flatten_dict(var.get("params", {})).items():
        mod, leaf = path[:-1], path[-1]
        prefix = ".".join(_untranslate_path(mod))
        arr = np.asarray(val)
        if leaf == "scale":
            sd[f"{prefix}.weight"] = arr
        elif leaf == "kernel":
            sd[f"{prefix}.weight"] = arr.T if arr.ndim == 2 else arr
        elif leaf == "bias":
            sd[f"{prefix}.bias"] = arr
        else:
            raise KeyError(f"unexpected param leaf {path}")
    for path, val in flatten_dict(var.get("batch_stats", {})).items():
        mod, leaf = path[:-1], path[-1]
        prefix = ".".join(_untranslate_path(mod))
        name = {"mean": "running_mean", "var": "running_var"}[leaf]
        sd[f"{prefix}.{name}"] = np.asarray(val)
    for mod in bn_paths:
        prefix = ".".join(_untranslate_path(mod))
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)
    return sd


def save_torch_state_dict(sd: Dict[str, np.ndarray], path: str) -> None:
    """Write a ``{name: array}`` state_dict as a torch pickle the reference
    can ``torch.load`` + ``load_state_dict`` directly."""
    import os

    import torch

    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    torch.save(
        {k: torch.tensor(np.asarray(v)) for k, v in sd.items()}, path
    )


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
