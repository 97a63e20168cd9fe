"""Shared NN building blocks.

All statistics-bearing ops (PairNorm, BatchNorm) take an explicit node
validity mask: the framework pads node arrays to block multiples, and
normalization statistics must be computed over *real* rows only to stay
numerically equivalent to the unpadded reference
(models/models.py:29-64 PairNorm; torch BatchNorm1d semantics).

Linear layers follow the torch convention when importing checkpoints:
torch stores ``weight`` as [out, in]; flax Dense kernels are [in, out], so
the import shim (bridged_gnn_tpu/io/ckpt_import.py) transposes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def masked_mean(x: jax.Array, mask: jax.Array, axis=0, keepdims=False,
                axis_name: Optional[str] = None):
    """Mean over rows where mask is True.

    With ``axis_name`` (inside shard_map over row-sharded node arrays) the
    sums and counts are psum-combined so the mean is the *global* masked
    mean — the collective carries [D]-sized partials, not node arrays."""
    m = mask.astype(x.dtype)
    shape = m.shape + (1,) * (x.ndim - m.ndim)
    m = m.reshape(shape)
    s = jnp.sum(x * m, axis=axis, keepdims=keepdims)
    n = jnp.sum(m, axis=axis, keepdims=keepdims)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
        n = jax.lax.psum(n, axis_name)
    return s / jnp.maximum(n, 1.0)


def pair_norm(
    x: jax.Array,
    mask: Optional[jax.Array] = None,
    mode: str = "PN",
    scale: float = 1.0,
) -> jax.Array:
    """PairNorm graph normalization (reference models/models.py:29-64).

    Modes: 'None' | 'PN' | 'PN-SI' | 'PN-SCS'. Statistics over masked rows.
    """
    if mode == "None":
        return x
    if mask is None:
        mask = jnp.ones(x.shape[0], dtype=bool)
    col_mean = masked_mean(x, mask, axis=0, keepdims=True)
    if mode == "PN":
        xc = x - col_mean
        rown = jnp.sqrt(
            1e-6 + masked_mean(jnp.sum(xc * xc, axis=1), mask)
        )
        return scale * xc / rown
    if mode == "PN-SI":
        xc = x - col_mean
        rown = jnp.sqrt(1e-6 + jnp.sum(xc * xc, axis=1, keepdims=True))
        return scale * xc / rown
    if mode == "PN-SCS":
        rown = jnp.sqrt(1e-6 + jnp.sum(x * x, axis=1, keepdims=True))
        return scale * x / rown - col_mean
    raise ValueError(f"unknown PairNorm mode: {mode}")


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d with torch semantics and row-mask-aware batch statistics.

    Matches torch.nn.BatchNorm1d: eps=1e-5, momentum=0.1 (torch convention:
    new = (1-m)*old + m*batch), biased variance for normalization, unbiased
    variance for the running estimate.
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    # mesh axis over which node rows are sharded (halo/row partition):
    # batch statistics psum [D]-sized partials so they match the global
    # unsharded statistics exactly
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = False):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(features)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(features)
        )
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            if mask is None:
                mask = jnp.ones(x.shape[0], dtype=bool)
            n = jnp.sum(mask.astype(x.dtype))
            if self.axis_name is not None:
                n = jax.lax.psum(n, self.axis_name)
            n = jnp.maximum(n, 1.0)
            mean = masked_mean(x, mask, axis=0, axis_name=self.axis_name)
            var = masked_mean(
                (x - mean) ** 2, mask, axis=0, axis_name=self.axis_name
            )
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value
                    + self.momentum * unbiased
                )
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


def glorot_dense(features: int, use_bias: bool = True, name: str = None):
    """Dense layer with glorot-uniform kernel (PyG Linear 'glorot' init,
    used by GCN/GAT-family convs) and zero bias."""
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=nn.initializers.glorot_uniform(),
        bias_init=nn.initializers.zeros,
        name=name,
    )


class TorchLinear(nn.Module):
    """Dense layer with torch/PyG *default* Linear initialization:
    kernel ~ U(±1/√fan_in) (kaiming_uniform a=√5) and bias ~ U(±1/√fan_in).

    This is what the reference's AdaptedConv / clf_transformer / SAGEConv
    linears actually use (PyG dense Linear with weight_initializer=None —
    torch_geometric/nn/dense/linear.py), NOT glorot; the init scale differs
    by ~2× on these shapes and measurably changes where 300-epoch training
    lands (see results_reference_baseline_torch.json).

    Param layout matches nn.Dense ({kernel [in,out], bias [out]}) so
    checkpoint import paths are unaffected.
    """

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = 1.0 / np.sqrt(fan_in)

        def kernel_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param(
            "kernel", kernel_init, (fan_in, self.features)
        )
        y = x @ kernel
        if self.use_bias:
            bias = self.param(
                "bias", kernel_init, (self.features,)
            )
            y = y + bias
        return y


def torch_dense(features: int, use_bias: bool = True, name: str = None):
    """Factory mirroring glorot_dense for the torch-default init family."""
    return TorchLinear(features, use_bias=use_bias, name=name)


class ParamKernel(nn.Module):
    """Returns a TorchLinear-initialized kernel as a raw array.

    Param path and init are identical to ``TorchLinear(features,
    use_bias=False)`` (``<name>/kernel``, shape [fan_in, features],
    U(±1/√fan_in)), so checkpoints transfer 1:1 — used where an op needs
    the projection *vector* itself (the custom-VJP fused attention's
    GATv2 logit projections) rather than a module call."""

    fan_in: int
    features: int = 1

    @nn.compact
    def __call__(self) -> jax.Array:
        bound = 1.0 / np.sqrt(self.fan_in)

        def kernel_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        return self.param(
            "kernel", kernel_init, (self.fan_in, self.features)
        )


class MLPBackbone(nn.Module):
    """2-layer MLP backbone with optional PairNorm between layers.

    Mirror of reference ``MLP`` (models/models.py:852-893): Linear → [norm]
    → relu → dropout(0.5) → … → Linear, glorot init.
    """

    dim_out: int
    dim_hidden: int = 64
    layer_num: int = 2
    use_norm: bool = False
    norm_mode: str = "PN-SCS"
    norm_scale: float = 1.0

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        dims = (
            [self.dim_out]
            if self.layer_num == 1
            else [self.dim_hidden] * (self.layer_num - 1) + [self.dim_out]
        )
        for i, d in enumerate(dims):
            x = torch_dense(d, name=f"layers_{i}")(x)
            if i < len(dims) - 1:
                if self.use_norm:
                    x = pair_norm(
                        x, mask, mode=self.norm_mode, scale=self.norm_scale
                    )
                x = nn.relu(x)
                x = nn.Dropout(0.5, deterministic=not train)(x)
        return x


class Decoder(nn.Module):
    """AE decoder (reference models/models.py:653-701): Linear → [PairNorm]
    → act → … → Linear."""

    dim_hidden: int
    dim_out: int
    num_layer: int = 2
    use_norm: bool = True
    norm_mode: str = "PN"
    norm_scale: float = 1.0

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        dims = (
            [self.dim_out]
            if self.num_layer == 1
            else [self.dim_hidden] * (self.num_layer - 2) + [self.dim_out]
        )
        for i in range(self.num_layer - 1):
            width = self.dim_hidden
            x = torch_dense(width, name=f"layers_{i}")(x)
            if self.use_norm:
                x = pair_norm(
                    x, mask, mode=self.norm_mode, scale=self.norm_scale
                )
            x = nn.relu(x)
        x = torch_dense(self.dim_out, name=f"layers_{self.num_layer - 1}")(x)
        return x


class Discriminator(nn.Module):
    """Domain discriminator (reference models/models.py:753-813)."""

    dim_hidden: int
    num_layer: int = 2
    act_fn: str = "relu"
    sigmoid_output: bool = True

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        act = {
            "relu": nn.relu,
            "leakyrelu": lambda v: nn.leaky_relu(v, 0.2),
            "tanh": jnp.tanh,
            "sigmoid": nn.sigmoid,
        }[self.act_fn]
        for i in range(self.num_layer - 1):
            x = torch_dense(self.dim_hidden, name=f"layers_{i}")(x)
            x = act(x)
        logits = torch_dense(1, name=f"layers_{self.num_layer - 1}")(x)
        return nn.sigmoid(logits) if self.sigmoid_output else logits
