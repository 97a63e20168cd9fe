"""Optimizers matching the reference's torch training recipes.

torch.optim.Adam with ``weight_decay`` adds ``wd * param`` to the gradient
*before* the moment updates (L2, not AdamW), and ``StepLR(step_size, gamma)``
multiplies the lr by gamma every ``step_size`` epochs — both reproduced here
with optax primitives (reference main_graph_knowledge_transfer.py:205-207,
scripts.py:464-469).
"""

from __future__ import annotations

from typing import Callable

import optax


def step_lr(base_lr: float, step_size: int, gamma: float) -> Callable:
    def schedule(count):
        return base_lr * gamma ** (count // step_size)

    return schedule


def torch_adam(
    lr,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """torch-semantics Adam: L2 into grads, bias-corrected moments."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    if callable(lr):
        parts.append(optax.scale_by_schedule(lambda c: -lr(c)))
    else:
        parts.append(optax.scale(-lr))
    return optax.chain(*parts)
