"""Numerics/determinism sanitizers (SURVEY §5.2: the reference only sets
cudnn.deterministic; this framework gives active checks).

  * :func:`check_determinism` — run a jitted function twice on the same
    inputs and assert bit-identical outputs (catches nondeterministic
    reductions or stateful host leakage into traced code);
  * :func:`assert_all_finite` — pytree-wide NaN/Inf guard;
  * :func:`nan_debug` — context manager enabling jax's NaN debugging
    (recompiles with checks; use for debugging only).
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Iterator

import jax
import numpy as np


def check_determinism(fn: Callable, *args, runs: int = 2, **kwargs) -> None:
    ref = jax.tree.map(np.asarray, fn(*args, **kwargs))
    for _ in range(runs - 1):
        out = jax.tree.map(np.asarray, fn(*args, **kwargs))
        for a, b in zip(
            jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(out)
        ):
            if not np.array_equal(a, b, equal_nan=True):
                raise AssertionError(
                    "nondeterministic output: max abs diff "
                    f"{np.max(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)))}"
                )


def assert_all_finite(tree: Any, name: str = "tree") -> None:
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(
            arr
        ).all():
            raise FloatingPointError(
                f"non-finite values in {name} at "
                f"{jax.tree_util.keystr(path)}"
            )


@contextlib.contextmanager
def nan_debug() -> Iterator[None]:
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
