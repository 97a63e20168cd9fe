"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("edges",)
) -> Mesh:
    """1-D mesh over the first n devices (graph-parallel axis).

    Multi-axis meshes (dp × graph) are formed by passing two axis names and
    reshaping; single-axis is the common case for full-batch GNN training.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(axis_names) == 1:
        return Mesh(np.array(devs[:n]), axis_names)
    # split n into a near-square grid for 2-D meshes
    a = int(np.floor(np.sqrt(n)))
    while n % a:
        a -= 1
    return Mesh(np.array(devs[:n]).reshape(a, n // a), axis_names)
