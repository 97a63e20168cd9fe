"""Multi-host process-group initialization and pod-slice mesh layout.

The reference has no distributed support (SURVEY §5.8). For multi-host TPU
pod slices the recipe is:

  1. every host calls :func:`init_distributed` (jax.distributed.initialize)
     so all processes see the global device set;
  2. :func:`make_pod_mesh` builds a 2-D ('host', 'edges') mesh whose inner
     axis maps to each host's local chips — the edge-shard collectives
     (psum/all-gather in ops/segment.py) then ride ICI within a host and
     DCN across hosts only for the small per-node partials;
  3. the edge partitioner assigns contiguous (dst-sorted) edge ranges per
     device so each shard's segment reductions stay sorted.

On a single host this degenerates to the 1-D mesh from parallel/mesh.py.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host process group (idempotent).

    Arguments default to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) or,
    on TPU pods, to automatic cluster detection.
    """
    # Idempotency must NOT be probed with jax.process_count(): that call
    # initializes the local backend first, after which distributed init
    # can never form the group (caught by tests/test_multihost.py).
    if jax.distributed.is_initialized():
        return
    kwargs = {}
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kwargs = dict(
            coordinator_address=addr,
            num_processes=int(
                num_processes or os.environ.get("JAX_NUM_PROCESSES", "1")
            ),
            process_id=int(
                process_id or os.environ.get("JAX_PROCESS_ID", "0")
            ),
        )
        jax.distributed.initialize(**kwargs)
        return
    # no explicit coordinator: rely on automatic cluster detection (TPU
    # pods); off-cluster this raises, which means single-process — the
    # only case the fallback may swallow
    try:
        jax.distributed.initialize()
    except (RuntimeError, ValueError):
        pass  # single-process run


def make_pod_mesh(
    axis_names: Sequence[str] = ("host", "edges"),
) -> Mesh:
    """2-D mesh: hosts × local devices. Edge shards live on the inner
    (ICI) axis; the outer axis carries the cross-host psum over DCN."""
    devs = np.array(jax.devices())
    n_local = jax.local_device_count()
    n_hosts = len(devs) // n_local
    if n_hosts <= 1:
        return Mesh(devs.reshape(1, -1), axis_names)
    return Mesh(devs.reshape(n_hosts, n_local), axis_names)


def flat_edge_mesh(mesh: Mesh, axis_name: str = "edges") -> Mesh:
    """Collapse a pod mesh to the 1-D edge axis used by the shard_map
    train steps (host-major device order keeps contiguous edge ranges on
    the same host)."""
    return Mesh(mesh.devices.reshape(-1), (axis_name,))
