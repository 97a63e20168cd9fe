"""Multi-host backend tests (VERDICT r2 item 6 / missing #3).

`parallel/multihost.py` is the DCN story; with no second host in this
environment the strongest available evidence is a REAL 2-process
`jax.distributed.initialize` on localhost (CPU backend, gloo
collectives): the process group must form, `make_pod_mesh` must lay
hosts on the outer axis with process-local devices on the inner (ICI)
axis, and one jitted cross-process reduction must return the global
sum. Single-process mesh-layout degeneracies are covered in-process.
"""

import os
import socket
import subprocess
import sys

import numpy as np

import jax


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_localhost_cluster():
    """Spawn 2 worker processes that form a jax.distributed cluster on
    localhost and each run the mesh-layout asserts + a global reduction
    (tests/multihost_worker.py)."""
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {pid} failed (rc={p.returncode}):\n{out[-3000:]}"
        )
        assert f"MULTIHOST_OK {pid}" in out, out[-3000:]


def test_pod_mesh_single_host_degenerates():
    """On one process the pod mesh is 1 × n_local and flattens cleanly."""
    from bridged_gnn_tpu.parallel.multihost import (
        flat_edge_mesh,
        make_pod_mesh,
    )

    mesh = make_pod_mesh()
    n = len(jax.devices())
    assert mesh.devices.shape == (1, n)
    assert mesh.axis_names == ("host", "edges")
    flat = flat_edge_mesh(mesh)
    assert flat.devices.shape == (n,)
    assert list(flat.axis_names) == ["edges"]
    assert (np.asarray(flat.devices) == np.asarray(jax.devices())).all()


def test_init_distributed_idempotent_single_process():
    """init_distributed without a coordinator is a no-op that leaves the
    single-process world intact (the documented single-host degenerate)."""
    from bridged_gnn_tpu.parallel.multihost import init_distributed

    init_distributed()
    assert jax.process_count() == 1
