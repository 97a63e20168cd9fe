"""Worker process for tests/test_multihost.py: joins a 2-process
localhost CPU cluster, validates the pod mesh layout, and runs one
cross-process reduction. Exit code 0 + final 'MULTIHOST_OK <pid>' line
signal success to the spawning test."""

import os
import sys


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    # 2 virtual CPU devices per process → 4 global devices over 2 "hosts"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=2 "
        + os.environ.get("XLA_FLAGS", "")
    )
    os.environ.pop("JAX_COORDINATOR_ADDRESS", None)

    import jax

    # the axon TPU plugin overrides JAX_PLATFORMS env; pin via config
    # (bridged_gnn_tpu.utils.platform rationale) BEFORE backend init
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from bridged_gnn_tpu.parallel.multihost import (
        flat_edge_mesh,
        init_distributed,
        make_pod_mesh,
    )

    init_distributed(f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2, (
        f"process group did not form: {jax.process_count()}"
    )
    assert len(jax.devices()) == 4, jax.devices()
    assert jax.local_device_count() == 2

    mesh = make_pod_mesh()
    assert mesh.devices.shape == (2, 2), mesh.devices.shape
    assert mesh.axis_names == ("host", "edges")
    # each host's local devices sit on one row of the mesh
    for h in range(2):
        assert all(d.process_index == h for d in mesh.devices[h]), (
            "pod mesh rows must be host-local so the inner axis rides ICI"
        )

    flat = flat_edge_mesh(mesh)
    assert flat.devices.shape == (4,)

    # one cross-process reduction over the flat axis: each process
    # contributes its local rows; the jitted global sum must see all 4
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    sh = NamedSharding(flat, P("edges"))
    local = (np.arange(2, dtype=np.float32) + 2 * pid + 1.0)  # [1,2]/[3,4]
    garr = jax.make_array_from_process_local_data(sh, local, (4,))
    total = jax.jit(
        lambda x: jnp.sum(x), out_shardings=NamedSharding(flat, P())
    )(garr)
    assert float(total) == 10.0, float(total)

    print(f"MULTIHOST_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
