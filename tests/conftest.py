"""Test configuration: run everything on a virtual 8-device CPU mesh.

Note: the env var JAX_PLATFORMS is NOT honored in this environment (the
axon TPU plugin wins); `jax.config.update('jax_platforms', ...)` is, so we
set both the XLA flag (before import) and the config (after import).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Default lane: everything on the virtual 8-device CPU mesh. The real-TPU
# lane (VERDICT r1 item 6) is opted into with BGNN_TPU_TESTS=1, which
# leaves the platform alone so `-m tpu` tests hit the chip:
#   BGNN_TPU_TESTS=1 python -m pytest tests/ -m tpu -q
# (run detached per the STATUS.md runbook; first compiles are slow).
if os.environ.get("BGNN_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: requires the real TPU chip (BGNN_TPU_TESTS=1)"
    )

REFERENCE_DIR = "/root/reference"
A2D_GRAPH = (
    REFERENCE_DIR + "/data_bridged_graph/office_amazon2dslr_bridged_graph.dat"
)
A2W_GRAPH = (
    REFERENCE_DIR
    + "/data_bridged_graph/office_amazon2webcam_bridged_graph.dat"
)
A2D_CKPT = REFERENCE_DIR + "/ckpt/model_AdvLearner_office_amazon2dslr_best.ckpt"


@pytest.fixture(scope="session")
def a2d_dict():
    from bridged_gnn_tpu.io import load_pyg_data_dict

    return load_pyg_data_dict(A2D_GRAPH)


@pytest.fixture(scope="session")
def a2w_dict():
    from bridged_gnn_tpu.io import load_pyg_data_dict

    return load_pyg_data_dict(A2W_GRAPH)


@pytest.fixture(scope="session")
def a2d_ckpt():
    from bridged_gnn_tpu.io import load_torch_state_dict

    return load_torch_state_dict(A2D_CKPT)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
