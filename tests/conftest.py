"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-device sharding
paths (client-axis mesh, FedAvg cross-device reductions) are exercised
without TPU hardware — the analog of how the reference fakes multi-node with
N client threads over localhost gRPC (ref: src/simulation/
federated_simulation.py:309-318).

Environment note: this machine's axon TPU plugin initializes the PJRT
backend at *interpreter start* via sitecustomize (PALLAS_AXON_POOL_IPS), so
setting JAX_PLATFORMS in-process is too late. The conftest therefore
re-execs pytest exactly once with a corrected environment.
"""

import os

import fl_tpu_test_env  # noqa: F401  (re-exec happens there, pre-capture)
import jax

if os.environ.get("FL_TPU_TESTS_ON_TPU") != "1":
    # set FL_TPU_TESTS_REEXEC=1 FL_TPU_TESTS_ON_TPU=1 to deliberately run
    # hardware-marked tests on the real chip
    assert jax.devices()[0].platform == "cpu", (
        f"tests must run on CPU, got {jax.devices()}"
    )

jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from fl_tpu.core.mesh import make_mesh

    return make_mesh(8)
