"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so multi-device sharding
paths (client-axis mesh, FedAvg cross-device reductions) are exercised
without TPU hardware — the analog of how the reference fakes multi-node with
N client threads over localhost gRPC (ref: src/simulation/
federated_simulation.py:309-318). Environment variables must be set before
jax initializes, hence at conftest import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: tests never touch the TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from fl_tpu.core.mesh import make_mesh

    return make_mesh(8)
