"""gRPC-backend simulation (reference-parity topology): full coordinator +
client FSM threads over localhost. Slow (per-client jit compiles), so gated
behind FL_TPU_SLOW_TESTS=1 — the onchip backend and the gRPC loopback
services are covered by the fast suite."""

import os

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("FL_TPU_SLOW_TESTS") != "1",
    reason="set FL_TPU_SLOW_TESTS=1 to run the grpc-backend simulation",
)


def test_grpc_backend_simulation_completes():
    from fl_tpu.orchestration.simulation import (
        FederatedLearningSimulation,
        SimulationConfig,
    )

    sim = FederatedLearningSimulation(SimulationConfig(
        dataset="mnist", num_clients=2, num_rounds=2,
        target_accuracy=0.999, backend="grpc",
        n_train_synth=512, n_test_synth=64,
        local_epochs=1, batch_size=16,
        privacy_epsilon=1.0, dp_mode="delta", timeout_s=600,
    ))
    results = sim.run_simulation()
    assert results["backend"] == "grpc"
    assert results["rounds_completed"] >= 2
    for status in results["client_results"].values():
        assert status["rounds_completed"] >= 2
