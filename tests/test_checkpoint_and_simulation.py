"""Checkpoint/resume exactness + simulation harness tests."""

import numpy as np
import pytest

from fl_tpu.core.types import PrivacyConfig
from fl_tpu.data import load_dataset, make_federated_arrays
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.models import create_model
from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig
from fl_tpu.orchestration.checkpoint import (
    CheckpointManager,
    restore_engine_checkpoint,
    save_engine_checkpoint,
)
from fl_tpu.orchestration.simulation import (
    FederatedLearningSimulation,
    SimulationConfig,
    run_mnist_simulation,
)


@pytest.fixture(scope="module")
def mnist():
    return load_dataset("mnist", n_train_synth=512, n_test_synth=128)


def make_engine(mnist, seed=0, dp=False):
    model = create_model("simple_cnn")
    fa = make_federated_arrays(mnist, num_clients=2, strategy="iid",
                               samples_per_client=32, seed=seed)
    cfg = RoundEngineConfig(
        training=FederatedTrainingConfig(local_epochs=1, batch_size=16),
        dp_mode="delta" if dp else "none",
        privacy=PrivacyConfig(1.0, 1e-5) if dp else None,
        epsilon_per_round=0.1 if dp else None,
        delta_per_round=1e-6 if dp else None,
        seed=seed,
    )
    return FederatedRoundEngine(model, fa, cfg)


def test_checkpoint_resume_is_exact(tmp_path, mnist):
    """A restored engine must produce bit-identical continuation (the
    per-round PRNG keys are pure functions of (seed, round))."""
    a = make_engine(mnist, seed=7, dp=True)
    a.run_round(evaluate=False)
    a.run_round(evaluate=False)
    save_engine_checkpoint(a, str(tmp_path / "ckpt"))
    # continue the original
    mask = np.ones(2, np.float32)
    r_orig = a.run_round(mask=mask, evaluate=False)

    # fresh engine restored from the checkpoint
    b = make_engine(mnist, seed=7, dp=True)
    resumed_round = restore_engine_checkpoint(b, str(tmp_path / "ckpt"))
    assert resumed_round == 2
    assert b.budget_tracker.consumed_epsilon == pytest.approx(0.2)
    r_resumed = b.run_round(mask=mask, evaluate=False)

    assert r_resumed.round_number == r_orig.round_number
    assert r_resumed.train_loss == r_orig.train_loss
    wa, wb = a.get_model_weights(), b.get_model_weights()
    for k in wa:
        np.testing.assert_array_equal(np.asarray(wa[k]), np.asarray(wb[k]))


def test_checkpoint_manager_gc(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "gc"), max_to_keep=2)
    tree = {"w": np.ones((4,), np.float32)}
    for step in range(5):
        mgr.save(step, tree, {"note": step})
    assert mgr.all_steps() == [3, 4]
    state = mgr.restore(template=tree)
    assert state["round_number"] == 4
    assert state["host_state"]["note"] == 4


def test_checkpoint_restore_missing_raises(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        mgr.restore(template={})


def test_simulation_onchip_mnist():
    """The reference's canonical entry (run_mnist_simulation,
    federated_simulation.py:530) on the on-chip backend."""
    results = run_mnist_simulation(
        num_clients=3, num_rounds=2, target_accuracy=0.99,
        n_train_synth=384, n_test_synth=96, samples_per_client=32,
        local_epochs=1, dp_mode="none", privacy_epsilon=None,
        heterogeneous_clients=True, seed=1,
    )
    assert results["rounds_completed"] == 2
    assert results["stop_reason"] == "round_budget_exhausted"
    assert results["final_accuracy"] is not None
    assert results["rounds_per_sec"] > 0
    assert len(results["round_history"]) == 2
    assert results["config"]["dataset"] == "mnist"


def test_simulation_stops_at_target_accuracy():
    sim = FederatedLearningSimulation(SimulationConfig(
        dataset="mnist", num_clients=2, num_rounds=20,
        target_accuracy=0.05,  # trivially reachable
        n_train_synth=256, n_test_synth=64, samples_per_client=32,
        local_epochs=1, dp_mode="none", privacy_epsilon=None, seed=2,
    ))
    results = sim.run_simulation()
    assert results["stop_reason"] == "target_accuracy_reached"
    assert results["rounds_completed"] < 20


def test_simulation_with_dp_tracks_budget():
    sim = FederatedLearningSimulation(SimulationConfig(
        dataset="mnist", num_clients=2, num_rounds=2, target_accuracy=0.999,
        n_train_synth=256, n_test_synth=64, samples_per_client=32,
        local_epochs=1, dp_mode="delta", privacy_epsilon=1.0, seed=3,
    ))
    results = sim.run_simulation()
    assert results["total_epsilon_spent"] == pytest.approx(1.0)
    assert results["privacy_budget"]["remaining_epsilon"] == pytest.approx(
        0.0, abs=1e-9)


def test_simulation_export(tmp_path):
    sim = FederatedLearningSimulation(SimulationConfig(
        dataset="mnist", num_clients=2, num_rounds=1, target_accuracy=0.999,
        n_train_synth=128, n_test_synth=64, samples_per_client=32,
        local_epochs=1, dp_mode="none", privacy_epsilon=None, seed=4,
    ))
    sim.run_simulation()
    out = tmp_path / "results.json"
    sim.export_results(str(out))
    import json

    data = json.loads(out.read_text())
    assert data["rounds_completed"] == 1


def test_checkpoint_persists_rdp_accountant(tmp_path, mnist):
    """A resumed dp_sgd/client_dp run must continue RDP accounting from the
    checkpointed state — restarting from zero would silently overdraw the
    ε bound across save/restore (advisor finding r1)."""
    def make_dp_sgd(seed=3):
        model = create_model("simple_cnn")
        fa = make_federated_arrays(mnist, num_clients=2, strategy="iid",
                                   samples_per_client=32, seed=seed)
        cfg = RoundEngineConfig(
            training=FederatedTrainingConfig(local_epochs=1, batch_size=8),
            dp_mode="dp_sgd",
            privacy=PrivacyConfig(epsilon=8.0, delta=1e-5, max_grad_norm=1.0,
                                  noise_multiplier=2.0),
            seed=seed, dp_microbatch=4,
        )
        return FederatedRoundEngine(model, fa, cfg)

    a = make_dp_sgd()
    a.run_round(evaluate=False)
    a.run_round(evaluate=False)
    eps_at_save = a.rdp_accountant.get_epsilon(1e-5)
    assert eps_at_save > 0
    save_engine_checkpoint(a, str(tmp_path / "rdp_ckpt"))

    b = make_dp_sgd()
    restore_engine_checkpoint(b, str(tmp_path / "rdp_ckpt"))
    assert b.rdp_accountant.get_epsilon(1e-5) == pytest.approx(
        eps_at_save, rel=1e-12)
    b.run_round(evaluate=False)
    a.run_round(evaluate=False)
    assert b.rdp_accountant.get_epsilon(1e-5) == pytest.approx(
        a.rdp_accountant.get_epsilon(1e-5), rel=1e-12)


def test_simulation_overrides_expose_engine_capabilities():
    """engine_overrides/training_overrides pass capability extensions
    (here: SCAFFOLD and dp_ftrl) through the reference-parity harness."""
    results = run_mnist_simulation(
        num_clients=4, num_rounds=2, target_accuracy=0.99,
        n_train_synth=256, n_test_synth=64, samples_per_client=32,
        local_epochs=1, dp_mode="none", privacy_epsilon=None,
        heterogeneous_clients=False, seed=1,
        engine_overrides={"scaffold": True},
        training_overrides={"optimizer_type": "sgd", "momentum": 0.0},
    )
    assert results["rounds_completed"] == 2

    results = run_mnist_simulation(
        num_clients=4, num_rounds=2, target_accuracy=0.99,
        n_train_synth=256, n_test_synth=64, samples_per_client=32,
        local_epochs=1, dp_mode="dp_ftrl", privacy_epsilon=30.0,
        noise_multiplier=1.0, heterogeneous_clients=False, seed=1,
        engine_overrides={"ftrl_rounds": 2, "ftrl_cohort_size": 2},
    )
    assert results["rounds_completed"] == 2
    # dp_ftrl certifies the whole transcript once at round 0
    eps = [r["epsilon_spent"] for r in results["round_history"]]
    assert eps[0] > 0 and eps[1] == 0.0
