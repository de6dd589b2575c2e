"""Client trainer FSM unit tests — DP budget timing vs transmission.

ADVICE (round 2, medium): the privacy ledger must be charged for every
update that actually LEAVES the client, including transmitted-but-rejected
submissions, and must NOT be charged for failures that provably occur
before transmission (the secagg roster-wait raises before the payload
leaves the process).
"""

import numpy as np
import pytest

from fl_tpu.core.types import PrivacyConfig, RoundConfig
from fl_tpu.services.federated_trainer import FederatedTrainer


class _StubClient:
    """Minimal in-process stand-in for FederatedLearningClient."""

    def __init__(self, model, submit_success=True,
                 roster=None, roster_ready=True):
        self._model = model
        self.submit_success = submit_success
        self.roster = roster or []
        self.roster_ready = roster_ready
        self.submitted = []

    def join_training_round(self, round_number):
        return RoundConfig(round_number=round_number, local_epochs=1,
                           batch_size=8, learning_rate=1e-3,
                           optimizer_type="sgd")

    def get_global_model(self, round_number):
        import jax

        from fl_tpu.core.types import GlobalModel

        variables = self._model.init(jax.random.PRNGKey(0))
        weights = {k: np.asarray(v) for k, v in
                   self._model.get_model_weights(variables).items()}
        return GlobalModel(round_number=round_number, model_weights=weights)

    def get_secagg_roster(self, round_number):
        return self.roster_ready, {
            "peers": list(self.roster),
            "nonce": b"\x00" * 16,
            "threshold": max(1, len(self.roster)),
            "frac_bits": 16,
            "round_number": round_number,
        }

    def submit_model_update(self, update):
        self.submitted.append(update)
        return {"success": self.submit_success,
                "message": "ok" if self.submit_success else "stale round"}


def _make_trainer(**kwargs):
    t = FederatedTrainer(
        client_id="budget_test",
        privacy=PrivacyConfig(epsilon=1.0, delta=1e-5, max_grad_norm=1.0),
        epsilon_per_round=0.25, delta_per_round=1e-6,
        compression_algorithm=None,
        n_train_synth=64, n_test_synth=16, num_clients=4,
        **kwargs,
    )
    t.initialize()
    return t


def test_rejected_submission_still_charges_budget():
    """The payload hit the wire: even a success=False ack is a release."""
    t = _make_trainer()
    t.client = _StubClient(t._model, submit_success=False)
    with pytest.raises(RuntimeError, match="rejected"):
        t._run_one_round(0)
    assert len(t.client.submitted) == 1  # it WAS transmitted
    assert t.budget_tracker.consumed_epsilon == pytest.approx(0.25)


def test_pre_transmit_failure_does_not_charge_budget():
    """A secagg roster that excludes this client raises BEFORE transmission
    — nothing left the process, so no epsilon is spent."""
    from fl_tpu.services.secagg_wire import generate_keypair

    t = _make_trainer(secure_aggregation=True)
    _, other_pk = generate_keypair()
    t.client = _StubClient(t._model,
                           roster=[("someone_else", other_pk)],
                           roster_ready=True)
    with pytest.raises(RuntimeError):
        t._run_one_round(0)
    assert t.client.submitted == []  # never transmitted
    assert t.budget_tracker.consumed_epsilon == pytest.approx(0.0)


def test_successful_round_charges_once():
    t = _make_trainer()
    t.client = _StubClient(t._model, submit_success=True)
    t._run_one_round(0)
    assert t.budget_tracker.consumed_epsilon == pytest.approx(0.25)
    assert t.rounds_completed == 1
