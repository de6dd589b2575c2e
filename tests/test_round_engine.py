"""End-to-end federated round tests on the CPU backend.

These reproduce the reference's baseline configs (BASELINE.json):
  #1  2-client MNIST SimpleCNN FedAvg, 1 round (quick_start path)
  #2  10-client non-IID MNIST, weighted aggregation by sample count
  #3  DP rounds with budget accounting
plus learning-progress and determinism checks the reference never had.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fl_tpu.core.types import PrivacyConfig
from fl_tpu.data import load_dataset, make_federated_arrays
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.fl.privacy import PrivacyError
from fl_tpu.models import create_model
from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig


@pytest.fixture(scope="module")
def mnist():
    return load_dataset("mnist", n_train_synth=2048, n_test_synth=512)


def make_engine(mnist, num_clients=2, strategy="iid", dp_mode="none",
                privacy=None, rounds_epochs=1, batch=32, seed=0, **kw):
    model = create_model("simple_cnn")
    fa = make_federated_arrays(mnist, num_clients=num_clients,
                               strategy=strategy, seed=seed)
    cfg = RoundEngineConfig(
        training=FederatedTrainingConfig(local_epochs=rounds_epochs,
                                         batch_size=batch),
        dp_mode=dp_mode,
        privacy=privacy,
        min_clients=min(2, num_clients),
        seed=seed,
        **kw,
    )
    x, y = mnist.normalized(mnist.test_images), mnist.test_labels
    return FederatedRoundEngine(model, fa, cfg, test_images=x, test_labels=y)


def test_config1_two_client_single_round(mnist):
    """BASELINE config #1: 2-client MNIST SimpleCNN, 1 round."""
    eng = make_engine(mnist, num_clients=2)
    r = eng.run_round()
    assert r.participating_clients == 2
    assert np.isfinite(r.train_loss)
    assert 0.0 <= r.train_accuracy <= 1.0
    assert r.test_accuracy is not None
    # round 0 has no previous model, so the detector reports score 0
    # (reference behaves identically); a second round must register change
    r2 = eng.run_round()
    assert r2.convergence_score > 0


def test_learning_progress(mnist):
    """A few rounds of 4-client FedAvg must beat chance by a wide margin on
    the synthetic digits."""
    eng = make_engine(mnist, num_clients=4, rounds_epochs=2)
    hist = eng.run(num_rounds=3)
    assert hist[-1].test_accuracy > 0.5  # chance = 0.1


def test_config2_non_iid_weighted(mnist):
    """BASELINE config #2: 10-client Dirichlet non-IID, sample-weighted."""
    eng = make_engine(mnist, num_clients=10, strategy="non_iid",
                      rounds_epochs=1)
    r = eng.run_round()
    assert r.participating_clients == 10
    assert np.isfinite(r.train_loss)
    counts = np.asarray(eng.data.num_samples)
    assert counts.std() > 0  # actually heterogeneous shards


def test_rounds_deterministic(mnist):
    a = make_engine(mnist, num_clients=3, seed=11)
    b = make_engine(mnist, num_clients=3, seed=11)
    ra = a.run_round()
    rb = b.run_round()
    assert ra.train_loss == rb.train_loss
    wa = a.get_model_weights()
    wb = b.get_model_weights()
    for k in wa:
        np.testing.assert_array_equal(np.asarray(wa[k]), np.asarray(wb[k]))


def test_seeds_differ(mnist):
    a = make_engine(mnist, num_clients=3, seed=1)
    b = make_engine(mnist, num_clients=3, seed=2)
    assert a.run_round().train_loss != b.run_round().train_loss


def test_config3_dp_delta_mode(mnist):
    """BASELINE config #3 (reference semantics): delta clipping + Gaussian
    noise + additive budget accounting."""
    privacy = PrivacyConfig(epsilon=1.0, delta=1e-5, max_grad_norm=1.0)
    eng = make_engine(mnist, num_clients=4, dp_mode="delta", privacy=privacy,
                      epsilon_per_round=0.25, delta_per_round=2.5e-6)
    r1 = eng.run_round()
    assert r1.epsilon_spent == 0.25
    status = eng.budget_tracker.get_budget_status()
    assert status["consumed_epsilon"] == pytest.approx(0.25)
    assert status["remaining_epsilon"] == pytest.approx(0.75)
    # ledger recorded a gaussian mechanism
    ledger = eng.accountant.get_privacy_ledger()
    assert ledger and ledger[0]["mechanism_type"] == "gaussian"
    # 3 more rounds exhaust the budget; the 5th must refuse
    for _ in range(3):
        eng.run_round()
    with pytest.raises(PrivacyError):
        eng.run_round()


def test_dp_noise_changes_result(mnist):
    """DP rounds must differ from non-DP rounds with the same seed (noise is
    actually applied — ref smoke check quick_start.py:65-90)."""
    clean = make_engine(mnist, num_clients=2, seed=5)
    noisy = make_engine(mnist, num_clients=2, seed=5, dp_mode="delta",
                        privacy=PrivacyConfig(epsilon=1.0, delta=1e-5,
                                              max_grad_norm=1.0))
    rc = clean.run_round()
    rn = noisy.run_round()
    wc = clean.get_model_weights()
    wn = noisy.get_model_weights()
    diffs = [not np.allclose(np.asarray(wc[k]), np.asarray(wn[k])) for k in wc]
    assert any(diffs)
    del rc, rn


def test_partial_participation(mnist):
    eng = make_engine(mnist, num_clients=8, participation_rate=0.5,
                      seed=3)
    r = eng.run_round()
    assert 2 <= r.participating_clients <= 8


def test_straggler_dropout_and_exclusion(mnist):
    eng = make_engine(mnist, num_clients=8, straggler_dropout_rate=0.3, seed=3)
    mask = eng.sample_participation(exclude=[0, 1])
    assert mask[0] == 0.0 and mask[1] == 0.0
    assert mask.sum() >= eng.config.min_clients


def test_nonparticipants_leave_global_untouched(mnist):
    """With an all-zero-but-min mask, the update must move only by the
    participants' deltas (fedavg_delta semantics)."""
    eng = make_engine(mnist, num_clients=4, seed=9)
    w0 = {k: np.asarray(v) for k, v in eng.get_model_weights().items()}
    mask = np.zeros(4, np.float32)
    mask[:2] = 1.0
    eng.run_round(mask=mask)
    w1 = eng.get_model_weights()
    # something changed (participants' contribution)
    assert any(not np.allclose(w0[k], np.asarray(w1[k])) for k in w0)


def test_heterogeneous_epoch_budgets(mnist):
    """LOW/MEDIUM/HIGH clients with different epoch budgets coexist in one
    vmapped program (capability adaptation, ref training.py:455-502)."""
    eng = make_engine(mnist, num_clients=4, rounds_epochs=2)
    eng.epochs_per_client = np.array([1, 1, 2, 2], np.int32)
    r = eng.run_round()
    assert np.isfinite(r.train_loss)


def test_weight_roundtrip_through_engine(mnist):
    eng = make_engine(mnist, num_clients=2)
    w = eng.get_model_weights()
    w_np = {k: np.asarray(v) for k, v in w.items()}
    eng.run_round()
    eng.set_model_weights(w_np)
    w2 = eng.get_model_weights()
    for k in w:
        np.testing.assert_array_equal(w_np[k], np.asarray(w2[k]))
