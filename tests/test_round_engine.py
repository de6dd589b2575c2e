"""End-to-end federated round tests on the CPU backend.

These reproduce the reference's baseline configs (BASELINE.json):
  #1  2-client MNIST SimpleCNN FedAvg, 1 round (quick_start path)
  #2  10-client non-IID MNIST, weighted aggregation by sample count
  #3  DP rounds with budget accounting
plus learning-progress and determinism checks the reference never had.

CPU-compile budget note: every FederatedRoundEngine compiles its own XLA
superstep (~tens of seconds on the CPU backend), so tests share engines
where possible, keep shards tiny, and only attach a test set (an extra eval
compile) where the assertion needs accuracy.
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
    return load_dataset("mnist", n_train_synth=1024, n_test_synth=256)


def make_engine(mnist, num_clients=2, strategy="iid", dp_mode="none",
                privacy=None, rounds_epochs=1, batch=16, seed=0,
                with_eval=False, samples_per_client=64, **kw):
    model = create_model("simple_cnn")
    fa = make_federated_arrays(mnist, num_clients=num_clients,
                               strategy=strategy, seed=seed,
                               samples_per_client=samples_per_client)
    cfg = RoundEngineConfig(
        training=FederatedTrainingConfig(local_epochs=rounds_epochs,
                                         batch_size=batch),
        dp_mode=dp_mode,
        privacy=privacy,
        min_clients=min(2, num_clients),
        seed=seed,
        **kw,
    )
    kwargs = {}
    if with_eval:
        kwargs["test_images"] = mnist.normalized(mnist.test_images)
        kwargs["test_labels"] = mnist.test_labels
    return FederatedRoundEngine(model, fa, cfg, **kwargs)


def test_config1_two_client_rounds_and_learning(mnist):
    """BASELINE config #1 (2-client MNIST SimpleCNN) + learning progress +
    convergence scoring, on one engine."""
    eng = make_engine(mnist, num_clients=2, rounds_epochs=2, with_eval=True,
                      samples_per_client=256)
    r = eng.run_round()
    assert r.participating_clients == 2
    assert np.isfinite(r.train_loss)
    assert 0.0 <= r.train_accuracy <= 1.0
    assert r.test_accuracy is not None
    # round 0 has no previous model, so score 0 (reference behaves the same)
    assert r.convergence_score == 0.0
    hist = eng.run(num_rounds=3)
    assert hist[-1].convergence_score > 0
    assert hist[-1].test_accuracy > 0.5  # chance = 0.1 on synthetic digits


def test_config2_non_iid_weighted(mnist):
    """BASELINE config #2: 10-client Dirichlet non-IID, sample-weighted."""
    eng = make_engine(mnist, num_clients=10, strategy="non_iid",
                      samples_per_client=None)
    r = eng.run_round(evaluate=False)
    assert r.participating_clients == 10
    assert np.isfinite(r.train_loss)
    counts = np.asarray(eng.data.num_samples)
    assert counts.std() > 0  # actually heterogeneous shards


def test_determinism_and_seed_sensitivity(mnist):
    a = make_engine(mnist, num_clients=3, seed=11)
    b = make_engine(mnist, num_clients=3, seed=11)
    c = make_engine(mnist, num_clients=3, seed=12)
    ra = a.run_round(evaluate=False)
    rb = b.run_round(evaluate=False)
    rc = c.run_round(evaluate=False)
    assert ra.train_loss == rb.train_loss
    assert ra.train_loss != rc.train_loss
    wa, wb = a.get_model_weights(), b.get_model_weights()
    for k in wa:
        np.testing.assert_array_equal(np.asarray(wa[k]), np.asarray(wb[k]))


def test_config3_dp_delta_mode(mnist):
    """BASELINE config #3 (reference semantics): delta clipping + Gaussian
    noise + additive budget accounting, with exhaustion enforcement."""
    privacy = PrivacyConfig(epsilon=1.0, delta=1e-5, max_grad_norm=1.0)
    eng = make_engine(mnist, num_clients=4, dp_mode="delta", privacy=privacy,
                      epsilon_per_round=0.25, delta_per_round=2.5e-6)
    w0 = {k: np.asarray(v) for k, v in eng.get_model_weights().items()}
    r1 = eng.run_round(evaluate=False)
    assert r1.epsilon_spent == 0.25
    status = eng.budget_tracker.get_budget_status()
    assert status["consumed_epsilon"] == pytest.approx(0.25)
    assert status["remaining_epsilon"] == pytest.approx(0.75)
    ledger = eng.accountant.get_privacy_ledger()
    assert ledger and ledger[0]["mechanism_type"] == "gaussian"
    # DP noise actually moved the weights (ref smoke: quick_start.py:65-90)
    w1 = eng.get_model_weights()
    assert any(not np.allclose(w0[k], np.asarray(w1[k])) for k in w0)
    # 3 more rounds exhaust the budget; the 5th must refuse
    for _ in range(3):
        eng.run_round(evaluate=False)
    with pytest.raises(PrivacyError):
        eng.run_round(evaluate=False)


def test_participation_and_heterogeneous_epochs(mnist):
    """Partial participation, straggler masks, exclusions, per-client epoch
    budgets, and masked-aggregation semantics on one 8-client engine."""
    eng = make_engine(mnist, num_clients=8, rounds_epochs=2,
                      participation_rate=0.6, straggler_dropout_rate=0.2,
                      seed=3, samples_per_client=32)
    # exclusions respected, min_clients enforced
    mask = eng.sample_participation(exclude=[0, 1])
    assert mask[0] == 0.0 and mask[1] == 0.0
    assert mask.sum() >= eng.config.min_clients
    # heterogeneous epoch budgets coexist in one vmapped program
    eng.epochs_per_client = np.array([1, 1, 1, 1, 2, 2, 2, 2], np.int32)
    r = eng.run_round(evaluate=False)
    assert 2 <= r.participating_clients <= 8
    assert np.isfinite(r.train_loss)
    # explicit mask: only clients 0,1 participate; weights still move
    w0 = {k: np.asarray(v) for k, v in eng.get_model_weights().items()}
    m = np.zeros(8, np.float32)
    m[:2] = 1.0
    eng.run_round(mask=m, evaluate=False)
    w1 = eng.get_model_weights()
    assert any(not np.allclose(w0[k], np.asarray(w1[k])) for k in w0)


def test_weight_roundtrip_through_engine(mnist):
    eng = make_engine(mnist, num_clients=2, samples_per_client=32)
    w = eng.get_model_weights()
    w_np = {k: np.asarray(v) for k, v in w.items()}
    eng.run_round(evaluate=False)
    eng.set_model_weights(w_np)
    w2 = eng.get_model_weights()
    for k in w:
        np.testing.assert_array_equal(w_np[k], np.asarray(w2[k]))


def test_server_optimizer_identity_and_adaptive(mnist):
    """Server optimizers (fl_tpu.fl.server_optimizer): fedavgm with lr=1,
    momentum=0 is EXACTLY plain FedAvg (sgd on the pseudo-gradient
    x - avg(x) steps to avg(x)); fedadam produces a different, finite,
    learning trajectory; the fused path refuses (host-side state)."""
    import pytest as _pytest

    plain = make_engine(mnist, num_clients=2, samples_per_client=64, seed=9)
    ident = make_engine(mnist, num_clients=2, samples_per_client=64, seed=9,
                        server_optimizer="fedavgm", server_lr=1.0,
                        server_momentum=0.0)
    adam = make_engine(mnist, num_clients=2, samples_per_client=64, seed=9,
                       server_optimizer="fedadam", server_lr=0.1)

    mask = np.ones(2, np.float32)
    r_p = plain.run_round(mask=mask, evaluate=False)
    r_i = ident.run_round(mask=mask, evaluate=False)
    r_a = adam.run_round(mask=mask, evaluate=False)
    assert r_p.train_loss == pytest.approx(r_i.train_loss)
    w_p, w_i, w_a = (e.get_model_weights() for e in (plain, ident, adam))
    for k in w_p:
        np.testing.assert_allclose(np.asarray(w_i[k]), np.asarray(w_p[k]),
                                   rtol=1e-6, atol=1e-7)
    # fedadam moved the model somewhere else (but finite)
    moved = any(not np.allclose(np.asarray(w_a[k]), np.asarray(w_p[k]))
                for k in w_p)
    assert moved
    assert all(np.isfinite(np.asarray(v)).all() for v in w_a.values())
    assert np.isfinite(r_a.train_loss)
    # momentum state persists round over round
    adam.run_round(mask=mask, evaluate=False)
    assert adam.server_opt_state is not None

    with _pytest.raises(ValueError, match="server optimizer"):
        adam.run_rounds_fused(2)
