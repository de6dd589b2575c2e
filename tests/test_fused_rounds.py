"""Fused multi-round scan must be semantically identical to the sequential
round loop (same masks, same seeds → same weights)."""

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
    return load_dataset("mnist", n_train_synth=256, n_test_synth=64)


def make_engine(mnist, **kw):
    model = create_model("simple_cnn")
    fa = make_federated_arrays(mnist, num_clients=4, strategy="iid",
                               samples_per_client=32, seed=0)
    cfg = RoundEngineConfig(
        training=FederatedTrainingConfig(local_epochs=1, batch_size=8),
        seed=3, **kw,
    )
    return FederatedRoundEngine(model, fa, cfg)


def test_fused_matches_sequential(mnist):
    masks = np.ones((3, 4), np.float32)
    masks[1, 0] = 0.0  # a partial round in the middle

    seq = make_engine(mnist)
    for i in range(3):
        seq.run_round(mask=masks[i], evaluate=False)

    fused = make_engine(mnist)
    results = fused.run_rounds_fused(3, masks=masks, evaluate=False)

    assert len(results) == 3
    assert fused.round_number == seq.round_number == 3
    for r_f, r_s in zip(results, seq.history):
        assert r_f.train_loss == pytest.approx(r_s.train_loss, rel=1e-6)
        assert r_f.participating_clients == r_s.participating_clients
    wf, ws = fused.get_model_weights(), seq.get_model_weights()
    for k in wf:
        np.testing.assert_allclose(np.asarray(wf[k]), np.asarray(ws[k]),
                                   rtol=1e-6, atol=1e-7)


def test_fused_dp_budget_enforced(mnist):
    eng = make_engine(mnist, dp_mode="delta",
                      privacy=PrivacyConfig(1.0, 1e-5),
                      epsilon_per_round=0.4, delta_per_round=4e-6)
    eng.run_rounds_fused(2, evaluate=False)
    assert eng.budget_tracker.consumed_epsilon == pytest.approx(0.8)
    with pytest.raises(PrivacyError):
        eng.run_rounds_fused(2, evaluate=False)


def test_fused_then_sequential_continues(mnist):
    eng = make_engine(mnist)
    eng.run_rounds_fused(2, evaluate=False)
    r = eng.run_round(evaluate=False)
    assert r.round_number == 2
    assert len(eng.history) == 3


def test_fused_rounds_evaluate_every_validation():
    import pytest as _pytest

    from fl_tpu.data import load_dataset, make_federated_arrays
    from fl_tpu.fl.local_training import FederatedTrainingConfig
    from fl_tpu.models import create_model
    from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig

    mnist = load_dataset("mnist", n_train_synth=128, n_test_synth=32)
    fa = make_federated_arrays(mnist, num_clients=2, strategy="iid",
                               samples_per_client=16, seed=0)
    eng = FederatedRoundEngine(
        create_model("simple_cnn"), fa,
        RoundEngineConfig(training=FederatedTrainingConfig(
            local_epochs=1, batch_size=8)))
    for bad in (0, -1):
        with _pytest.raises(ValueError, match="evaluate_every"):
            eng.run_rounds_fused(4, evaluate_every=bad)


def test_fused_rounds_evaluate_every_chunks():
    """evaluate_every=k: test accuracy appears every k rounds, results are
    continuous across chunks."""
    import numpy as np

    from fl_tpu.data import load_dataset, make_federated_arrays
    from fl_tpu.fl.local_training import FederatedTrainingConfig
    from fl_tpu.models import create_model
    from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig

    mnist = load_dataset("mnist", n_train_synth=256, n_test_synth=64)
    fa = make_federated_arrays(mnist, num_clients=2, strategy="iid",
                               samples_per_client=32, seed=0)
    eng = FederatedRoundEngine(
        create_model("simple_cnn"), fa,
        RoundEngineConfig(
            training=FederatedTrainingConfig(local_epochs=1, batch_size=8),
            seed=2, max_clients=2),
        test_images=mnist.normalized(mnist.test_images),
        test_labels=mnist.test_labels)
    results = eng.run_rounds_fused(4, evaluate_every=2)
    assert [r.round_number for r in results] == [0, 1, 2, 3]
    evals = [r.test_accuracy is not None for r in results]
    assert evals == [False, True, False, True]
