"""Membership-inference harness (fl_tpu.validation.membership).

Verifies the attack statistics against hand oracles, the (ε, δ)
advantage ceiling's closed forms, near-chance behavior on an untrained
model, the measured overfit-vs-DP gap through the production engine,
and the engine adapter's pad-slot filtering.
"""

import math

import numpy as np
import pytest

from fl_tpu.data.federated import FederatedArrays
from fl_tpu.data.synthetic import synthetic_mnist
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig
from fl_tpu.validation.membership import (
    best_threshold_advantage,
    evaluate_membership_risk,
    loss_attack_report,
    membership_advantage_bound,
    rank_auc,
)

from tests.test_qffl import make_data, tiny_model


def test_rank_auc_oracle():
    # perfect separation
    assert rank_auc(np.asarray([3.0, 4.0]), np.asarray([1.0, 2.0])) == 1.0
    # perfect anti-separation
    assert rank_auc(np.asarray([1.0, 2.0]), np.asarray([3.0, 4.0])) == 0.0
    # ties: pos=[1,2], neg=[1,2] -> pairs (1,1)=.5 (1,2)=0 (2,1)=1 (2,2)=.5
    assert rank_auc(np.asarray([1.0, 2.0]),
                    np.asarray([1.0, 2.0])) == pytest.approx(0.5)
    # one-sided overlap
    auc = rank_auc(np.asarray([1.0, 3.0]), np.asarray([2.0]))
    assert auc == pytest.approx(0.5)


def test_best_threshold_advantage_oracle():
    # pos >= 2 catches both positives and one of two negatives ->
    # TPR 1, FPR .5 -> adv .5 at threshold 2
    adv, thr = best_threshold_advantage(
        np.asarray([2.0, 3.0]), np.asarray([1.0, 2.0]))
    assert adv == pytest.approx(0.5)
    # both t=3 (TPR .5, FPR 0) and t=2 (TPR 1, FPR .5) achieve it
    assert thr in (2.0, 3.0)
    # inseparable
    adv, _ = best_threshold_advantage(
        np.asarray([1.0, 2.0]), np.asarray([1.0, 2.0]))
    assert adv == pytest.approx(0.0)


def test_advantage_bound_closed_forms():
    # δ=0: tanh(ε/2) (tight hypothesis-testing bound)
    for eps in (0.1, 1.0, 2.0, 8.0):
        assert membership_advantage_bound(eps, 0.0) == pytest.approx(
            math.tanh(eps / 2.0), rel=1e-9)
    # ε=0: only the δ slack distinguishes
    assert membership_advantage_bound(0.0, 1e-5) == pytest.approx(1e-5)
    # non-trivial δ: (e^ε − 1 + 2δ)/(e^ε + 1) — the δ term must NOT
    # cancel (regression for the f* sign error that collapsed every δ
    # to tanh(ε/2), under-reporting the ceiling by 2δ/(e^ε+1))
    t = math.exp(1.0)
    assert membership_advantage_bound(1.0, 0.1) == pytest.approx(
        (t - 1.0 + 0.2) / (t + 1.0), rel=1e-12)
    assert membership_advantage_bound(1.0, 0.1) == pytest.approx(
        0.51591, abs=1e-5)
    assert membership_advantage_bound(1.0, 0.1) > \
        membership_advantage_bound(1.0, 0.0)
    # δ large enough saturates at 1
    assert membership_advantage_bound(0.5, 1.0) == 1.0
    # monotone in ε and bounded by 1
    b = [membership_advantage_bound(e, 1e-5) for e in (0.5, 1, 2, 4, 50)]
    assert all(x < y for x, y in zip(b, b[1:])) or b[-1] == 1.0
    assert b[-1] <= 1.0
    with pytest.raises(ValueError):
        membership_advantage_bound(-1.0)


def _nonmembers(n=256, seed=9):
    x, y, _, _ = synthetic_mnist(n_train=n, n_test=1, seed=seed)
    return x.reshape(n, 28, 28, 1), y[:n].astype(np.int32)


def test_untrained_model_near_chance():
    data = make_data(C=4, n=64, seed=0)
    eng = FederatedRoundEngine(
        tiny_model(), data,
        RoundEngineConfig(training=FederatedTrainingConfig(
            local_epochs=1, batch_size=16, learning_rate=0.05,
            optimizer_type="sgd"), seed=0))
    nx, ny = _nonmembers()
    rep = evaluate_membership_risk(eng, nx, ny)
    assert abs(rep.auc - 0.5) < 0.12, rep.auc
    assert rep.n_members == 4 * 64
    assert rep.n_nonmembers == 256


def test_overfit_model_leaks_and_dp_caps_it():
    """The measured gap the harness exists for: a non-private model
    trained to memorize its 64 members separates member/non-member
    losses (high AUC); the DP-SGD run at ε=2 stays under the certified
    advantage ceiling and well below the non-private attack."""
    data = make_data(C=2, n=32, seed=1)
    nx, ny = _nonmembers(seed=11)

    eng = FederatedRoundEngine(
        tiny_model(), data,
        RoundEngineConfig(training=FederatedTrainingConfig(
            local_epochs=5, batch_size=16, learning_rate=0.2,
            optimizer_type="sgd"), seed=0))
    for _ in range(12):
        eng.run_round(evaluate=False)
    rep_np = evaluate_membership_risk(eng, nx, ny)
    assert rep_np.auc > 0.75, rep_np.auc
    assert rep_np.advantage_bound is None  # no DP claim to compare to

    from fl_tpu.core.types import PrivacyConfig

    eng_dp = FederatedRoundEngine(
        tiny_model(), data,
        RoundEngineConfig(
            training=FederatedTrainingConfig(
                local_epochs=5, batch_size=16, learning_rate=0.2,
                optimizer_type="sgd"),
            dp_mode="dp_sgd", dp_microbatch=16,
            privacy=PrivacyConfig(epsilon=2.0, delta=1e-5,
                                  max_grad_norm=1.0,
                                  noise_multiplier=6.0),
            seed=0))
    for _ in range(2):  # 20 dp_sgd steps at q=.5, z=6 -> eps 1.95 < 2
        eng_dp.run_round(evaluate=False)
    rep_dp = evaluate_membership_risk(eng_dp, nx, ny)
    # the certificate ceiling holds with statistical slack (the max-over-
    # thresholds estimator is upward-biased at finite samples)
    bound = rep_dp.advantage_bound
    assert bound == pytest.approx(
        membership_advantage_bound(2.0, 1e-5), rel=1e-9)
    slack = 2.5 * math.sqrt(math.log(rep_dp.n_nonmembers)
                            / rep_dp.n_members)
    assert rep_dp.advantage <= bound + slack, (rep_dp.advantage, bound)
    assert rep_dp.auc < rep_np.auc


def test_engine_adapter_filters_pad_slots():
    """Members must be only the valid shard slots: pad entries were
    never trained on."""
    xtr, ytr, _, _ = synthetic_mnist(n_train=64, n_test=1, seed=3)
    data = FederatedArrays(
        images=xtr.reshape(2, 32, 28, 28, 1),
        labels=ytr.reshape(2, 32).astype(np.int32),
        num_samples=np.asarray([20, 7], np.int32),  # rest is padding
        mean=np.asarray([0.1307], np.float32),
        std=np.asarray([0.3081], np.float32), num_classes=10)
    eng = FederatedRoundEngine(
        tiny_model(), data,
        RoundEngineConfig(training=FederatedTrainingConfig(
            local_epochs=1, batch_size=16, learning_rate=0.05,
            optimizer_type="sgd"), seed=0))
    nx, ny = _nonmembers(n=64)
    rep = evaluate_membership_risk(eng, nx, ny)
    assert rep.n_members == 27
    d = rep.to_dict()
    assert set(d) >= {"auc", "advantage", "n_members", "advantage_bound"}
