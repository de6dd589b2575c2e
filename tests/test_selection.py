"""Oort-style utility-based client selection
(fl_tpu.orchestration.selection).

Capability extension: the reference selects participants by registration
order with only a health filter (src/coordinator/round_manager.py:533-549).
"""

import numpy as np
import pytest

from fl_tpu.orchestration.selection import OortSelector


def drive(sel, k, losses, num_samples=None, rounds=1, durations=None):
    masks = []
    for _ in range(rounds):
        m = sel.select_mask(k)
        sel.update(m, losses, num_samples=num_samples,
                   durations=durations)
        masks.append(m)
    return masks


def test_mask_shape_and_count():
    sel = OortSelector(10, seed=0)
    m = sel.select_mask(4)
    assert m.shape == (10,) and m.dtype == np.float32
    assert m.sum() == 4 and set(np.unique(m)) <= {0.0, 1.0}


def test_exploration_covers_everyone():
    sel = OortSelector(12, fraction_explore=0.5, seed=1)
    losses = np.full(12, 1.0)
    drive(sel, 4, losses, rounds=12)
    assert sel.state()["explored"].all()


def explore_all(sel, losses, **kw):
    """One full-population round marks every client explored (the k=C
    mask exercises the unexplored-fallback path too)."""
    drive(sel, sel.num_clients, losses, rounds=1, **kw)
    assert sel.state()["explored"].all()


def test_exploitation_prefers_high_loss_large_shards():
    C, k = 8, 2
    sel = OortSelector(C, fraction_explore=0.0, min_explore=0.0, seed=2)
    losses = np.asarray([2.0, 2.0, 2.0, 2.0, 0.01, 0.01, 0.01, 0.01])
    n = np.full(C, 100)
    explore_all(sel, losses, num_samples=n)
    picks = np.zeros(C)
    for m in drive(sel, k, losses, num_samples=n, rounds=10):
        picks += m
    # high-loss clients dominate selection
    assert picks[:4].sum() > picks[4:].sum() * 2


def test_temporal_bonus_recirculates():
    """With equal utilities the √(ln R / R_i) bonus must rotate selection
    instead of pinning the same argmax forever."""
    C, k = 6, 2
    sel = OortSelector(C, fraction_explore=0.0, min_explore=0.0, seed=3)
    losses = np.full(C, 1.0)
    explore_all(sel, losses)
    picks = np.zeros(C)
    for m in drive(sel, k, losses, rounds=12):
        picks += m
    assert (picks > 0).all(), f"some clients starved: {picks}"


def test_straggler_penalty():
    C, k = 4, 1
    sel = OortSelector(C, fraction_explore=0.0, min_explore=0.0,
                       desired_duration=1.0, straggler_alpha=2.0, seed=4)
    losses = np.full(C, 1.0)
    durations = np.asarray([1.0, 1.0, 1.0, 10.0])  # client 3 is 10× slow
    explore_all(sel, losses, durations=durations)
    picks = np.zeros(C)
    for m in drive(sel, k, losses, durations=durations, rounds=9):
        picks += m
    assert picks[3] == picks.min()
    util = sel.state()["utility"]
    assert util[3] == pytest.approx(util[0] / 100.0)  # (1/10)^2


def test_validation():
    with pytest.raises(ValueError, match="fraction_explore"):
        OortSelector(4, fraction_explore=1.5)
    with pytest.raises(ValueError, match="num_clients"):
        OortSelector(0)
    sel = OortSelector(4)
    with pytest.raises(ValueError, match="k must be"):
        sel.select_mask(0)
    with pytest.raises(ValueError, match="k must be"):
        sel.select_mask(5)


def test_engine_integration():
    """The selector's masks drive the real engine, and the engine's
    per-client losses feed back into the selector."""
    import flax.linen as nn
    import jax

    from fl_tpu.data.federated import FederatedArrays
    from fl_tpu.data.synthetic import synthetic_mnist
    from fl_tpu.fl.local_training import FederatedTrainingConfig
    from fl_tpu.models.base import FLModel
    from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig

    class TinyMLP(nn.Module):
        @nn.compact
        def __call__(self, x, *, train: bool = False):
            x = x.reshape((x.shape[0], -1))
            return nn.Dense(10, name="fc")(x)

    C, n = 6, 32
    xtr, ytr, _, _ = synthetic_mnist(n_train=C * n, n_test=1, seed=9)
    data = FederatedArrays(
        images=xtr.reshape(C, n, 28, 28, 1),
        labels=ytr.reshape(C, n).astype(np.int32),
        num_samples=np.full(C, n, np.int32),
        mean=np.asarray([0.1307], np.float32),
        std=np.asarray([0.3081], np.float32), num_classes=10)
    eng = FederatedRoundEngine(
        FLModel(module=TinyMLP(), name="tiny", input_shape=(28, 28, 1),
                num_classes=10),
        data,
        RoundEngineConfig(training=FederatedTrainingConfig(
            local_epochs=1, batch_size=16, learning_rate=0.05,
            optimizer_type="sgd"), seed=0))
    sel = OortSelector(C, seed=0)
    for _ in range(3):
        mask = sel.select_mask(3)
        res = eng.run_round(mask=mask, evaluate=False)
        assert res.participating_clients == 3
        assert eng.last_client_losses.shape == (C,)
        part = mask > 0
        assert np.isfinite(eng.last_client_losses[part]).all()
        sel.update(mask, eng.last_client_losses,
                   num_samples=np.asarray(data.num_samples))
    st = sel.state()
    assert st["explored"].sum() >= 3
    assert (st["utility"][st["explored"]] > 0).any()
