"""Vertical (feature-partitioned) FL / SplitNN: fl_tpu/fl/vertical.py."""

import numpy as np
import pytest

from fl_tpu.fl.vertical import (
    VerticalConfig,
    VerticalFLEngine,
    split_features,
)


def _toy_task(n=512, d=20, classes=3, seed=0):
    """Linearly separable-ish synthetic tabular task where the signal is
    spread across BOTH parties' columns, so neither side can solve it
    alone — learning proves the cut actually transports information."""
    rng = np.random.default_rng(seed)
    w = rng.normal(0, 1, (d, classes))
    x = rng.normal(0, 1, (n, d)).astype(np.float32)
    y = np.argmax(x @ w + 0.1 * rng.normal(0, 1, (n, classes)), axis=1)
    return x, y.astype(np.int32)


def test_split_features_partitions_columns():
    x = np.arange(24, dtype=np.float32).reshape(4, 6)
    parts = split_features(x, 3)
    assert [p.shape for p in parts] == [(4, 2)] * 3
    np.testing.assert_array_equal(np.concatenate(parts, axis=1), x)
    # images flatten first
    img = np.zeros((4, 2, 3, 1), np.float32)
    assert split_features(img, 2)[0].shape == (4, 3)


def test_vertical_learns_cross_party_signal():
    x, y = _toy_task()
    xtr, ytr = x[:384], y[:384]
    xte, yte = x[384:], y[384:]
    eng = VerticalFLEngine(
        split_features(xtr, 2), ytr, num_classes=3,
        config=VerticalConfig(batch_size=32, hidden=32, cut_dim=8,
                              learning_rate=3e-3, seed=0),
        test_splits=split_features(xte, 2), test_labels=yte)
    first = eng.run_epoch()
    for _ in range(14):
        last = eng.run_epoch()
    assert last["train_loss"] < first["train_loss"]
    acc = eng.evaluate()["accuracy"]
    assert acc > 0.7  # chance is 1/3; signal needs both parties' columns


def test_vertical_beats_single_party_floor():
    """Train a label-party-only variant (other party's columns zeroed):
    the 2-party engine must beat it — the cut transports real signal."""
    x, y = _toy_task(seed=3)
    both = VerticalFLEngine(
        split_features(x, 2), y, num_classes=3,
        config=VerticalConfig(batch_size=32, hidden=32, cut_dim=8,
                              learning_rate=3e-3, seed=0),
        test_splits=split_features(x, 2), test_labels=y)
    crippled_splits = split_features(x, 2)
    crippled_splits[1] = np.zeros_like(crippled_splits[1])
    solo = VerticalFLEngine(
        crippled_splits, y, num_classes=3,
        config=VerticalConfig(batch_size=32, hidden=32, cut_dim=8,
                              learning_rate=3e-3, seed=0),
        test_splits=crippled_splits, test_labels=y)
    for _ in range(15):
        both.run_epoch()
        solo.run_epoch()
    assert both.evaluate()["accuracy"] > solo.evaluate()["accuracy"] + 0.1


def test_vertical_cut_noise_still_trains_and_changes_run():
    x, y = _toy_task(seed=1)
    quiet = VerticalFLEngine(split_features(x, 2), y, 3,
                             VerticalConfig(batch_size=32, hidden=32,
                                            cut_dim=8, seed=2))
    noisy = VerticalFLEngine(split_features(x, 2), y, 3,
                             VerticalConfig(batch_size=32, hidden=32,
                                            cut_dim=8, seed=2,
                                            cut_noise_std=0.5))
    for _ in range(5):
        rq = quiet.run_epoch()
        rn = noisy.run_epoch()
    assert rq["train_loss"] != rn["train_loss"]
    assert np.isfinite(rn["train_loss"])


def test_vertical_communication_accounting():
    x, y = _toy_task(n=256)
    eng = VerticalFLEngine(split_features(x, 4), y, 3,
                           VerticalConfig(batch_size=32, cut_dim=8))
    # 3 non-label parties x (fwd + bwd) x (32, 8) f32
    assert eng.exchanged_bytes_per_step() == 3 * 2 * 32 * 8 * 4
    assert eng.exchanged_bytes_per_epoch() == \
        (256 // 32) * eng.exchanged_bytes_per_step()
    assert eng.raw_feature_bytes() == sum(
        int(np.prod(s.shape)) * 4 for s in split_features(x, 4)[1:])


def test_vertical_validation_errors():
    x, y = _toy_task(n=64)
    with pytest.raises(ValueError, match=">= 2 parties"):
        VerticalFLEngine([x], y, 3)
    with pytest.raises(ValueError, match="row-aligned"):
        VerticalFLEngine([x[:32], x[:64]], y[:32], 3)
    with pytest.raises(ValueError, match="labels"):
        VerticalFLEngine(split_features(x, 2), y[:10], 3)
