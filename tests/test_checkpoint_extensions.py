"""Checkpoint/resume for the clustered (IFCA) and async (FedBuff)
engines: a restored engine must reproduce the uninterrupted run exactly
(per-round/attempt PRNG keys derive from (seed, counter); async also
restores the host event queue and RNG stream)."""

import flax.linen as nn
import jax
import numpy as np
import pytest

from fl_tpu.data.federated import FederatedArrays
from fl_tpu.data.synthetic import synthetic_mnist
from fl_tpu.fl.async_fl import AsyncConfig, AsyncFederatedEngine
from fl_tpu.fl.clustered import ClusteredConfig, ClusteredFederatedEngine
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.models.base import FLModel
from fl_tpu.orchestration.checkpoint import (
    restore_async_checkpoint,
    restore_clustered_checkpoint,
    save_async_checkpoint,
    save_clustered_checkpoint,
)


class TinyMLP(nn.Module):
    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.reshape((x.shape[0], -1))
        return nn.Dense(10, name="fc")(x)


def tiny_model():
    return FLModel(module=TinyMLP(), name="tiny", input_shape=(28, 28, 1),
                   num_classes=10)


def make_data(C=4, n=32, seed=0):
    xtr, ytr, _, _ = synthetic_mnist(n_train=C * n, n_test=1, seed=seed)
    return FederatedArrays(
        images=xtr.reshape(C, n, 28, 28, 1),
        labels=ytr.reshape(C, n).astype(np.int32),
        num_samples=np.full(C, n, np.int32),
        mean=np.asarray([0.1307], np.float32),
        std=np.asarray([0.3081], np.float32), num_classes=10)


TRAIN = FederatedTrainingConfig(local_epochs=1, batch_size=16,
                                learning_rate=0.05, optimizer_type="sgd")


def assert_trees_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_clustered_checkpoint_exact_resume(tmp_path):
    data = make_data()
    cfg = ClusteredConfig(training=TRAIN, num_clusters=2, seed=0,
                          warmstart_clients=(0, 3))
    ref = ClusteredFederatedEngine(tiny_model(), data, cfg)
    ref.run(4)

    eng = ClusteredFederatedEngine(tiny_model(), data, cfg)
    eng.run(2)
    save_clustered_checkpoint(eng, str(tmp_path))

    resumed = ClusteredFederatedEngine(tiny_model(), data, cfg)
    assert restore_clustered_checkpoint(resumed, str(tmp_path)) == 2
    resumed.run(2)
    assert resumed.round_number == ref.round_number
    np.testing.assert_array_equal(resumed.assignments, ref.assignments)
    assert_trees_equal(resumed.cluster_variables, ref.cluster_variables)


def test_clustered_checkpoint_rejects_k_mismatch(tmp_path):
    data = make_data()
    cfg = ClusteredConfig(training=TRAIN, num_clusters=2, seed=0)
    eng = ClusteredFederatedEngine(tiny_model(), data, cfg)
    eng.run_round()
    save_clustered_checkpoint(eng, str(tmp_path))
    other = ClusteredFederatedEngine(
        tiny_model(), data,
        ClusteredConfig(training=TRAIN, num_clusters=3, seed=0))
    with pytest.raises(ValueError, match="clusters"):
        restore_clustered_checkpoint(other, str(tmp_path))


def test_async_checkpoint_exact_resume(tmp_path):
    data = make_data(C=6)
    cfg = AsyncConfig(training=TRAIN, buffer_size=2, max_staleness=4,
                      seed=1)
    ref = AsyncFederatedEngine(tiny_model(), data, cfg)
    ref_results = ref.run(5)

    eng = AsyncFederatedEngine(tiny_model(), data, cfg)
    eng.run(2)
    save_async_checkpoint(eng, str(tmp_path))

    resumed = AsyncFederatedEngine(tiny_model(), data, cfg)
    assert restore_async_checkpoint(resumed, str(tmp_path)) == 2
    res = resumed.run(3)
    # identical continuation: same completion order, staleness, clock,
    # cancellations, and model bits
    for mine, theirs in zip(res, ref_results[2:]):
        assert mine.client_ids == theirs.client_ids
        assert mine.staleness == theirs.staleness
        assert mine.sim_time == pytest.approx(theirs.sim_time)
        assert mine.cancelled_attempts == theirs.cancelled_attempts
    assert resumed.version == ref.version
    assert_trees_equal(resumed.global_variables, ref.global_variables)
    assert_trees_equal(resumed.ring, ref.ring)


def test_async_restore_rejects_wrong_kind(tmp_path):
    data = make_data()
    cl = ClusteredFederatedEngine(
        tiny_model(), data, ClusteredConfig(training=TRAIN,
                                            num_clusters=2, seed=0))
    cl.run_round()
    save_clustered_checkpoint(cl, str(tmp_path))
    a = AsyncFederatedEngine(tiny_model(), data,
                             AsyncConfig(training=TRAIN, buffer_size=2))
    # kind is validated BEFORE the orbax restore: a clear ValueError,
    # not an opaque template-shape error
    with pytest.raises(ValueError, match="async"):
        restore_async_checkpoint(a, str(tmp_path))
