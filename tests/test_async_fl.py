"""Asynchronous buffered aggregation — FedBuff (fl_tpu.fl.async_fl).

Capability extension: the reference coordinator is strictly synchronous
(blocks on min_clients then aggregates, src/coordinator/grpc_server.py:
209-214). Verifies the deferred-execution equivalence (equal service
times + full buffer ≡ synchronous FedAvg, bit-near-exact), staleness
bookkeeping and the ring-eviction cancel policy, buffer semantics,
learning progress, and mesh equality.
"""

import dataclasses

import flax.linen as nn
import jax
import numpy as np
import pytest

from fl_tpu.data.federated import FederatedArrays
from fl_tpu.data.synthetic import synthetic_mnist
from fl_tpu.fl.async_fl import AsyncConfig, AsyncFederatedEngine
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.models.base import FLModel
from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig


class TinyMLP(nn.Module):
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(16, name="fc1")(x))
        return nn.Dense(self.num_classes, name="fc2")(x)


def tiny_model():
    return FLModel(module=TinyMLP(), name="tiny_mlp",
                   input_shape=(28, 28, 1), num_classes=10)


def make_data(C=4, n=32, seed=0):
    xtr, ytr, _, xte = synthetic_mnist(n_train=C * n, n_test=128, seed=seed)
    return FederatedArrays(
        images=xtr.reshape(C, n, 28, 28, 1),
        labels=ytr.reshape(C, n).astype(np.int32),
        num_samples=np.full(C, n, np.int32),
        mean=np.asarray([0.1307], np.float32),
        std=np.asarray([0.3081], np.float32), num_classes=10)


TRAIN = FederatedTrainingConfig(local_epochs=2, batch_size=16,
                                learning_rate=0.05, optimizer_type="sgd")


def test_full_buffer_equal_speeds_equals_sync_fedavg():
    """With unit service times and buffer = population, every FedBuff
    server step is exactly one synchronous FedAvg round (deferred
    execution is bit-equivalent; attempt index ≡ round index in the key
    schedule)."""
    data = make_data(C=4)
    sync = FederatedRoundEngine(
        tiny_model(), data,
        RoundEngineConfig(training=TRAIN, seed=7))
    async_eng = AsyncFederatedEngine(
        tiny_model(), data,
        AsyncConfig(training=TRAIN, buffer_size=4, seed=7,
                    sample_weighted=True, duration_sigma=0.0,
                    heterogeneity_sigma=0.0))
    for step in range(2):
        sync.run_round()
        res = async_eng.run_server_step()
        assert res.staleness == [0, 0, 0, 0]
        for a, b in zip(jax.tree.leaves(sync.global_variables),
                        jax.tree.leaves(async_eng.global_variables)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                        rtol=1e-5, atol=1e-7)


def test_staleness_bounded_and_buffer_semantics():
    data = make_data(C=6)
    eng = AsyncFederatedEngine(
        tiny_model(), data,
        AsyncConfig(training=TRAIN, buffer_size=2, max_staleness=4,
                    seed=1))
    results = eng.run(8)
    for i, r in enumerate(results):
        assert r.server_step == i
        assert len(r.client_ids) == 2
        assert all(0 <= s <= 4 for s in r.staleness)
    assert eng.version == 8
    # heterogeneous speeds: fast clients contribute more attempts
    counts = np.bincount(np.concatenate(
        [r.client_ids for r in results]), minlength=6)
    assert counts.max() > counts.min()
    # simulated clock is monotone
    times = [r.sim_time for r in results]
    assert all(b >= a for a, b in zip(times, times[1:]))


def test_ring_eviction_cancels_and_restarts():
    """max_staleness=0 forces every not-just-started client to cancel:
    the engine must keep making progress and count the cancellations."""
    data = make_data(C=6)
    eng = AsyncFederatedEngine(
        tiny_model(), data,
        AsyncConfig(training=TRAIN, buffer_size=2, max_staleness=0,
                    seed=2))
    results = eng.run(6)
    assert all(s == [0, 0] for s in (r.staleness for r in results))
    assert results[-1].cancelled_attempts > 0


def test_async_learns():
    data = make_data(C=8, n=64)
    xte = np.asarray(data.images).reshape(-1, 28, 28, 1)[:256]
    yte = np.asarray(data.labels).reshape(-1)[:256]
    eng = AsyncFederatedEngine(
        tiny_model(), data,
        AsyncConfig(training=TRAIN, buffer_size=4, seed=3))
    before = eng.evaluate(xte, yte)["accuracy"]
    eng.run(10)
    after = eng.evaluate(xte, yte)["accuracy"]
    assert after > before + 0.2


def test_staleness_discount_changes_dynamics():
    data = make_data(C=6)

    def run(exponent):
        eng = AsyncFederatedEngine(
            tiny_model(), data,
            AsyncConfig(training=TRAIN, buffer_size=2, max_staleness=6,
                        staleness_exponent=exponent, seed=4))
        results = eng.run(6)
        assert any(max(r.staleness) > 0 for r in results), \
            "scenario must actually produce stale updates"
        return eng.global_variables

    g0, g5 = run(0.0), run(5.0)
    diffs = [np.max(np.abs(np.asarray(a) - np.asarray(b)))
             for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g5))]
    assert max(diffs) > 1e-6


def test_mesh_equality(mesh8):
    data = make_data(C=8)
    cfg = AsyncConfig(training=TRAIN, buffer_size=8, seed=5)
    e1 = AsyncFederatedEngine(tiny_model(), data, cfg)
    e2 = AsyncFederatedEngine(tiny_model(), data, cfg, mesh=mesh8)
    for _ in range(2):
        r1, r2 = e1.run_server_step(), e2.run_server_step()
        assert r1.client_ids == r2.client_ids
        assert r1.staleness == r2.staleness
    for a, b in zip(jax.tree.leaves(e1.global_variables),
                    jax.tree.leaves(e2.global_variables)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                    rtol=2e-5, atol=2e-6)


def test_config_validation(mesh8):
    data = make_data(C=4)
    m = tiny_model()
    with pytest.raises(ValueError, match="buffer_size"):
        AsyncFederatedEngine(m, data, AsyncConfig(buffer_size=0))
    with pytest.raises(ValueError, match="exceeds"):
        AsyncFederatedEngine(m, data, AsyncConfig(buffer_size=5))
    with pytest.raises(ValueError, match="max_staleness"):
        AsyncFederatedEngine(m, data, AsyncConfig(buffer_size=2,
                                                  max_staleness=-1))
    with pytest.raises(ValueError, match="divide evenly"):
        AsyncFederatedEngine(m, data, AsyncConfig(buffer_size=2),
                             mesh=mesh8)
