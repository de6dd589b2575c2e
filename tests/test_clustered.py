"""Clustered federated learning (IFCA, fl_tpu.fl.clustered).

Capability extension over the reference (one global model end-to-end,
src/coordinator/grpc_server.py:433-463). Verifies the argmin-assignment
dynamics separate a two-population mixture, per-cluster aggregation math,
empty-cluster invariance, and mesh equality.
"""

import flax.linen as nn
import jax
import numpy as np
import pytest

from fl_tpu.data.synthetic import synthetic_mnist
from fl_tpu.data.federated import FederatedArrays
from fl_tpu.fl.clustered import ClusteredConfig, ClusteredFederatedEngine
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.models.base import FLModel


class TinyMLP(nn.Module):
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(32, name="fc1")(x))
        return nn.Dense(self.num_classes, name="fc2")(x)


def tiny_model():
    return FLModel(module=TinyMLP(), name="tiny_mlp",
                   input_shape=(28, 28, 1), num_classes=10)


def two_population_data(C=8, n=64, seed=11):
    """Clients 0..C/2-1 carry normal labels, the rest a fixed label
    permutation (y+5 mod 10) — the canonical clustered-FL construct
    (Ghosh et al. 2020 §5 use permuted/rotated cohorts)."""
    xtr, ytr, xte, yte = synthetic_mnist(n_train=C * n, n_test=256,
                                         seed=seed)
    images = xtr.reshape(C, n, 28, 28, 1)
    labels = ytr.reshape(C, n).astype(np.int32)
    labels[C // 2:] = (labels[C // 2:] + 5) % 10
    fa = FederatedArrays(
        images=images, labels=labels,
        num_samples=np.full(C, n, np.int32),
        mean=np.asarray([0.1307], np.float32),
        std=np.asarray([0.3081], np.float32), num_classes=10)
    return fa, xte, yte


TRAIN = FederatedTrainingConfig(local_epochs=3, batch_size=16,
                                learning_rate=0.05, optimizer_type="sgd")


def test_ifca_separates_populations_and_specializes():
    fa, xte, yte = two_population_data()
    eng = ClusteredFederatedEngine(
        tiny_model(), fa,
        ClusteredConfig(training=TRAIN, num_clusters=2, seed=0,
                        warmstart_clients=(0, 7)))
    results = eng.run(4)
    # perfect population purity (warmstarted from one client per cohort)
    a = eng.assignments
    assert len(set(a[:4])) == 1 and len(set(a[4:])) == 1
    assert a[0] != a[7]
    assert results[-1].cluster_sizes == [4, 4]
    # the adopted-model loss must fall as clusters specialize
    assert results[-1].assignment_loss < results[0].assignment_loss
    # cross-specialization: each cluster is better on its own cohort's
    # labeling than on the other's
    ca, cb = int(a[0]), int(a[7])
    ev_a = eng.evaluate_clusters(xte, yte)
    ev_b = eng.evaluate_clusters(xte, (yte + 5) % 10)
    assert ev_a[ca]["accuracy"] > ev_a[cb]["accuracy"]
    assert ev_b[cb]["accuracy"] > ev_b[ca]["accuracy"]


def test_single_cluster_reduces_to_fedavg_dynamics():
    fa, _, _ = two_population_data(C=4)
    eng = ClusteredFederatedEngine(
        tiny_model(), fa, ClusteredConfig(training=TRAIN, num_clusters=1,
                                          seed=0))
    res = eng.run_round()
    assert res.cluster_sizes == [4]
    assert np.all(eng.assignments == 0)


def test_empty_cluster_model_unchanged():
    """Two identical clients both adopt the same cluster; the other
    cluster's model must come through the round bit-identical."""
    fa, _, _ = two_population_data(C=8)
    # make clients 0 and 1 identical (same shard)
    fa.images[1] = fa.images[0]
    fa.labels[1] = fa.labels[0]
    fa2 = FederatedArrays(
        images=fa.images[:2], labels=fa.labels[:2],
        num_samples=fa.num_samples[:2], mean=fa.mean, std=fa.std,
        num_classes=10)
    eng = ClusteredFederatedEngine(
        tiny_model(), fa2, ClusteredConfig(training=TRAIN, num_clusters=2,
                                           seed=3))
    before = [jax.tree.map(np.asarray, eng.cluster_model(j))
              for j in range(2)]
    res = eng.run_round()
    (empty,) = [j for j, s in enumerate(res.cluster_sizes) if s == 0]
    after = jax.tree.map(np.asarray, eng.cluster_model(empty))
    for b, aft in zip(jax.tree.leaves(before[empty]),
                      jax.tree.leaves(after)):
        np.testing.assert_array_equal(b, aft)


def test_mesh_equality(mesh8):
    """The shard_map superstep must produce the same models and
    assignments as the single-device program."""
    fa, _, _ = two_population_data(C=8, n=32)
    cfg = ClusteredConfig(training=TRAIN, num_clusters=2, seed=0,
                          warmstart_clients=(0, 7))
    e1 = ClusteredFederatedEngine(tiny_model(), fa, cfg)
    e2 = ClusteredFederatedEngine(tiny_model(), fa, cfg, mesh=mesh8)
    for _ in range(2):
        r1, r2 = e1.run_round(), e2.run_round()
        assert r1.cluster_sizes == r2.cluster_sizes
        np.testing.assert_array_equal(e1.assignments, e2.assignments)
    for l1, l2 in zip(jax.tree.leaves(e1.cluster_variables),
                      jax.tree.leaves(e2.cluster_variables)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=2e-5, atol=2e-6)


def test_config_validation():
    fa, _, _ = two_population_data(C=4)
    m = tiny_model()
    with pytest.raises(ValueError, match="num_clusters"):
        ClusteredFederatedEngine(m, fa, ClusteredConfig(num_clusters=0))
    with pytest.raises(ValueError, match="exceeds"):
        ClusteredFederatedEngine(m, fa, ClusteredConfig(num_clusters=5))
    with pytest.raises(ValueError, match="warmstart_clients"):
        ClusteredFederatedEngine(
            m, fa, ClusteredConfig(num_clusters=2, warmstart_clients=(0,)))
    with pytest.raises(ValueError, match="out of range"):
        ClusteredFederatedEngine(
            m, fa, ClusteredConfig(num_clusters=2,
                                   warmstart_clients=(0, 9)))
    eng = ClusteredFederatedEngine(m, fa, ClusteredConfig(num_clusters=2,
                                                          training=TRAIN))
    with pytest.raises(IndexError):
        eng.cluster_model(2)
