"""Hierarchical FL — HierFAVG (fl_tpu.fl.hierarchical).

Capability extension: the reference has a single-tier coordinator. The
load-bearing checks are the two algebraic limits where HierFAVG must
equal plain FedAvg (one edge; cloud sync every round) — verified against
the flat engine bit-near-exactly — plus sync/divergence semantics and
mesh equality.
"""

import flax.linen as nn
import jax
import numpy as np
import pytest

from fl_tpu.data.federated import FederatedArrays
from fl_tpu.data.synthetic import synthetic_mnist
from fl_tpu.fl.hierarchical import (
    HierarchicalConfig,
    HierarchicalFederatedEngine,
)
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.models.base import FLModel
from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig


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


TRAIN = FederatedTrainingConfig(local_epochs=2, batch_size=16,
                                learning_rate=0.05, optimizer_type="sgd")


def flat_engine(data):
    return FederatedRoundEngine(
        tiny_model(), data, RoundEngineConfig(training=TRAIN, seed=0))


def assert_close(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                    rtol=1e-5, atol=1e-7)


def test_sync_every_round_equals_flat_fedavg():
    """τ=1: within-edge weighting composed with edge-total weighting is
    global sample weighting — the cloud model must track the flat
    engine."""
    data = make_data()
    flat = flat_engine(data)
    hier = HierarchicalFederatedEngine(
        tiny_model(), data,
        HierarchicalConfig(training=TRAIN, num_edges=2,
                           global_sync_every=1, seed=0))
    for _ in range(2):
        flat.run_round(evaluate=False)
        res = hier.run_round()
        assert res.cloud_synced
        assert_close(hier.cloud_variables, flat.global_variables)
        assert res.edge_divergence < 1e-6   # edges rebroadcast post-sync


def test_single_edge_equals_flat_fedavg_between_syncs():
    """E=1: the edge aggregation IS FedAvg; the edge model must track the
    flat engine every round even when the cloud only syncs later."""
    data = make_data()
    flat = flat_engine(data)
    hier = HierarchicalFederatedEngine(
        tiny_model(), data,
        HierarchicalConfig(training=TRAIN, num_edges=1,
                           global_sync_every=3, seed=0))
    for r in range(3):
        flat.run_round(evaluate=False)
        res = hier.run_round()
        edge0 = jax.tree.map(lambda l: l[0], hier.edge_variables)
        assert_close(edge0, flat.global_variables)
        assert res.cloud_synced == (r == 2)


def test_edges_diverge_then_sync():
    data = make_data(C=4)
    # give the two edges different data flavors (label shift)
    labels = np.array(data.labels)
    labels[2:] = (labels[2:] + 5) % 10
    import dataclasses as dc

    data = dc.replace(data, labels=labels)
    hier = HierarchicalFederatedEngine(
        tiny_model(), data,
        HierarchicalConfig(training=TRAIN, num_edges=2,
                           edge_assignment=[0, 0, 1, 1],
                           global_sync_every=2, seed=0))
    r0 = hier.run_round()
    assert not r0.cloud_synced and r0.edge_divergence > 1e-4
    r1 = hier.run_round()
    assert r1.cloud_synced and r1.edge_divergence < 1e-6
    # cloud model changed at the sync
    assert np.isfinite(r1.train_loss)


def test_mesh_equality(mesh8):
    data = make_data(C=8)
    cfg = HierarchicalConfig(training=TRAIN, num_edges=3,
                             edge_assignment=[0, 0, 0, 1, 1, 1, 2, 2],
                             global_sync_every=2, seed=0)
    e1 = HierarchicalFederatedEngine(tiny_model(), data, cfg)
    e2 = HierarchicalFederatedEngine(tiny_model(), data, cfg, mesh=mesh8)
    for _ in range(2):
        r1, r2 = e1.run_round(), e2.run_round()
        assert r1.cloud_synced == r2.cloud_synced
    for a, b in zip(jax.tree.leaves(e1.edge_variables),
                    jax.tree.leaves(e2.edge_variables)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                    rtol=2e-5, atol=2e-6)


def test_default_assignment_leaves_no_edge_empty():
    """C=4, E=3 regression: the naive repeat(ceil(C/E))[:C] default made
    edge 2 empty (frozen model, zero cloud weight)."""
    data = make_data(C=4)
    eng = HierarchicalFederatedEngine(
        tiny_model(), data,
        HierarchicalConfig(training=TRAIN, num_edges=3, seed=0))
    sizes = np.bincount(eng.assignment, minlength=3)
    assert (sizes >= 1).all(), sizes
    with pytest.raises(IndexError, match="out of range"):
        xte = np.asarray(data.images).reshape(-1, 28, 28, 1)[:8]
        yte = np.asarray(data.labels).reshape(-1)[:8]
        eng.evaluate(xte, yte, edge=3)


def test_validation():
    data = make_data(C=4)
    m = tiny_model()
    with pytest.raises(ValueError, match="num_edges"):
        HierarchicalFederatedEngine(m, data, HierarchicalConfig(
            num_edges=0))
    with pytest.raises(ValueError, match="exceeds"):
        HierarchicalFederatedEngine(m, data, HierarchicalConfig(
            num_edges=5))
    with pytest.raises(ValueError, match="global_sync_every"):
        HierarchicalFederatedEngine(m, data, HierarchicalConfig(
            num_edges=2, global_sync_every=0))
    with pytest.raises(ValueError, match="length"):
        HierarchicalFederatedEngine(m, data, HierarchicalConfig(
            num_edges=2, edge_assignment=[0, 1]))
    with pytest.raises(ValueError, match="edge ids"):
        HierarchicalFederatedEngine(m, data, HierarchicalConfig(
            num_edges=2, edge_assignment=[0, 1, 2, 0]))
    with pytest.raises(ValueError, match="at least one client"):
        HierarchicalFederatedEngine(m, data, HierarchicalConfig(
            num_edges=2, edge_assignment=[0, 0, 0, 0]))
    # evaluate() addresses cloud or edge models
    eng = HierarchicalFederatedEngine(m, data, HierarchicalConfig(
        training=TRAIN, num_edges=2, seed=0))
    xte = np.asarray(data.images).reshape(-1, 28, 28, 1)[:64]
    yte = np.asarray(data.labels).reshape(-1)[:64]
    out = eng.evaluate(xte, yte)
    assert np.isfinite(out["loss"])
    out_e = eng.evaluate(xte, yte, edge=1)
    assert np.isfinite(out_e["loss"])
