"""Decentralized FL — D-PSGD gossip (fl_tpu.fl.decentralized).

Capability extension completing the topology family. Load-bearing
checks: complete-graph uniform mixing reproduces the flat FedAvg engine
bit-near-exactly every round; doubly-stochastic mixing preserves the
parameter mean and contracts consensus distance; mesh equality with the
all-gather + W-block formulation.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fl_tpu.data.federated import FederatedArrays
from fl_tpu.data.synthetic import synthetic_mnist
from fl_tpu.fl.decentralized import (
    DecentralizedConfig,
    DecentralizedFederatedEngine,
    metropolis_mixing_matrix,
    ring_mixing_matrix,
    validate_mixing_matrix,
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


def test_mixing_matrix_constructors():
    W = ring_mixing_matrix(6)
    np.testing.assert_allclose(W.sum(0), 1.0)
    np.testing.assert_allclose(W.sum(1), 1.0)
    assert (W >= 0).all() and W[0, 1] > 0 and W[0, 5] > 0 and W[0, 3] == 0
    # metropolis on a path graph 0-1-2
    A = np.asarray([[0, 1, 0], [1, 0, 1], [0, 1, 0]], bool)
    M = metropolis_mixing_matrix(A)
    np.testing.assert_allclose(M.sum(0), 1.0)
    np.testing.assert_allclose(M.sum(1), 1.0)
    assert M[0, 2] == 0.0
    with pytest.raises(ValueError, match="symmetric"):
        metropolis_mixing_matrix(np.asarray([[0, 1], [0, 0]], bool))
    with pytest.raises(ValueError, match="rows"):
        validate_mixing_matrix(np.eye(3) * 0.5, 3)
    with pytest.raises(ValueError, match="non-negative"):
        validate_mixing_matrix(
            np.asarray([[1.5, -0.5], [-0.5, 1.5]]), 2)


def test_complete_graph_uniform_equals_flat_fedavg():
    """W = 11ᵀ/C: every gossip round collapses all clients onto the
    FedAvg mean — must track the flat engine round for round."""
    C = 4
    data = make_data(C)
    flat = FederatedRoundEngine(tiny_model(), data,
                                RoundEngineConfig(training=TRAIN, seed=0))
    dec = DecentralizedFederatedEngine(
        tiny_model(), data,
        DecentralizedConfig(training=TRAIN, seed=0,
                            mixing_matrix=np.full((C, C), 1.0 / C)))
    for _ in range(2):
        flat.run_round(evaluate=False)
        res = dec.run_round()
        assert res.consensus_distance < 1e-5
        for i in range(C):
            for a, b in zip(jax.tree.leaves(dec.client_model(i)),
                            jax.tree.leaves(flat.global_variables)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                            rtol=1e-5, atol=1e-7)


def test_gossip_preserves_mean_and_contracts():
    """lr=0 isolates the mixing: the parameter mean is invariant (double
    stochasticity) and consensus distance contracts every round."""
    C = 6
    data = make_data(C)
    eng = DecentralizedFederatedEngine(
        tiny_model(), data,
        DecentralizedConfig(training=FederatedTrainingConfig(
            local_epochs=1, batch_size=16, learning_rate=0.0,
            optimizer_type="sgd"), seed=0))
    # spread the clients apart artificially
    key = jax.random.PRNGKey(7)
    eng.client_variables = jax.tree.map(
        lambda l: l + jax.random.normal(key, l.shape, l.dtype) * 0.1
        if jnp.issubdtype(l.dtype, jnp.floating) else l,
        eng.client_variables)
    mean_before = jax.tree.map(np.asarray, eng.mean_model())
    dists = [eng.run_round().consensus_distance for _ in range(3)]
    mean_after = jax.tree.map(np.asarray, eng.mean_model())
    for a, b in zip(jax.tree.leaves(mean_before),
                    jax.tree.leaves(mean_after)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
    assert dists[0] > dists[1] > dists[2]


def test_ring_gossip_learns():
    data = make_data(C=8, n=64)
    eng = DecentralizedFederatedEngine(
        tiny_model(), data, DecentralizedConfig(training=TRAIN, seed=1))
    xte = np.asarray(data.images).reshape(-1, 28, 28, 1)[:256]
    yte = np.asarray(data.labels).reshape(-1)[:256]
    before = eng.evaluate(xte, yte)["accuracy"]
    eng.run(6)
    after = eng.evaluate(xte, yte)["accuracy"]
    assert after > before + 0.2
    # per-client evaluation works too
    assert np.isfinite(eng.evaluate(xte, yte, client=3)["loss"])
    with pytest.raises(IndexError):
        eng.evaluate(xte, yte, client=8)


def test_mesh_equality(mesh8):
    data = make_data(C=8)
    cfg = DecentralizedConfig(training=TRAIN, seed=0)
    e1 = DecentralizedFederatedEngine(tiny_model(), data, cfg)
    e2 = DecentralizedFederatedEngine(tiny_model(), data, cfg, mesh=mesh8)
    for _ in range(2):
        r1, r2 = e1.run_round(), e2.run_round()
        assert r1.consensus_distance == pytest.approx(
            r2.consensus_distance, rel=1e-4, abs=1e-6)
    for a, b in zip(jax.tree.leaves(e1.client_variables),
                    jax.tree.leaves(e2.client_variables)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                    rtol=2e-5, atol=2e-6)


def test_validation():
    data = make_data(C=4)
    with pytest.raises(ValueError, match="\\(4, 4\\)"):
        DecentralizedFederatedEngine(
            tiny_model(), data,
            DecentralizedConfig(mixing_matrix=np.eye(3)))
