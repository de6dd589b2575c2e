"""Federated evaluation (fl_tpu.fl.federated_eval): per-client scoring
of the global model on the clients' own shards.

Parity note: the reference's client evaluates the downloaded global model
locally (src/client/federated_trainer.py:390-426); here the whole
population's evaluation is one vmapped program.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fl_tpu.data.federated import FederatedArrays
from fl_tpu.data.synthetic import synthetic_mnist
from fl_tpu.fl.local_training import (
    FederatedTrainingConfig,
    cross_entropy_loss,
)
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


def make_engine(C=4, n=48, mesh=None, uneven=False):
    xtr, ytr, _, _ = synthetic_mnist(n_train=C * n, n_test=1, seed=3)
    counts = np.full(C, n, np.int32)
    if uneven:
        counts = np.asarray([n, n // 2, n // 3, 5][:C], np.int32)
    data = FederatedArrays(
        images=xtr.reshape(C, n, 28, 28, 1),
        labels=ytr.reshape(C, n).astype(np.int32),
        num_samples=counts,
        mean=np.asarray([0.1307], np.float32),
        std=np.asarray([0.3081], np.float32), num_classes=10)
    return FederatedRoundEngine(
        tiny_model(), data,
        RoundEngineConfig(training=FederatedTrainingConfig(
            local_epochs=1, batch_size=16, learning_rate=0.05,
            optimizer_type="sgd"), seed=0))


def manual_client_metrics(engine, c):
    """Oracle: eval-mode forward over client c's VALID samples only."""
    n = int(engine.data.num_samples[c])
    x = (np.asarray(engine.data.images[c][:n], np.float32) / 255.0
         - 0.1307) / 0.3081
    y = np.asarray(engine.data.labels[c][:n])
    logits, _ = engine.model.apply(engine.global_variables,
                                   jnp.asarray(x), train=False)
    per = np.asarray(cross_entropy_loss(
        jnp.asarray(logits), jnp.asarray(y), reduce=False))
    acc = float((np.argmax(np.asarray(logits), -1) == y).mean())
    return float(per.mean()), acc


def test_matches_per_client_oracle_with_padding():
    eng = make_engine(uneven=True)   # exercises the valid-sample masking
    out = eng.evaluate_federated()
    pc = out["per_client"]
    assert pc["loss"].shape == (4,)
    np.testing.assert_array_equal(pc["n"],
                                  np.asarray(eng.data.num_samples))
    for c in range(4):
        loss_ref, acc_ref = manual_client_metrics(eng, c)
        assert pc["loss"][c] == pytest.approx(loss_ref, rel=1e-4)
        assert pc["accuracy"][c] == pytest.approx(acc_ref, abs=1e-6)
    # aggregate = sample-weighted mean of per-client metrics
    w = pc["n"] / pc["n"].sum()
    assert out["accuracy"] == pytest.approx(
        float((pc["accuracy"] * w).sum()), rel=1e-6)
    assert out["accuracy_min"] <= out["accuracy"] <= out["accuracy_max"]


def test_chunking_invariance():
    """Chunked scan must equal a whole-shard pass (chunk smaller than,
    equal to, and not dividing the shard)."""
    from fl_tpu.fl.federated_eval import make_federated_eval_fn

    eng = make_engine(C=2, n=48)
    for chunk in (16, 48, 36):
        fn = make_federated_eval_fn(eng.model, 48, 0.1307, 0.3081,
                                    chunk_size=chunk)
        m = fn(eng.global_variables, jnp.asarray(eng.data.images[0]),
               jnp.asarray(eng.data.labels[0]),
               jnp.asarray(eng.data.num_samples[0]))
        loss_ref, acc_ref = manual_client_metrics(eng, 0)
        assert float(m["loss"]) == pytest.approx(loss_ref, rel=1e-4), chunk
        assert float(m["accuracy"]) == pytest.approx(acc_ref, abs=1e-6)


def test_mesh_equality(mesh8):
    xtr, ytr, _, _ = synthetic_mnist(n_train=8 * 32, n_test=1, seed=5)
    data = FederatedArrays(
        images=xtr.reshape(8, 32, 28, 28, 1),
        labels=ytr.reshape(8, 32).astype(np.int32),
        num_samples=np.full(8, 32, np.int32),
        mean=np.asarray([0.1307], np.float32),
        std=np.asarray([0.3081], np.float32), num_classes=10)
    cfg = RoundEngineConfig(training=FederatedTrainingConfig(
        local_epochs=1, batch_size=16, learning_rate=0.05,
        optimizer_type="sgd"), seed=0)
    e1 = FederatedRoundEngine(tiny_model(), data, cfg)
    e2 = FederatedRoundEngine(tiny_model(), data, cfg, mesh=mesh8)
    o1, o2 = e1.evaluate_federated(), e2.evaluate_federated()
    np.testing.assert_allclose(o1["per_client"]["loss"],
                               o2["per_client"]["loss"],
                               rtol=2e-5, atol=2e-6)
    assert o1["accuracy"] == pytest.approx(o2["accuracy"], rel=1e-5)
