"""FedDF ensemble distillation (fl_tpu.fl.feddf).

Capability extension: the reference aggregates by parameter averaging
only (src/aggregation/fedavg.py:267-288). Anchors: distill_steps=0 must
be EXACTLY the flat FedAvg engine; identical clients make distillation a
no-op (the student already matches the ensemble); under heterogeneity the
distillation loss must actually shrink across steps; mesh equality.
"""

import flax.linen as nn
import jax
import numpy as np
import pytest

from fl_tpu.data.federated import FederatedArrays
from fl_tpu.data.synthetic import synthetic_mnist
from fl_tpu.fl.feddf import FedDFConfig, FedDFEngine
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.models.base import FLModel
from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig


class TinyMLP(nn.Module):
    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(16, name="fc1")(x))
        return nn.Dense(10, name="fc2")(x)


def tiny_model():
    return FLModel(module=TinyMLP(), name="tiny", input_shape=(28, 28, 1),
                   num_classes=10)


def make_data(C=4, n=32, seed=0, identical=False, pathological=False):
    xtr, ytr, _, _ = synthetic_mnist(n_train=4 * C * n, n_test=1, seed=seed)
    if identical:
        xtr, ytr = xtr[:C * n], ytr[:C * n]
        xtr = np.tile(xtr[:n], (C, 1, 1, 1))
        ytr = np.tile(ytr[:n], C)
    elif pathological:
        # client c sees ONLY labels {2c, 2c+1} — the regime where the
        # parameter average diverges from the logit ensemble
        xs, ys = [], []
        for c in range(C):
            sel = np.flatnonzero((ytr == 2 * c) | (ytr == 2 * c + 1))[:n]
            xs.append(xtr[sel])
            ys.append(ytr[sel])
        xtr, ytr = np.concatenate(xs), np.concatenate(ys)
    else:
        xtr, ytr = xtr[:C * n], ytr[:C * n]
    return FederatedArrays(
        images=xtr.reshape(C, n, 28, 28, 1),
        labels=ytr.reshape(C, n).astype(np.int32),
        num_samples=np.full(C, n, np.int32),
        mean=np.asarray([0.1307], np.float32),
        std=np.asarray([0.3081], np.float32), num_classes=10)


def proxy_images(n=64, seed=7):
    x, _, _, _ = synthetic_mnist(n_train=n, n_test=1, seed=seed)
    return x.reshape(n, 28, 28, 1)


TRAIN = FederatedTrainingConfig(local_epochs=2, batch_size=16,
                                learning_rate=0.05, optimizer_type="sgd")


def assert_close(a, b, rtol=1e-5, atol=1e-7):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def test_zero_distill_steps_is_exact_fedavg():
    """distill_steps=0: the student IS the sample-weighted average, so
    the round must track the flat engine (same PRNG schedule)."""
    data = make_data()
    flat = FederatedRoundEngine(
        tiny_model(), data, RoundEngineConfig(training=TRAIN, seed=0))
    df = FedDFEngine(tiny_model(), data, proxy_images(),
                     FedDFConfig(training=TRAIN, distill_steps=0, seed=0))
    for _ in range(2):
        flat.run_round(evaluate=False)
        res = df.run_round()
        assert res.distill_kl_before == 0.0
        assert_close(df.global_variables, flat.global_variables)


def test_identical_clients_make_distillation_a_noop():
    """All clients share one dataset → trained models identical → the
    averaged student already produces the ensemble logits exactly, so the
    KL starts at ~0 and the distilled params stay put."""
    data = make_data(identical=True)
    # full-batch training: the per-client shuffle keys differ, but a
    # full-batch gradient is permutation-invariant, so identical shards
    # give bit-identical client models
    full = FederatedTrainingConfig(local_epochs=2, batch_size=32,
                                   learning_rate=0.05,
                                   optimizer_type="sgd")
    base = FedDFEngine(tiny_model(), data, proxy_images(),
                       FedDFConfig(training=full, distill_steps=0, seed=0))
    # sgd distillation: zero ensemble-mismatch gradient is an exact
    # fixpoint (Adam would take lr-sized steps from numerically-tiny
    # gradients)
    df = FedDFEngine(tiny_model(), data, proxy_images(),
                     FedDFConfig(training=full, distill_steps=16,
                                 distill_batch=32,
                                 distill_optimizer="sgd", seed=0))
    base.run_round()
    res = df.run_round()
    assert res.distill_kl_before < 1e-6
    assert_close(df.global_variables, base.global_variables,
                 rtol=1e-4, atol=1e-5)


def test_distillation_loss_shrinks_under_heterogeneity():
    """Pathological label skew: the parameter average does NOT reproduce
    the logit ensemble (probe KL large at the FedAvg init) and the
    distillation loop reduces it."""
    data = make_data(C=4, n=32, seed=3, pathological=True)
    df = FedDFEngine(
        tiny_model(), data, proxy_images(128),
        FedDFConfig(training=TRAIN, distill_steps=64, distill_batch=64,
                    distill_lr=1e-3, seed=0))
    res = df.run_round()
    assert res.distill_kl_before > 1e-3
    assert res.distill_kl_after < res.distill_kl_before


def test_learns_on_synthetic_data():
    data = make_data(C=4, n=64)
    xte, yte, _, _ = synthetic_mnist(n_train=256, n_test=1, seed=11)
    df = FedDFEngine(
        tiny_model(), data, proxy_images(128),
        FedDFConfig(training=TRAIN, distill_steps=8, distill_batch=64,
                    seed=0))
    norm = (xte.reshape(256, 28, 28, 1).astype(np.float32) / 255.0
            - 0.1307) / 0.3081
    acc0 = float(df.evaluate(norm, yte[:256].astype(np.int32))["accuracy"])
    df.run(4)
    acc1 = float(df.evaluate(norm, yte[:256].astype(np.int32))["accuracy"])
    assert acc1 > acc0
    assert np.isfinite(df.history[-1].train_loss)


def test_mesh_equality(mesh8):
    data = make_data(C=8)
    cfg = FedDFConfig(training=TRAIN, distill_steps=8, distill_batch=32,
                      seed=0)
    e1 = FedDFEngine(tiny_model(), data, proxy_images(), cfg)
    e2 = FedDFEngine(tiny_model(), data, proxy_images(), cfg, mesh=mesh8)
    for _ in range(2):
        r1, r2 = e1.run_round(), e2.run_round()
        assert r1.distill_kl_before == pytest.approx(
            r2.distill_kl_before, rel=1e-4, abs=1e-6)
    assert_close(e1.global_variables, e2.global_variables,
                 rtol=2e-4, atol=2e-5)


def test_validation_errors():
    data = make_data()
    with pytest.raises(ValueError, match="uint8"):
        FedDFEngine(tiny_model(), data,
                    proxy_images().astype(np.float32), FedDFConfig())
    with pytest.raises(ValueError, match="does not match"):
        FedDFEngine(tiny_model(), data,
                    np.zeros((8, 32, 32, 3), np.uint8), FedDFConfig())
    with pytest.raises(ValueError, match="smaller than"):
        FedDFEngine(tiny_model(), data, proxy_images(16),
                    FedDFConfig(distill_steps=4, distill_batch=64))
    with pytest.raises(ValueError, match="temperature"):
        FedDFEngine(tiny_model(), data, proxy_images(),
                    FedDFConfig(temperature=0.0))
    with pytest.raises(ValueError, match="distill_steps"):
        FedDFEngine(tiny_model(), data, proxy_images(),
                    FedDFConfig(distill_steps=-1))
