"""q-FedAvg / q-FFL fair federated learning (Li et al. 2020).

Capability extension: the reference's FedAvg weights are sample counts
only (src/aggregation/fedavg.py:247) — it has no fairness objective.
Verifies the q=0 uniform-FedAvg identity, the exact Algorithm-2 server
step against a numpy oracle built from solo-delta extraction, the
fairness effect on a two-population loss spread, mesh equality, the
pre-loss metric, and the composition guards.
"""

import dataclasses

import flax.linen as nn
import jax
import numpy as np
import pytest

from fl_tpu.data.federated import FederatedArrays
from fl_tpu.data.synthetic import synthetic_mnist
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


class TinyBN(nn.Module):
    """Minimal batch_stats-carrying model for the refusal guard."""

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(8)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        return nn.Dense(10)(x)


def tiny_model(module=None, name="tiny_mlp"):
    return FLModel(module=module or TinyMLP(), name=name,
                   input_shape=(28, 28, 1), num_classes=10)


def make_data(C=2, n=32, seed=0, hard_last=False):
    xtr, ytr, _, _ = synthetic_mnist(n_train=C * n, n_test=1, seed=seed)
    images = xtr.reshape(C, n, 28, 28, 1).copy()
    labels = ytr.reshape(C, n).astype(np.int32).copy()
    if hard_last:
        # make the LAST client's shard a different population: inverted
        # images with permuted labels — a minority distribution the
        # uniform objective under-serves
        images[-1] = 255 - images[-1]
        labels[-1] = (labels[-1] + 5) % 10
    return FederatedArrays(
        images=images, labels=labels,
        num_samples=np.full(C, n, np.int32),
        mean=np.asarray([0.1307], np.float32),
        std=np.asarray([0.3081], np.float32), num_classes=10)


def qffl_config(q=None, lr=0.05, epochs=1, seed=0):
    return RoundEngineConfig(
        training=FederatedTrainingConfig(
            local_epochs=epochs, batch_size=16, learning_rate=lr,
            optimizer_type="sgd", momentum=0.0),
        qffl_q=q, seed=seed)


def params_of(engine):
    return jax.tree.map(np.asarray, engine.global_variables)


def flat(tree):
    return np.concatenate([np.asarray(x).ravel()
                           for x in jax.tree.leaves(tree)])


def test_qffl_zero_equals_uniform_fedavg():
    """q=0 reduces Alg. 2 to θ + mean(w̄_k − θ): with equal sample counts
    that is exactly the sample-weighted FedAvg round."""
    data = make_data()
    e_avg = FederatedRoundEngine(tiny_model(), data, qffl_config(q=None))
    e_q0 = FederatedRoundEngine(tiny_model(), data, qffl_config(q=0.0))
    e_avg.run_round()
    e_q0.run_round()
    for a, b in zip(jax.tree.leaves(params_of(e_avg)),
                    jax.tree.leaves(params_of(e_q0))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_qffl_oracle_exact():
    """Recover each client's trained model by zeroing the other's epoch
    budget, evaluate F_k(θ0) through the same eval path, and check the
    q-FedAvg round equals the paper's θ − ΣF^qΔw / Σh exactly."""
    from fl_tpu.fl.federated_eval import evaluate_federated

    data = make_data()
    q, lr = 2.0, 0.05
    L = 1.0 / lr

    def run_with(epochs, qq):
        eng = FederatedRoundEngine(tiny_model(), data, qffl_config(q=qq))
        eng.epochs_per_client = np.asarray(epochs, np.int32)
        eng.run_round(evaluate=False)
        return eng, params_of(eng)

    ref_eng = FederatedRoundEngine(tiny_model(), data, qffl_config(q=None))
    theta0 = params_of(ref_eng)
    pre = evaluate_federated(ref_eng)["per_client"]["loss"]  # F_k(θ0)

    # solo w̄_k via zero budgets (index-keyed client PRNG streams make
    # client i's trajectory identical across runs)
    _, g_a = run_with([1, 0], qq=None)     # θ0 + 0.5·(w̄_1 − θ0)
    _, g_b = run_with([0, 1], qq=None)
    w1 = jax.tree.map(lambda g, t: t + 2.0 * (g - t),
                      g_a["params"], theta0["params"])
    w2 = jax.tree.map(lambda g, t: t + 2.0 * (g - t),
                      g_b["params"], theta0["params"])

    # numpy oracle on flat vectors
    t0 = flat(theta0["params"])
    d1 = L * (t0 - flat(w1))               # Δw_k = L(θ − w̄_k)
    d2 = L * (t0 - flat(w2))
    F = np.maximum(np.asarray(pre, np.float64), 1e-12)
    Fq = F ** q
    h = q * F ** (q - 1) * np.asarray([d1 @ d1, d2 @ d2]) + L * Fq
    step = (Fq[0] * d1 + Fq[1] * d2) / h.sum()
    expect = t0 - step

    eng, actual = run_with([1, 1], qq=q)
    np.testing.assert_allclose(flat(actual["params"]), expect,
                               rtol=1e-4, atol=1e-6)

    # the engine's reported pre-losses are the oracle's F_k
    np.testing.assert_allclose(eng.last_client_pre_losses, pre,
                               rtol=1e-5, atol=1e-7)

    # and q=2 genuinely differs from uniform averaging here
    _, plain = run_with([1, 1], qq=0.0)
    assert np.max(np.abs(flat(plain["params"])
                         - flat(actual["params"]))) > 1e-6


def test_qffl_reduces_loss_spread():
    """Two-population setup: the minority client's loss stays high under
    the uniform objective; q>0 shifts weight toward it and narrows the
    final per-client loss spread."""
    from fl_tpu.fl.federated_eval import evaluate_federated

    def final_spread(q):
        data = make_data(C=4, n=32, hard_last=True)
        eng = FederatedRoundEngine(
            tiny_model(), data, qffl_config(q=q, lr=0.1, epochs=2))
        for _ in range(8):
            eng.run_round(evaluate=False)
        losses = evaluate_federated(eng)["per_client"]["loss"]
        return float(losses.max() - losses.min()), losses

    spread_q0, _ = final_spread(0.0)
    spread_q3, _ = final_spread(3.0)
    assert spread_q3 < spread_q0, (spread_q3, spread_q0)


def test_qffl_mesh_equality(mesh8):
    data = make_data(C=8)

    def run(mesh):
        eng = FederatedRoundEngine(tiny_model(), data,
                                   qffl_config(q=1.5), mesh=mesh)
        eng.run_round(evaluate=False)
        eng.run_round(evaluate=False)
        return params_of(eng), eng.last_client_pre_losses

    (single, pre_s), (sharded, pre_m) = run(None), run(mesh8)
    for a, b in zip(jax.tree.leaves(single), jax.tree.leaves(sharded)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(pre_s, pre_m, rtol=2e-5, atol=2e-7)


def test_qffl_partial_participation_moves_only_by_participants():
    """A masked-out client contributes neither Δ_k nor h_k: the round with
    client 1 masked equals a q-FFL round over client 0 alone."""
    data = make_data()
    e = FederatedRoundEngine(tiny_model(), data, qffl_config(q=1.0))
    e.run_round(mask=np.asarray([1.0, 0.0]), evaluate=False)
    got = flat(params_of(e)["params"])

    # oracle: solo client-0 round — with one participant the step is
    # F^q·Δw / (q·F^{q-1}‖Δw‖² + L·F^q)
    e2 = FederatedRoundEngine(tiny_model(), data, qffl_config(q=1.0))
    theta0 = flat(params_of(e2)["params"])
    assert np.max(np.abs(got - theta0)) > 1e-7  # it did move
    e3 = FederatedRoundEngine(tiny_model(), data, qffl_config(q=1.0))
    e3.run_round(mask=np.asarray([1.0, 0.0]), evaluate=False)
    np.testing.assert_allclose(flat(params_of(e3)["params"]), got)


def test_qffl_composition_guards():
    data = make_data()
    m = tiny_model()
    base = qffl_config(q=1.0)
    with pytest.raises(ValueError, match="dp_mode"):
        from fl_tpu.core.types import PrivacyConfig

        FederatedRoundEngine(m, data, dataclasses.replace(
            base, dp_mode="delta",
            privacy=PrivacyConfig(epsilon=1.0, delta=1e-5,
                                  max_grad_norm=1.0)))
    with pytest.raises(ValueError, match="secure"):
        FederatedRoundEngine(m, data, dataclasses.replace(
            base, secure_aggregation=True))
    with pytest.raises(ValueError, match="robust|reweighting"):
        FederatedRoundEngine(m, data, dataclasses.replace(
            base, aggregation="median"))
    with pytest.raises(ValueError, match="server"):
        FederatedRoundEngine(m, data, dataclasses.replace(
            base, server_optimizer="fedadam"))
    with pytest.raises(ValueError, match="fednova|scaffold|feddyn"):
        FederatedRoundEngine(m, data, dataclasses.replace(
            base, fednova=True))
    with pytest.raises(ValueError, match="uplink"):
        FederatedRoundEngine(m, data, dataclasses.replace(
            base, uplink_compression="int8"))
    with pytest.raises(ValueError, match=">= 0"):
        FederatedRoundEngine(m, data, dataclasses.replace(
            base, qffl_q=-1.0))
    with pytest.raises(ValueError, match="batch_stats|params only"):
        FederatedRoundEngine(
            tiny_model(module=TinyBN(), name="tiny_bn"), data, base)
