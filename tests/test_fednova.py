"""FedNova normalized averaging (Wang et al. 2020).

Capability extension: the reference's capability adaptation hands clients
heterogeneous epoch budgets (src/shared/training.py:455-502) but its
FedAvg then averages the resulting deltas with sample weights only
(src/aggregation/fedavg.py:267-288) — the objective-inconsistency FedNova
fixes. Verifies the a_i identity, FedAvg equivalence under homogeneous
work, the exact normalized-averaging composition under heterogeneous
budgets, mesh equality, and composition guards.
"""

import dataclasses

import flax.linen as nn
import jax
import numpy as np
import pytest

from fl_tpu.data.federated import FederatedArrays
from fl_tpu.data.synthetic import synthetic_mnist
from fl_tpu.fl.fedavg import fednova_effective_steps
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


def make_data(C=2, n=32, seed=0):
    xtr, ytr, _, _ = synthetic_mnist(n_train=C * n, n_test=1, seed=seed)
    return FederatedArrays(
        images=xtr.reshape(C, n, 28, 28, 1),
        labels=ytr.reshape(C, n).astype(np.int32),
        num_samples=np.full(C, n, np.int32),
        mean=np.asarray([0.1307], np.float32),
        std=np.asarray([0.3081], np.float32), num_classes=10)


def sgd_config(momentum=0.9, fednova=False, epochs=3):
    return RoundEngineConfig(
        training=FederatedTrainingConfig(
            local_epochs=epochs, batch_size=16, learning_rate=0.05,
            optimizer_type="sgd", momentum=momentum),
        fednova=fednova, seed=0)


def params_of(engine):
    return jax.tree.map(np.asarray, engine.global_variables)


def test_effective_steps_identities():
    tau = np.asarray([1.0, 2.0, 5.0])
    # plain SGD: a_i = tau_i
    np.testing.assert_allclose(
        fednova_effective_steps(tau, 0.0), tau)
    # momentum 0.9: a_1 = 1 (one step moves by g), a_2 = 2 + rho
    a = np.asarray(fednova_effective_steps(np.asarray([1.0, 2.0]), 0.9))
    np.testing.assert_allclose(a, [1.0, 2.9], rtol=1e-6)
    # monotone in tau and > tau (momentum amplifies displacement)
    a5 = float(fednova_effective_steps(np.asarray([5.0]), 0.9)[0])
    assert a5 > 5.0


def test_fednova_equals_fedavg_when_homogeneous():
    data = make_data()
    e_avg = FederatedRoundEngine(tiny_model(), data, sgd_config())
    e_nova = FederatedRoundEngine(tiny_model(), data,
                                  sgd_config(fednova=True))
    e_avg.run_round()
    e_nova.run_round()
    for a, b in zip(jax.tree.leaves(params_of(e_avg)),
                    jax.tree.leaves(params_of(e_nova))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_fednova_normalized_average_exact():
    """Heterogeneous budgets: recover each client's solo delta by zeroing
    the other's budget, then check the fednova round equals
    θ + τ_eff·Σ p_i Δ_i/a_i exactly."""
    data = make_data()
    mom = 0.9

    def run_with(epochs, fednova):
        eng = FederatedRoundEngine(tiny_model(), data,
                                   sgd_config(momentum=mom, fednova=fednova))
        eng.epochs_per_client = np.asarray(epochs, np.int32)
        eng.run_round()
        return params_of(eng)

    theta0 = params_of(FederatedRoundEngine(tiny_model(), data,
                                            sgd_config()))
    # solo deltas via zero budgets (masked epochs are exact no-ops and
    # per-client PRNG streams are index-keyed, so client i's trajectory
    # is identical across these runs)
    g_a = run_with([1, 0], fednova=False)   # θ + 0.5·Δ_1
    g_b = run_with([0, 3], fednova=False)   # θ + 0.5·Δ_2
    d1 = jax.tree.map(lambda g, t: 2.0 * (g - t), g_a, theta0)
    d2 = jax.tree.map(lambda g, t: 2.0 * (g - t), g_b, theta0)

    spe = 32 // 16  # steps per epoch
    a1 = float(fednova_effective_steps(np.asarray([1.0 * spe]), mom)[0])
    a2 = float(fednova_effective_steps(np.asarray([3.0 * spe]), mom)[0])
    tau_eff = 0.5 * a1 + 0.5 * a2
    expect = jax.tree.map(
        lambda t, x, y: t + tau_eff * (0.5 * x / a1 + 0.5 * y / a2),
        theta0, d1, d2)

    actual = run_with([1, 3], fednova=True)
    for e, a in zip(jax.tree.leaves(expect), jax.tree.leaves(actual)):
        np.testing.assert_allclose(e, a, rtol=1e-4, atol=1e-6)

    # and it genuinely differs from plain FedAvg on the same budgets
    plain = run_with([1, 3], fednova=False)
    diffs = [np.max(np.abs(p - a)) for p, a in
             zip(jax.tree.leaves(plain), jax.tree.leaves(actual))]
    assert max(diffs) > 1e-5


def test_fednova_mesh_equality(mesh8):
    data = make_data(C=8)
    budgets = np.asarray([1, 2, 3, 1, 2, 3, 1, 2], np.int32)

    def run(mesh):
        eng = FederatedRoundEngine(tiny_model(), data,
                                   sgd_config(fednova=True), mesh=mesh)
        eng.epochs_per_client = budgets
        eng.run_round()
        return params_of(eng)

    single, sharded = run(None), run(mesh8)
    for a, b in zip(jax.tree.leaves(single), jax.tree.leaves(sharded)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_fednova_composition_guards():
    data = make_data()
    m = tiny_model()
    base = sgd_config(fednova=True)
    with pytest.raises(ValueError, match="optimizer_type"):
        FederatedRoundEngine(m, data, dataclasses.replace(
            base, training=dataclasses.replace(
                base.training, optimizer_type="adam")))
    with pytest.raises(ValueError, match="proximal"):
        FederatedRoundEngine(m, data, dataclasses.replace(
            base, training=dataclasses.replace(
                base.training, proximal_mu=0.1)))
    with pytest.raises(ValueError, match="secure_aggregation"):
        FederatedRoundEngine(m, data, dataclasses.replace(
            base, secure_aggregation=True))
    with pytest.raises(ValueError, match="aggregation"):
        FederatedRoundEngine(m, data, dataclasses.replace(
            base, aggregation="median"))
    with pytest.raises(ValueError, match="dp_mode"):
        from fl_tpu.core.types import PrivacyConfig

        FederatedRoundEngine(m, data, dataclasses.replace(
            base, dp_mode="client_dp",
            privacy=PrivacyConfig(epsilon=1.0, delta=1e-5,
                                  max_grad_norm=1.0),
            participation_rate=0.5))
    with pytest.raises(ValueError, match="scaffold|fednova"):
        FederatedRoundEngine(m, data, dataclasses.replace(
            base, scaffold=True))
    with pytest.raises(ValueError, match="momentum"):
        # a_i diverges at rho=1 — must be rejected, not NaN the model
        FederatedRoundEngine(m, data, dataclasses.replace(
            base, training=dataclasses.replace(
                base.training, momentum=1.0)))
