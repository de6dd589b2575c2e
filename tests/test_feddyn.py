"""FedDyn dynamic regularization (Acar et al. 2021).

Capability extension (4th drift corrector alongside FedProx / SCAFFOLD /
FedNova). Load-bearing checks: the server-update algebra against a numpy
oracle, and the round-1 engine identity θ₁ − θ₀ = 2·(θ₁^prox − θ₀) —
with zero-initialized state and full participation, FedDyn's local runs
are EXACTLY FedProx(μ=α) runs, and the server step doubles the move
(mean Δ from the participant mean plus mean Δ again from −h/α).
"""

import dataclasses

import flax.linen as nn
import jax
import numpy as np
import pytest

from fl_tpu.data.federated import FederatedArrays
from fl_tpu.data.synthetic import synthetic_mnist
from fl_tpu.fl.feddyn import feddyn_server_update
from fl_tpu.fl.local_training import FederatedTrainingConfig
from fl_tpu.models.base import FLModel
from fl_tpu.orchestration import FederatedRoundEngine, RoundEngineConfig
from fl_tpu.orchestration.checkpoint import (
    restore_engine_checkpoint,
    save_engine_checkpoint,
)


class TinyMLP(nn.Module):
    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(16, name="fc1")(x))
        return nn.Dense(10, name="fc2")(x)


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
                                learning_rate=0.05, optimizer_type="sgd",
                                momentum=0.0)


def cfg(training=TRAIN, **kw):
    return RoundEngineConfig(training=training, seed=0, **kw)


def params_of(e):
    return jax.tree.map(np.asarray, e.global_variables)


def test_server_update_algebra():
    rng = np.random.default_rng(0)
    C, D, N, alpha = 4, 6, 8, 0.3
    params = rng.normal(size=D).astype(np.float32)
    h = rng.normal(size=D).astype(np.float32)
    g = rng.normal(size=(C, D)).astype(np.float32)
    d = rng.normal(size=(C, D)).astype(np.float32)
    mask = np.asarray([1.0, 0.0, 1.0, 1.0], np.float32)

    new_p, new_h, new_g = (np.asarray(x) for x in feddyn_server_update(
        params, h, g, d, mask, alpha, N))
    m = mask[:, None]
    # non-participants' state untouched; participants: g - alpha*d
    np.testing.assert_allclose(new_g, np.where(m > 0, g - alpha * d, g),
                               rtol=1e-6)
    sum_d = (m * d).sum(0)
    np.testing.assert_allclose(new_h, h - alpha * sum_d / N, rtol=1e-6)
    np.testing.assert_allclose(
        new_p, params + sum_d / mask.sum() - new_h / alpha,
        rtol=1e-5, atol=1e-6)


def test_round1_identity_vs_fedprox():
    """Zero-init state + full participation: FedDyn's first round moves
    the model by exactly twice the FedProx(μ=α) FedAvg move."""
    alpha = 0.1
    data = make_data()
    theta0 = params_of(FederatedRoundEngine(tiny_model(), data, cfg()))

    prox = FederatedRoundEngine(
        tiny_model(), data,
        cfg(training=dataclasses.replace(TRAIN, proximal_mu=alpha)))
    prox.run_round(evaluate=False)

    dyn = FederatedRoundEngine(tiny_model(), data,
                               cfg(feddyn_alpha=alpha))
    dyn.run_round(evaluate=False)

    for t0, tp, td in zip(jax.tree.leaves(theta0),
                          jax.tree.leaves(params_of(prox)),
                          jax.tree.leaves(params_of(dyn))):
        np.testing.assert_allclose(td - t0, 2.0 * (tp - t0),
                                    rtol=1e-4, atol=1e-6)


def test_partial_participation_state_semantics():
    data = make_data(C=4)
    eng = FederatedRoundEngine(tiny_model(), data, cfg(feddyn_alpha=0.2))
    mask = np.asarray([1, 1, 0, 0], np.float32)
    eng.run_round(mask=mask, evaluate=False)
    g = np.asarray(eng.feddyn_grads)
    assert np.abs(g[:2]).max() > 0      # participants' state moved
    np.testing.assert_array_equal(g[2:], 0.0)  # non-participants frozen
    assert np.abs(np.asarray(eng.feddyn_h)).max() > 0


def test_empty_round_leaves_model_unchanged():
    """After state has accumulated (h != 0), a round with zero realized
    participants must not move the model (regression: −h/α used to be
    applied unconditionally)."""
    data = make_data(C=4)
    eng = FederatedRoundEngine(tiny_model(), data, cfg(feddyn_alpha=0.2))
    eng.run_round(evaluate=False)          # h becomes nonzero
    assert np.abs(np.asarray(eng.feddyn_h)).max() > 0
    before = params_of(eng)
    eng.run_round(mask=np.zeros(4, np.float32), evaluate=False)
    after = params_of(eng)
    for b, a in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(b, a)


def test_feddyn_learns():
    data = make_data(C=8, n=64)
    eng = FederatedRoundEngine(tiny_model(), data, cfg(feddyn_alpha=0.1))
    losses = [eng.run_round(evaluate=False).train_loss for _ in range(6)]
    assert losses[-1] < losses[0]


def test_checkpoint_resume_exact(tmp_path):
    data = make_data()
    ref = FederatedRoundEngine(tiny_model(), data, cfg(feddyn_alpha=0.1))
    for _ in range(4):
        ref.run_round(evaluate=False)

    eng = FederatedRoundEngine(tiny_model(), data, cfg(feddyn_alpha=0.1))
    eng.run_round(evaluate=False)
    eng.run_round(evaluate=False)
    save_engine_checkpoint(eng, str(tmp_path))
    res = FederatedRoundEngine(tiny_model(), data, cfg(feddyn_alpha=0.1))
    assert restore_engine_checkpoint(res, str(tmp_path)) == 2
    res.run_round(evaluate=False)
    res.run_round(evaluate=False)
    for a, b in zip(jax.tree.leaves(params_of(ref)),
                    jax.tree.leaves(params_of(res))):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.asarray(ref.feddyn_grads),
                                  np.asarray(res.feddyn_grads))


def test_mesh_equality(mesh8):
    data = make_data(C=8)

    def run(mesh):
        e = FederatedRoundEngine(tiny_model(), data,
                                 cfg(feddyn_alpha=0.15), mesh=mesh)
        e.run_round(evaluate=False)
        e.run_round(evaluate=False)
        return params_of(e), np.asarray(e.feddyn_h), np.asarray(
            e.feddyn_grads)

    (p1, h1, g1), (p2, h2, g2) = run(None), run(mesh8)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(h1, h2, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(g1, g2, rtol=2e-5, atol=2e-6)


def test_composition_guards():
    data = make_data()
    m = tiny_model()
    with pytest.raises(ValueError, match=">= 0"):
        FederatedRoundEngine(m, data, cfg(feddyn_alpha=-1.0))
    with pytest.raises(ValueError, match="at most one"):
        FederatedRoundEngine(m, data, cfg(feddyn_alpha=0.1,
                                          scaffold=True))
    with pytest.raises(ValueError, match="at most one"):
        FederatedRoundEngine(m, data, cfg(feddyn_alpha=0.1, fednova=True))
    with pytest.raises(ValueError, match="secure|robust"):
        FederatedRoundEngine(m, data, cfg(feddyn_alpha=0.1,
                                          aggregation="median"))
    with pytest.raises(ValueError, match="uplink|downlink|lossy"):
        FederatedRoundEngine(m, data, cfg(feddyn_alpha=0.1,
                                          uplink_compression="int8"))
    with pytest.raises(ValueError, match="proximal_mu"):
        FederatedRoundEngine(m, data, cfg(
            feddyn_alpha=0.1,
            training=dataclasses.replace(TRAIN, proximal_mu=0.5)))
    with pytest.raises(ValueError, match="server_optimizer|server step"):
        FederatedRoundEngine(m, data, cfg(feddyn_alpha=0.1,
                                          server_optimizer="fedadam"))
    eng = FederatedRoundEngine(m, data, cfg(feddyn_alpha=0.1))
    with pytest.raises(ValueError, match="fused"):
        eng.run_rounds_fused(2)
