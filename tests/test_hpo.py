"""Federated HPO sweep (fl_tpu.fl.hpo) + the traced-lr local-training
extension it rides on.

The load-bearing check is traced-lr EXACTNESS: make_local_train_fn(
traced_lr=True) must be bit-identical to a statically-built optimizer at
the same rate (the optimizer update is linear in lr for sgd/adam/adamw).
Then the sweep itself: zero-lr / zero-epoch trials never move, successive
halving kills the divergent trial and keeps the sensible one, compaction
preserves the surviving models, mesh equality.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fl_tpu.data.federated import FederatedArrays
from fl_tpu.data.synthetic import synthetic_mnist
from fl_tpu.fl.hpo import FederatedHPOEngine, HPOConfig
from fl_tpu.fl.local_training import (
    FederatedTrainingConfig,
    make_local_train_fn,
)
from fl_tpu.models.base import FLModel


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


def val_set(n=128, seed=9):
    x, y, _, _ = synthetic_mnist(n_train=n, n_test=1, seed=seed)
    return x.reshape(n, 28, 28, 1), y[:n].astype(np.int32)


TRAIN = FederatedTrainingConfig(local_epochs=2, batch_size=16,
                                learning_rate=0.05, optimizer_type="sgd")


def _one_client_args(seed=0):
    data = make_data(C=1, seed=seed)
    key = jax.random.PRNGKey(42)
    return (jnp.asarray(data.images[0]), jnp.asarray(data.labels[0]),
            jnp.int32(32), jnp.int32(2), key)


@pytest.mark.parametrize("opt,momentum", [("sgd", 0.0), ("sgd", 0.9),
                                          ("adam", 0.0), ("adamw", 0.0)])
def test_traced_lr_is_bit_identical_to_static(opt, momentum):
    model = tiny_model()
    variables = model.init(jax.random.PRNGKey(0))
    lr = 0.07
    cfg = FederatedTrainingConfig(local_epochs=2, batch_size=16,
                                  learning_rate=lr, optimizer_type=opt,
                                  momentum=momentum)
    images, labels, n, ep, key = _one_client_args()
    static_fn = make_local_train_fn(model, cfg, samples_per_client=32,
                                    mean=[0.1307], std=[0.3081])
    traced_fn = make_local_train_fn(model, cfg, samples_per_client=32,
                                    mean=[0.1307], std=[0.3081],
                                    traced_lr=True)
    out_s, _ = jax.jit(static_fn)(variables, images, labels, n, ep, key)
    out_t, _ = jax.jit(
        lambda v, i, l, nn_, e, k, r: traced_fn(v, i, l, nn_, e, k, lr=r)
    )(variables, images, labels, n, ep, key, jnp.float32(lr))
    for a, b in zip(jax.tree.leaves(out_s), jax.tree.leaves(out_t)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_traced_lr_requires_lr():
    model = tiny_model()
    variables = model.init(jax.random.PRNGKey(0))
    fn = make_local_train_fn(model, TRAIN, samples_per_client=32,
                             mean=[0.1307], std=[0.3081], traced_lr=True)
    images, labels, n, ep, key = _one_client_args()
    with pytest.raises(TypeError, match="lr"):
        fn(variables, images, labels, n, ep, key)


def test_zero_lr_and_zero_epoch_trials_never_move():
    data = make_data()
    vx, vy = val_set()
    eng = FederatedHPOEngine(
        tiny_model(), data,
        HPOConfig(training=TRAIN, learning_rates=[0.0, 0.05, 0.05],
                  epoch_budgets=[2, 0, 2], seed=0),
        vx, vy)
    init = jax.tree.map(np.asarray, eng.trial_variables)
    eng.run_round()
    after = jax.tree.map(np.asarray, eng.trial_variables)
    for a, b in zip(jax.tree.leaves(init), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a[0], b[0])   # lr=0: frozen
        np.testing.assert_array_equal(a[1], b[1])   # epochs=0: frozen
        assert not np.allclose(a[2], b[2])          # the real trial moved


def test_halving_kills_the_hopeless_trials():
    data = make_data(n=64)
    vx, vy = val_set()
    eng = FederatedHPOEngine(
        tiny_model(), data,
        HPOConfig(training=TRAIN,
                  learning_rates=[0.05, 0.0, 300.0, 0.03],
                  rung_rounds=(1,), eta=2, seed=0),
        vx, vy)
    r0 = eng.run_round()
    assert not r0.halved and r0.alive_trials == 4
    r1 = eng.run_round()
    assert r1.halved and r1.alive_trials == 2
    dead = [t for t in eng.trials if not t.alive]
    assert len(dead) == 2
    assert all(t.killed_at_round == 1 for t in dead)
    # the divergent lr=300 trial cannot have survived a ranked rung
    assert all(t.learning_rate != 300.0
               for t in eng.trials if t.alive)
    # killed trials stop accumulating history; survivors continue
    r2 = eng.run_round()
    assert r2.alive_trials == 2
    assert all(len(t.val_history) == 2 for t in dead)
    assert all(len(t.val_history) == 3 for t in eng.trials if t.alive)


def test_compaction_preserves_surviving_models():
    data = make_data()
    vx, vy = val_set()
    eng = FederatedHPOEngine(
        tiny_model(), data,
        HPOConfig(training=TRAIN, learning_rates=[0.05, 0.0, 0.03],
                  rung_rounds=(0,), eta=3, seed=0),
        vx, vy)
    eng.run_round()  # rung after round 0: keeps ⌈3/3⌉ = 1 trial
    assert eng.history[0].halved
    assert len(eng._alive_ids) == 1
    best = eng.best_trial()
    assert best.alive and best.trial_id == eng._alive_ids[0]
    # the compacted stacked tree has exactly the survivor
    assert jax.tree.leaves(eng.trial_variables)[0].shape[0] == 1
    # and another round still runs at the new population size
    r = eng.run_round()
    assert r.alive_trials == 1


def test_best_variables_slice_matches_best_trial():
    data = make_data()
    vx, vy = val_set()
    eng = FederatedHPOEngine(
        tiny_model(), data,
        HPOConfig(training=TRAIN, learning_rates=[0.0, 0.05], seed=0),
        vx, vy)
    eng.run_round()
    pos = eng._alive_ids.index(eng.best_trial().trial_id)
    bv = eng.best_variables()
    for a, b in zip(jax.tree.leaves(bv),
                    jax.tree.leaves(eng.trial_variables)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b[pos]))


def test_mesh_equality(mesh8):
    data = make_data(C=8)
    vx, vy = val_set(64)
    cfg = HPOConfig(training=TRAIN, learning_rates=[0.05, 0.01],
                    rung_rounds=(1,), seed=0)
    e1 = FederatedHPOEngine(tiny_model(), data, cfg, vx, vy)
    e2 = FederatedHPOEngine(tiny_model(), data, cfg, vx, vy, mesh=mesh8)
    for _ in range(3):
        r1, r2 = e1.run_round(), e2.run_round()
        assert r1.alive_trials == r2.alive_trials
        assert r1.best_trial_id == r2.best_trial_id
        for tid, a in r1.val_accuracies.items():
            assert r2.val_accuracies[tid] == pytest.approx(a, abs=2e-3)
    for a, b in zip(jax.tree.leaves(e1.trial_variables),
                    jax.tree.leaves(e2.trial_variables)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_validation_errors():
    data = make_data()
    vx, vy = val_set()
    with pytest.raises(ValueError, match="non-empty"):
        FederatedHPOEngine(tiny_model(), data,
                           HPOConfig(learning_rates=[]), vx, vy)
    with pytest.raises(ValueError, match="must match"):
        FederatedHPOEngine(
            tiny_model(), data,
            HPOConfig(learning_rates=[0.1, 0.2], epoch_budgets=[1]),
            vx, vy)
    with pytest.raises(ValueError, match="exceed"):
        FederatedHPOEngine(
            tiny_model(), data,
            HPOConfig(training=TRAIN, learning_rates=[0.1],
                      epoch_budgets=[5]),
            vx, vy)
    with pytest.raises(ValueError, match="eta"):
        FederatedHPOEngine(tiny_model(), data,
                           HPOConfig(learning_rates=[0.1], eta=1), vx, vy)
    with pytest.raises(ValueError, match="strictly increasing"):
        FederatedHPOEngine(
            tiny_model(), data,
            HPOConfig(learning_rates=[0.1], rung_rounds=(4, 4)), vx, vy)
    with pytest.raises(ValueError, match="uint8"):
        FederatedHPOEngine(tiny_model(), data,
                           HPOConfig(learning_rates=[0.1]),
                           vx.astype(np.float32), vy)
