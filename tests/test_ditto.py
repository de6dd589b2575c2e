"""Ditto personalization (fl_tpu.fl.ditto).

Load-bearing checks: the algebraic decomposition against a hand-written
oracle step (single full-batch step: v' = v − η(∇L(v) + λ(v − θ_g))),
the λ interpolation limits, and the personalization gain on a
label-permuted population.
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fl_tpu.core import pytree as pt
from fl_tpu.data.federated import FederatedArrays
from fl_tpu.data.synthetic import synthetic_mnist
from fl_tpu.fl.ditto import DittoPersonalizer
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


def make_data(C=4, n=32, seed=0, permute_half=False):
    xtr, ytr, _, _ = synthetic_mnist(n_train=C * n, n_test=1, seed=seed)
    labels = ytr.reshape(C, n).astype(np.int32)
    if permute_half:
        labels[C // 2:] = (labels[C // 2:] + 5) % 10
    return FederatedArrays(
        images=xtr.reshape(C, n, 28, 28, 1),
        labels=labels,
        num_samples=np.full(C, n, np.int32),
        mean=np.asarray([0.1307], np.float32),
        std=np.asarray([0.3081], np.float32), num_classes=10)


def make_engine(data, epochs=2, batch=16, lr=0.05):
    return FederatedRoundEngine(
        tiny_model(), data,
        RoundEngineConfig(training=FederatedTrainingConfig(
            local_epochs=epochs, batch_size=batch, learning_rate=lr,
            optimizer_type="sgd", momentum=0.0), seed=0))


def test_matches_oracle_single_full_batch_step():
    """batch = full shard, 1 epoch, plain SGD: the Ditto update must
    equal v − η(∇L(v; shard) + λ(v − θ_g)) exactly (the decomposition
    into FedProx-at-start + constant correction is an identity)."""
    lam, lr, n = 0.3, 0.05, 32
    data = make_data(C=2, n=n)
    eng = make_engine(data, epochs=1, batch=n, lr=lr)
    eng.run_round(evaluate=False)          # make θ_g ≠ init
    ditto = DittoPersonalizer(eng, lam=lam)
    # move one personal model away from the global so v ≠ θ_g
    bump = jax.tree.map(
        lambda l: l.at[0].add(0.05).astype(l.dtype)
        if jnp.issubdtype(l.dtype, jnp.floating) else l,
        ditto.personal_variables)
    ditto.personal_variables = bump
    v_before = [jax.tree.map(np.asarray, ditto.personal_model(c))
                for c in range(2)]
    ditto.step()
    for c in range(2):
        x = (jnp.asarray(data.images[c], jnp.float32) / 255.0
             - 0.1307) / 0.3081
        y = jnp.asarray(data.labels[c], jnp.int32)
        v = v_before[c]

        def loss_fn(params):
            logits, _ = eng.model.apply(
                {**v, "params": params}, x, train=False)
            return cross_entropy_loss(logits, y)

        g = jax.grad(loss_fn)(v["params"])
        expect = jax.tree.map(
            lambda p, gl, gp: p - lr * (np.asarray(gl)
                                        + lam * (p - np.asarray(gp))),
            v["params"], g, eng.global_variables["params"])
        got = ditto.personal_model(c)["params"]
        for a, b in zip(jax.tree.leaves(expect), jax.tree.leaves(got)):
            np.testing.assert_allclose(a, np.asarray(b), rtol=2e-5,
                                        atol=1e-6)


def test_lambda_interpolation():
    """Large λ pins the personal models to the global; small λ lets them
    wander much further. (λ must keep η·λ < 2 — the proximal pull is a
    plain gradient term, so overshooting it diverges like any SGD step;
    λ=10 at η=0.05 contracts.)"""
    data = make_data(C=4)
    eng = make_engine(data)
    eng.run_round(evaluate=False)

    def drift(lam):
        d = DittoPersonalizer(eng, lam=lam)
        for _ in range(3):
            d.step()
        dist = 0.0
        for vp, gp in zip(jax.tree.leaves(d.personal_variables),
                          jax.tree.leaves(jax.tree.map(
                              lambda x: x[None], eng.global_variables))):
            dist += float(np.sum((np.asarray(vp, np.float64)
                                  - np.asarray(gp, np.float64)) ** 2))
        return np.sqrt(dist)

    assert drift(10.0) < 0.5 * drift(0.0)


def test_personalization_gain_on_permuted_population():
    """Label-permuted halves: the single global model cannot serve both
    cohorts, the personal models can — personal accuracy on own shards
    must clearly beat the global's."""
    data = make_data(C=4, n=64, permute_half=True)
    eng = make_engine(data, epochs=2)
    ditto = DittoPersonalizer(eng, lam=0.05)
    for _ in range(4):
        eng.run_round(evaluate=False)
        ditto.step()
    out = ditto.evaluate_personal()
    assert out["personal_accuracy"] > out["global_accuracy"] + 0.1
    assert out["personalization_gain"] == pytest.approx(
        out["personal_accuracy"] - out["global_accuracy"])
    assert out["per_client"]["accuracy"].shape == (4,)


def test_mesh_equality(mesh8):
    data = make_data(C=8)

    def run(mesh):
        eng = FederatedRoundEngine(
            tiny_model(), data,
            RoundEngineConfig(training=FederatedTrainingConfig(
                local_epochs=1, batch_size=16, learning_rate=0.05,
                optimizer_type="sgd", momentum=0.0), seed=0),
            mesh=mesh)
        d = DittoPersonalizer(eng, lam=0.2)
        for _ in range(2):
            eng.run_round(evaluate=False)
            d.step()
        return jax.tree.map(np.asarray, d.personal_variables)

    a, b = run(None), run(mesh8)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(x, y, rtol=2e-5, atol=2e-6)


def test_validation_and_fedprox_composition():
    data = make_data()
    eng = make_engine(data)
    with pytest.raises(ValueError, match="lam"):
        DittoPersonalizer(eng, lam=-1.0)
    d = DittoPersonalizer(eng, lam=0.1)
    with pytest.raises(IndexError):
        d.personal_model(4)
    # a FedProx GLOBAL objective composes with Ditto's personal update
    # (the personal trainer strips the engine's mu and injects its own λ)
    eng2 = FederatedRoundEngine(
        tiny_model(), data,
        RoundEngineConfig(training=FederatedTrainingConfig(
            local_epochs=1, batch_size=16, learning_rate=0.05,
            optimizer_type="sgd", proximal_mu=0.5), seed=0))
    d2 = DittoPersonalizer(eng2, lam=0.1)
    eng2.run_round(evaluate=False)
    m = d2.step()
    assert np.isfinite(m["personal_loss"])


def test_checkpoint_resume_exact(tmp_path):
    from fl_tpu.orchestration.checkpoint import (
        restore_ditto_checkpoint,
        save_ditto_checkpoint,
    )

    data = make_data()
    eng = make_engine(data)
    ref = DittoPersonalizer(eng, lam=0.2)
    for _ in range(4):
        ref.step()

    eng_b = make_engine(data)  # same seed → same global trajectory
    d = DittoPersonalizer(eng_b, lam=0.2)
    d.step()
    d.step()
    save_ditto_checkpoint(d, str(tmp_path))
    resumed = DittoPersonalizer(make_engine(data), lam=0.2)
    assert restore_ditto_checkpoint(resumed, str(tmp_path)) == 2
    resumed.step()
    resumed.step()
    for a, b in zip(jax.tree.leaves(ref.personal_variables),
                    jax.tree.leaves(resumed.personal_variables)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_step_keys_distinct_from_personalization_eval():
    """ditto.step at counter r and evaluate_personalized at round r must
    NOT share PRNG streams (regression: both derived from the bare
    (round, PERSONALIZE) fold)."""
    import jax.numpy as jnp

    from fl_tpu.core import prng

    root = prng.root_key(0)
    eval_key = prng.stream_key(prng.round_key(root, jnp.int32(1)),
                               prng.Stream.PERSONALIZE)
    ditto_key = jax.random.fold_in(eval_key, jnp.uint32(0xD1770))
    assert not np.array_equal(np.asarray(eval_key),
                              np.asarray(ditto_key))
